"""argsort+gathers vs multi-operand lax.sort at bench shapes.

voxel_downsample and assign_slots both argsort a key then gather 3-4
payload arrays through the permutation. TPU gathers are scalar-core-bound
(CLAUDE.md), so sorting the payloads ALONGSIDE the key (one lax.sort with
k operands — XLA sorts tuples natively) may beat argsort + k gathers.
Stable sort + same key => bitwise-identical outputs.

Times both forms amortized over an in-device fori_loop (relay-safe).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_sort.py
"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("BENCH_NO_DEVICE_GATE", "1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

RTT = 0.035
R = 50


def timeit(fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(x), out)
        best = min(best, max(time.time() - t0 - RTT, 0.0))
    return best / R * 1e3


def rep(f):
    """Run f R times in-device, chaining a data dependency."""
    def g(key, *payloads):
        def body(i, carry):
            k, ps = carry
            outs = f(k, *ps)
            # fold output back into the key so iterations can't be elided
            k2 = k ^ (outs[0][:k.shape[0]].astype(jnp.uint32) * 0 + i.astype(jnp.uint32))
            return (k2, ps)
        k, ps = jax.lax.fori_loop(0, R, body, (key, payloads))
        return f(k, *ps)
    return jax.jit(g)


def main():
    rng = np.random.default_rng(0)
    for n, label in ((26215, "downsample shape"), (19456, "assign_slots shape")):
        key = jnp.asarray(rng.integers(0, 2**32 - 2, n, dtype=np.uint32))
        pts = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
        iv = jnp.asarray(rng.integers(0, 2**31 - 1, (n, 3), dtype=np.int32))
        vb = jnp.asarray(rng.integers(0, 2, n).astype(bool))

        def argsort_form(k, p, c, v):
            order = jnp.argsort(k, stable=True)
            return (k[order], p[order], c[order], v[order])

        def multisort_form(k, p, c, v):
            ks, p0, p1, p2, c0, c1, c2, vs = jax.lax.sort(
                (k, p[:, 0], p[:, 1], p[:, 2],
                 c[:, 0], c[:, 1], c[:, 2], v),
                num_keys=1, is_stable=True)
            return (ks, jnp.stack([p0, p1, p2], -1),
                    jnp.stack([c0, c1, c2], -1), vs)

        def multisort_idx_form(k, p, c, v):
            # sort (key, iota): one extra u32 lane, then gather payloads
            ks, order = jax.lax.sort(
                (k, jnp.arange(k.shape[0], dtype=jnp.int32)),
                num_keys=1, is_stable=True)
            return (ks, p[order], c[order], v[order])

        a = timeit(rep(argsort_form), key, pts, iv, vb)
        b = timeit(rep(multisort_form), key, pts, iv, vb)
        c = timeit(rep(multisort_idx_form), key, pts, iv, vb)
        print(f"{label:20s} n={n}: argsort+gathers {a:7.3f} ms | "
              f"multi-operand sort {b:7.3f} ms | sort-idx+gathers {c:7.3f} ms",
              flush=True)

        # correctness: identical outputs
        oa = argsort_form(key, pts, iv, vb)
        ob = multisort_form(key, pts, iv, vb)
        for x, y in zip(oa, ob):
            assert np.array_equal(np.asarray(x), np.asarray(y)), "mismatch"
        print("  outputs bitwise equal", flush=True)


if __name__ == "__main__":
    main()
