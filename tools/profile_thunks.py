"""Thunk census: optimized-HLO instruction counts of the fused frame.

The round-3 ablations bound the no-ICP frame floor at ~3.2 ms and attributed
it to "~100 small dependent thunks" (docs/BENCH_NOTES.md). This tool makes
that concrete: compile fused_frame for the active backend and count
top-level instructions per computation in the OPTIMIZED module — each
non-trivial instruction in the entry/while-body computations is roughly one
kernel launch on TPU. Use it to find which stage carries the launch count.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_thunks.py
"""
import collections
import functools
import os
import re
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("BENCH_NO_DEVICE_GATE", "1")

import bench  # noqa: E402
from elimaloc_tpu.pipeline.runtime import (  # noqa: E402
    build_fused_batches, fused_frame,
)

SKIP = {"parameter", "constant", "tuple", "get-tuple-element", "bitcast"}


def census(hlo_text):
    """instruction opcode counts per computation."""
    comps = {}
    cur = None
    for line in hlo_text.splitlines():
        if line and not line.startswith(" ") and "{" in line and "->" in line:
            name = line.strip().split(" ")[0].lstrip("%")
            if name == "ENTRY":
                name = "ENTRY " + line.strip().split(" ")[1].lstrip("%")
            cur = collections.Counter()
            comps[name or "entry"] = cur
            continue
        s = line.strip()
        if cur is None or not s or s == "}" or " = " not in s:
            continue
        rhs = s.split(" = ", 1)[1].strip()
        # rhs: "<shape> <opcode>(...)" — TPU layout blocks ({1,0:T(8,128)})
        # contain parens, so strip every {...} before finding the first
        # opcode-like token immediately followed by '('
        rhs = re.sub(r"\{[^}]*\}", "", rhs)
        m = re.search(r"(?:^|[\s\)])([a-z][\w\-]*)\(", rhs)
        if not m:
            continue
        op = m.group(1)
        if op in SKIP:
            continue
        cur[op] += 1
    return comps


def main():
    pipe, log = bench.build_everything()
    pipe.reset()
    pipe._rebase(min(log.imu_t[0], log.scan_t[0]))
    batches = build_fused_batches(log, time_base=pipe.time_base)
    b0 = jax.tree_util.tree_map(lambda x: jnp.asarray(x)[0], batches)
    state = pipe.reset()
    fn = jax.jit(functools.partial(fused_frame, ps=pipe.static))
    compiled = fn.lower(state, b0, pipe.map, pp=pipe.params).compile()
    txt = compiled.as_text()
    comps = census(txt)
    rows = sorted(comps.items(), key=lambda kv: -sum(kv[1].values()))
    total = 0
    for name, cnt in rows:
        n = sum(cnt.values())
        total += n
        if n < 5:
            continue
        top = ", ".join(f"{k}:{v}" for k, v in cnt.most_common(8))
        print(f"{n:5d}  {name[:70]:70s} {top}")
    print(f"TOTAL instructions (all computations): {total}")
    print(f"module computations: {len(comps)}")


if __name__ == "__main__":
    main()
