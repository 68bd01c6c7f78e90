"""Pallas TPU kernels for tile-blocked correspondence search.

The XLA tile path (map/tiles.py) materializes each slot's [QB, 9*MTP]
distance matrix and its masks in HBM — several GB of traffic per query batch.
These kernels fuse the whole per-slot pipeline in VMEM: candidate tile blocks
stream in as double-buffered DMAs whose source row is computed in the
BlockSpec index_map from the scalar-prefetched slot->tile table, the distance
matrix is evaluated on the MXU against tile-local coordinates, the exact
27-voxel cube mask is applied, and only the [QB] winners leave the chip. HBM
traffic drops to "read each candidate tile once per slot".

Grid: (S slots,); each program consumes its slot's nine neighbor-tile blocks
(nine BlockSpecs over the same tensor with different index maps) so program
dispatch overhead amortizes over the whole 3x3 neighborhood.

Layout contract (map/tiles.build_tile_map(for_pallas=True)): candidate
geometry is transposed to [T+1, 3, Kp] with the candidate axis padded to a
lane multiple (128) and geometry padding at 1e30 (finite: stray MXU products
never NaN). Row T is the sentinel tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30
_COORD_SENTINEL = 2**30


def _interpret():
    # Mosaic only lowers on TPU; everywhere else (CPU tests, virtual meshes)
    # run the kernels in interpreter mode - same semantics, slow.
    return jax.default_backend() != "tpu"


def _neighbor_index_map(i, k, tile_ref, *, tx_dim, ty_dim, sentinel):
    """Slot i, neighbor k -> candidate tile row (sentinel outside the grid)."""
    tile = tile_ref[i]
    tx = tile // ty_dim + (k // 3 - 1)
    ty = tile % ty_dim + (k % 3 - 1)
    ok = (
        (tile != sentinel)
        & (tx >= 0) & (tx < tx_dim) & (ty >= 0) & (ty < ty_dim)
    )
    return jnp.where(ok, tx * ty_dim + ty, sentinel)


def _slot_center(tile, *, tile_size, tx0, ty0, ty_dim):
    tx = (tile // ty_dim + tx0).astype(jnp.float32)
    ty = (tile % ty_dim + ty0).astype(jnp.float32)
    return (tx + 0.5) * tile_size, (ty + 0.5) * tile_size


def _block_nearest(q, qv, ctr, cand, voxel_size):
    """One candidate block: exact-f32 distances + cube mask -> per-query
    (min d2, argmin, selected point). All VPU except the nothing-critical
    square terms; selection via one-hot VPU sums (bitwise exact)."""
    kp = cand.shape[1]
    qb = q.shape[0]
    finite = cand[0] < _BIG * 0.5                      # [Kp]
    ql = q - ctr[None, :]
    cl = cand - ctr[:, None]
    d2 = jnp.zeros((qb, kp), jnp.float32)
    for d in range(3):
        diff = ql[:, d][:, None] - cl[d][None, :]
        d2 = d2 + diff * diff
    cvox = jnp.floor(cand * (1.0 / voxel_size)).astype(jnp.int32)
    cube = finite[None, :]
    for d in range(3):
        cube = cube & (jnp.abs(cvox[d][None, :] - qv[:, d][:, None]) <= 1)
    d2m = jnp.where(cube, d2, jnp.inf)
    blk_idx = jnp.argmin(d2m, axis=1).astype(jnp.int32)
    blk_d2 = jnp.min(d2m, axis=1)
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (qb, kp), 1) == blk_idx[:, None]
    ).astype(jnp.float32)
    cand_z = jnp.where(finite[None, :], cand, 0.0)
    tgt = jnp.concatenate(
        [jnp.sum(onehot * cand_z[d][None, :], axis=1, keepdims=True)
         for d in range(3)],
        axis=1,
    )
    return blk_d2, blk_idx, tgt


def _nearest_point_kernel(meta, tile_ref, qbuf_ref, qvox_ref, *refs):
    voxel_size, tile_size, tx0, ty0, ty_dim = meta
    pts_refs = refs[:9]
    tgt_ref, d2_ref, idx_ref = refs[9:]
    i = pl.program_id(0)
    q = qbuf_ref[0]                      # [QB, 3]
    qv = qvox_ref[0]                     # [QB, 3] int32
    qb = q.shape[0]
    kp = pts_refs[0].shape[2]

    cx, cy = _slot_center(tile_ref[i], tile_size=tile_size, tx0=tx0, ty0=ty0,
                          ty_dim=ty_dim)
    ctr = jnp.stack([cx, cy, jnp.float32(0.0)])

    best_d2 = jnp.full((qb,), jnp.inf, jnp.float32)
    best_idx = jnp.zeros((qb,), jnp.int32)
    best_tgt = jnp.zeros((qb, 3), jnp.float32)
    for k in range(9):
        blk_d2, blk_idx, tgt_k = _block_nearest(
            q, qv, ctr, pts_refs[k][0], voxel_size
        )
        better = blk_d2 < best_d2
        best_tgt = jnp.where(better[:, None], tgt_k, best_tgt)
        best_idx = jnp.where(better, k * kp + blk_idx, best_idx)
        best_d2 = jnp.where(better, blk_d2, best_d2)

    tgt_ref[0] = best_tgt
    d2_ref[0, 0] = best_d2
    idx_ref[0, 0] = best_idx


def nearest_point_pallas(tmap, qbuf, qvox, slot_tile):
    """Per-slot nearest map point in the 27-voxel cube.

    qbuf [S,QB,3] f32, qvox [S,QB,3] i32, slot_tile [S] i32 ->
    (target [S,QB,3], best_d2 [S,QB], flat idx [S,QB] = k*Kp + slot).
    """
    s, qb, _ = qbuf.shape
    kp = tmap.tile_points_t.shape[2]
    sentinel = tmap.sentinel
    nbr_map = functools.partial(
        _neighbor_index_map, tx_dim=tmap.tx_dim, ty_dim=tmap.ty_dim,
        sentinel=sentinel,
    )
    meta = (float(tmap.voxel_size), float(tmap.tile_size), tmap.tx0, tmap.ty0,
            tmap.ty_dim)

    cand_specs = [
        pl.BlockSpec(
            (1, 3, kp),
            functools.partial(lambda i, t, kk: (nbr_map(i, kk, t), 0, 0), kk=k),
            memory_space=pltpu.VMEM,
        )
        for k in range(9)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(s,),
        in_specs=[
            pl.BlockSpec((1, qb, 3), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qb, 3), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + cand_specs,
        out_specs=[
            pl.BlockSpec((1, qb, 3), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, qb), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, qb), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    tgt, d2, idx = pl.pallas_call(
        functools.partial(_nearest_point_kernel, meta),
        grid_spec=grid_spec,
        interpret=_interpret(),
        out_shape=[
            jax.ShapeDtypeStruct((s, qb, 3), jnp.float32),
            jax.ShapeDtypeStruct((s, 1, qb), jnp.float32),
            jax.ShapeDtypeStruct((s, 1, qb), jnp.int32),
        ],
    )(slot_tile, qbuf, qvox, *([tmap.tile_points_t] * 9))
    return tgt, d2[:, 0], idx[:, 0]


def _block_voxel(q, qv, ctr, means, coords, covs):
    """One voxel-candidate block: exact-f32 distances to voxel means + cube
    mask -> (min d2, selected mean, selected cov row). Selection via one-hot
    VPU sums (bitwise exact)."""
    kp = means.shape[1]
    qb = q.shape[0]
    occupied = coords[0] != _COORD_SENTINEL
    ql = q - ctr[None, :]
    ml = jnp.where(occupied[None, :], means - ctr[:, None], 0.0)
    d2 = jnp.zeros((qb, kp), jnp.float32)
    for d in range(3):
        diff = ql[:, d][:, None] - ml[d][None, :]
        d2 = d2 + diff * diff
    cube = occupied[None, :]
    for d in range(3):
        cube = cube & (jnp.abs(coords[d][None, :] - qv[:, d][:, None]) <= 1)
    d2m = jnp.where(cube, d2, jnp.inf)
    blk_idx = jnp.argmin(d2m, axis=1).astype(jnp.int32)
    blk_d2 = jnp.min(d2m, axis=1)
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (qb, kp), 1) == blk_idx[:, None]
    ).astype(jnp.float32)
    mean_k = jnp.concatenate(
        [jnp.sum(onehot * ml[d][None, :], axis=1, keepdims=True)
         for d in range(3)],
        axis=1,
    ) + ctr[None, :]
    cov_k = jnp.concatenate(
        [jnp.sum(onehot * covs[j][None, :], axis=1, keepdims=True)
         for j in range(9)],
        axis=1,
    )
    return blk_d2, mean_k, cov_k


def _nearest_voxel_kernel(meta, tile_ref, qbuf_ref, qvox_ref, *refs):
    voxel_size, tile_size, tx0, ty0, ty_dim = meta
    mean_refs = refs[:9]
    coord_refs = refs[9:18]
    cov_refs = refs[18:27]
    mean_out, cov_out, d2_ref = refs[27:]
    i = pl.program_id(0)
    q = qbuf_ref[0]
    qv = qvox_ref[0]
    qb = q.shape[0]

    cx, cy = _slot_center(tile_ref[i], tile_size=tile_size, tx0=tx0, ty0=ty0,
                          ty_dim=ty_dim)
    ctr = jnp.stack([cx, cy, jnp.float32(0.0)])

    best_d2 = jnp.full((qb,), jnp.inf, jnp.float32)
    best_mean = jnp.zeros((qb, 3), jnp.float32)
    best_cov = jnp.zeros((qb, 9), jnp.float32)
    for k in range(9):
        blk_d2, mean_k, cov_k = _block_voxel(
            q, qv, ctr, mean_refs[k][0], coord_refs[k][0], cov_refs[k][0]
        )
        better = blk_d2 < best_d2
        best_mean = jnp.where(better[:, None], mean_k, best_mean)
        best_cov = jnp.where(better[:, None], cov_k, best_cov)
        best_d2 = jnp.where(better, blk_d2, best_d2)

    mean_out[0] = best_mean
    cov_out[0] = best_cov
    d2_ref[0, 0] = best_d2


def nearest_voxel_cov_pallas(tmap, qbuf, qvox, slot_tile):
    """VGICP: nearest voxel mean + its covariance, fused in VMEM.
    Returns (mean [S,QB,3], cov [S,QB,9], best_d2 [S,QB])."""
    s, qb, _ = qbuf.shape
    kp = tmap.tile_vox_mean_t.shape[2]
    sentinel = tmap.sentinel
    nbr_map = functools.partial(
        _neighbor_index_map, tx_dim=tmap.tx_dim, ty_dim=tmap.ty_dim,
        sentinel=sentinel,
    )
    meta = (float(tmap.voxel_size), float(tmap.tile_size), tmap.tx0, tmap.ty0,
            tmap.ty_dim)

    def cand_spec(shape2):
        return [
            pl.BlockSpec(
                (1,) + shape2,
                functools.partial(lambda i, t, kk: (nbr_map(i, kk, t), 0, 0), kk=k),
                memory_space=pltpu.VMEM,
            )
            for k in range(9)
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(s,),
        in_specs=[
            pl.BlockSpec((1, qb, 3), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qb, 3), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + cand_spec((3, kp)) + cand_spec((3, kp)) + cand_spec((9, kp)),
        out_specs=[
            pl.BlockSpec((1, qb, 3), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qb, 9), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, qb), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    mean, cov, d2 = pl.pallas_call(
        functools.partial(_nearest_voxel_kernel, meta),
        grid_spec=grid_spec,
        interpret=_interpret(),
        out_shape=[
            jax.ShapeDtypeStruct((s, qb, 3), jnp.float32),
            jax.ShapeDtypeStruct((s, qb, 9), jnp.float32),
            jax.ShapeDtypeStruct((s, 1, qb), jnp.float32),
        ],
    )(slot_tile, qbuf, qvox,
      *([tmap.tile_vox_mean_t] * 9), *([tmap.tile_vox_coord_t] * 9),
      *([tmap.tile_vox_cov_t] * 9))
    return mean, cov, d2[:, 0]


# --------------------------------------------------------------------------- #
# AVGICP: all 7 face-adjacent voxel covariances per query
# --------------------------------------------------------------------------- #

_OFF7 = (
    (0, 0, 0), (1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1),
    (0, 0, -1),
)


def _all_voxel_kernel(meta, tile_ref, qbuf_ref, qvox_ref, *refs):
    voxel_size, tile_size, tx0, ty0, ty_dim = meta
    mean_refs = refs[:9]
    coord_refs = refs[9:18]
    cov_refs = refs[18:27]
    mean_out, cov_out, found_out = refs[27:]
    i = pl.program_id(0)
    q = qbuf_ref[0]
    qv = qvox_ref[0]
    qb = q.shape[0]

    # Functional accumulation (no .at[].add — scatter isn't implemented in
    # the Pallas TPU lowering): per-offset sums collected in Python lists,
    # stacked once at the end.
    found_cols = []
    mean_cols = []
    cov_cols = []
    for o, off in enumerate(_OFF7):
        found_o = jnp.zeros((qb,), jnp.float32)
        mean_o = [jnp.zeros((qb,), jnp.float32) for _ in range(3)]
        cov_o = [jnp.zeros((qb,), jnp.float32) for _ in range(9)]
        for k in range(9):
            means = mean_refs[k][0]              # [3, Kp]
            coords = coord_refs[k][0]            # [3, Kp]
            covs = cov_refs[k][0]                # [9, Kp]
            occupied = coords[0] != _COORD_SENTINEL
            m_safe = jnp.where(occupied[None, :], means, 0.0)
            eq = occupied[None, :]
            for d in range(3):
                eq = eq & (coords[d][None, :] == (qv[:, d] + off[d])[:, None])
            sel = eq.astype(jnp.float32)     # [QB, Kp]; coords unique -> 0/1 hit
            found_o = found_o + jnp.sum(sel, axis=1)
            for d in range(3):
                mean_o[d] = mean_o[d] + jnp.sum(sel * m_safe[d][None, :], axis=1)
            for j in range(9):
                cov_o[j] = cov_o[j] + jnp.sum(sel * covs[j][None, :], axis=1)
        found_cols.append(found_o)
        mean_cols.append(jnp.stack(mean_o, axis=-1))   # [QB,3]
        cov_cols.append(jnp.stack(cov_o, axis=-1))     # [QB,9]

    mean_out[0] = jnp.stack(mean_cols, axis=1)         # [QB,7,3]
    cov_out[0] = jnp.stack(cov_cols, axis=1)           # [QB,7,9]
    found_out[0] = jnp.stack(found_cols, axis=1)       # [QB,7]


def all_voxel_cov_pallas(tmap, qbuf, qvox, slot_tile):
    """AVGICP: the 7 face-adjacent voxels per query (exact-coordinate match
    over the streamed candidate blocks). Returns
    (mean [S,QB,7,3], cov [S,QB,7,9], found [S,QB,7])."""
    s, qb, _ = qbuf.shape
    kp = tmap.tile_vox_mean_t.shape[2]
    sentinel = tmap.sentinel
    nbr_map = functools.partial(
        _neighbor_index_map, tx_dim=tmap.tx_dim, ty_dim=tmap.ty_dim,
        sentinel=sentinel,
    )
    meta = (float(tmap.voxel_size), float(tmap.tile_size), tmap.tx0, tmap.ty0,
            tmap.ty_dim)

    def cand_spec(shape2):
        return [
            pl.BlockSpec(
                (1,) + shape2,
                functools.partial(lambda i, t, kk: (nbr_map(i, kk, t), 0, 0), kk=k),
                memory_space=pltpu.VMEM,
            )
            for k in range(9)
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(s,),
        in_specs=[
            pl.BlockSpec((1, qb, 3), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qb, 3), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + cand_spec((3, kp)) + cand_spec((3, kp)) + cand_spec((9, kp)),
        out_specs=[
            pl.BlockSpec((1, qb, 7, 3), lambda i, t: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qb, 7, 9), lambda i, t: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qb, 7), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    mean, cov, found = pl.pallas_call(
        functools.partial(_all_voxel_kernel, meta),
        grid_spec=grid_spec,
        interpret=_interpret(),
        out_shape=[
            jax.ShapeDtypeStruct((s, qb, 7, 3), jnp.float32),
            jax.ShapeDtypeStruct((s, qb, 7, 9), jnp.float32),
            jax.ShapeDtypeStruct((s, qb, 7), jnp.float32),
        ],
    )(slot_tile, qbuf, qvox,
      *([tmap.tile_vox_mean_t] * 9), *([tmap.tile_vox_coord_t] * 9),
      *([tmap.tile_vox_cov_t] * 9))
    return mean, cov, found
