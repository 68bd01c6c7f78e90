"""Tile-blocked correspondence engine — the TPU fast path.

The hash-grid queries in grid.py are semantically exact but gather-bound:
XLA lowers per-point random access to scalar-core loops (~0.1M elements/ms on
v5e), so 8192 queries x 27 probes cost tens of milliseconds. This module
restructures the same correspondence semantics (reference:
voxel_hash_map.cpp:31-206) into a TPU-native dataflow:

  1. Map points/voxels are sorted into 2D spatial TILES (a few voxels wide,
     full z column) and padded to dense per-tile blocks at build time.
  2. At query time, scan points are sorted by tile id and packed into fixed
     [slot, QB] blocks (a slot = one tile's queries, chunked by QB).
  3. Each slot gathers its 3x3 tile neighborhood as NINE contiguous slices —
     big sequential DMAs instead of 200k tiny gathers — and evaluates the
     dense [QB, 9*MTP] distance matrix on the MXU, masked back to the exact
     27-voxel cube so results match the hash grid bit-for-bit (up to argmin
     tie order).
  4. Results scatter back through the sort permutation.

This is also the natural multi-chip decomposition: slots shard over devices
(parallel/sharding.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# TPU f32 matmuls default to bf16 operands; distance matrices and one-hot
# selections need true f32.
_HI = jax.lax.Precision.HIGHEST

from .builder import BuiltMap
from .grid import OFFSETS_7

_COORD_SENTINEL = np.int32(2**30)


@struct.dataclass
class TileMap:
    """Tile-blocked map tensors. Row T (last) of tile-indexed arrays is a
    sentinel (count 0, +inf geometry)."""

    # point level (P2P / GICP)
    tile_points: jnp.ndarray            # [T+1, MTP, 3] f32, pad +inf
    tile_counts: jnp.ndarray            # [T+1] int32
    tile_point_cov: Optional[jnp.ndarray]       # [T+1, MTP, 3, 3] or None
    tile_point_cov_mean: Optional[jnp.ndarray]  # [T+1, MTP, 3] or None

    # voxel level (VGICP / AVGICP)
    tile_vox_mean: jnp.ndarray          # [T+1, MTV, 3] f32, pad +inf
    tile_vox_cov: jnp.ndarray           # [T+1, MTV, 3, 3]
    tile_vox_coord: jnp.ndarray         # [T+1, MTV, 3] int32, pad sentinel
    tile_vox_counts: jnp.ndarray        # [T+1] int32

    # transposed lane-aligned copies for the Pallas kernels (last dim padded
    # to a multiple of 128; geometry padded with 1e30, not inf, so stray
    # MXU products stay NaN-free)
    tile_points_t: Optional[jnp.ndarray]     # [T+1, 3, MTPp] f32
    tile_vox_mean_t: Optional[jnp.ndarray]   # [T+1, 3, MTVp] f32
    tile_vox_coord_t: Optional[jnp.ndarray]  # [T+1, 3, MTVp] int32
    tile_vox_cov_t: Optional[jnp.ndarray]    # [T+1, 9, MTVp] f32

    voxel_size: float = struct.field(pytree_node=False)
    tile_size: float = struct.field(pytree_node=False)
    tx0: int = struct.field(pytree_node=False)   # tile-grid origin (tile units)
    ty0: int = struct.field(pytree_node=False)
    tx_dim: int = struct.field(pytree_node=False)
    ty_dim: int = struct.field(pytree_node=False)

    # world offset of the map's coordinate frame (nonzero for active-window
    # crops: point coords are stored window-locally so the window can move
    # WITHOUT recompiling — the origin is a dynamic pytree leaf while the
    # grid geometry stays static). run_register conjugates poses by it.
    origin: jnp.ndarray = None               # [2] f32 (x, y), 0 for full maps

    @property
    def num_tiles(self) -> int:
        return self.tx_dim * self.ty_dim

    @property
    def sentinel(self) -> int:
        return self.num_tiles


@dataclasses.dataclass(frozen=True)
class TileQueryBudget:
    """Static shape budgets for one query batch.

    ``pallas=True`` routes the per-slot search through the fused VMEM kernels
    (pallas/corr_kernels.py) — same results, ~10x less HBM traffic; requires
    a map built with for_pallas=True (the default)."""

    qb: int = 8            # queries per slot (small: slot fill beats SIMD width)
    max_slots: int = 2560  # >= N/qb + (#occupied query tiles)
    pallas: bool = False

    def for_queries(self, n: int):
        return self


def _round_up(x, m=128):
    return ((max(x, 1) + m - 1) // m) * m


def build_tile_map(built: BuiltMap, tile_voxels: int = 4,
                   for_pallas: bool = True) -> "HostTileMap":
    """Re-block a BuiltMap into padded per-tile tensors (host side).
    ``for_pallas`` additionally materializes transposed lane-aligned copies
    consumed by the Pallas correspondence kernels."""
    vs = built.voxel_size
    ts = vs * tile_voxels
    # numpy // floors for negative ints, matching floor(p / tile_size).
    vox_tx = built.vox_coords[:, 0] // tile_voxels
    vox_ty = built.vox_coords[:, 1] // tile_voxels
    tx0, ty0 = int(vox_tx.min()), int(vox_ty.min())
    tx_dim = int(vox_tx.max()) - tx0 + 1
    ty_dim = int(vox_ty.max()) - ty0 + 1
    t = tx_dim * ty_dim
    tile_of_vox = (vox_tx - tx0) * ty_dim + (vox_ty - ty0)

    v, m = built.counts.shape[0], built.max_points_per_voxel

    # --- voxel-level blocking ---
    order = np.argsort(tile_of_vox, kind="stable")
    sorted_tiles = tile_of_vox[order]
    vox_rank = np.arange(v) - np.searchsorted(sorted_tiles, sorted_tiles)
    mtv = int(np.bincount(sorted_tiles, minlength=t).max()) if v else 1

    tile_vox_mean = np.full((t + 1, mtv, 3), np.inf, np.float32)
    tile_vox_cov = np.tile(np.eye(3, dtype=np.float32), (t + 1, mtv, 1, 1))
    tile_vox_coord = np.full((t + 1, mtv, 3), _COORD_SENTINEL, np.int32)
    tile_vox_counts = np.zeros(t + 1, np.int32)
    tile_vox_counts[:t] = np.bincount(tile_of_vox, minlength=t)
    tile_vox_mean[sorted_tiles, vox_rank] = built.vox_mean[order]
    tile_vox_cov[sorted_tiles, vox_rank] = built.vox_cov[order]
    tile_vox_coord[sorted_tiles, vox_rank] = built.vox_coords[order]

    # --- point-level blocking (flatten voxel blocks, keep per-point payloads) ---
    pt_mask = np.arange(m)[None, :] < built.counts[:, None]          # [V, M]
    flat_pts = built.points[pt_mask]                                  # [P,3]
    pt_tile = np.repeat(tile_of_vox, m).reshape(v, m)[pt_mask]
    p_order = np.argsort(pt_tile, kind="stable")
    sp_tiles = pt_tile[p_order]
    p_rank = np.arange(len(p_order)) - np.searchsorted(sp_tiles, sp_tiles)
    mtp = int(np.bincount(sp_tiles, minlength=t).max()) if len(p_order) else 1

    tile_points = np.full((t + 1, mtp, 3), np.inf, np.float32)
    tile_counts = np.zeros(t + 1, np.int32)
    tile_counts[:t] = np.bincount(pt_tile, minlength=t)
    tile_points[sp_tiles, p_rank] = flat_pts[p_order]

    tile_point_cov = tile_point_cov_mean = None
    if built.point_cov is not None:
        flat_cov = built.point_cov[pt_mask]
        flat_cm = built.point_cov_mean[pt_mask]
        tile_point_cov = np.tile(np.eye(3, dtype=np.float32), (t + 1, mtp, 1, 1))
        tile_point_cov_mean = np.full((t + 1, mtp, 3), np.inf, np.float32)
        tile_point_cov[sp_tiles, p_rank] = flat_cov[p_order]
        tile_point_cov_mean[sp_tiles, p_rank] = flat_cm[p_order]

    tile_points_t = tile_vox_mean_t = tile_vox_coord_t = tile_vox_cov_t = None
    if for_pallas:
        big = np.float32(1e30)
        mtp_p = _round_up(mtp)
        tile_points_t = np.full((t + 1, 3, mtp_p), big, np.float32)
        tile_points_t[:, :, :mtp] = np.where(
            np.isfinite(tile_points), tile_points, big
        ).transpose(0, 2, 1)
        mtv_p = _round_up(mtv)
        tile_vox_mean_t = np.full((t + 1, 3, mtv_p), big, np.float32)
        tile_vox_mean_t[:, :, :mtv] = np.where(
            np.isfinite(tile_vox_mean), tile_vox_mean, big
        ).transpose(0, 2, 1)
        tile_vox_coord_t = np.full((t + 1, 3, mtv_p), _COORD_SENTINEL, np.int32)
        tile_vox_coord_t[:, :, :mtv] = tile_vox_coord.transpose(0, 2, 1)
        tile_vox_cov_t = np.zeros((t + 1, 9, mtv_p), np.float32)
        tile_vox_cov_t[:, :, :mtv] = tile_vox_cov.reshape(
            t + 1, mtv, 9
        ).transpose(0, 2, 1)

    return HostTileMap(
        tile_points=tile_points,
        tile_counts=tile_counts,
        tile_point_cov=tile_point_cov,
        tile_point_cov_mean=tile_point_cov_mean,
        tile_vox_mean=tile_vox_mean,
        tile_vox_cov=tile_vox_cov,
        tile_vox_coord=tile_vox_coord,
        tile_vox_counts=tile_vox_counts,
        tile_points_t=tile_points_t,
        tile_vox_mean_t=tile_vox_mean_t,
        tile_vox_coord_t=tile_vox_coord_t,
        tile_vox_cov_t=tile_vox_cov_t,
        voxel_size=float(vs),
        tile_size=float(ts),
        tx0=tx0,
        ty0=ty0,
        tx_dim=tx_dim,
        ty_dim=ty_dim,
    )


@dataclasses.dataclass
class HostTileMap:
    tile_points: np.ndarray
    tile_counts: np.ndarray
    tile_point_cov: Optional[np.ndarray]
    tile_point_cov_mean: Optional[np.ndarray]
    tile_vox_mean: np.ndarray
    tile_vox_cov: np.ndarray
    tile_vox_coord: np.ndarray
    tile_vox_counts: np.ndarray
    tile_points_t: Optional[np.ndarray]
    tile_vox_mean_t: Optional[np.ndarray]
    tile_vox_coord_t: Optional[np.ndarray]
    tile_vox_cov_t: Optional[np.ndarray]
    voxel_size: float
    tile_size: float
    tx0: int
    ty0: int
    tx_dim: int
    ty_dim: int
    world_offset: tuple = (0.0, 0.0)

    def to_device(self, dtype=jnp.float32) -> TileMap:
        a = lambda x: None if x is None else jnp.asarray(x)
        return TileMap(
            tile_points=jnp.asarray(self.tile_points, dtype=dtype),
            tile_counts=jnp.asarray(self.tile_counts),
            tile_point_cov=a(self.tile_point_cov),
            tile_point_cov_mean=a(self.tile_point_cov_mean),
            tile_vox_mean=jnp.asarray(self.tile_vox_mean, dtype=dtype),
            tile_vox_cov=jnp.asarray(self.tile_vox_cov, dtype=dtype),
            tile_vox_coord=jnp.asarray(self.tile_vox_coord),
            tile_vox_counts=jnp.asarray(self.tile_vox_counts),
            tile_points_t=a(self.tile_points_t),
            tile_vox_mean_t=a(self.tile_vox_mean_t),
            tile_vox_coord_t=a(self.tile_vox_coord_t),
            tile_vox_cov_t=a(self.tile_vox_cov_t),
            voxel_size=self.voxel_size,
            tile_size=self.tile_size,
            tx0=self.tx0,
            ty0=self.ty0,
            tx_dim=self.tx_dim,
            ty_dim=self.ty_dim,
            origin=jnp.asarray(self.world_offset, dtype=dtype),
        )

    def window_anchor(self, center_xy, dims):
        """(x0, y0) tile anchor a crop_window at this center would use —
        cheap no-op detection for window management (clamped at map edges,
        where the window cannot follow the pose)."""
        nx, ny = dims
        cx = int(np.floor(center_xy[0] / self.tile_size))
        cy = int(np.floor(center_xy[1] / self.tile_size))
        x0 = int(np.clip(cx - nx // 2, self.tx0, self.tx0 + self.tx_dim - nx))
        y0 = int(np.clip(cy - ny // 2, self.ty0, self.ty0 + self.ty_dim - ny))
        return x0, y0

    def crop_window(self, center_xy, radius_tiles: int,
                    dims: Optional[tuple] = None,
                    offset_dtype=np.float32) -> "HostTileMap":
        """Fixed-size active-window crop in WINDOW-LOCAL coordinates.

        City-scale maps (10-100M points) do not fit HBM; the pipeline keeps
        a (2*radius_tiles+1)^2-tile window around the vehicle resident and
        re-crops when the pose nears the edge. The window's point/voxel
        coordinates are shifted by the window origin and the grid is
        anchored at tx0=ty0=0, so every crop has IDENTICAL static metadata
        — swapping windows never recompiles. The world offset rides along
        as ``world_offset`` (a dynamic device leaf after ``to_device``);
        ``register.run_register`` conjugates poses by it, making results
        identical to the full map for any query whose 3x3-tile neighborhood
        lies inside the window. Out-of-map tiles are filled from the
        sentinel row (empty).
        """
        if dims is None:
            nx = min(2 * radius_tiles + 1, self.tx_dim)
            ny = min(2 * radius_tiles + 1, self.ty_dim)
        else:
            nx, ny = dims
        del dims
        x0, y0 = self.window_anchor(center_xy, (nx, ny))
        t_full = self.tx_dim * self.ty_dim  # sentinel row index
        gx = np.arange(x0 - self.tx0, x0 - self.tx0 + nx)
        gy = np.arange(y0 - self.ty0, y0 - self.ty0 + ny)
        in_map = (gx[:, None] >= 0) & (gx[:, None] < self.tx_dim)             & (gy[None, :] >= 0) & (gy[None, :] < self.ty_dim)
        rows = gx[:, None] * self.ty_dim + gy[None, :]
        rows = np.where(in_map, rows, t_full).reshape(-1)

        # Quantize the offset to the DEVICE dtype before shifting: the same
        # value must be subtracted host-side and added back by run_register's
        # origin conjugation, or city-scale coordinates (~1e6 m, f32 ulp
        # ~0.06 m) pick up a per-window pose bias.
        off = np.array([x0 * self.tile_size, y0 * self.tile_size])
        off = off.astype(offset_dtype).astype(np.float64)
        voff = np.array([x0, y0]) * int(round(self.tile_size / self.voxel_size))

        def sel(a):
            return None if a is None else np.concatenate(
                [a[rows], a[-1:]], axis=0)  # + sentinel row

        def shift_xy(a, o, sentinel=None):
            if a is None:
                return None
            a = a.copy()
            # padded entries (coord sentinel) must KEEP their sentinel value:
            # the voxel paths test coords against _COORD_SENTINEL exactly,
            # and a shifted pad would read as occupied (NaN means downstream)
            keep = None if sentinel is None else (a[..., 0] == sentinel)
            a[..., 0] -= o[0]
            a[..., 1] -= o[1]
            if keep is not None:
                a[keep] = sentinel
            return a

        def shift_xy_t(a, o, sentinel=None):
            # transposed layout [T+1, 3, Kp]: axis 1 is the coordinate
            if a is None:
                return None
            a = a.copy()
            keep = None if sentinel is None else (a[:, 0, :] == sentinel)
            a[:, 0, :] -= o[0]
            a[:, 1, :] -= o[1]
            if keep is not None:
                a[:, 0, :][keep] = sentinel
                a[:, 1, :][keep] = sentinel
            return a

        return HostTileMap(
            tile_points=shift_xy(sel(self.tile_points), off),
            tile_counts=sel(self.tile_counts),
            tile_point_cov=sel(self.tile_point_cov),
            tile_point_cov_mean=shift_xy(sel(self.tile_point_cov_mean), off),
            tile_vox_mean=shift_xy(sel(self.tile_vox_mean), off),
            tile_vox_cov=sel(self.tile_vox_cov),
            tile_vox_coord=shift_xy(sel(self.tile_vox_coord), voff,
                                    sentinel=_COORD_SENTINEL),
            tile_vox_counts=sel(self.tile_vox_counts),
            tile_points_t=shift_xy_t(sel(self.tile_points_t),
                                     off.astype(np.float32)),
            tile_vox_mean_t=shift_xy_t(sel(self.tile_vox_mean_t),
                                       off.astype(np.float32)),
            tile_vox_coord_t=shift_xy_t(sel(self.tile_vox_coord_t), voff,
                                        sentinel=_COORD_SENTINEL),
            tile_vox_cov_t=sel(self.tile_vox_cov_t),
            voxel_size=self.voxel_size,
            tile_size=self.tile_size,
            tx0=0,
            ty0=0,
            tx_dim=nx,
            ty_dim=ny,
            world_offset=(float(off[0]), float(off[1])),
        )


# --------------------------------------------------------------------------- #
# Slot assignment: sort queries by tile, pack into [max_slots, qb] blocks
# --------------------------------------------------------------------------- #

@struct.dataclass
class SlotAssignment:
    qbuf: jnp.ndarray       # [S, QB, 3] queries (garbage where ~qmask)
    qvox: jnp.ndarray       # [S, QB, 3] int32 query voxel coords
    qmask: jnp.ndarray      # [S, QB] bool
    qidx: jnp.ndarray       # [S, QB] int32 original query index (N if unused)
    slot_tile: jnp.ndarray  # [S] int32 tile id (sentinel T if unused)
    dropped: jnp.ndarray    # number of queries dropped on slot overflow


def assign_slots(tmap: TileMap, queries, valid, budget: TileQueryBudget) -> SlotAssignment:
    n = queries.shape[0]
    qb, s = budget.qb, budget.max_slots
    t_sent = tmap.sentinel

    qv = jnp.floor(queries / tmap.voxel_size).astype(jnp.int32)
    tx = jnp.floor(queries[:, 0] / tmap.tile_size).astype(jnp.int32) - tmap.tx0
    ty = jnp.floor(queries[:, 1] / tmap.tile_size).astype(jnp.int32) - tmap.ty0
    in_grid = (tx >= 0) & (tx < tmap.tx_dim) & (ty >= 0) & (ty < tmap.ty_dim)
    tile = jnp.where(valid & in_grid, tx * tmap.ty_dim + ty, t_sent)

    order = jnp.argsort(tile)  # stable
    st = tile[order]
    idx = jnp.arange(n, dtype=jnp.int32)
    first = jnp.ones(n, dtype=bool).at[1:].set(st[1:] != st[:-1])
    seg_start = jax.lax.cummax(jnp.where(first, idx, 0))
    rank = idx - seg_start
    new_slot = first | (rank % qb == 0)
    slot = jnp.cumsum(new_slot) - 1
    pos = rank % qb

    usable = (slot < s) & (st != t_sent)
    flat = jnp.where(usable, slot * qb + pos, s * qb)  # drop target

    q_sorted = queries[order]
    qv_sorted = qv[order]
    qbuf = jnp.zeros((s * qb, 3), dtype=queries.dtype).at[flat].set(
        q_sorted, mode="drop"
    ).reshape(s, qb, 3)
    qvox = jnp.full((s * qb, 3), 0, dtype=jnp.int32).at[flat].set(
        qv_sorted, mode="drop"
    ).reshape(s, qb, 3)
    qmask = jnp.zeros((s * qb,), dtype=bool).at[flat].set(
        usable, mode="drop"
    ).reshape(s, qb)
    qidx = jnp.full((s * qb,), n, dtype=jnp.int32).at[flat].set(
        order.astype(jnp.int32), mode="drop"
    ).reshape(s, qb)
    slot_tile = jnp.full((s + 1,), t_sent, dtype=jnp.int32).at[
        jnp.where(usable, slot, s)
    ].set(st, mode="drop")[:s]
    dropped = jnp.sum((st != t_sent) & ~usable)
    return SlotAssignment(
        qbuf=qbuf, qvox=qvox, qmask=qmask, qidx=qidx, slot_tile=slot_tile,
        dropped=dropped,
    )


def _slot_centers(tmap: TileMap, slot_tile, dtype):
    """Per-slot tile-center offsets. Distances are evaluated on tile-local
    coordinates so the MXU |q|^2 - 2 q.c + |c|^2 expansion keeps full f32
    precision at map-scale coordinates (z is left global: vehicle maps are
    z-shallow)."""
    tx = (slot_tile // tmap.ty_dim + tmap.tx0).astype(dtype)
    ty = (slot_tile % tmap.ty_dim + tmap.ty0).astype(dtype)
    zeros = jnp.zeros_like(tx)
    return jnp.stack(
        [(tx + 0.5) * tmap.tile_size, (ty + 0.5) * tmap.tile_size, zeros], axis=-1
    )


def _neighbor_tiles(tmap: TileMap, slot_tile):
    """[S] tile id -> [S,9] neighbor tile ids (sentinel outside the grid)."""
    t_sent = tmap.sentinel
    tx = slot_tile // tmap.ty_dim
    ty = slot_tile % tmap.ty_dim
    offs = jnp.asarray(
        [[dx, dy] for dx in (-1, 0, 1) for dy in (-1, 0, 1)], dtype=jnp.int32
    )
    nx = tx[:, None] + offs[None, :, 0]
    ny = ty[:, None] + offs[None, :, 1]
    ok = (
        (slot_tile != t_sent)[:, None]
        & (nx >= 0) & (nx < tmap.tx_dim) & (ny >= 0) & (ny < tmap.ty_dim)
    )
    return jnp.where(ok, nx * tmap.ty_dim + ny, t_sent)


def _cube_mask(qvox, cvox):
    """27-voxel cube membership: all(|cvox - qvox| <= 1).

    qvox: [..., QB, 3]; cvox: [..., K, 3] -> [..., QB, K] bool.
    """
    ok = jnp.ones(qvox.shape[:-2] + (qvox.shape[-2], cvox.shape[-2]), dtype=bool)
    for d in range(3):
        diff = jnp.abs(
            cvox[..., None, :, d] - qvox[..., :, None, d]
        )
        ok = ok & (diff <= 1)
    return ok


def _chunked(fn, xs_tree, chunk: int):
    """scan(vmap(fn)) over the leading axis in chunks (bounded memory)."""
    leaves = jax.tree_util.tree_leaves(xs_tree)
    s = leaves[0].shape[0]
    assert s % chunk == 0, (s, chunk)
    resh = jax.tree_util.tree_map(
        lambda x: x.reshape((s // chunk, chunk) + x.shape[1:]), xs_tree
    )
    out = jax.lax.map(lambda c: jax.vmap(fn)(c), resh)
    return jax.tree_util.tree_map(
        lambda x: x.reshape((s,) + x.shape[2:]), out
    )


def _scatter_back(n, qidx, *fields):
    """[S,QB,...] slot results -> [N,...] original order (defaults kept where
    a query was dropped)."""
    flat_idx = qidx.reshape(-1)
    outs = []
    for default, buf in fields:
        flat = buf.reshape((-1,) + buf.shape[2:])
        out = jnp.broadcast_to(default, (n,) + flat.shape[1:]).astype(flat.dtype)
        outs.append(out.at[flat_idx].set(flat, mode="drop"))
    return outs


# --------------------------------------------------------------------------- #
# Queries
# --------------------------------------------------------------------------- #

def nearest_point_slots(tmap: TileMap, slot_tile, qbuf, qvox, qmask, max_dist,
                        budget: TileQueryBudget, *, with_point_cov: bool = False,
                        chunk: int = 8):
    """Slot-layout core of :func:`query_nearest_point`: correspondence for
    pre-assigned per-tile query blocks, no scatter back to query order. Used
    directly by the ICP inner loop, where slot assignment is hoisted out of
    the Gauss-Newton iteration (sort/scatter are TPU scalar-core-bound; the
    GN sums are permutation-invariant so results never need re-ordering).

    Returns (target [S,QB,3], ok [S,QB]) + (cov [S,QB,3,3], mean [S,QB,3])
    when ``with_point_cov``.
    """
    if budget.pallas:
        return _nearest_point_slots_pallas(
            tmap, slot_tile, qbuf, qvox, qmask, max_dist,
            with_point_cov=with_point_cov,
        )
    nbr = _neighbor_tiles(tmap, slot_tile)              # [S,9]
    mtp = tmap.tile_points.shape[1]

    def per_slot(args):
        q, qv, qm, nb, ctr = args                        # [QB,3],[QB,3],[QB],[9],[3]
        cand = tmap.tile_points[nb].reshape(9 * mtp, 3)  # 9 contiguous slices
        finite = jnp.isfinite(cand[:, 0])
        cand_safe = jnp.where(finite[:, None], cand, 0.0)  # keep inf out of MXU
        cvox = jnp.floor(cand_safe / tmap.voxel_size).astype(jnp.int32)
        cube = _cube_mask(qv, cvox) & finite[None, :]    # [QB, 9*MTP]
        # dense squared distance via the MXU on tile-local coordinates
        ql = q - ctr
        cl = jnp.where(finite[:, None], cand_safe - ctr, 0.0)
        d2 = (
            jnp.sum(ql * ql, axis=1)[:, None]
            - 2.0 * jnp.matmul(ql, cl.T, precision=_HI)
            + jnp.sum(cl * cl, axis=1)[None, :]
        )
        d2 = jnp.where(cube, d2, jnp.inf)
        best = jnp.argmin(d2, axis=1)
        best_d2 = jnp.min(d2, axis=1)
        ok = qm & (best_d2 < max_dist * max_dist)
        # gather-free selection: one-hot row-select as a matmul
        onehot = (
            jnp.arange(9 * mtp, dtype=jnp.int32)[None, :] == best[:, None]
        ).astype(q.dtype)                                # [QB, 9*MTP]
        tgt = jnp.where(
            ok[:, None], jnp.matmul(onehot, cand_safe, precision=_HI), q
        )
        outs = (tgt, ok)
        if with_point_cov:
            ccov = tmap.tile_point_cov[nb].reshape(9 * mtp, 9)
            cmean = tmap.tile_point_cov_mean[nb].reshape(9 * mtp, 3)
            cmean = jnp.where(finite[:, None], cmean, 0.0)  # inf pad -> NaN in matmul
            bc = jnp.matmul(onehot, ccov, precision=_HI).reshape(-1, 3, 3)
            bm = jnp.matmul(onehot, cmean, precision=_HI)
            eye = jnp.broadcast_to(jnp.eye(3, dtype=bc.dtype), bc.shape)
            outs = outs + (
                jnp.where(ok[:, None, None], bc, eye),
                jnp.where(ok[:, None], bm, q),
            )
        return outs

    centers = _slot_centers(tmap, slot_tile, qbuf.dtype)
    xs = (qbuf, qvox, qmask, nbr, centers)
    return _chunked(per_slot, xs, chunk)


def query_nearest_point(tmap: TileMap, queries, valid, max_dist,
                        budget: TileQueryBudget, *, with_point_cov: bool = False,
                        chunk: int = 8):
    """Nearest map point within the exact 27-voxel cube of each query
    (hash-grid/GetCorrespondencePoints semantics). Returns
    (target [N,3], valid [N]) plus (cov [N,3,3], cov_mean [N,3]) when
    ``with_point_cov`` (GICP)."""
    n = queries.shape[0]
    asg = assign_slots(tmap, queries, valid, budget)
    res = nearest_point_slots(
        tmap, asg.slot_tile, asg.qbuf, asg.qvox, asg.qmask, max_dist, budget,
        with_point_cov=with_point_cov, chunk=chunk,
    )
    fields = [(queries[0] * 0.0, res[0]), (jnp.asarray(False), res[1])]
    if with_point_cov:
        fields += [
            (jnp.eye(3, dtype=queries.dtype), res[2]),
            (queries[0] * 0.0, res[3]),
        ]
    out = _scatter_back(n, asg.qidx, *fields)
    # default target/mean for dropped queries: the query itself (sanitized)
    out[0] = jnp.where(out[1][:, None], out[0], queries)
    if with_point_cov:
        out[3] = jnp.where(out[1][:, None], out[3], queries)
    return tuple(out)


def nearest_voxel_cov_slots(tmap: TileMap, slot_tile, qbuf, qvox, qmask,
                            max_dist, budget: TileQueryBudget, chunk: int = 8):
    """Slot-layout core of :func:`query_nearest_voxel_cov` (see
    :func:`nearest_point_slots` for why). Returns
    (cov [S,QB,3,3], mean [S,QB,3], ok [S,QB])."""
    if budget.pallas:
        return _nearest_voxel_cov_slots_pallas(
            tmap, slot_tile, qbuf, qvox, qmask, max_dist
        )
    nbr = _neighbor_tiles(tmap, slot_tile)
    mtv = tmap.tile_vox_mean.shape[1]

    def per_slot(args):
        q, qv, qm, nb, ctr = args
        means = tmap.tile_vox_mean[nb].reshape(9 * mtv, 3)
        cvox = tmap.tile_vox_coord[nb].reshape(9 * mtv, 3)
        occupied = cvox[:, 0] != _COORD_SENTINEL
        cube = _cube_mask(qv, cvox) & occupied[None, :]
        m_safe = jnp.where(occupied[:, None], means, 0.0)
        ql = q - ctr
        ml = jnp.where(occupied[:, None], m_safe - ctr, 0.0)
        d2 = (
            jnp.sum(ql * ql, axis=1)[:, None]
            - 2.0 * jnp.matmul(ql, ml.T, precision=_HI)
            + jnp.sum(ml * ml, axis=1)[None, :]
        )
        d2 = jnp.where(cube, d2, jnp.inf)
        best = jnp.argmin(d2, axis=1)
        best_d2 = jnp.min(d2, axis=1)
        ok = qm & (best_d2 < max_dist * max_dist)
        onehot = (
            jnp.arange(9 * mtv, dtype=jnp.int32)[None, :] == best[:, None]
        ).astype(q.dtype)
        covs = jnp.matmul(
            onehot, tmap.tile_vox_cov[nb].reshape(9 * mtv, 9), precision=_HI
        ).reshape(-1, 3, 3)
        bmean = jnp.matmul(onehot, m_safe, precision=_HI)
        eye = jnp.broadcast_to(jnp.eye(3, dtype=covs.dtype), covs.shape)
        return (
            jnp.where(ok[:, None, None], covs, eye),
            jnp.where(ok[:, None], bmean, q),
            ok,
        )

    centers = _slot_centers(tmap, slot_tile, qbuf.dtype)
    return _chunked(per_slot, (qbuf, qvox, qmask, nbr, centers), chunk)


def query_nearest_voxel_cov(tmap: TileMap, queries, valid, max_dist,
                            budget: TileQueryBudget, chunk: int = 8):
    """VGICP: covariance of the 27-neighborhood voxel whose mean is closest.
    Returns (cov [N,3,3], mean [N,3], valid [N])."""
    n = queries.shape[0]
    asg = assign_slots(tmap, queries, valid, budget)
    res = nearest_voxel_cov_slots(
        tmap, asg.slot_tile, asg.qbuf, asg.qvox, asg.qmask, max_dist, budget,
        chunk=chunk,
    )
    cov, mean, ok = _scatter_back(
        n,
        asg.qidx,
        (jnp.eye(3, dtype=queries.dtype), res[0]),
        (queries[0] * 0.0, res[1]),
        (jnp.asarray(False), res[2]),
    )
    mean = jnp.where(ok[:, None], mean, queries)
    return cov, mean, ok


def all_voxel_cov_slots(tmap: TileMap, slot_tile, qbuf, qvox, qmask,
                        max_dist, budget: TileQueryBudget, chunk: int = 8):
    """Slot-layout core of :func:`query_all_voxel_cov` (see
    :func:`nearest_point_slots` for why). Returns
    (cov [S,QB,7,3,3], mean [S,QB,7,3], ok [S,QB,7])."""
    if budget.pallas:
        return _all_voxel_cov_slots_pallas(
            tmap, slot_tile, qbuf, qvox, qmask, max_dist
        )
    nbr = _neighbor_tiles(tmap, slot_tile)
    mtv = tmap.tile_vox_mean.shape[1]
    off7 = jnp.asarray(OFFSETS_7)

    def per_slot(args):
        q, qv, qm, nb = args
        means = tmap.tile_vox_mean[nb].reshape(9 * mtv, 3)
        cvox = tmap.tile_vox_coord[nb].reshape(9 * mtv, 3)
        covs = tmap.tile_vox_cov[nb].reshape(9 * mtv, 3, 3)
        occupied = cvox[:, 0] != _COORD_SENTINEL
        want = qv[:, None, :] + off7[None, :, :]          # [QB,7,3]
        # exact-coordinate match over the candidate set; a coordinate occurs
        # at most once, so eq doubles as a one-hot selector
        eq = jnp.all(
            cvox[None, None, :, :] == want[:, :, None, :], axis=-1
        ) & occupied[None, None, :]                        # [QB,7,9*MTV]
        found = jnp.any(eq, axis=-1)
        sel = eq.astype(q.dtype)
        means_safe = jnp.where(occupied[:, None], means, 0.0)
        m_safe = jnp.einsum("qon,nk->qok", sel, means_safe, precision=_HI)
        d2 = jnp.sum((m_safe - q[:, None, :]) ** 2, axis=-1)
        ok = qm[:, None] & found & (d2 < max_dist * max_dist)
        c = jnp.einsum(
            "qon,nk->qok", sel, covs.reshape(9 * mtv, 9), precision=_HI
        ).reshape(-1, 7, 3, 3)
        eye = jnp.broadcast_to(jnp.eye(3, dtype=c.dtype), c.shape)
        return (
            jnp.where(ok[..., None, None], c, eye),
            jnp.where(ok[..., None], m_safe, q[:, None, :]),
            ok,
        )

    return _chunked(per_slot, (qbuf, qvox, qmask, nbr), chunk)


def query_all_voxel_cov(tmap: TileMap, queries, valid, max_dist,
                        budget: TileQueryBudget, chunk: int = 8):
    """AVGICP: the 7 face-adjacent voxels' covariances where they exist and
    their means pass the distance gate (GetCorrespondencesAllCov semantics).
    Returns (cov [N,7,3,3], mean [N,7,3], valid [N,7])."""
    n = queries.shape[0]
    asg = assign_slots(tmap, queries, valid, budget)
    res = all_voxel_cov_slots(
        tmap, asg.slot_tile, asg.qbuf, asg.qvox, asg.qmask, max_dist, budget,
        chunk=chunk,
    )
    cov, mean, ok = _scatter_back(
        n,
        asg.qidx,
        (jnp.eye(3, dtype=queries.dtype), res[0]),
        (jnp.zeros(3, dtype=queries.dtype), res[1]),
        (jnp.zeros(7, dtype=bool), res[2]),
    )
    mean = jnp.where(ok[..., None], mean, queries[:, None, :])
    return cov, mean, ok


# --------------------------------------------------------------------------- #
# Pallas-fused variants
# --------------------------------------------------------------------------- #

def _nearest_point_slots_pallas(tmap: TileMap, slot_tile, qbuf, qvox, qmask,
                                max_dist, *, with_point_cov: bool = False):
    from ..pallas.corr_kernels import nearest_point_pallas

    if tmap.tile_points_t is None:
        raise ValueError("map built without for_pallas=True")
    tgt, d2, idx = nearest_point_pallas(
        tmap, qbuf.astype(jnp.float32), qvox, slot_tile
    )
    tgt = tgt.astype(qbuf.dtype)
    ok = qmask & (d2 < max_dist * max_dist)
    target = jnp.where(ok[..., None], tgt, qbuf)
    if not with_point_cov:
        return target, ok
    # Per-query payload gather from the untransposed arrays ([S,QB] rows).
    mtp_p = tmap.tile_points_t.shape[2]
    nbr = _neighbor_tiles(tmap, slot_tile)
    nbr_k = idx // mtp_p                                   # [S,QB] neighbor 0..8
    slot_in_tile = idx % mtp_p
    tile_row = jnp.take_along_axis(nbr, nbr_k, axis=1)     # [S,QB]
    tile_safe = jnp.where(ok, tile_row, tmap.sentinel)
    slot_safe = jnp.where(
        ok, jnp.minimum(slot_in_tile, tmap.tile_point_cov.shape[1] - 1), 0
    )
    cov = tmap.tile_point_cov[tile_safe, slot_safe].astype(qbuf.dtype)
    mean = tmap.tile_point_cov_mean[tile_safe, slot_safe].astype(qbuf.dtype)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=cov.dtype), cov.shape)
    cov = jnp.where(ok[..., None, None], cov, eye)
    mean = jnp.where(ok[..., None] & jnp.isfinite(mean), mean, qbuf)
    return target, ok, cov, mean


def _nearest_voxel_cov_slots_pallas(tmap: TileMap, slot_tile, qbuf, qvox,
                                    qmask, max_dist):
    from ..pallas.corr_kernels import nearest_voxel_cov_pallas

    if tmap.tile_vox_mean_t is None:
        raise ValueError("map built without for_pallas=True")
    mean, cov9, d2 = nearest_voxel_cov_pallas(
        tmap, qbuf.astype(jnp.float32), qvox, slot_tile
    )
    ok = qmask & (d2 < max_dist * max_dist)
    cov = cov9.astype(qbuf.dtype).reshape(qbuf.shape[:2] + (3, 3))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=cov.dtype), cov.shape)
    cov = jnp.where(ok[..., None, None], cov, eye)
    mean = jnp.where(ok[..., None], mean.astype(qbuf.dtype), qbuf)
    return cov, mean, ok


def _all_voxel_cov_slots_pallas(tmap: TileMap, slot_tile, qbuf, qvox,
                                qmask, max_dist):
    from ..pallas.corr_kernels import all_voxel_cov_pallas

    if tmap.tile_vox_mean_t is None:
        raise ValueError("map built without for_pallas=True")
    mean, cov9, found = all_voxel_cov_pallas(
        tmap, qbuf.astype(jnp.float32), qvox, slot_tile
    )
    mean = mean.astype(qbuf.dtype)
    d2 = jnp.sum((mean - qbuf[:, :, None, :]) ** 2, axis=-1)
    ok = qmask[:, :, None] & (found > 0.5) & (d2 < max_dist * max_dist)
    cov = cov9.astype(qbuf.dtype).reshape(qbuf.shape[:2] + (7, 3, 3))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=cov.dtype), cov.shape)
    cov = jnp.where(ok[..., None, None], cov, eye)
    mean = jnp.where(ok[..., None], mean, qbuf[:, :, None, :])
    return cov, mean, ok
