"""Structured large-N Pallas kernel: pencil vs 9-neighbor-pencil sweep.

Companion to ``ops/cell_list.py``. Positions live in pencil-slot layout as an
(8, n_slots) row matrix — rows 0..2 = x, y, z, row 3 = slot validity (1/0),
rows 4..7 zero. The grid is (n_i_tiles, 9): i-tiles are 128-slot chunks of a
pencil; the j block for (i, t) is the t-th xy-neighbor pencil of i's pencil,
looked up from a scalar-prefetched int32 table (the PrefetchScalarGridSpec
pattern — index computation for DMA). All hot-loop memory access is dense
block reads; pair count is O(N * 9 * capacity) instead of O(N^2).

Output layout matches ``pallas_pair_sweep``: rows 0..2 accumulate forces
(without the 24 prefactor), rows 3..5 per-slot e/du/ddu partials; invalid
slots produce exact zeros.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ljmd_tpu.ops.cell_list import PencilGrid

__all__ = ["pallas_pencil_sweep", "build_tile_table"]

TILE_I = 128


def build_tile_table(grid: PencilGrid, tile_i: int = TILE_I) -> np.ndarray:
    """Flat (n_i_tiles * 9,) int32 table: j-pencil id for (i_tile, t)."""
    if grid.capacity % tile_i != 0:
        raise ValueError("pencil capacity must be a multiple of tile_i")
    tiles_per_pencil = grid.capacity // tile_i
    nbr = grid.neighbor_table()  # (n_pencils, 9)
    n_i_tiles = grid.n_pencils * tiles_per_pencil
    tbl = np.empty((n_i_tiles, 9), dtype=np.int32)
    for t in range(n_i_tiles):
        tbl[t] = nbr[t // tiles_per_pencil]
    return tbl.reshape(-1)


def _pencil_kernel(
    tbl_ref,     # scalar-prefetch: (n_i_tiles*9,) int32 j-pencil ids
    pos_i_ref,   # (8, TILE_I)
    pos_j_ref,   # (8, capacity) — the t-th neighbor pencil
    out_ref,     # (8, TILE_I) accumulator
    *,
    box_length: float,
    inv_box_length: float,
    rc_square: float,
    tile_i: int,
    capacity: int,
):
    i = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    j_pencil = tbl_ref[i * 9 + t]

    xi = pos_i_ref[0, :].reshape(tile_i, 1)
    yi = pos_i_ref[1, :].reshape(tile_i, 1)
    zi = pos_i_ref[2, :].reshape(tile_i, 1)
    vi = pos_i_ref[3, :].reshape(tile_i, 1)
    xj = pos_j_ref[0, :].reshape(1, capacity)
    yj = pos_j_ref[1, :].reshape(1, capacity)
    zj = pos_j_ref[2, :].reshape(1, capacity)
    vj = pos_j_ref[3, :].reshape(1, capacity)

    L = box_length
    inv_l = inv_box_length
    dx = xi - xj
    dy = yi - yj
    dz = zi - zj
    dx = dx - L * jnp.round(dx * inv_l)
    dy = dy - L * jnp.round(dy * inv_l)
    dz = dz - L * jnp.round(dz * inv_l)
    r2 = dx * dx + dy * dy + dz * dz

    gi = i * tile_i + jax.lax.broadcasted_iota(jnp.int32, (tile_i, capacity), 0)
    gj = j_pencil * capacity + jax.lax.broadcasted_iota(
        jnp.int32, (tile_i, capacity), 1
    )
    mask = (r2 < rc_square) & (gi != gj) & (vi * vj > 0.5)

    one = jnp.asarray(1.0, r2.dtype)
    r2_safe = jnp.where(mask, r2, one)
    inv_r2 = jnp.where(mask, one / r2_safe, 0.0)
    inv_r6 = inv_r2 * inv_r2 * inv_r2
    inv_r12 = inv_r6 * inv_r6

    e = inv_r12 - inv_r6
    du = inv_r6 - 2.0 * inv_r12
    ddu = 26.0 * inv_r12 - 7.0 * inv_r6
    coef = -du * inv_r2

    out_ref[0, :] += jnp.sum(coef * dx, axis=1)
    out_ref[1, :] += jnp.sum(coef * dy, axis=1)
    out_ref[2, :] += jnp.sum(coef * dz, axis=1)
    out_ref[3, :] += jnp.sum(e, axis=1)
    out_ref[4, :] += jnp.sum(du, axis=1)
    out_ref[5, :] += jnp.sum(ddu, axis=1)


def pallas_pencil_sweep(
    pos_slots: jax.Array,
    tile_table: jax.Array,
    grid: PencilGrid,
    rc_square: float,
    tile_i: int = TILE_I,
    interpret: bool = False,
) -> jax.Array:
    """(8, n_slots) -> (8, n_slots) structured pair sweep (see module doc)."""
    n_slots = grid.n_slots
    n_i_tiles = n_slots // tile_i
    cap = grid.capacity

    kernel = functools.partial(
        _pencil_kernel,
        box_length=float(grid.box_length),
        inv_box_length=1.0 / float(grid.box_length),
        rc_square=float(rc_square),
        tile_i=tile_i,
        capacity=cap,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_i_tiles, 9),
        in_specs=[
            pl.BlockSpec((8, tile_i), lambda i, t, tbl: (0, i)),
            pl.BlockSpec((8, cap), lambda i, t, tbl: (0, tbl[i * 9 + t])),
        ],
        out_specs=pl.BlockSpec((8, tile_i), lambda i, t, tbl: (0, i)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, n_slots), pos_slots.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(45 * n_slots * 9 * cap),
            bytes_accessed=int(4 * 8 * n_slots * 10),
            transcendentals=0,
        ),
    )(tile_table, pos_slots, pos_slots)
