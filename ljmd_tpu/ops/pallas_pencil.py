"""Structured large-N Pallas kernel: pencil vs 9-neighbor-pencil sweep with
occupancy-based tile skipping.

Companion to ``ops/cell_list.py``. Positions live in pencil-slot layout as an
(8, n_slots) row matrix — rows 0..2 = x, y, z, row 3 = slot validity (1/0),
rows 4..7 auxiliary. Binning packs each pencil's particles into a dense rank
prefix, so a pencil's occupied slots are exactly ranks [0, count).

Grid: (n_i_tiles, 9 * tiles_per_pencil). The j block for (i, t) is the
(t % tpp)-th 128-slot tile of the (t // tpp)-th xy-neighbor pencil of i's
pencil, looked up from a scalar-prefetched int32 table (the
PrefetchScalarGridSpec pattern). Two whole-tile skips kill padding work:

- the i tile is empty (its start rank >= its pencil's count), or
- the j tile is empty (its start rank >= the j pencil's count).

Per-pencil counts arrive as a second scalar-prefetch operand (dynamic —
recomputed at every rebin). Pair work is O(N * 9 * ceil(occupancy/128)*128)
— the capacity roundoff no longer costs compute, only memory.

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

__all__ = ["pallas_pencil_sweep", "build_tile_table", "TILE_I", "TILE_J"]

TILE_I = 128
TILE_J = 128


def build_tile_table(grid: PencilGrid, tile_i: int = TILE_I) -> np.ndarray:
    """Flat int32 table of j slot-block ids: entry [(i_tile * 9 + nb) * tpp + s]
    = global 128-slot block id of the s-th tile of the nb-th neighbor pencil
    of i_tile's pencil."""
    if grid.capacity % tile_i != 0:
        raise ValueError("pencil capacity must be a multiple of tile_i")
    tpp = grid.capacity // TILE_J  # j tiles per pencil
    tiles_per_pencil_i = grid.capacity // tile_i
    nbr = grid.neighbor_table()  # (n_pencils, 9)
    n_i_tiles = grid.n_pencils * tiles_per_pencil_i
    tbl = np.empty((n_i_tiles, 9, tpp), dtype=np.int32)
    for t in range(n_i_tiles):
        for k in range(9):
            p = nbr[t // tiles_per_pencil_i, k]
            tbl[t, k] = p * tpp + np.arange(tpp)
    return tbl.reshape(-1)


def _pencil_kernel(
    tbl_ref,     # scalar-prefetch: flat j slot-block ids
    counts_ref,  # scalar-prefetch: (n_pencils,) int32 occupancy
    pos_i_ref,   # (8, TILE_I)
    pos_j_ref,   # (8, TILE_J)
    out_ref,     # (8, TILE_I) accumulator
    *,
    box_length: float,
    inv_box_length: float,
    rc_square: float,
    tile_i: int,
    tile_j: int,
    capacity: int,
    n_j_steps: int,
):
    i = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    tpp = capacity // tile_j
    j_blk = tbl_ref[i * n_j_steps + t]
    j_pencil = j_blk // tpp
    j_rank0 = (j_blk % tpp) * tile_j
    i_pencil = (i * tile_i) // capacity
    i_rank0 = (i * tile_i) % capacity

    i_occupied = i_rank0 < counts_ref[i_pencil]
    j_occupied = j_rank0 < counts_ref[j_pencil]

    @pl.when(i_occupied & j_occupied)
    def _compute():
        xi = pos_i_ref[0, :].reshape(tile_i, 1)
        yi = pos_i_ref[1, :].reshape(tile_i, 1)
        zi = pos_i_ref[2, :].reshape(tile_i, 1)
        vi = pos_i_ref[3, :].reshape(tile_i, 1)
        xj = pos_j_ref[0, :].reshape(1, tile_j)
        yj = pos_j_ref[1, :].reshape(1, tile_j)
        zj = pos_j_ref[2, :].reshape(1, tile_j)
        vj = pos_j_ref[3, :].reshape(1, tile_j)

        L = box_length
        inv_l = inv_box_length
        dx = xi - xj
        dy = yi - yj
        dz = zi - zj
        dx = dx - L * jnp.round(dx * inv_l)
        dy = dy - L * jnp.round(dy * inv_l)
        dz = dz - L * jnp.round(dz * inv_l)
        r2 = dx * dx + dy * dy + dz * dz

        gi = i * tile_i + jax.lax.broadcasted_iota(jnp.int32, (tile_i, tile_j), 0)
        gj = j_blk * tile_j + jax.lax.broadcasted_iota(jnp.int32, (tile_i, tile_j), 1)
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
    counts: jax.Array,
    grid: PencilGrid,
    rc_square: float,
    tile_i: int = TILE_I,
    interpret: bool = False,
) -> jax.Array:
    """(8, n_slots) -> (8, n_slots) structured pair sweep (see module doc).

    ``counts``: (n_pencils,) int32 per-pencil occupancy (from the binning).
    """
    n_slots = grid.n_slots
    n_i_tiles = n_slots // tile_i
    tpp = grid.capacity // TILE_J
    n_j_steps = 9 * tpp

    kernel = functools.partial(
        _pencil_kernel,
        box_length=float(grid.box_length),
        inv_box_length=1.0 / float(grid.box_length),
        rc_square=float(rc_square),
        tile_i=tile_i,
        tile_j=TILE_J,
        capacity=grid.capacity,
        n_j_steps=n_j_steps,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_i_tiles, n_j_steps),
        in_specs=[
            pl.BlockSpec((8, tile_i), lambda i, t, tbl, cnt: (0, i)),
            pl.BlockSpec((8, TILE_J), lambda i, t, tbl, cnt: (0, tbl[i * n_j_steps + t])),
        ],
        out_specs=pl.BlockSpec((8, tile_i), lambda i, t, tbl, cnt: (0, i)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, n_slots), pos_slots.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(45 * n_slots * 9 * grid.capacity),
            bytes_accessed=int(4 * 8 * n_slots * 10),
            transcendentals=0,
        ),
    )(tile_table, counts, pos_slots, pos_slots)
