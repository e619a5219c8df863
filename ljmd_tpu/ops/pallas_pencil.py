"""Structured large-N Pallas kernel: pencil vs 9-neighbor-pencil sweep with
occupancy-based compute skipping.

Companion to ``ops/cell_list.py``. Positions live in pencil-slot layout as an
(8, n_slots) row matrix — rows 0..2 = x, y, z, row 3 = slot validity (1/0),
rows 4..7 auxiliary. Binning packs each pencil's particles into a dense rank
prefix, so a pencil's occupied slots are exactly ranks [0, count).

Grid: (n_i_tiles, 9) — each 128-slot i-tile against the whole slot block of
each of its 9 xy-neighbor pencils (scalar-prefetched index table; the
PrefetchScalarGridSpec pattern). Keeping j-blocks pencil-sized keeps the
program count low (per-program overhead dominated a finer-tiled variant);
padding work is skipped INSIDE the kernel instead: a static Python loop over
the pencil's 128-lane sub-slices, each guarded by ``@pl.when(rank < count)``
with per-pencil counts prefetched (dynamic — recomputed at every rebin).
Fully-empty i-tiles skip all compute. Pair work is therefore
O(N * 9 * ceil(occupancy/128)*128): capacity roundoff costs memory and DMA,
not FLOPs.

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

__all__ = ["pallas_pencil_sweep", "build_tile_table", "TILE_I", "SUB_J"]

TILE_I = 128
SUB_J = 128  # in-kernel j sub-slice width


def build_tile_table(grid: PencilGrid, tile_i: int = TILE_I) -> np.ndarray:
    """Flat (n_i_tiles * 9,) int32 table: j-pencil id for (i_tile, nb)."""
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
    counts_ref,  # scalar-prefetch: (n_pencils,) int32 occupancy
    pos_i_ref,   # (8, TILE_I)
    pos_j_ref,   # (8, capacity) — the whole neighbor pencil
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
    i_pencil = (i * tile_i) // capacity
    i_rank0 = (i * tile_i) % capacity
    count_j = counts_ref[j_pencil]

    @pl.when(i_rank0 < counts_ref[i_pencil])
    def _tile():
        xi = pos_i_ref[0, :].reshape(tile_i, 1)
        yi = pos_i_ref[1, :].reshape(tile_i, 1)
        zi = pos_i_ref[2, :].reshape(tile_i, 1)
        vi = pos_i_ref[3, :].reshape(tile_i, 1)
        gi = i * tile_i + jax.lax.broadcasted_iota(jnp.int32, (tile_i, SUB_J), 0)
        L = box_length
        inv_l = inv_box_length

        for s in range(capacity // SUB_J):
            @pl.when(s * SUB_J < count_j)
            def _sub(s=s):
                sl = slice(s * SUB_J, (s + 1) * SUB_J)
                xj = pos_j_ref[0, sl].reshape(1, SUB_J)
                yj = pos_j_ref[1, sl].reshape(1, SUB_J)
                zj = pos_j_ref[2, sl].reshape(1, SUB_J)
                vj = pos_j_ref[3, sl].reshape(1, SUB_J)

                dx = xi - xj
                dy = yi - yj
                dz = zi - zj
                dx = dx - L * jnp.round(dx * inv_l)
                dy = dy - L * jnp.round(dy * inv_l)
                dz = dz - L * jnp.round(dz * inv_l)
                r2 = dx * dx + dy * dy + dz * dz

                gj = (
                    j_pencil * capacity
                    + s * SUB_J
                    + jax.lax.broadcasted_iota(jnp.int32, (tile_i, SUB_J), 1)
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
        num_scalar_prefetch=2,
        grid=(n_i_tiles, 9),
        in_specs=[
            pl.BlockSpec((8, tile_i), lambda i, t, tbl, cnt: (0, i)),
            pl.BlockSpec((8, cap), lambda i, t, tbl, cnt: (0, tbl[i * 9 + t])),
        ],
        out_specs=pl.BlockSpec((8, tile_i), lambda i, t, tbl, cnt: (0, i)),
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
    )(tile_table, counts, pos_slots, pos_slots)
