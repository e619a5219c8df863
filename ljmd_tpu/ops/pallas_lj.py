"""Tiled Pallas TPU kernel for the dense LJ force/energy/virial sweep.

This is the TPU-native replacement for the reference's O(N^2) i<j pair loop
(``scripts/physics/lj_potential_energy.f90:109-183``). Design (SURVEY §7
"Hard parts"): the triangular loop with Newton's-3rd-law scatter does not
vectorize, so the kernel sweeps the FULL N x N pair matrix in (TI, TJ) tiles
that stream through VMEM — the MD analogue of blockwise attention over the
pair matrix — and reduces each i-tile over all j-tiles.

Layout: positions enter as an (8, N) row matrix (rows 0..2 = x, y, z; rows
3..7 zero padding to the f32 sublane minimum), so per-component pair tiles
(TI, TJ) have the lane dimension along j — ideal VPU shapes. The kernel
output is an (8, N) row matrix: rows 0..2 = fx, fy, fz (prefactor 24 NOT yet
applied), row 3 = per-particle energy partial e_i = sum_j (r^-12 - r^-6),
row 4 = per-particle d_epot partial, row 5 = per-particle dd_epot partial.
Scalar totals are O(N) reductions outside the kernel (done in f64 on the
host side of the jit for accumulation accuracy), where the 4/24 prefactors,
the 1/2 double-count factor, and tail corrections are restored —
mirroring the reference's restore-prefactors-after-the-loop strategy
(lj_potential_energy.f90:188-223).

Grid: (N/TI, N/TJ) with j innermost; the output block index depends only on
i, so Mosaic keeps the i-tile accumulator resident in VMEM across the whole
j sweep (initialized at j == 0). Masking handles self-pairs and the padding
to tile multiples via global indices, not sentinel coordinates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ljmd_tpu.config import SimConfig
from ljmd_tpu.ops.lj import LJResult, tail_corrections
from ljmd_tpu.ops.pallas_common import lj_pair_terms

__all__ = ["lj_force_energy_pallas", "make_pallas_force_fn"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _lj_tile_kernel(
    pos_i_ref,  # (8, TI) VMEM: rows 0..2 = x,y,z of the i tile
    pos_j_ref,  # (8, TJ) VMEM: rows 0..2 = x,y,z of the j tile
    out_ref,    # (8, TI) VMEM accumulator: fx,fy,fz,e_i,du_i,ddu_i,_,_
    *,
    box_length: float,
    inv_box_length: float,
    rc_square: float,
    n: int,
    tile_i: int,
    tile_j: int,
    approx_reciprocal: bool = False,
    want_observables: bool = True,
):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    # Per-component pair displacement tiles (TI, TJ), minimum image.
    xi = pos_i_ref[0, :].reshape(tile_i, 1)
    yi = pos_i_ref[1, :].reshape(tile_i, 1)
    zi = pos_i_ref[2, :].reshape(tile_i, 1)
    xj = pos_j_ref[0, :].reshape(1, tile_j)
    yj = pos_j_ref[1, :].reshape(1, tile_j)
    zj = pos_j_ref[2, :].reshape(1, tile_j)

    L = box_length
    inv_l = inv_box_length
    dx = xi - xj
    dy = yi - yj
    dz = zi - zj
    dx = dx - L * jnp.round(dx * inv_l)
    dy = dy - L * jnp.round(dy * inv_l)
    dz = dz - L * jnp.round(dz * inv_l)
    r2 = dx * dx + dy * dy + dz * dz

    # Global indices for self-pair and padding masks.
    gi = i * tile_i + jax.lax.broadcasted_iota(jnp.int32, (tile_i, tile_j), 0)
    gj = j * tile_j + jax.lax.broadcasted_iota(jnp.int32, (tile_i, tile_j), 1)
    mask = (r2 < rc_square) & (gi != gj) & (gj < n) & (gi < n)

    coef, du, e, ddu = lj_pair_terms(r2, mask, approx_reciprocal, want_observables)

    out_ref[0, :] += jnp.sum(coef * dx, axis=1)
    out_ref[1, :] += jnp.sum(coef * dy, axis=1)
    out_ref[2, :] += jnp.sum(coef * dz, axis=1)
    if want_observables:
        out_ref[3, :] += jnp.sum(e, axis=1)
        out_ref[4, :] += jnp.sum(du, axis=1)
        out_ref[5, :] += jnp.sum(ddu, axis=1)


def pallas_pair_sweep(
    pos: jax.Array,
    n: int,
    box_length: float,
    rc_square: float,
    tile_i: int = 128,
    tile_j: int = 1024,
    interpret: bool = False,
    approx_reciprocal: bool = False,
    want_observables: bool = True,
) -> jax.Array:
    """Raw tiled sweep on an (8, n_pad) row matrix (rows 0..2 = x,y,z).

    Returns (8, n_pad): rows 0..2 = fx,fy,fz WITHOUT the 24 prefactor,
    row 3 = per-particle e_i, row 4 = du_i, row 5 = ddu_i (see module doc).
    Rows/columns for padded particle slots (index >= n) are exactly zero.
    This is the layout-native entry used by the production engine so the
    scan carry never changes layout; ``lj_force_energy_pallas`` wraps it for
    the (N, 3) functional API.
    """
    n_pad = pos.shape[1]
    if n_pad % tile_i or n_pad % tile_j:
        raise ValueError(
            f"n_pad={n_pad} must be divisible by tile_i={tile_i} and "
            f"tile_j={tile_j} (a floor-divided grid would silently drop "
            "trailing columns)"
        )
    grid = (n_pad // tile_i, n_pad // tile_j)
    kernel = functools.partial(
        _lj_tile_kernel,
        box_length=float(box_length),
        inv_box_length=1.0 / float(box_length),
        rc_square=float(rc_square),
        n=n,
        tile_i=tile_i,
        tile_j=tile_j,
        approx_reciprocal=approx_reciprocal and not interpret,
        want_observables=want_observables,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, tile_i), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile_j), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tile_i), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n_pad), pos.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(40 * n_pad * n_pad),
            bytes_accessed=int(4 * 8 * n_pad * (grid[0] + grid[1] + 1)),
            transcendentals=0,
        ),
    )(pos, pos)


def _lj_tri_kernel(
    pos_i_ref,  # (8, TI)
    pos_j_ref,  # (8, TJ)
    out1_ref,   # (8, TI): i-side accumulator (forces + e/du/ddu rows)
    out2_ref,   # (8, n_pad): whole-array j-side reaction accumulator
    *,
    box_length: float,
    inv_box_length: float,
    rc_square: float,
    n: int,
    tile_i: int,
    tile_j: int,
    want_observables: bool = True,
    approx_reciprocal: bool = False,
):
    """Triangular variant: each unordered pair is evaluated ONCE (mask
    gj > gi); reaction forces accumulate into a VMEM-RESIDENT whole-array
    j-side buffer (constant index map — one (8, n_pad) block alive across
    the whole grid, written to HBM once at the end) at lane offset
    j*tile_j (program-id-affine 128-multiple, legal for Mosaic). This
    replaced the round-4 (grid_i, 8, n_pad) per-i-tile HBM buffer + XLA
    reduction (exp_r5_tri_tj): grid_i x fewer reaction bytes to HBM and no
    reduce pass. Tiles wholly below the diagonal are skipped."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out1_ref[:, :] = jnp.zeros_like(out1_ref)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init2():
        out2_ref[:, :] = jnp.zeros_like(out2_ref)

    # Tile contains some pair with gj > gi iff its max gj > its min gi.
    compute = (j + 1) * tile_j - 1 > i * tile_i

    @pl.when(compute)
    def _tile():
        xi = pos_i_ref[0, :].reshape(tile_i, 1)
        yi = pos_i_ref[1, :].reshape(tile_i, 1)
        zi = pos_i_ref[2, :].reshape(tile_i, 1)
        xj = pos_j_ref[0, :].reshape(1, tile_j)
        yj = pos_j_ref[1, :].reshape(1, tile_j)
        zj = pos_j_ref[2, :].reshape(1, tile_j)

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
        gj = j * tile_j + jax.lax.broadcasted_iota(jnp.int32, (tile_i, tile_j), 1)
        mask = (r2 < rc_square) & (gj > gi) & (gj < n)

        coef, du, e, ddu = lj_pair_terms(r2, mask, approx_reciprocal, want_observables)

        fx = coef * dx
        fy = coef * dy
        fz = coef * dz
        out1_ref[0, :] += jnp.sum(fx, axis=1)
        out1_ref[1, :] += jnp.sum(fy, axis=1)
        out1_ref[2, :] += jnp.sum(fz, axis=1)
        if want_observables:
            out1_ref[3, :] += jnp.sum(e, axis=1)
            out1_ref[4, :] += jnp.sum(du, axis=1)
            out1_ref[5, :] += jnp.sum(ddu, axis=1)
        # Reaction on b: -sum_a f_ab (column sums), accumulated in place in
        # the resident buffer (rows 3..7 stay zero from _init2).
        js = pl.ds(j * tile_j, tile_j)
        out2_ref[0, js] += -jnp.sum(fx, axis=0)
        out2_ref[1, js] += -jnp.sum(fy, axis=0)
        out2_ref[2, js] += -jnp.sum(fz, axis=0)


def pallas_pair_sweep_tri(
    pos: jax.Array,
    n: int,
    box_length: float,
    rc_square: float,
    tile_i: int = 128,
    tile_j: int = 1024,
    interpret: bool = False,
    want_observables: bool = True,
    approx_reciprocal: bool = False,
) -> jax.Array:
    """Triangular counterpart of ``pallas_pair_sweep``. NOTE: scalar rows
    3..5 hold per-pair-ONCE partials, so totals restore with prefactors
    4 / 24 (no halving)."""
    n_pad = pos.shape[1]
    if n_pad % tile_i or n_pad % tile_j:
        raise ValueError(
            f"n_pad={n_pad} must be divisible by tile_i={tile_i} and "
            f"tile_j={tile_j} (a floor-divided grid would silently drop "
            "trailing columns)"
        )
    grid = (n_pad // tile_i, n_pad // tile_j)
    kernel = functools.partial(
        _lj_tri_kernel,
        box_length=float(box_length),
        inv_box_length=1.0 / float(box_length),
        rc_square=float(rc_square),
        n=n,
        tile_i=tile_i,
        tile_j=tile_j,
        want_observables=want_observables,
        approx_reciprocal=approx_reciprocal and not interpret,
    )
    out1, out2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, tile_i), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile_j), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, tile_i), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            # Whole-array resident reaction accumulator: constant index map
            # keeps ONE (8, n_pad) block in VMEM for the entire grid (128 KB
            # at n_pad=4096) — no per-i-tile HBM buffer, no XLA reduce.
            pl.BlockSpec((8, n_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, n_pad), pos.dtype),
            jax.ShapeDtypeStruct((8, n_pad), pos.dtype),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(24 * n_pad * n_pad),
            bytes_accessed=int(4 * 8 * n_pad * (grid[0] + grid[1] + 2)),
            transcendentals=0,
        ),
    )(pos, pos)
    return out1 + out2


def _lj_rect_kernel(
    gi0_ref,    # scalar-prefetch: (1,) int32 global index offset of the i rows
    gj0_ref,    # scalar-prefetch: (1,) int32 global index offset of the j rows
    pos_i_ref,  # (8, TI) VMEM
    pos_j_ref,  # (8, TJ) VMEM
    out_ref,    # (8, TI) VMEM accumulator
    *,
    box_length: float,
    inv_box_length: float,
    rc_square: float,
    n_i: int,
    n_j: int,
    tile_i: int,
    tile_j: int,
    approx_reciprocal: bool = False,
    want_observables: bool = True,
):
    """Rectangular variant of the tile kernel for DISTINCT i/j position sets
    (the sharded multi-chip path: local i rows against a ring-passed j
    block). Self-pairs are excluded by GLOBAL index (gi0 + row == gj0 + col),
    with the offsets passed as scalar prefetch because they depend on
    ``lax.axis_index`` inside shard_map (traced, not static)."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    xi = pos_i_ref[0, :].reshape(tile_i, 1)
    yi = pos_i_ref[1, :].reshape(tile_i, 1)
    zi = pos_i_ref[2, :].reshape(tile_i, 1)
    xj = pos_j_ref[0, :].reshape(1, tile_j)
    yj = pos_j_ref[1, :].reshape(1, tile_j)
    zj = pos_j_ref[2, :].reshape(1, tile_j)

    L = box_length
    inv_l = inv_box_length
    dx = xi - xj
    dy = yi - yj
    dz = zi - zj
    dx = dx - L * jnp.round(dx * inv_l)
    dy = dy - L * jnp.round(dy * inv_l)
    dz = dz - L * jnp.round(dz * inv_l)
    r2 = dx * dx + dy * dy + dz * dz

    li = i * tile_i + jax.lax.broadcasted_iota(jnp.int32, (tile_i, tile_j), 0)
    lj_ = j * tile_j + jax.lax.broadcasted_iota(jnp.int32, (tile_i, tile_j), 1)
    gi = gi0_ref[0] + li
    gj = gj0_ref[0] + lj_
    mask = (r2 < rc_square) & (gi != gj) & (lj_ < n_j) & (li < n_i)

    coef, du, e, ddu = lj_pair_terms(r2, mask, approx_reciprocal, want_observables)

    out_ref[0, :] += jnp.sum(coef * dx, axis=1)
    out_ref[1, :] += jnp.sum(coef * dy, axis=1)
    out_ref[2, :] += jnp.sum(coef * dz, axis=1)
    if want_observables:
        out_ref[3, :] += jnp.sum(e, axis=1)
        out_ref[4, :] += jnp.sum(du, axis=1)
        out_ref[5, :] += jnp.sum(ddu, axis=1)


def pallas_pair_sweep_rect(
    pos_i: jax.Array,
    pos_j: jax.Array,
    n_i: int,
    n_j: int,
    gi0: jax.Array,
    gj0: jax.Array,
    box_length: float,
    rc_square: float,
    tile_i: int = 128,
    tile_j: int = 1024,
    interpret: bool = False,
    approx_reciprocal: bool = False,
    want_observables: bool = True,
) -> jax.Array:
    """Tiled sweep of i rows (8, ni_pad) against a DIFFERENT j block
    (8, nj_pad). Output layout matches ``pallas_pair_sweep`` (ordered-pair
    counting: scalar rows restore with prefactors 2/12 after the cross-shard
    reduction). ``gi0``/``gj0`` are traced int32 global offsets."""
    ni_pad = pos_i.shape[1]
    nj_pad = pos_j.shape[1]
    tile_i = min(tile_i, ni_pad)
    tile_j = min(tile_j, nj_pad)
    if ni_pad % tile_i or nj_pad % tile_j:
        raise ValueError(
            f"pads ({ni_pad}, {nj_pad}) must be divisible by tiles "
            f"({tile_i}, {tile_j}) — a floor-divided grid would silently "
            "drop trailing columns"
        )
    grid = (ni_pad // tile_i, nj_pad // tile_j)
    kernel = functools.partial(
        _lj_rect_kernel,
        box_length=float(box_length),
        inv_box_length=1.0 / float(box_length),
        rc_square=float(rc_square),
        n_i=n_i,
        n_j=n_j,
        tile_i=tile_i,
        tile_j=tile_j,
        approx_reciprocal=approx_reciprocal and not interpret,
        want_observables=want_observables,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, tile_i), lambda i, j, gi0, gj0: (0, i)),
            pl.BlockSpec((8, tile_j), lambda i, j, gi0, gj0: (0, j)),
        ],
        out_specs=pl.BlockSpec((8, tile_i), lambda i, j, gi0, gj0: (0, i)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, ni_pad), pos_i.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(40 * ni_pad * nj_pad),
            bytes_accessed=int(4 * 8 * (ni_pad * (grid[1] + 1) + nj_pad * grid[0])),
            transcendentals=0,
        ),
    )(
        jnp.asarray(gi0, jnp.int32).reshape(1),
        jnp.asarray(gj0, jnp.int32).reshape(1),
        pos_i,
        pos_j,
    )


def _lj_rect_newton_kernel(
    gi0_ref,    # scalar-prefetch: (1,) int32 global index offset of the i rows
    gj0_ref,    # scalar-prefetch: (1,) int32 global index offset of the j rows
    ilo_ref,    # scalar-prefetch: (1,) int32 first ACTIVE local i row
    jhi_ref,    # scalar-prefetch: (1,) int32 end of the ACTIVE local j cols
    pos_i_ref,  # (8, TI) VMEM
    pos_j_ref,  # (8, TJ) VMEM
    out_i_ref,  # (8, TI) VMEM accumulator (forces + e/du/ddu rows)
    out_j_ref,  # (8, nj_pad): whole-array resident j-side reaction accumulator
    *,
    box_length: float,
    inv_box_length: float,
    rc_square: float,
    n_i: int,
    n_j: int,
    tile_i: int,
    tile_j: int,
    approx_reciprocal: bool = False,
    want_observables: bool = True,
):
    """Pair-ONCE rectangular sweep with Newton's-3rd-law j reactions: each
    (i, j) pair in the active range [i_lo, n_i) x [0, j_hi) is evaluated once;
    i-side partials accumulate like the rect kernel, j-side reaction forces
    accumulate into a VMEM-resident whole-array buffer (the tri kernel's
    constant-index-map scheme — one HBM write at grid end, no XLA reduce).

    The (i_lo, j_hi) range bounds implement the half-ring force decomposition's
    GATED shared hop (even d, ring distance d/2): the two devices holding a
    block pair each sweep a complementary half keyed on the low block's
    particle index, so every cross-pair is computed exactly once while each
    device does half the block work. Tiles wholly outside the range are
    skipped (ranges are traced per-device values -> scalar prefetch, not
    static). Full hops pass (0, n_j)."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_i_ref[:, :] = jnp.zeros_like(out_i_ref)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init2():
        out_j_ref[:, :] = jnp.zeros_like(out_j_ref)

    i_lo = ilo_ref[0]
    j_hi = jhi_ref[0]
    compute = jnp.logical_and((i + 1) * tile_i - 1 >= i_lo, j * tile_j < j_hi)

    @pl.when(compute)
    def _tile():
        xi = pos_i_ref[0, :].reshape(tile_i, 1)
        yi = pos_i_ref[1, :].reshape(tile_i, 1)
        zi = pos_i_ref[2, :].reshape(tile_i, 1)
        xj = pos_j_ref[0, :].reshape(1, tile_j)
        yj = pos_j_ref[1, :].reshape(1, tile_j)
        zj = pos_j_ref[2, :].reshape(1, tile_j)

        L = box_length
        inv_l = inv_box_length
        dx = xi - xj
        dy = yi - yj
        dz = zi - zj
        dx = dx - L * jnp.round(dx * inv_l)
        dy = dy - L * jnp.round(dy * inv_l)
        dz = dz - L * jnp.round(dz * inv_l)
        r2 = dx * dx + dy * dy + dz * dz

        li = i * tile_i + jax.lax.broadcasted_iota(jnp.int32, (tile_i, tile_j), 0)
        lj_ = j * tile_j + jax.lax.broadcasted_iota(jnp.int32, (tile_i, tile_j), 1)
        gi = gi0_ref[0] + li
        gj = gj0_ref[0] + lj_
        mask = (
            (r2 < rc_square)
            & (gi != gj)
            & (li < n_i)
            & (lj_ < n_j)
            & (li >= i_lo)
            & (lj_ < j_hi)
        )

        coef, du, e, ddu = lj_pair_terms(r2, mask, approx_reciprocal, want_observables)

        fx = coef * dx
        fy = coef * dy
        fz = coef * dz
        out_i_ref[0, :] += jnp.sum(fx, axis=1)
        out_i_ref[1, :] += jnp.sum(fy, axis=1)
        out_i_ref[2, :] += jnp.sum(fz, axis=1)
        if want_observables:
            out_i_ref[3, :] += jnp.sum(e, axis=1)
            out_i_ref[4, :] += jnp.sum(du, axis=1)
            out_i_ref[5, :] += jnp.sum(ddu, axis=1)
        # Reaction on j: -sum_i f_ij (column sums), accumulated in place
        # (rows 3..7 stay zero from _init2).
        js = pl.ds(j * tile_j, tile_j)
        out_j_ref[0, js] += -jnp.sum(fx, axis=0)
        out_j_ref[1, js] += -jnp.sum(fy, axis=0)
        out_j_ref[2, js] += -jnp.sum(fz, axis=0)


def pallas_pair_sweep_rect_newton(
    pos_i: jax.Array,
    pos_j: jax.Array,
    n_i: int,
    n_j: int,
    gi0: jax.Array,
    gj0: jax.Array,
    box_length: float,
    rc_square: float,
    i_lo: jax.Array | int = 0,
    j_hi: jax.Array | int | None = None,
    tile_i: int = 128,
    tile_j: int = 1024,
    interpret: bool = False,
    approx_reciprocal: bool = False,
    want_observables: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Pair-once Newton rect sweep: i rows (8, ni_pad) against a DIFFERENT j
    block (8, nj_pad), active range [i_lo, n_i) x [0, j_hi) (traced bounds).

    Returns (acc_i (8, ni_pad), acc_j (8, nj_pad)): acc_i rows 0..2 = i-side
    forces WITHOUT the 24 prefactor, rows 3..5 = pair-ONCE e/du/ddu partials
    (totals restore with prefactors 4/24, NO halving); acc_j rows 0..2 =
    j-side reaction forces (rows 3..7 zero)."""
    ni_pad = pos_i.shape[1]
    nj_pad = pos_j.shape[1]
    tile_i = min(tile_i, ni_pad)
    tile_j = min(tile_j, nj_pad)
    if ni_pad % tile_i or nj_pad % tile_j:
        raise ValueError(
            f"pads ({ni_pad}, {nj_pad}) must be divisible by tiles "
            f"({tile_i}, {tile_j})"
        )
    if j_hi is None:
        j_hi = n_j
    grid = (ni_pad // tile_i, nj_pad // tile_j)
    kernel = functools.partial(
        _lj_rect_newton_kernel,
        box_length=float(box_length),
        inv_box_length=1.0 / float(box_length),
        rc_square=float(rc_square),
        n_i=n_i,
        n_j=n_j,
        tile_i=tile_i,
        tile_j=tile_j,
        approx_reciprocal=approx_reciprocal and not interpret,
        want_observables=want_observables,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, tile_i), lambda i, j, *_: (0, i)),
            pl.BlockSpec((8, tile_j), lambda i, j, *_: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((8, tile_i), lambda i, j, *_: (0, i)),
            # Whole-array resident reaction accumulator (see _lj_tri_kernel).
            pl.BlockSpec((8, nj_pad), lambda i, j, *_: (0, 0)),
        ],
    )
    out_i, out_j = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((8, ni_pad), pos_i.dtype),
            jax.ShapeDtypeStruct((8, nj_pad), pos_i.dtype),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(24 * ni_pad * nj_pad),
            bytes_accessed=int(
                4 * 8 * (ni_pad * (grid[1] + 1) + nj_pad * (grid[0] + 1))
            ),
            transcendentals=0,
        ),
    )(
        jnp.asarray(gi0, jnp.int32).reshape(1),
        jnp.asarray(gj0, jnp.int32).reshape(1),
        jnp.asarray(i_lo, jnp.int32).reshape(1),
        jnp.asarray(j_hi, jnp.int32).reshape(1),
        pos_i,
        pos_j,
    )
    return out_i, out_j


@functools.partial(
    jax.jit,
    static_argnames=(
        "box_length",
        "rc_square",
        "use_tail_corrections",
        "volume",
        "rc",
        "tile_i",
        "tile_j",
        "interpret",
        "sum_dtype",
    ),
)
def lj_force_energy_pallas(
    r: jax.Array,
    box_length: float,
    rc_square: float,
    use_tail_corrections: bool = True,
    volume: float | None = None,
    rc: float | None = None,
    tile_i: int = 128,
    tile_j: int = 1024,
    interpret: bool = False,
    sum_dtype=jnp.float64,
) -> LJResult:
    """Drop-in replacement for ``lj_force_energy_dense`` backed by the tiled
    Pallas kernel. ``r`` is (N, 3); any float dtype (computed in its dtype,
    scalar totals reduced in ``sum_dtype`` when x64 is enabled)."""
    n = r.shape[0]
    dtype = r.dtype

    n_pad = _round_up(n, max(tile_i, tile_j))
    # (8, n_pad) row matrix; padded slots are masked by index in-kernel.
    pos = jnp.zeros((8, n_pad), dtype=dtype)
    pos = pos.at[0:3, :n].set(r.T)

    out = pallas_pair_sweep(
        pos, n, box_length, rc_square, tile_i=tile_i, tile_j=tile_j, interpret=interpret
    )

    out = out[:, :n]
    a = 24.0 * out[0:3, :].T.astype(dtype)

    # Scalar totals: accumulate in sum_dtype (f64 when enabled) — the f32
    # per-particle partials lose little, but the O(N) total benefits.
    acc = out[3:6, :].astype(sum_dtype if jax.config.jax_enable_x64 else dtype)
    epot = 2.0 * jnp.sum(acc[0])    # 4 * (1/2): full-matrix double counts
    d_epot = 12.0 * jnp.sum(acc[1])
    dd_epot = 12.0 * jnp.sum(acc[2])

    if use_tail_corrections:
        if volume is None or rc is None:
            raise ValueError("tail corrections require volume and rc")
        e_t, d_t, dd_t = tail_corrections(n, volume, rc)
        epot = epot + e_t
        d_epot = d_epot + d_t
        dd_epot = dd_epot + dd_t

    return LJResult(
        a=a,
        epot=epot.astype(dtype),
        d_epot=d_epot.astype(dtype),
        dd_epot=dd_epot.astype(dtype),
    )


def make_pallas_force_fn(cfg: SimConfig, interpret: bool | None = None):
    """Force function bound to a config. ``interpret`` defaults to True off
    TPU so the same tests exercise the kernel everywhere (SURVEY §5.2:
    interpreter-mode tests vs the dense implementation)."""
    if interpret is None:
        try:
            interpret = jax.devices()[0].platform != "tpu"
        except Exception:  # pragma: no cover
            interpret = True

    # Tile sizes: best measured on v5e (TI=128, TJ=1024). Both are lane
    # dims of their block specs -> must stay multiples of 128 on hardware.
    tile_i = 128
    tile_j = 1024 if cfg.n >= 1024 else 128

    def force(r: jax.Array) -> LJResult:
        return lj_force_energy_pallas(
            r,
            box_length=cfg.box_length,
            rc_square=cfg.rc_square,
            use_tail_corrections=cfg.use_tail_corrections,
            volume=cfg.volume,
            rc=cfg.rc,
            tile_i=tile_i,
            tile_j=tile_j,
            interpret=interpret,
        )

    return force
