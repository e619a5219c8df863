"""Half-shell pair-once structured pencil kernel (pencil sweep v2).

The round-1 pencil kernel (``ops/pallas_pencil.py``) sweeps each pencil
against all 9 xy-neighbors, evaluating every pair twice (both i sides).
This version evaluates each unordered pair ONCE — the structured analogue of
the reference's i<j loop with Newton's-3rd-law scatter
(``lj_potential_energy.f90:109-183``) — cutting pair math ~2x:

- Each pencil sweeps itself (slot-triangular mask) plus its 4 "upper"
  xy-neighbors (dx,dy) in {(0,1),(1,-1),(1,0),(1,1)}; every unordered
  adjacent pencil pair appears exactly once.
- Reaction forces for neighbor k go to a dedicated output whose block index
  map is the k-shift PERMUTATION of pencil ids (p -> tbl[p,k] is a bijection
  on the torus), so each block is written exactly once per sweep and the
  cross-program reduction is four elementwise adds — no gather/scatter.
- Empty slots carry SENTINEL coordinates (x = SENT_BASE*(1 + pencil) +
  rank, far outside the box) instead of a validity row: sentinel-vs-real
  pairs fail the cutoff automatically, removing the validity mask ops from
  the hot loop. CROSS-pencil sentinel pairs are >= SENT_BASE - capacity - L
  apart (never pass the cutoff, and their r^2 cannot overflow the pair
  math); SAME-pencil sentinel pairs (self sweep only) have unit spacing and
  can pass the cutoff with O(1) coefficients, so the caller multiplies the
  output by the validity row once per sweep. SENT_BASE is small enough that
  base + rank stays exactly representable in f32 (unit spacing survives).

Output convention: PAIR-ONCE partials (prefactors 4 / 24, like the
triangular dense kernel), rows 0..2 forces without the 24, rows 3..5
per-slot e/du/ddu partials (i side only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ljmd_tpu.ops.cell_list import PencilGrid
from ljmd_tpu.ops.pallas_common import lj_pair_terms

__all__ = [
    "SENT_BASE",
    "build_half_shell_tables",
    "pallas_pencil_sweep_hs",
    "pallas_pencil_sweep_mono",
    "pencil_mono_viable",
]

TILE_I = 128
# Sentinel x for the empty slots of pencil p: SENT_BASE * (1 + p) + rank.
# 1e4 keeps base + rank exact in f32 up to ~1600 pencils (values < 2^24)
# while separating pencils by ~1e4 >> L, so cross-pencil sentinel r^2 is
# ~1e8 — far outside any cutoff yet far from f32 overflow in r^-14 terms.
SENT_BASE = 1.0e4

_HALF_SHELL = ((0, 1), (1, -1), (1, 0), (1, 1))


def build_half_shell_tables(grid: PencilGrid) -> tuple[np.ndarray, np.ndarray]:
    """(tbl (n_pencils*4,) int32 neighbor ids, shifts (n_pencils*4*2,) int32
    xy image shifts in units of L) for the 4 upper half-shell offsets."""
    m = grid.m_xy
    tbl = np.empty((m * m, 4), dtype=np.int32)
    shf = np.empty((m * m, 4, 2), dtype=np.int32)
    for ix in range(m):
        for iy in range(m):
            p = ix * m + iy
            for k, (dx, dy) in enumerate(_HALF_SHELL):
                tbl[p, k] = ((ix + dx) % m) * m + (iy + dy) % m
                shf[p, k, 0] = -1 if ix + dx < 0 else (1 if ix + dx >= m else 0)
                shf[p, k, 1] = -1 if iy + dy < 0 else (1 if iy + dy >= m else 0)
    return tbl.reshape(-1), shf.reshape(-1)


def _pencil_hs_kernel(
    tbl_ref,     # scalar-prefetch: (n_pencils*4,) int32
    counts_ref,  # scalar-prefetch: (n_pencils,) int32
    shift_ref,   # scalar-prefetch: (n_pencils*4*2,) int32
    pos_i_ref,   # (8, capacity): this pencil
    *refs,       # 4 neighbor blocks, out1, out2_0..out2_3
    box_length: float,
    inv_box_length: float,
    rc_square: float,
    capacity: int,
    want_observables: bool = True,
    approx_reciprocal: bool = False,
):
    nbr_refs = refs[:4]
    out1 = refs[4]
    out2 = refs[5:9]
    p = pl.program_id(0)

    out1[:, :] = jnp.zeros_like(out1)
    for k in range(4):
        out2[k][:, :] = jnp.zeros_like(out2[k])

    count_i = counts_ref[p]
    L = box_length
    inv_l = inv_box_length
    n_sub = capacity // TILE_I

    # Hoist the static xy image shifts onto the neighbor rows (after this,
    # xi - xjs IS the in-cutoff minimum image in x/y; z keeps its round()).
    shifted = []
    for k in range(4):
        jref = nbr_refs[k]
        off_x = shift_ref[(p * 4 + k) * 2].astype(pos_i_ref.dtype) * L
        off_y = shift_ref[(p * 4 + k) * 2 + 1].astype(pos_i_ref.dtype) * L
        shifted.append(
            (
                jref[0, :].reshape(1, capacity) + off_x,
                jref[1, :].reshape(1, capacity) + off_y,
                jref[2, :].reshape(1, capacity),
            )
        )

    for si in range(n_sub):
        isl = slice(si * TILE_I, (si + 1) * TILE_I)

        @pl.when(si * TILE_I < count_i)
        def _i_slice(si=si, isl=isl):
            xi = pos_i_ref[0, isl].reshape(TILE_I, 1)
            yi = pos_i_ref[1, isl].reshape(TILE_I, 1)
            zi = pos_i_ref[2, isl].reshape(TILE_I, 1)

            def accumulate(dx, dy, dz, r2, mask, out_j, jsl=slice(None)):
                coef, du, e, ddu = lj_pair_terms(
                    r2, mask, approx_reciprocal, want_observables
                )
                fx = coef * dx
                fy = coef * dy
                fz = coef * dz
                out1[0, isl] += jnp.sum(fx, axis=1)
                out1[1, isl] += jnp.sum(fy, axis=1)
                out1[2, isl] += jnp.sum(fz, axis=1)
                if want_observables:
                    out1[3, isl] += jnp.sum(e, axis=1)
                    out1[4, isl] += jnp.sum(du, axis=1)
                    out1[5, isl] += jnp.sum(ddu, axis=1)
                # Newton's 3rd law: reaction onto the j side.
                out_j[0, jsl] -= jnp.sum(fx, axis=0)
                out_j[1, jsl] -= jnp.sum(fy, axis=0)
                out_j[2, jsl] -= jnp.sum(fz, axis=0)

            # Self pencil: slot-triangular, each in-pencil pair once. Ranks
            # below the i-slice are wholly masked, so the j sweep starts at
            # the slice (a static, 128-aligned trim).
            j_lo = si * TILE_I
            jw = capacity - j_lo
            jsl = slice(j_lo, capacity)
            xs = pos_i_ref[0, jsl].reshape(1, jw)
            ys = pos_i_ref[1, jsl].reshape(1, jw)
            zs = pos_i_ref[2, jsl].reshape(1, jw)
            rank_i = si * TILE_I + jax.lax.broadcasted_iota(
                jnp.int32, (TILE_I, jw), 0
            )
            rank_j = j_lo + jax.lax.broadcasted_iota(jnp.int32, (TILE_I, jw), 1)
            dxs = xi - xs
            dys = yi - ys
            dzs = zi - zs
            dzs = dzs - L * jnp.round(dzs * inv_l)
            r2s = dxs * dxs + dys * dys + dzs * dzs
            accumulate(
                dxs, dys, dzs, r2s, (r2s < rc_square) & (rank_j > rank_i),
                out1, jsl=jsl,
            )

            # 4 upper half-shell neighbors: full sweep, pair-once by
            # construction; sentinels make a bare cutoff mask sufficient.
            for k in range(4):
                j_pencil = tbl_ref[p * 4 + k]
                xjs, yjs, zj = shifted[k]

                @pl.when(counts_ref[j_pencil] > 0)
                def _j(k=k, xjs=xjs, yjs=yjs, zj=zj):
                    dx = xi - xjs
                    dy = yi - yjs
                    dz = zi - zj
                    dz = dz - L * jnp.round(dz * inv_l)
                    r2 = dx * dx + dy * dy + dz * dz
                    accumulate(dx, dy, dz, r2, r2 < rc_square, out2[k])


def pallas_pencil_sweep_hs(
    pos_slots: jax.Array,
    tbl: jax.Array,
    counts: jax.Array,
    shifts: jax.Array,
    grid: PencilGrid,
    rc_square: float,
    interpret: bool = False,
    want_observables: bool = True,
    approx_reciprocal: bool = False,
) -> jax.Array:
    """(8, n_slots) -> (8, n_slots) half-shell pair-once sweep.

    ``pos_slots`` must carry sentinel coordinates in empty slots
    (x = SENT_BASE + global slot; see module doc). The caller multiplies the
    result by the validity row (sentinel-sentinel artifacts land only on
    invalid slots) and restores prefactors 4 / 24.
    """
    n_slots = grid.n_slots
    cap = grid.capacity

    kernel = functools.partial(
        _pencil_hs_kernel,
        box_length=float(grid.box_length),
        inv_box_length=1.0 / float(grid.box_length),
        rc_square=float(rc_square),
        capacity=cap,
        want_observables=want_observables,
        approx_reciprocal=approx_reciprocal and not interpret,
    )

    def nbr_spec(k):
        return pl.BlockSpec(
            (8, cap), lambda p, tbl, cnt, shf, k=k: (0, tbl[p * 4 + k])
        )

    def out2_spec(k):
        # p -> tbl[p, k] is a bijection (torus shift), so each block is
        # written by exactly one program.
        return pl.BlockSpec(
            (8, cap), lambda p, tbl, cnt, shf, k=k: (0, tbl[p * 4 + k])
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(grid.n_pencils,),
        in_specs=[pl.BlockSpec((8, cap), lambda p, tbl, cnt, shf: (0, p))]
        + [nbr_spec(k) for k in range(4)],
        out_specs=[pl.BlockSpec((8, cap), lambda p, tbl, cnt, shf: (0, p))]
        + [out2_spec(k) for k in range(4)],
    )
    shape = jax.ShapeDtypeStruct((8, n_slots), pos_slots.dtype)
    out1, o2a, o2b, o2c, o2d = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[shape] * 5,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(33 * n_slots * 5 * cap),
            bytes_accessed=int(4 * 8 * n_slots * 10),
            transcendentals=0,
        ),
    )(tbl, counts, shifts, pos_slots, *([pos_slots] * 4))
    return out1 + o2a + o2b + o2c + o2d


def sentinel_fill(rows_r: jax.Array, valid: jax.Array, capacity: int) -> jax.Array:
    """Write sentinel coordinates into the xyz rows of invalid slots
    (x = SENT_BASE * (1 + pencil) + rank, y = z = 0); aux rows untouched.

    Per-pencil bases keep cross-pencil sentinel pairs ~1e4 apart regardless
    of the box length (the old global-slot scheme could place two sentinels
    from different pencils within the cutoff of each other's xy-shifted
    image whenever L sat near an integer, overflowing r^-14 in f32)."""
    ns = rows_r.shape[1]
    dtype = rows_r.dtype
    slot = jnp.arange(ns)
    pencil = slot // capacity
    rank = slot - pencil * capacity
    slot_x = (SENT_BASE * (1.0 + pencil) + rank).astype(dtype)
    ok = valid > 0.5
    x = jnp.where(ok, rows_r[0], slot_x)
    y = jnp.where(ok, rows_r[1], 0.0)
    z = jnp.where(ok, rows_r[2], 0.0)
    return rows_r.at[0].set(x).at[1].set(y).at[2].set(z)


# ---------------------------------------------------------------------------
# Single-program ("mono") per-step sweep: the grid kernel above pays per-
# program costs (~2.5 us each: block DMAs + region prologues, measured round
# 2 as ~0.5 ms/step over 196 programs at N=62500) plus a 5-buffer reaction
# reduction afterwards. When the whole (8, n_slots) position matrix and one
# output buffer fit VMEM (~<= 196k slots f32), ONE program with the affine
# fori_loop-over-pencils body (the fused chunk kernel's sweep, but per-step
# and with observables) removes both. Same output contract as
# ``pallas_pencil_sweep_hs``: rows 0..2 forces without the 24 prefactor,
# rows 3..5 per-particle e/du/ddu accumulated on the i side (pair once),
# caller multiplies by the validity row and restores prefactors 4/24.
# ---------------------------------------------------------------------------

_MONO_VMEM_BUDGET = 12 * 1024 * 1024


def pencil_mono_viable(n_slots: int, itemsize: int = 4) -> bool:
    """True when positions + output fit the single-program VMEM budget."""
    return 2 * 8 * n_slots * itemsize <= _MONO_VMEM_BUDGET


def _pencil_mono_kernel(
    tbl_ref,     # SMEM (n_pencils*4,) int32
    counts_ref,  # SMEM (n_pencils,) int32
    shf_ref,     # SMEM (n_pencils*4*2,) int32
    pos_ref,     # VMEM (8, n_slots)
    out_ref,     # VMEM (8, n_slots)
    *,
    n_pencils: int,
    capacity: int,
    box_length: float,
    inv_box_length: float,
    rc_square: float,
    want_observables: bool,
    approx_reciprocal: bool,
    i_gate: bool,
):
    out_ref[:, :] = jnp.zeros_like(out_ref)
    L = box_length
    inv_l = inv_box_length
    cap = capacity
    n_sub = cap // TILE_I

    def pencil_body(p, c):
        base = p * cap
        shifted = []
        for k in range(4):
            j = tbl_ref[p * 4 + k]
            jb = j * cap
            off_x = shf_ref[(p * 4 + k) * 2].astype(pos_ref.dtype) * L
            off_y = shf_ref[(p * 4 + k) * 2 + 1].astype(pos_ref.dtype) * L
            shifted.append((
                jb,
                pos_ref[0, pl.ds(jb, cap)].reshape(1, cap) + off_x,
                pos_ref[1, pl.ds(jb, cap)].reshape(1, cap) + off_y,
                pos_ref[2, pl.ds(jb, cap)].reshape(1, cap),
            ))
        count_i = counts_ref[p]

        for si in range(n_sub):
            ista = base + si * TILE_I

            def i_slice(si=si, ista=ista):
                xi = pos_ref[0, pl.ds(ista, TILE_I)].reshape(TILE_I, 1)
                yi = pos_ref[1, pl.ds(ista, TILE_I)].reshape(TILE_I, 1)
                zi = pos_ref[2, pl.ds(ista, TILE_I)].reshape(TILE_I, 1)

                def accumulate(dx, dy, dz, r2, mask, jsta, jw, ista=ista):
                    coef, du, e, ddu = lj_pair_terms(
                        r2, mask, approx_reciprocal, want_observables
                    )
                    fx = coef * dx
                    fy = coef * dy
                    fz = coef * dz
                    out_ref[0, pl.ds(ista, TILE_I)] += jnp.sum(fx, axis=1)
                    out_ref[1, pl.ds(ista, TILE_I)] += jnp.sum(fy, axis=1)
                    out_ref[2, pl.ds(ista, TILE_I)] += jnp.sum(fz, axis=1)
                    if want_observables:
                        out_ref[3, pl.ds(ista, TILE_I)] += jnp.sum(e, axis=1)
                        out_ref[4, pl.ds(ista, TILE_I)] += jnp.sum(du, axis=1)
                        out_ref[5, pl.ds(ista, TILE_I)] += jnp.sum(ddu, axis=1)
                    out_ref[0, pl.ds(jsta, jw)] -= jnp.sum(fx, axis=0)
                    out_ref[1, pl.ds(jsta, jw)] -= jnp.sum(fy, axis=0)
                    out_ref[2, pl.ds(jsta, jw)] -= jnp.sum(fz, axis=0)

                # Self pencil: slot-triangular, ranks below the slice are a
                # static 128-aligned trim (same as the grid kernel).
                j_lo = si * TILE_I
                jw = cap - j_lo
                xs = pos_ref[0, pl.ds(base + j_lo, jw)].reshape(1, jw)
                ys = pos_ref[1, pl.ds(base + j_lo, jw)].reshape(1, jw)
                zs = pos_ref[2, pl.ds(base + j_lo, jw)].reshape(1, jw)
                tri = jax.lax.broadcasted_iota(
                    jnp.int32, (TILE_I, jw), 1
                ) > jax.lax.broadcasted_iota(jnp.int32, (TILE_I, jw), 0)
                dxs = xi - xs
                dys = yi - ys
                dzs = zi - zs
                dzs = dzs - L * jnp.round(dzs * inv_l)
                r2s = dxs * dxs + dys * dys + dzs * dzs
                accumulate(dxs, dys, dzs, r2s, (r2s < rc_square) & tri,
                           base + j_lo, jw)

                for jb, xjs, yjs, zjs in shifted:
                    dx = xi - xjs
                    dy = yi - yjs
                    dz = zi - zjs
                    dz = dz - L * jnp.round(dz * inv_l)
                    r2 = dx * dx + dy * dy + dz * dz
                    accumulate(dx, dy, dz, r2, r2 < rc_square, jb, cap)

            if i_gate:
                pl.when(si * TILE_I < count_i)(i_slice)
            else:
                i_slice()
        return c

    jax.lax.fori_loop(0, n_pencils, pencil_body, 0)


def pallas_pencil_sweep_mono(
    pos_slots: jax.Array,
    tbl: jax.Array,
    counts: jax.Array,
    shifts: jax.Array,
    grid: PencilGrid,
    rc_square: float,
    interpret: bool = False,
    want_observables: bool = True,
    approx_reciprocal: bool = False,
    i_gate: bool = True,
    n_pencils_i: int | None = None,
) -> jax.Array:
    """Single-program half-shell sweep; drop-in for
    ``pallas_pencil_sweep_hs`` when ``pencil_mono_viable(grid.n_slots)``.

    ``n_pencils_i`` (default: all) bounds the i-pencil loop while j visits
    may reach any slot of ``pos_slots`` — the x-strip decomposition passes
    a strip's pencils plus one halo row and sweeps i only over the strip
    (``tbl`` then holds STRIP-LOCAL indices; see the engine's strip
    builder). ``pos_slots`` may be longer than ``n_pencils_i * capacity``.
    """
    n_slots = pos_slots.shape[1]
    cap = grid.capacity
    kernel = functools.partial(
        _pencil_mono_kernel,
        n_pencils=n_pencils_i if n_pencils_i is not None else grid.n_pencils,
        capacity=cap,
        box_length=float(grid.box_length),
        inv_box_length=1.0 / float(grid.box_length),
        rc_square=float(rc_square),
        want_observables=want_observables,
        approx_reciprocal=approx_reciprocal and not interpret,
        i_gate=i_gate,
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        in_specs=[smem, smem, smem, vmem],
        out_specs=vmem,
        out_shape=jax.ShapeDtypeStruct((8, n_slots), pos_slots.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(33 * n_slots * 5 * cap),
            bytes_accessed=int(4 * 8 * n_slots * 3),
            transcendentals=0,
        ),
    )(tbl, counts, shifts, pos_slots)
