"""Fused multi-step Pallas kernel: the MD time loop INSIDE one TPU program.

Motivation (measured, docs/RESULTS.md + CLAUDE.md): this runtime pays a
~15-20us kernel-launch floor per lax.scan iteration (even for an empty
elementwise body), which caps any per-step backend at ~5e7 particle-steps/s
regardless of kernel quality at small/mid N. The reference's hot loop
(``scripts/physics/lj_potential_energy.f90:109-183`` inside
``scripts/physics/verlet.f90:41-97``) is re-fused here the TPU-native way:
ONE Pallas program holds the whole state (8, n_pad) resident in VMEM and runs
``n_steps`` velocity-Verlet steps in a ``fori_loop`` — zero HBM traffic and
zero launch overhead between steps.

Key design points:

- **Triangular sweep with in-kernel reaction.** The per-step grid kernels
  (``pallas_lj.pallas_pair_sweep_tri``) must reduce the j-side reaction
  forces OUTSIDE the kernel because grid programs run in parallel over
  i-tiles. Here the whole sweep is sequential inside one program, so the
  reaction column-sums accumulate straight into the force scratch — each
  unordered pair is evaluated once (Newton's 3rd law at tile granularity,
  mirroring the reference's scatter at ``lj_potential_energy.f90:153-159``).

- **No per-step wrap.** Minimum-image via ``dx - L*round(dx/L)`` is exact
  for ANY image offset, so positions may drift out of [0, L) during the
  chunk; the caller wraps once per chunk (and carries the unwrap update
  ``ru += r_end - r_start`` exactly, since no wrapping happened inside).
  Chunks are capped (``MAX_CHUNK_STEPS``) so coordinates never drift far
  enough to lose float resolution.

- **Static tile masks.** Sub-diagonal tiles are skipped at trace time;
  the gj>gi triangular mask is emitted only for diagonal-crossing tiles and
  the gi/gj < n padding masks only for tiles touching the padded columns —
  most tiles run with the pure ``r2 < rc^2`` cutoff mask.

Output contract: returns (r, v, a) rows 0..2 advanced ``n_steps``; rows 3..7
and columns >= n stay exactly zero. Forces in ``a`` INCLUDE the 24 prefactor
(they are real accelerations, unlike the raw sweep outputs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ljmd_tpu.ops.pallas_common import lj_pair_terms

__all__ = ["fused_dense_chunk", "MAX_CHUNK_STEPS"]

# Position drift per chunk is bounded by v_max * dt * MAX_CHUNK_STEPS; at
# liquid state points (v_max ~ 4 sigma/tau, dt <= 0.005) 256 steps keep
# coordinates within ~2L of the box, preserving f32 position resolution.
MAX_CHUNK_STEPS = 256


def _fused_dense_kernel(
    r_in, v_in, a_in,      # (8, n_pad) VMEM inputs
    r_out, v_out, a_out,   # (8, n_pad) VMEM outputs (the live state)
    f_acc,                 # (8, n_pad) VMEM scratch: per-step force accumulator
    *,
    n: int,
    n_pad: int,
    tile_i: int,
    tile_j: int,
    box_length: float,
    inv_box_length: float,
    rc_square: float,
    dt: float,
    n_steps: int,
    approx_reciprocal: bool,
):
    r_out[:, :] = r_in[:, :]
    v_out[:, :] = v_in[:, :]
    a_out[:, :] = a_in[:, :]

    n_i = n_pad // tile_i
    n_j = n_pad // tile_j
    L = box_length
    inv_l = inv_box_length
    half_dt = 0.5 * dt
    half_dt_sq = 0.5 * dt * dt

    def step_body(_s, carry):
        # Position update + first half-kick (verlet.f90:58-74). Rows 3..7 are
        # zero in r/v/a, so full-matrix ops keep them zero.
        r_out[:, :] = r_out[:, :] + v_out[:, :] * dt + a_out[:, :] * half_dt_sq
        v_out[:, :] = v_out[:, :] + a_out[:, :] * half_dt

        f_acc[:, :] = jnp.zeros_like(f_acc)

        # Triangular tile sweep: each unordered pair once (gj > gi).
        for it in range(n_i):
            i_lo = it * tile_i
            i_hi = i_lo + tile_i
            isl = slice(i_lo, i_hi)
            xi = r_out[0, isl].reshape(tile_i, 1)
            yi = r_out[1, isl].reshape(tile_i, 1)
            zi = r_out[2, isl].reshape(tile_i, 1)
            for jt in range(n_j):
                j_lo = jt * tile_j
                j_hi = j_lo + tile_j
                if j_hi - 1 <= i_lo:
                    continue  # no pair with gj > gi in this tile
                jsl = slice(j_lo, j_hi)
                xj = r_out[0, jsl].reshape(1, tile_j)
                yj = r_out[1, jsl].reshape(1, tile_j)
                zj = r_out[2, jsl].reshape(1, tile_j)

                dx = xi - xj
                dy = yi - yj
                dz = zi - zj
                dx = dx - L * jnp.round(dx * inv_l)
                dy = dy - L * jnp.round(dy * inv_l)
                dz = dz - L * jnp.round(dz * inv_l)
                r2 = dx * dx + dy * dy + dz * dz

                mask = r2 < rc_square
                # Triangular mask only where the diagonal crosses the tile.
                if j_lo < i_hi:
                    gi = i_lo + jax.lax.broadcasted_iota(
                        jnp.int32, (tile_i, tile_j), 0
                    )
                    gj = j_lo + jax.lax.broadcasted_iota(
                        jnp.int32, (tile_i, tile_j), 1
                    )
                    mask = mask & (gj > gi)
                    if j_hi > n:
                        mask = mask & (gj < n)
                    if i_hi > n:
                        mask = mask & (gi < n)
                else:
                    # Padding masks only for tiles touching columns >= n.
                    if j_hi > n:
                        gj = j_lo + jax.lax.broadcasted_iota(
                            jnp.int32, (tile_i, tile_j), 1
                        )
                        mask = mask & (gj < n)
                    if i_hi > n:
                        gi = i_lo + jax.lax.broadcasted_iota(
                            jnp.int32, (tile_i, tile_j), 0
                        )
                        mask = mask & (gi < n)

                coef, _du, _e, _ddu = lj_pair_terms(
                    r2, mask, approx_reciprocal, want_observables=False
                )

                fx = coef * dx
                fy = coef * dy
                fz = coef * dz
                f_acc[0, isl] += jnp.sum(fx, axis=1)
                f_acc[1, isl] += jnp.sum(fy, axis=1)
                f_acc[2, isl] += jnp.sum(fz, axis=1)
                # Newton's 3rd law reaction onto the j side (sequential
                # in-program accumulation — safe, unlike grid kernels).
                f_acc[0, jsl] -= jnp.sum(fx, axis=0)
                f_acc[1, jsl] -= jnp.sum(fy, axis=0)
                f_acc[2, jsl] -= jnp.sum(fz, axis=0)

        # a = 24 * raw sweep (prefactor restore, lj_potential_energy.f90:192)
        # + second half-kick. f_acc rows 3..7 were zeroed and never written.
        a_out[:, :] = 24.0 * f_acc[:, :]
        v_out[:, :] = v_out[:, :] + a_out[:, :] * half_dt
        return carry

    jax.lax.fori_loop(0, n_steps, step_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n",
        "box_length",
        "rc_square",
        "dt",
        "n_steps",
        "tile_i",
        "tile_j",
        "interpret",
        "approx_reciprocal",
    ),
)
def fused_dense_chunk(
    r: jax.Array,
    v: jax.Array,
    a: jax.Array,
    n: int,
    box_length: float,
    rc_square: float,
    dt: float,
    n_steps: int,
    tile_i: int = 128,
    tile_j: int = 1024,
    interpret: bool = False,
    approx_reciprocal: bool = True,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Advance ``n_steps`` velocity-Verlet steps in one Pallas program.

    ``r``/``v``/``a`` are (8, n_pad) row matrices (rows 0..2 = x/y/z, rows
    3..7 and columns >= n zero); ``a`` must hold real accelerations
    consistent with ``r`` (24-prefactored). Positions are NOT wrapped inside
    the chunk — the caller wraps afterwards; ``n_steps`` must not exceed
    ``MAX_CHUNK_STEPS``.
    """
    if n_steps > MAX_CHUNK_STEPS:
        raise ValueError(f"n_steps={n_steps} exceeds MAX_CHUNK_STEPS={MAX_CHUNK_STEPS}")
    n_pad = r.shape[1]
    kernel = functools.partial(
        _fused_dense_kernel,
        n=n,
        n_pad=n_pad,
        tile_i=tile_i,
        tile_j=tile_j,
        box_length=float(box_length),
        inv_box_length=1.0 / float(box_length),
        rc_square=float(rc_square),
        dt=float(dt),
        n_steps=n_steps,
        approx_reciprocal=approx_reciprocal and not interpret,
    )
    out_shape = [jax.ShapeDtypeStruct((8, n_pad), r.dtype)] * 3
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    pairs_per_step = n_pad * n_pad // 2
    return tuple(
        pl.pallas_call(
            kernel,
            in_specs=[vmem, vmem, vmem],
            out_specs=[vmem, vmem, vmem],
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((8, n_pad), r.dtype)],
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=int(40 * pairs_per_step) * n_steps,
                bytes_accessed=int(4 * 8 * n_pad * 7),
                transcendentals=0,
            ),
        )(r, v, a)
    )
