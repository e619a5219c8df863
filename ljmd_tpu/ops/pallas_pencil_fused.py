"""Fused multi-step pencil kernel: the large-N MD loop inside ONE program.

Measured on v5e at N=62500 (scripts/exp_overhead.py): the per-step cellpair
engine spends ~1.15 ms/step OUTSIDE the pair sweep (elementwise row updates,
the rebin displacement check, lax.cond, scan-iteration launch floors), and
the grid-sweep kernel itself pays ~0.5 ms/step of per-program overhead (196
programs x block DMAs + region prologues) on top of ~1.0 ms of pair math.
This kernel removes both: the WHOLE slot-layout state (r, v, a — ~2.4 MB
each at N=62500) stays resident in VMEM for ``n_steps`` velocity-Verlet
steps, with the half-shell pencil sweep of ``ops/pallas_pencil2.py`` run as
a ``fori_loop`` over pencils inside the program (dynamic 128-aligned lane
slices instead of grid block maps).

The physics is the reference's hot loop (``lj_potential_energy.f90:109-183``
inside ``verlet.f90:41-97``), restructured exactly like the half-shell grid
kernel: self-pencil slot-triangular sweep + 4 upper xy-neighbors with static
image shifts, each unordered pair once, Newton's-3rd-law reaction
accumulated in place (sequential within the single program, so no
shift-permutation output blocks are needed).

Contracts shared with the per-step engine path:

- Slot layout (8, n_slots): rows 0..2 = x/y/z, row 3 = validity, row 4 =
  particle id; invalid slots carry sentinel coordinates (pallas_pencil2
  scheme) with v = a = 0. Forces are multiplied by the validity row every
  step INSIDE the kernel, so same-pencil sentinel-sentinel artifacts never
  leak into velocities and sentinels never move.
- No wrap inside the chunk: slot coordinates drift (bounded by the rebin
  skin criterion, checked by the caller between chunks); the static xy
  image-shift tables stay exact because pencil assignment is frozen while
  the displacement stays under skin/2 — identical to the per-step engine's
  no-per-step-wrap invariant (models/engine.py).
- Pair assignment is bin-time: the caller must rebin (and re-sentinel)
  before a chunk whenever any particle moved more than a skin fraction
  since the last rebin, and flag results invalid past skin/2.

EXTENDED two-float mode (``r_lo``/``vc`` passed): positions carry a
remainder row-matrix and velocities a Neumaier compensation term, with each
pair displacement corrected by (lo_i - lo_j) inside the sweep — the same
scheme as ``pallas_fused.fused_dense_chunk_ext``. This keeps the fused fast
path available for the compensated policy (f32 at dt <= 1e-3, the
reference's own dt=1e-4 regime) instead of dropping to the per-step sweep.
Invalid slots have r_lo = vc = 0 and their forces are zeroed, so sentinels
stay exact.

Outputs (r, v, a) / (r, r_lo, v, vc, a) alias the inputs (in-place in
VMEM); ``a`` includes the 24 prefactor (real accelerations). VMEM budget:
4 (plain) or 6 (extended) buffers of (8, n_slots) f32 + 1 scratch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ljmd_tpu.ops.pallas_common import lj_pair_terms
from ljmd_tpu.ops.pallas_pencil2 import TILE_I

__all__ = ["MAX_PENCIL_CHUNK_STEPS", "fused_pencil_chunk", "pencil_fused_viable"]

# Chunks are bounded by the rebin cadence (skin/4 displacement) anyway;
# this cap just bounds unwrapped coordinate drift like the dense fused path.
MAX_PENCIL_CHUNK_STEPS = 128

_VMEM_BUDGET_BYTES = 12 * 1024 * 1024  # leave headroom under ~16 MB/core


def pencil_fused_viable(n_slots: int, itemsize: int = 4,
                        extended: bool = False) -> bool:
    """True when the state buffers + force scratch fit the VMEM budget."""
    n_buffers = 7 if extended else 4  # r[,rlo],v[,vc],a + f_acc scratch
    return n_buffers * 8 * n_slots * itemsize <= _VMEM_BUDGET_BYTES


def _pencil_fused_kernel(
    tbl_ref,    # SMEM (n_pencils*4,) int32: upper half-shell neighbor ids
    shf_ref,    # SMEM (n_pencils*4*2,) int32: xy image shifts (units of L)
    *args,      # ins (3 or 5), outs (3 or 5), f_acc scratch
    n_pencils: int,
    capacity: int,
    box_length: float,
    inv_box_length: float,
    rc_square: float,
    dt: float,
    n_steps: int,
    approx_reciprocal: bool,
    extended: bool = False,
    mxu_reduce: bool = False,
):
    n_state = 5 if extended else 3
    ins = args[:n_state]
    outs = args[n_state:2 * n_state]
    f_acc = args[2 * n_state]
    if extended:
        (r_out, rlo_out, v_out, vc_out, a_out) = outs
    else:
        (r_out, v_out, a_out) = outs
    for dst, src in zip(outs, ins):
        dst[:, :] = src[:, :]

    L = box_length
    inv_l = inv_box_length
    half_dt = 0.5 * dt
    half_dt_sq = 0.5 * dt * dt
    cap = capacity
    n_sub = cap // TILE_I

    def _comp_add(x_ref, c_ref, delta):
        """Neumaier-compensated x_ref += delta. Rows with delta = c = 0
        (validity/id aux rows, invalid slots) are exact fixed points."""
        x = x_ref[:, :]
        y = delta + c_ref[:, :]
        t = x + y
        big_x = jnp.abs(x) >= jnp.abs(y)
        c_ref[:, :] = jnp.where(big_x, (x - t) + y, (y - t) + x)
        x_ref[:, :] = t

    def step_body(_s, carry):
        # Position update + first half-kick. v/a rows 3..7 and invalid slots
        # are identically zero, so full-matrix updates leave the validity/id
        # rows and the sentinel coordinates untouched.
        if extended:
            delta = (v_out[:, :] + vc_out[:, :]) * dt + a_out[:, :] * half_dt_sq
            _comp_add(r_out, rlo_out, delta)
            _comp_add(v_out, vc_out, a_out[:, :] * half_dt)
        else:
            r_out[:, :] = r_out[:, :] + v_out[:, :] * dt + a_out[:, :] * half_dt_sq
            v_out[:, :] = v_out[:, :] + a_out[:, :] * half_dt
        f_acc[:, :] = jnp.zeros_like(f_acc)

        def pencil_body(p, c2):
            base = p * cap
            # Hoist the xy-preshifted neighbor rows once per pencil (after
            # this, xi - xjs IS the minimum image in x/y; z keeps a round).
            # The shift applies to the hi part only — it is an exact
            # multiple of L, and the lo remainders are shift-invariant.
            shifted = []
            for k in range(4):
                j = tbl_ref[p * 4 + k]
                jb = j * cap
                off_x = shf_ref[(p * 4 + k) * 2].astype(r_out.dtype) * L
                off_y = shf_ref[(p * 4 + k) * 2 + 1].astype(r_out.dtype) * L
                shifted.append((
                    jb,
                    r_out[0, pl.ds(jb, cap)].reshape(1, cap) + off_x,
                    r_out[1, pl.ds(jb, cap)].reshape(1, cap) + off_y,
                    r_out[2, pl.ds(jb, cap)].reshape(1, cap),
                ))

            for si in range(n_sub):
                ista = base + si * TILE_I
                xi = r_out[0, pl.ds(ista, TILE_I)].reshape(TILE_I, 1)
                yi = r_out[1, pl.ds(ista, TILE_I)].reshape(TILE_I, 1)
                zi = r_out[2, pl.ds(ista, TILE_I)].reshape(TILE_I, 1)
                if extended:
                    xi_lo = rlo_out[0, pl.ds(ista, TILE_I)].reshape(TILE_I, 1)
                    yi_lo = rlo_out[1, pl.ds(ista, TILE_I)].reshape(TILE_I, 1)
                    zi_lo = rlo_out[2, pl.ds(ista, TILE_I)].reshape(TILE_I, 1)

                def accumulate(dx, dy, dz, r2, mask, jsta, jw, ista=ista):
                    coef, _du, _e, _ddu = lj_pair_terms(
                        r2, mask, approx_reciprocal, want_observables=False
                    )
                    fx = coef * dx
                    fy = coef * dy
                    fz = coef * dz
                    if mxu_reduce:
                        # Row/column sums as ones-matmuls on the otherwise
                        # idle MXU (exact: bf16x3 splits f32 exactly; see
                        # pallas_fused._fused_dense_list_kernel).
                        dtt = fx.dtype
                        ones_j = jnp.ones((fx.shape[1], 8), dtt)
                        ones_i = jnp.ones((8, TILE_I), dtt)
                        dn = (((1,), (0,)), ((), ()))
                        f_acc[0, pl.ds(ista, TILE_I)] += jax.lax.dot_general(
                            fx, ones_j, dn, preferred_element_type=dtt)[:, 0]
                        f_acc[1, pl.ds(ista, TILE_I)] += jax.lax.dot_general(
                            fy, ones_j, dn, preferred_element_type=dtt)[:, 0]
                        f_acc[2, pl.ds(ista, TILE_I)] += jax.lax.dot_general(
                            fz, ones_j, dn, preferred_element_type=dtt)[:, 0]
                        f_acc[0, pl.ds(jsta, jw)] -= jax.lax.dot_general(
                            ones_i, fx, dn, preferred_element_type=dtt)[0, :]
                        f_acc[1, pl.ds(jsta, jw)] -= jax.lax.dot_general(
                            ones_i, fy, dn, preferred_element_type=dtt)[0, :]
                        f_acc[2, pl.ds(jsta, jw)] -= jax.lax.dot_general(
                            ones_i, fz, dn, preferred_element_type=dtt)[0, :]
                        return
                    f_acc[0, pl.ds(ista, TILE_I)] += jnp.sum(fx, axis=1)
                    f_acc[1, pl.ds(ista, TILE_I)] += jnp.sum(fy, axis=1)
                    f_acc[2, pl.ds(ista, TILE_I)] += jnp.sum(fz, axis=1)
                    # Newton's 3rd law reaction (sequential in-program
                    # accumulation — no permutation output blocks needed).
                    f_acc[0, pl.ds(jsta, jw)] -= jnp.sum(fx, axis=0)
                    f_acc[1, pl.ds(jsta, jw)] -= jnp.sum(fy, axis=0)
                    f_acc[2, pl.ds(jsta, jw)] -= jnp.sum(fz, axis=0)

                # Self pencil: slot-triangular, each in-pencil pair once;
                # ranks below the i-slice are wholly masked -> static trim.
                j_lo = si * TILE_I
                jw = cap - j_lo
                xs = r_out[0, pl.ds(base + j_lo, jw)].reshape(1, jw)
                ys = r_out[1, pl.ds(base + j_lo, jw)].reshape(1, jw)
                zs = r_out[2, pl.ds(base + j_lo, jw)].reshape(1, jw)
                rank_i = j_lo + jax.lax.broadcasted_iota(
                    jnp.int32, (TILE_I, jw), 0
                )
                rank_j = j_lo + jax.lax.broadcasted_iota(jnp.int32, (TILE_I, jw), 1)
                dxs = xi - xs
                dys = yi - ys
                dzs = zi - zs
                if extended:
                    dxs = dxs + (xi_lo - rlo_out[0, pl.ds(base + j_lo, jw)].reshape(1, jw))
                    dys = dys + (yi_lo - rlo_out[1, pl.ds(base + j_lo, jw)].reshape(1, jw))
                    dzs = dzs + (zi_lo - rlo_out[2, pl.ds(base + j_lo, jw)].reshape(1, jw))
                dzs = dzs - L * jnp.round(dzs * inv_l)
                r2s = dxs * dxs + dys * dys + dzs * dzs
                accumulate(
                    dxs, dys, dzs, r2s,
                    (r2s < rc_square) & (rank_j > rank_i),
                    base + j_lo, jw,
                )

                # 4 upper half-shell neighbors: full sweep, pair-once by
                # construction; sentinels make a bare cutoff mask sufficient.
                for jb, xjs, yjs, zjs in shifted:
                    dx = xi - xjs
                    dy = yi - yjs
                    dz = zi - zjs
                    if extended:
                        dx = dx + (xi_lo - rlo_out[0, pl.ds(jb, cap)].reshape(1, cap))
                        dy = dy + (yi_lo - rlo_out[1, pl.ds(jb, cap)].reshape(1, cap))
                        dz = dz + (zi_lo - rlo_out[2, pl.ds(jb, cap)].reshape(1, cap))
                    dz = dz - L * jnp.round(dz * inv_l)
                    r2 = dx * dx + dy * dy + dz * dz
                    accumulate(dx, dy, dz, r2, r2 < rc_square, jb, cap)
            return c2

        jax.lax.fori_loop(0, n_pencils, pencil_body, 0)

        # Prefactor restore (lj_potential_energy.f90:192) + validity cleanup
        # (same-pencil sentinel artifacts land only on invalid slots) +
        # second half-kick. f_acc rows 3..7 were zeroed and never written.
        a_out[:, :] = (24.0 * f_acc[:, :]) * r_out[3:4, :]
        if extended:
            _comp_add(v_out, vc_out, a_out[:, :] * half_dt)
        else:
            v_out[:, :] = v_out[:, :] + a_out[:, :] * half_dt
        return carry

    jax.lax.fori_loop(0, n_steps, step_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_pencils",
        "capacity",
        "box_length",
        "rc_square",
        "dt",
        "n_steps",
        "interpret",
        "approx_reciprocal",
        "mxu_reduce",
    ),
)
def fused_pencil_chunk(
    r: jax.Array,
    v: jax.Array,
    a: jax.Array,
    tbl: jax.Array,
    shf: jax.Array,
    n_pencils: int,
    capacity: int,
    box_length: float,
    rc_square: float,
    dt: float,
    n_steps: int,
    interpret: bool = False,
    approx_reciprocal: bool = True,
    r_lo: jax.Array | None = None,
    vc: jax.Array | None = None,
    mxu_reduce: bool = False,
) -> tuple[jax.Array, ...]:
    """Advance ``n_steps`` velocity-Verlet steps of the slot-layout state in
    one Pallas program (see module doc for the contracts). Returns
    (r, v, a) — or (r, r_lo, v, vc, a) in the extended two-float mode when
    ``r_lo``/``vc`` are passed; the outputs alias the input buffers."""
    if n_steps > MAX_PENCIL_CHUNK_STEPS:
        raise ValueError(
            f"n_steps={n_steps} exceeds MAX_PENCIL_CHUNK_STEPS={MAX_PENCIL_CHUNK_STEPS}"
        )
    ns = r.shape[1]
    if ns != n_pencils * capacity:
        raise ValueError(f"n_slots {ns} != n_pencils*capacity {n_pencils * capacity}")
    extended = r_lo is not None
    kernel = functools.partial(
        _pencil_fused_kernel,
        n_pencils=n_pencils,
        capacity=capacity,
        box_length=float(box_length),
        inv_box_length=1.0 / float(box_length),
        rc_square=float(rc_square),
        dt=float(dt),
        n_steps=n_steps,
        approx_reciprocal=approx_reciprocal and not interpret,
        extended=extended,
        mxu_reduce=mxu_reduce,
    )
    n_state = 5 if extended else 3
    out_shape = [jax.ShapeDtypeStruct((8, ns), r.dtype)] * n_state
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    # Candidate slots per step: self-triangular + 4 full neighbor sweeps.
    n_sub = capacity // TILE_I
    cand = n_pencils * (
        sum(TILE_I * (capacity - TILE_I * si) for si in range(n_sub))
        + n_sub * 4 * TILE_I * capacity
    )
    ins = (tbl, shf, r, r_lo, v, vc, a) if extended else (tbl, shf, r, v, a)
    aliases = {i + 2: i for i in range(n_state)}
    return tuple(
        pl.pallas_call(
            kernel,
            in_specs=[smem, smem] + [vmem] * n_state,
            out_specs=[vmem] * n_state,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((8, ns), r.dtype)],
            input_output_aliases=aliases,
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=int((36 if extended else 30) * cand) * n_steps,
                bytes_accessed=int(4 * 8 * ns * (2 * n_state + 1)),
                transcendentals=0,
            ),
        )(*ins)
    )
