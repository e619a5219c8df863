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

__all__ = [
    "MAX_PENCIL_CHUNK_STEPS",
    "build_width_lists",
    "fused_pencil_chunk",
    "fused_pencil_width_chunk",
    "pencil_fused_viable",
]

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


# ---------------------------------------------------------------------------
# Occupancy-width visit lists: the tail-tiles idea transferred to pencils.
#
# The static-capacity kernel above sweeps every pencil at ``capacity`` lanes
# even though mean occupancy is well below it (cap 384 vs mean ~244 at
# N=62500) — by the candidate census roughly half its pair slots are pure
# sentinel padding.  Here each pencil gets a WIDTH w_p = ceil(count_p/128)
# in {0..capacity/128} at (re)bin time (valid slots are packed rank-first by
# ``rebin_gather``), and every sweep visit runs at the exact 128-granular
# active width instead of the capacity:
#
# - self visits: (pencil p, i-subtile si < w_p), j covering ranks
#   [si*128, w_p*128) — a triangular visit of static width u*128 with
#   u = w_p - si; one entry per (p, u<=w_p) in per-u class lists.
# - neighbor visits: (p, si < w_p, k in 0..3), j covering the neighbor's
#   [0, w_j*128) — a full visit of static width w_j*128; entries classed by
#   w_j in one concatenated list with per-class offsets.
#
# Like the window-list tail tiles, each width class is a SEPARATE fori_loop
# body (static shapes), never a per-tile branch (the round-2 killer).
# Empty pencils (w = 0) vanish from both sides.  Coverage is unchanged:
# skipped regions contain only sentinel slots, whose pair terms are
# identically zero (r^2 >> rc^2) and whose forces are zeroed by the
# validity row anyway.
# ---------------------------------------------------------------------------


def build_width_lists(counts: jax.Array, tbl: jax.Array, shf: jax.Array,
                      n_pencils: int, capacity: int):
    """Visit lists for ``fused_pencil_width_chunk`` from per-pencil counts.

    counts: (n_pencils,) int32 valid-slot counts (ranks are packed first —
    the ``rebin_gather``/``bin_to_slots`` layout). tbl/shf: the half-shell
    tables of ``build_half_shell_tables``.

    Returns (wl_self, wl_self_cnt, wl_nbr_i, wl_nbr_j, wl_nbr_off). All
    slot addresses are stored as 128-slot BLOCK indices (the kernel
    multiplies by 128), because Mosaic must statically prove dynamic lane
    offsets are 128-multiples — an opaque SMEM value fails that proof, a
    value*128 passes it.

    - wl_self (n_sub*P,) int32: self-visit i-start blocks, class u stored
      in the STATIC segment [(u-1)*P, (u-1)*P + wl_self_cnt[u-1]).
    - wl_nbr_i / wl_nbr_j (P*n_sub*4,) int32: neighbor-visit i-start
      blocks and packed (j_block << 4 | (shx+1) << 2 | (shy+1)); class w
      occupies the DYNAMIC segment [wl_nbr_off[w-1], wl_nbr_off[w]).

    Pure jnp, sort-free and searchsorted-free (cumsum-packed scatters): it
    traces inline into the same chunk graphs as ``rebin_gather`` and must
    not reintroduce the v5e searchsorted miscompile (docs/RESULTS.md).
    """
    P = n_pencils
    tile = TILE_I
    n_sub = capacity // tile
    w = jnp.clip((counts + (tile - 1)) // tile, 0, n_sub).astype(jnp.int32)

    # Self visits: one entry per (p, class u) with u <= w_p, at block
    # p*n_sub + (w_p - u).
    base_blk = jnp.arange(P, dtype=jnp.int32) * n_sub
    wl_self = jnp.zeros((n_sub * P,), jnp.int32)
    cnts = []
    for u in range(1, n_sub + 1):
        m = w >= u
        pos = jnp.cumsum(m.astype(jnp.int32)) - 1
        ista_blk = base_blk + (w - u)
        tgt = jnp.where(m, (u - 1) * P + pos, n_sub * P)
        wl_self = wl_self.at[tgt].set(ista_blk, mode="drop")
        cnts.append(jnp.sum(m.astype(jnp.int32)))
    wl_self_cnt = jnp.stack(cnts)

    # Neighbor visits: static enumeration e = (p, si, k), active when
    # si < w_p and the neighbor is non-empty; classed by the neighbor width.
    M = P * n_sub * 4
    e = jnp.arange(M, dtype=jnp.int32)
    k_e = e % 4
    si_e = (e // 4) % n_sub
    p_e = e // (4 * n_sub)
    pk = p_e * 4 + k_e
    j_e = tbl[pk]
    wj = w[j_e]
    active = (si_e < w[p_e]) & (wj >= 1)
    cls = jnp.where(active, wj, 0)
    cnt_w = jnp.stack(
        [jnp.sum((cls == ww).astype(jnp.int32)) for ww in range(1, n_sub + 1)]
    )
    off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnt_w).astype(jnp.int32)]
    )
    ista_e = p_e * n_sub + si_e
    packed = ((j_e * n_sub) << 4) | ((shf[2 * pk] + 1) << 2) | (shf[2 * pk + 1] + 1)
    wl_nbr_i = jnp.zeros((M,), jnp.int32)
    wl_nbr_j = jnp.zeros((M,), jnp.int32)
    for ww in range(1, n_sub + 1):
        mw = cls == ww
        pos = jnp.cumsum(mw.astype(jnp.int32)) - 1
        tgt = jnp.where(mw, off[ww - 1] + pos, M)
        wl_nbr_i = wl_nbr_i.at[tgt].set(ista_e, mode="drop")
        wl_nbr_j = wl_nbr_j.at[tgt].set(packed, mode="drop")
    return wl_self, wl_self_cnt, wl_nbr_i, wl_nbr_j, off


def _pencil_width_kernel(
    wls_ref,    # SMEM (n_sub*P,) int32: self-visit i-starts (static segments)
    wlc_ref,    # SMEM (n_sub,) int32: self-visit counts per class
    wni_ref,    # SMEM (M,) int32: neighbor-visit i-starts
    wnj_ref,    # SMEM (M,) int32: packed j_base/shifts
    wno_ref,    # SMEM (n_sub+1,) int32: neighbor class offsets
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
    P = n_pencils
    n_sub = capacity // TILE_I

    def _comp_add(x_ref, c_ref, delta):
        x = x_ref[:, :]
        y = delta + c_ref[:, :]
        t = x + y
        big_x = jnp.abs(x) >= jnp.abs(y)
        c_ref[:, :] = jnp.where(big_x, (x - t) + y, (y - t) + x)
        x_ref[:, :] = t

    def step_body(_s, carry):
        if extended:
            delta = (v_out[:, :] + vc_out[:, :]) * dt + a_out[:, :] * half_dt_sq
            _comp_add(r_out, rlo_out, delta)
            _comp_add(v_out, vc_out, a_out[:, :] * half_dt)
        else:
            r_out[:, :] = r_out[:, :] + v_out[:, :] * dt + a_out[:, :] * half_dt_sq
            v_out[:, :] = v_out[:, :] + a_out[:, :] * half_dt
        f_acc[:, :] = jnp.zeros_like(f_acc)

        def accumulate(dx, dy, dz, r2, mask, ista, jsta, jw):
            coef, _du, _e, _ddu = lj_pair_terms(
                r2, mask, approx_reciprocal, want_observables=False
            )
            fx = coef * dx
            fy = coef * dy
            fz = coef * dz
            f_acc[0, pl.ds(ista, TILE_I)] += jnp.sum(fx, axis=1)
            f_acc[1, pl.ds(ista, TILE_I)] += jnp.sum(fy, axis=1)
            f_acc[2, pl.ds(ista, TILE_I)] += jnp.sum(fz, axis=1)
            f_acc[0, pl.ds(jsta, jw)] -= jnp.sum(fx, axis=0)
            f_acc[1, pl.ds(jsta, jw)] -= jnp.sum(fy, axis=0)
            f_acc[2, pl.ds(jsta, jw)] -= jnp.sum(fz, axis=0)

        def load_i(ista):
            xi = r_out[0, pl.ds(ista, TILE_I)].reshape(TILE_I, 1)
            yi = r_out[1, pl.ds(ista, TILE_I)].reshape(TILE_I, 1)
            zi = r_out[2, pl.ds(ista, TILE_I)].reshape(TILE_I, 1)
            if extended:
                return (
                    xi, yi, zi,
                    rlo_out[0, pl.ds(ista, TILE_I)].reshape(TILE_I, 1),
                    rlo_out[1, pl.ds(ista, TILE_I)].reshape(TILE_I, 1),
                    rlo_out[2, pl.ds(ista, TILE_I)].reshape(TILE_I, 1),
                )
            return xi, yi, zi, None, None, None

        # Self visits: triangular, j range starts AT the i slice, so the
        # pair-once rank mask reduces to iota_j > iota_i (common offset
        # cancels). One width class per static u.
        for u in range(1, n_sub + 1):
            width = u * TILE_I

            def self_body(t, c2, u=u, width=width):
                # *TILE_I lets Mosaic prove the lane offset is a
                # 128-multiple (an opaque SMEM value fails that proof).
                ista = wls_ref[(u - 1) * P + t] * TILE_I
                xi, yi, zi, xlo, ylo, zlo = load_i(ista)
                dx = xi - r_out[0, pl.ds(ista, width)].reshape(1, width)
                dy = yi - r_out[1, pl.ds(ista, width)].reshape(1, width)
                dz = zi - r_out[2, pl.ds(ista, width)].reshape(1, width)
                if extended:
                    dx = dx + (xlo - rlo_out[0, pl.ds(ista, width)].reshape(1, width))
                    dy = dy + (ylo - rlo_out[1, pl.ds(ista, width)].reshape(1, width))
                    dz = dz + (zlo - rlo_out[2, pl.ds(ista, width)].reshape(1, width))
                dz = dz - L * jnp.round(dz * inv_l)
                r2 = dx * dx + dy * dy + dz * dz
                tri = jax.lax.broadcasted_iota(
                    jnp.int32, (TILE_I, width), 1
                ) > jax.lax.broadcasted_iota(jnp.int32, (TILE_I, width), 0)
                accumulate(dx, dy, dz, r2, (r2 < rc_square) & tri,
                           ista, ista, width)
                return c2

            jax.lax.fori_loop(0, wlc_ref[u - 1], self_body, 0)

        # Neighbor visits: full sweeps at the neighbor's width; pair-once by
        # the half-shell table, sentinels make the bare cutoff mask enough.
        for ww in range(1, n_sub + 1):
            width = ww * TILE_I

            def nbr_body(t, c2, width=width):
                ista = wni_ref[t] * TILE_I
                pk = wnj_ref[t]
                jb = (pk >> 4) * TILE_I
                off_x = (((pk >> 2) & 3) - 1).astype(r_out.dtype) * L
                off_y = ((pk & 3) - 1).astype(r_out.dtype) * L
                xi, yi, zi, xlo, ylo, zlo = load_i(ista)
                dx = xi - (r_out[0, pl.ds(jb, width)].reshape(1, width) + off_x)
                dy = yi - (r_out[1, pl.ds(jb, width)].reshape(1, width) + off_y)
                dz = zi - r_out[2, pl.ds(jb, width)].reshape(1, width)
                if extended:
                    dx = dx + (xlo - rlo_out[0, pl.ds(jb, width)].reshape(1, width))
                    dy = dy + (ylo - rlo_out[1, pl.ds(jb, width)].reshape(1, width))
                    dz = dz + (zlo - rlo_out[2, pl.ds(jb, width)].reshape(1, width))
                dz = dz - L * jnp.round(dz * inv_l)
                r2 = dx * dx + dy * dy + dz * dz
                accumulate(dx, dy, dz, r2, r2 < rc_square, ista, jb, width)
                return c2

            jax.lax.fori_loop(wno_ref[ww - 1], wno_ref[ww], nbr_body, 0)

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
    ),
)
def fused_pencil_width_chunk(
    r: jax.Array,
    v: jax.Array,
    a: jax.Array,
    wl_self: jax.Array,
    wl_self_cnt: jax.Array,
    wl_nbr_i: jax.Array,
    wl_nbr_j: jax.Array,
    wl_nbr_off: jax.Array,
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
) -> tuple[jax.Array, ...]:
    """``fused_pencil_chunk`` with occupancy-width visit lists (see the
    section comment above): same contracts, same outputs, ~the sentinel-
    padding fraction less pair math. Lists come from ``build_width_lists``
    on the CURRENT bin's counts and stay valid exactly as long as the bin
    does (pair assignment is frozen between rebins, so widths are too)."""
    if n_steps > MAX_PENCIL_CHUNK_STEPS:
        raise ValueError(
            f"n_steps={n_steps} exceeds MAX_PENCIL_CHUNK_STEPS={MAX_PENCIL_CHUNK_STEPS}"
        )
    ns = r.shape[1]
    if ns != n_pencils * capacity:
        raise ValueError(f"n_slots {ns} != n_pencils*capacity {n_pencils * capacity}")
    extended = r_lo is not None
    kernel = functools.partial(
        _pencil_width_kernel,
        n_pencils=n_pencils,
        capacity=capacity,
        box_length=float(box_length),
        inv_box_length=1.0 / float(box_length),
        rc_square=float(rc_square),
        dt=float(dt),
        n_steps=n_steps,
        approx_reciprocal=approx_reciprocal and not interpret,
        extended=extended,
    )
    n_state = 5 if extended else 3
    out_shape = [jax.ShapeDtypeStruct((8, ns), r.dtype)] * n_state
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    # Upper-bound candidate count (the static-cap census); the true count is
    # occupancy-dependent and lower.
    n_sub = capacity // TILE_I
    cand = n_pencils * (
        sum(TILE_I * (capacity - TILE_I * si) for si in range(n_sub))
        + n_sub * 4 * TILE_I * capacity
    )
    lists = (wl_self, wl_self_cnt, wl_nbr_i, wl_nbr_j, wl_nbr_off)
    ins = lists + ((r, r_lo, v, vc, a) if extended else (r, v, a))
    aliases = {i + 5: i for i in range(n_state)}
    return tuple(
        pl.pallas_call(
            kernel,
            in_specs=[smem] * 5 + [vmem] * n_state,
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
