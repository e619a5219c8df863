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

__all__ = [
    "MAX_CHUNK_STEPS",
    "build_tile_lists",
    "build_window_lists",
    "build_window_lists_pallas",
    "compute_tile_flags",
    "fused_dense_chunk",
    "fused_dense_chunk_ext",
    "fused_dense_chunk_flags",
    "fused_dense_chunk_list",
    "wrap_positions_ext",
]


def wrap_positions_ext(hi: jax.Array, lo: jax.Array, box_length: float):
    """Wrap two-float positions into [0, L) without losing the remainder:
    hi' = hi - k*L with the subtraction's rounding error folded into lo.
    k*L is exact for the small |k| (<= 2) that occur between wraps."""
    k = jnp.floor(hi * (1.0 / box_length))
    d = k * box_length
    s = hi - d
    big = jnp.abs(hi) >= jnp.abs(d)
    err = jnp.where(big, (hi - s) - d, (-d - s) + hi)
    return s, lo + err

# Position drift per chunk is bounded by v_max * dt * MAX_CHUNK_STEPS; at
# liquid state points (v_max ~ 4 sigma/tau, dt <= 0.005) 256 steps keep
# coordinates within ~2L of the box, preserving f32 position resolution.
MAX_CHUNK_STEPS = 256


def _fused_dense_kernel(
    *args,
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
    use_flags: bool = False,
    extended: bool = False,
):
    """Fused multi-step kernel body. Inputs: [flags (SMEM, when use_flags)],
    r_in, [rlo_in], v_in, [vc_in], a_in; outputs mirror the inputs; scratch
    f_acc. With ``use_flags`` each (i,j) tile is gated on
    flags[it * n_j + jt] — the z-sorted tile-skip path (tiles whose
    z-intervals are farther apart than rc + skin are skipped at runtime).

    ``extended``: two-float positions + compensated velocities. At dt=0.005
    in f32 the drift floor is set by kernel-INPUT position quantization
    (ulp(x~L) ~ 1e-6 absolute on the pair displacement); carrying the
    rounding remainder rows (r_lo) and correcting each pair displacement
    with (lo_i - lo_j) removes it for ~6 extra ops per pair. Integration
    uses Neumaier two-sums so r_hi + r_lo tracks the exact trajectory.
    """
    pos = 0
    if use_flags:
        flags_ref = args[0]
        pos = 1
    else:
        flags_ref = None
    n_state = 5 if extended else 3
    ins = args[pos:pos + n_state]
    outs = args[pos + n_state:pos + 2 * n_state]
    f_acc = args[pos + 2 * n_state]
    if extended:
        (r_in, rlo_in, v_in, vc_in, a_in) = ins
        (r_out, rlo_out, v_out, vc_out, a_out) = outs
    else:
        (r_in, v_in, a_in) = ins
        (r_out, v_out, a_out) = outs
    for dst, src in zip(outs, ins):
        dst[:, :] = src[:, :]

    n_i = n_pad // tile_i
    n_j = n_pad // tile_j
    L = box_length
    inv_l = inv_box_length
    half_dt = 0.5 * dt
    half_dt_sq = 0.5 * dt * dt

    def _comp_add(x_ref, c_ref, delta):
        """Neumaier-compensated x_ref += delta (c_ref accumulates the
        rounding remainder)."""
        x = x_ref[:, :]
        y = delta + c_ref[:, :]
        t = x + y
        big_x = jnp.abs(x) >= jnp.abs(y)
        c_ref[:, :] = jnp.where(big_x, (x - t) + y, (y - t) + x)
        x_ref[:, :] = t

    def step_body(_s, carry):
        # Position update + first half-kick (verlet.f90:58-74). Rows 3..7 are
        # zero in r/v/a, so full-matrix ops keep them zero.
        if extended:
            delta = (v_out[:, :] + vc_out[:, :]) * dt + a_out[:, :] * half_dt_sq
            _comp_add(r_out, rlo_out, delta)
            _comp_add(v_out, vc_out, a_out[:, :] * half_dt)
        else:
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
            if extended:
                xi_lo = rlo_out[0, isl].reshape(tile_i, 1)
                yi_lo = rlo_out[1, isl].reshape(tile_i, 1)
                zi_lo = rlo_out[2, isl].reshape(tile_i, 1)
            else:
                xi_lo = yi_lo = zi_lo = None
            for jt in range(n_j):
                j_lo = jt * tile_j
                j_hi = j_lo + tile_j
                if j_hi - 1 <= i_lo:
                    continue  # no pair with gj > gi in this tile

                def tile_body(it=it, jt=jt, i_lo=i_lo, i_hi=i_hi,
                              j_lo=j_lo, j_hi=j_hi, xi=xi, yi=yi, zi=zi,
                              xi_lo=xi_lo, yi_lo=yi_lo, zi_lo=zi_lo,
                              mic_z=True):
                    jsl = slice(j_lo, j_hi)
                    xj = r_out[0, jsl].reshape(1, tile_j)
                    yj = r_out[1, jsl].reshape(1, tile_j)
                    zj = r_out[2, jsl].reshape(1, tile_j)

                    dx = xi - xj
                    dy = yi - yj
                    dz = zi - zj
                    if extended:
                        # Pair displacement correction from the remainder
                        # rows: restores the sub-ulp position information the
                        # f32 coordinates dropped.
                        dx = dx + (xi_lo - rlo_out[0, jsl].reshape(1, tile_j))
                        dy = dy + (yi_lo - rlo_out[1, jsl].reshape(1, tile_j))
                        dz = dz + (zi_lo - rlo_out[2, jsl].reshape(1, tile_j))
                    dx = dx - L * jnp.round(dx * inv_l)
                    dy = dy - L * jnp.round(dy * inv_l)
                    if mic_z:
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

                if use_flags:
                    # Single full-MIC body for any active flag. (A 2-branch
                    # variant skipping the z round on direct-only tiles was
                    # measured SLOWER — 98.97 -> 134.4 us/step at N=4000 —
                    # the per-tile pl.when pair defeats Mosaic pipelining;
                    # see CLAUDE.md perf notes.)
                    pl.when(flags_ref[0, it * n_j + jt] > 0)(tile_body)
                else:
                    tile_body()

        # a = 24 * raw sweep (prefactor restore, lj_potential_energy.f90:192)
        # + second half-kick. f_acc rows 3..7 were zeroed and never written.
        a_out[:, :] = 24.0 * f_acc[:, :]
        if extended:
            _comp_add(v_out, vc_out, a_out[:, :] * half_dt)
        else:
            v_out[:, :] = v_out[:, :] + a_out[:, :] * half_dt
        return carry

    jax.lax.fori_loop(0, n_steps, step_body, 0)


def compute_tile_flags(
    r: jax.Array,
    n: int,
    tile_i: int,
    tile_j: int,
    box_length: float,
    window: float,
    face_margin: float | None = None,
    x_window: float | None = None,
    cross_margin: float | None = None,
) -> jax.Array:
    """(n_i * n_j,) int32 tile-pair activity flags for a SORTED layout.

    Bit encoding (0 = inactive tile, never visited):
      bit 0 (1): active — the i/j column sets can hold a pair within range
      bit 1 (2): the z minimum-image round() is required for this tile
      bit 2 (4): the x minimum-image round() is required for this tile

    A tile pair is active iff, on EVERY tested axis, the circular distance
    between the i columns' coordinate interval and the j columns' interval
    is below the axis window (rc + sort skin). With the default
    ``x_window=None`` only z is tested (pure z-sorted layout) and bit 2 is
    set on every active tile (x order carries no information). Passing
    ``x_window`` adds the x-axis test — meaningful when the layout is
    (x-slab, z) lexicographically sorted so block x-intervals are compact.
    Columns >= n (padding, sorted last) are excluded; all-padding tiles are
    inactive. Valid while no particle has moved more than
    (window - rc)/2 from the sort-time positions (the engine tracks this
    via its r_ref displacement check).

    Round()-requirement per axis: a wrapped-image overlap obviously needs
    it. Additionally, a particle wrapping across a face between chunks
    jumps its RAW coordinate by L while physically moving epsilon, so a
    direct-overlap pair near a face would silently lose pairs without the
    round. The pair needs the round iff one side could CROSS a face before
    the next resort (interval within ``cross_margin`` — the engine's
    invalid-detection displacement bound, sort_skin/2) while the other side
    is within interaction range (``face_margin``, default = window) of the
    SAME face. Pairs that fail this test either keep a no-op round
    (|d| < L/2 throughout) or are beyond rc under both readings."""
    n_pad = r.shape[1]
    L = box_length
    big = jnp.asarray(jnp.inf, r.dtype)
    col = jnp.arange(n_pad)
    real = col < n
    if face_margin is None:
        face_margin = window
    if cross_margin is None:
        cross_margin = face_margin

    def axis_terms(coord, win):
        x = jnp.where(real, coord, big)

        def intervals(tile):
            xt = x.reshape(n_pad // tile, tile)
            lo = jnp.min(xt, axis=1)
            hi = jnp.max(jnp.where(jnp.isfinite(xt), xt, -big), axis=1)
            return lo, hi  # lo=+inf / hi=-inf for all-padding tiles

        i_lo, i_hi = intervals(tile_i)
        j_lo, j_hi = intervals(tile_j)

        def gap(a_lo, a_hi, b_lo, b_hi):
            return jnp.maximum(0.0, jnp.maximum(b_lo - a_hi, a_lo - b_hi))

        a_lo = i_lo[:, None]
        a_hi = i_hi[:, None]
        finite = jnp.isfinite(a_hi) & jnp.isfinite(j_hi)[None, :]
        direct = (gap(a_lo, a_hi, j_lo[None, :], j_hi[None, :]) < win) & finite
        wrapped = (
            jnp.minimum(
                gap(a_lo, a_hi, j_lo[None, :] - L, j_hi[None, :] - L),
                gap(a_lo, a_hi, j_lo[None, :] + L, j_hi[None, :] + L),
            )
            < win
        ) & finite
        s0_i, sl_i = i_lo < cross_margin, i_hi > L - cross_margin
        b0_i, bl_i = i_lo < face_margin, i_hi > L - face_margin
        s0_j, sl_j = j_lo < cross_margin, j_hi > L - cross_margin
        b0_j, bl_j = j_lo < face_margin, j_hi > L - face_margin
        hazard = (
            (s0_i[:, None] & b0_j[None, :])
            | (b0_i[:, None] & s0_j[None, :])
            | (sl_i[:, None] & bl_j[None, :])
            | (bl_i[:, None] & sl_j[None, :])
        )
        return direct | wrapped, wrapped | (direct & hazard)

    active, round_z = axis_terms(r[2], window)
    if x_window is None:
        round_x = active
    else:
        active_x, round_x = axis_terms(r[0], x_window)
        active = active & active_x
    return jnp.where(
        active,
        1 + 2 * round_z.astype(jnp.int32) + 4 * round_x.astype(jnp.int32),
        0,
    ).reshape(-1)


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
def fused_dense_chunk_flags(
    r: jax.Array,
    v: jax.Array,
    a: jax.Array,
    flags: jax.Array,
    n: int,
    box_length: float,
    rc_square: float,
    dt: float,
    n_steps: int,
    tile_i: int = 128,
    tile_j: int = 512,
    interpret: bool = False,
    approx_reciprocal: bool = True,
    r_lo: jax.Array | None = None,
    vc: jax.Array | None = None,
) -> tuple[jax.Array, ...]:
    """``fused_dense_chunk`` with runtime tile-pair skipping: tiles whose
    flag is 0 are not computed. Correctness requires the flags to be valid
    for the WHOLE chunk (see compute_tile_flags / the zsort engine's
    displacement bookkeeping). Passing ``r_lo``/``vc`` enables the extended
    two-float-precision mode (see fused_dense_chunk_ext); the return is then
    (r, r_lo, v, vc, a) instead of (r, v, a)."""
    if n_steps > MAX_CHUNK_STEPS:
        raise ValueError(f"n_steps={n_steps} exceeds MAX_CHUNK_STEPS={MAX_CHUNK_STEPS}")
    extended = r_lo is not None
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
        use_flags=True,
        extended=extended,
    )
    n_state = 5 if extended else 3
    out_shape = [jax.ShapeDtypeStruct((8, n_pad), r.dtype)] * n_state
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    pairs_per_step = n_pad * n_pad // 2
    # leading dummy axis: batch-legal under vmap (see _pack_window_kernel)
    flags2 = flags.reshape(1, -1)
    ins = (flags2, r, r_lo, v, vc, a) if extended else (flags2, r, v, a)
    return tuple(
        pl.pallas_call(
            kernel,
            in_specs=[smem] + [vmem] * n_state,
            out_specs=[vmem] * n_state,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((8, n_pad), r.dtype)],
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=int((26 if extended else 20) * pairs_per_step) * n_steps,
                bytes_accessed=int(4 * 8 * n_pad * (2 * n_state + 1)),
                transcendentals=0,
            ),
        )(*ins)
    )


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
def fused_dense_chunk_ext(
    r: jax.Array,
    r_lo: jax.Array,
    v: jax.Array,
    vc: jax.Array,
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
) -> tuple[jax.Array, ...]:
    """Extended-precision variant of ``fused_dense_chunk``: two-float
    positions (r + r_lo) and compensated velocities (v + vc), with the pair
    displacements corrected by the remainder rows inside the sweep — the
    f32 drift fix for dt ~ 5e-3 (see _fused_dense_kernel doc). Returns
    (r, r_lo, v, vc, a) after ``n_steps``."""
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
        extended=True,
    )
    out_shape = [jax.ShapeDtypeStruct((8, n_pad), r.dtype)] * 5
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    pairs_per_step = n_pad * n_pad // 2
    return tuple(
        pl.pallas_call(
            kernel,
            in_specs=[vmem] * 5,
            out_specs=[vmem] * 5,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((8, n_pad), r.dtype)],
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=int(46 * pairs_per_step) * n_steps,
                bytes_accessed=int(4 * 8 * n_pad * 11),
                transcendentals=0,
            ),
        )(r, r_lo, v, vc, a)
    )


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


# ---------------------------------------------------------------------------
# Active-tile-LIST fused kernel.
#
# Measured on v5e at N=4000 (scripts/exp_zfloor.py): the flags kernel pays a
# ~90 us/step floor with ZERO active tiles, FLAT in the number of tile visits
# (256 -> 128 visits: 90 -> 95 us) — the cost tracks the statically-unrolled
# code footprint (256 pl.when regions), not the branch count, and it
# dominates the ~18 us of actual pair math. This variant replaces the
# unrolled double tile loop with a data-driven fori_loop over a COMPACT list
# of active tiles (scalar-prefetched offsets), so the per-step code is one
# tile body, executed only for live tiles. Two lists keep the hot body
# mask-free: "pure" tiles (fully above the diagonal, no padding columns) run
# with the bare cutoff mask; "masked" tiles (diagonal-crossing or touching
# columns >= n) add the rank/padding masks — applying those masks is a no-op
# for any tile, so one masked body covers every special case.
# ---------------------------------------------------------------------------


def build_tile_lists(
    flags: jax.Array,
    n: int,
    n_pad: int,
    tile_i: int,
    tile_j: int,
) -> tuple[jax.Array, jax.Array]:
    """Compact the (n_i*n_j,) 2-bit activity flags into per-category
    tile-offset lists for ``fused_dense_chunk_list``.

    Returns (tiles (6, n_i*n_j) int32, tcounts (3,) int32). Row pairs are
    the i/j TILE INDICES per category:
      rows 0/1 "pure direct" — no rank/padding masks AND flag bit 1 unset
        (no wrapped z-image within the window): the kernel skips the z-MIC
        round() for these (~3 of ~34 FMA-ops per pair);
      rows 2/3 "pure wrapped" — mask-free but needs the z round;
      rows 4/5 "masked" — diagonal-crossing / padding tiles (full masks +
        z round; some are direct-only but the few boundary tiles are not
        worth a fourth body).
    Entries past the counts are zero (never visited)."""
    n_i = n_pad // tile_i
    n_j = n_pad // tile_j
    f2 = flags.reshape(n_i, n_j)
    active2 = f2 > 0
    zwrap = (f2 & 2) != 0
    i_lo = (jnp.arange(n_i) * tile_i)[:, None]
    j_lo = (jnp.arange(n_j) * tile_j)[None, :]
    visited = (j_lo + tile_j - 1) > i_lo  # some gj > gi exists in the tile
    needs_mask = (
        (j_lo < i_lo + tile_i) | (j_lo + tile_j > n) | (i_lo + tile_i > n)
    )
    active = active2 & visited
    pure_direct = active & ~needs_mask & ~zwrap
    pure_wrap = active & ~needs_mask & zwrap
    maskd = active & needs_mask

    def pack(m):
        # Store tile INDICES, not offsets: the kernel multiplies by the
        # static tile size so Mosaic can prove the dynamic lane slices are
        # 128-aligned (a raw SMEM offset is unprovable).
        idx = jnp.nonzero(m.ravel(), size=n_i * n_j, fill_value=0)[0]
        return (
            (idx // n_j).astype(jnp.int32),
            (idx % n_j).astype(jnp.int32),
            m.sum().astype(jnp.int32),
        )

    di, dj, nd = pack(pure_direct)
    wi, wj, nw = pack(pure_wrap)
    mi, mj, nm = pack(maskd)
    return jnp.stack([di, dj, wi, wj, mi, mj]), jnp.stack([nd, nw, nm])


def _window_max_t(n_pad: int, tile_i: int, tile_j: int) -> int:
    """Visit-list capacity: emissions within a row are >= span blocks apart
    (stride within a cluster; the next cluster starts >= span past the
    previous cluster's last active block), so a row holds at most
    ceil(n_b/span) visits."""
    span = tile_j // tile_i
    n_b = n_pad // tile_i
    return (n_pad // tile_i) * (-(-n_b // span))


def _pack_window_kernel(
    bounds_ref,  # SMEM (1, 2) int32: [n_i, n_b] as DYNAMIC loop bounds
    rowspan_ref,  # SMEM (2, n_i) int32: per-row [first, last+1) active block
    flags_ref,   # SMEM (1, n_i*n_b) int32
    tiles_ref,   # SMEM (9, max_t) int32 out
    tcounts_ref,  # SMEM (1, 4) int32 out
    # NOTE: the 1-D operands carry a leading dummy axis so the kernel stays
    # legal under vmap (batched ensembles): pallas batching prepends a
    # Squeezed dim, and Mosaic's last-two-dims block rule rejects a 1-D
    # SMEM operand batched to (R, k).
    *,
    n: int,
    tile_i: int,
    tile_j: int,
    max_t: int,
    zero_fill: bool,
    tail_tiles: bool = False,
):
    """Scalar-core greedy cover + pack in ONE kernel launch. The jnp
    builder's ~20 non-fusable ops (cummax/scatter/nonzero/gathers) cost
    ~106us per rebuild on v5e (measured, scripts/exp_winlist.py) — pure
    per-op overhead on tiny arrays. This is the same computation as a
    single sequential loop (~10us). Loop bounds come from SMEM so Mosaic
    treats them as dynamic and does not unroll the nested loops.

    ``tail_tiles``: see ``build_window_lists`` — emissions whose last
    active block lies < span blocks ahead go to per-width tail lists."""
    g = tile_i
    span = tile_j // g
    n_tails = span - 1 if tail_tiles and span > 1 else 0
    n_rows = 9 + 2 * n_tails
    n_b_dyn = bounds_ref[0, 1]
    max_start = n_b_dyn - span

    for c in range(4 + n_tails):
        tcounts_ref[0, c] = 0

    if zero_fill:
        def zero_body(k, carry):
            for rr in range(n_rows):
                tiles_ref[rr, k] = 0
            return carry

        jax.lax.fori_loop(0, bounds_ref[0, 0] * 0 + max_t, zero_body, 0)

    def row_body(row, carry):
        def blk(b, covered):
            f = flags_ref[0, row * n_b_dyn + b]
            trig = (f > 0) & (b >= row) & (b >= covered)

            @pl.when(trig)
            def _emit():
                s = jnp.minimum(b, max_start)
                zneed = (f & 2) != 0
                xneed = (f & 4) != 0
                width = jnp.int32(1)
                for k in range(1, span):
                    cb = b + k
                    fz = flags_ref[0, row * n_b_dyn + jnp.minimum(cb, n_b_dyn - 1)]
                    live = cb < n_b_dyn
                    zneed = zneed | (live & ((fz & 2) != 0))
                    xneed = xneed | (live & ((fz & 4) != 0))
                    if n_tails:
                        width = jnp.where(live & (fz > 0), k + 1, width)

                if n_tails:
                    # Tail emission: exact active width, start AT the
                    # block (never clamped), full-MIC masked sweep body.
                    for tw in range(1, span):
                        @pl.when(width == tw)
                        def _tail(tw=tw):
                            kt = tcounts_ref[0, 4 + tw - 1]
                            tiles_ref[9 + 2 * (tw - 1), kt] = row
                            tiles_ref[9 + 2 * (tw - 1) + 1, kt] = b
                            tcounts_ref[0, 4 + tw - 1] = kt + 1

                def _bulk():
                    needs_mask = (
                        (s * g < row * tile_i + tile_i)
                        | (s * g + tile_j > n)
                        | (row * tile_i + tile_i > n)
                        | (b > s)
                    )
                    cat = jnp.where(
                        needs_mask, 3,
                        jnp.where(zneed, 2, jnp.where(xneed, 1, 0)),
                    )
                    k0 = tcounts_ref[0, cat]
                    tiles_ref[2 * cat, k0] = row
                    tiles_ref[2 * cat + 1, k0] = s

                    # Row 8 (the masked category's jmin) must be WRITTEN
                    # for every masked visit, not only clamped ones —
                    # without zero_fill an unwritten slot is SMEM garbage
                    # and the sweep kernel reads it for every masked
                    # visit.
                    @pl.when(cat == 3)
                    def _jmin():
                        tiles_ref[8, k0] = jnp.where(b > s, b, 0)

                    tcounts_ref[0, cat] = k0 + 1

                if n_tails:
                    pl.when(width == span)(_bulk)
                else:
                    _bulk()

            return jnp.where(trig, b + span, covered)

        # Scan only the row's active block range (computed on the host
        # side from the flags matrix): the full n_b scan costs n_i*n_b
        # scalar iterations (16.9k at n_pad=16384 — the dominant rebuild
        # term), the banded scan ~n_i*run_length (~2.2k).
        jax.lax.fori_loop(
            jnp.maximum(rowspan_ref[0, row], row), rowspan_ref[1, row],
            blk, 0,
        )
        return carry

    jax.lax.fori_loop(0, bounds_ref[0, 0], row_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("n", "n_pad", "tile_i", "tile_j", "interpret",
                     "zero_fill", "tail_tiles"),
)
def build_window_lists_pallas(
    flags: jax.Array,
    n: int,
    n_pad: int,
    tile_i: int,
    tile_j: int,
    interpret: bool = False,
    zero_fill: bool = True,
    tail_tiles: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """``build_window_lists`` as one Pallas kernel (same contract; the two
    are parity-tested against each other). Use on TPU where the jnp
    version's per-op dispatch overhead dominates the rebuild.

    ``zero_fill=False`` skips zeroing the (9, max_t) output beyond the
    packed counts (9*max_t scalar SMEM writes — the dominant rebuild term
    at mid N: 51k writes at n_pad=16384). Entries past the per-category
    counts are then UNSPECIFIED; the sweep kernel never reads them (all
    its loops are count-bounded and the masked category's jmin row is
    written unconditionally), but comparisons against the jnp builder
    need zero_fill=True."""
    n_i = n_pad // tile_i
    n_b = n_pad // tile_i
    max_t = _window_max_t(n_pad, tile_i, tile_j)
    n_tails = (tile_j // tile_i) - 1 if tail_tiles else 0
    kernel = functools.partial(
        _pack_window_kernel, n=n, tile_i=tile_i, tile_j=tile_j, max_t=max_t,
        zero_fill=zero_fill, tail_tiles=tail_tiles,
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    bounds = jnp.array([[n_i, n_b]], dtype=jnp.int32)
    # Per-row active-block band: the scalar cover loop scans only
    # [max(first, row), last+1) instead of all n_b blocks.
    f2 = (flags.reshape(n_i, n_b) > 0)
    b_idx = jnp.arange(n_b, dtype=jnp.int32)[None, :]
    any_row = jnp.any(f2, axis=1)
    first = jnp.min(jnp.where(f2, b_idx, n_b), axis=1)
    last1 = jnp.max(jnp.where(f2, b_idx + 1, 0), axis=1)
    rowspan = jnp.stack([
        jnp.where(any_row, first, n_b).astype(jnp.int32),
        jnp.where(any_row, last1, 0).astype(jnp.int32),
    ])
    tiles, tcounts = pl.pallas_call(
        kernel,
        in_specs=[smem, smem, smem],
        out_specs=[smem, smem],
        out_shape=[
            jax.ShapeDtypeStruct((9 + 2 * n_tails, max_t), jnp.int32),
            jax.ShapeDtypeStruct((1, 4 + n_tails), jnp.int32),
        ],
        interpret=interpret,
    )(bounds, rowspan, flags.astype(jnp.int32).reshape(1, -1))
    return tiles, tcounts[0]


def build_window_lists(
    flags: jax.Array,
    n: int,
    n_pad: int,
    tile_i: int,
    tile_j: int,
    tail_tiles: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Greedy run-cover visit lists at ``tile_i``-granular j starts.

    ``build_tile_lists`` places the ``tile_j``-wide visits on a
    tile_j-ALIGNED grid, so covering an i-tile's z-window of ~W columns
    costs up to W + 2*tile_j candidates of quantization slack. This builder
    instead takes flags computed at (tile_i, tile_i) block granularity
    (``compute_tile_flags(..., tile_j=tile_i)``) and places each
    tile_j-wide visit at a tile_i-aligned start: per i-row, scan the active
    blocks left to right and emit a visit at the first uncovered one
    (covering span = tile_j/tile_i blocks), which tracks the z-window of
    the z-SORTED layout almost exactly (slack < tile_j per row instead of
    per run end AND start). At the flagship N=4000 geometry this cuts
    candidate slots ~6.8M -> ~4.5M and visits ~102 -> ~66.

    Starts are clamped to n_pad - tile_j so slices stay in bounds; a
    clamped visit keeps ``jmin`` = the original block index and the kernel
    masks gj >= jmin*tile_i, excluding the slice prefix that an earlier
    visit of the same row may already cover (no pair is ever double
    counted). Blocks strictly below the diagonal block never trigger a
    visit (their pairs belong to the transposed row).

    Returns (tiles (9, max_t) int32, tcounts (4,) int32): row pairs 0/1,
    2/3, 4/5, 6/7 are the i/j BLOCK indices (j in tile_i units) of the
    four visit categories keyed on the 3-bit ``compute_tile_flags``
    encoding, aggregated over each visit's covered blocks:
      0 "free"   — mask-free, no covered block needs the z or x round;
      1 "x-only" — mask-free, x round needed, z round not (in pure-z
        layouts every active tile carries the x bit, so the legacy
        "pure direct" category lands here);
      2 "full"   — mask-free, z round needed (x round kept on — a
        z-but-not-x category is too rare for a fifth kernel body);
      3 "masked" — diagonal-crossing / padding / clamped visits (full
        MIC + masks).
    Row 8 is the masked category's jmin block index (0 for the other rows
    and for ordinary masked visits). Entries past the counts are zero.

    ``tail_tiles``: emit each cover's LAST visit at its exact active width
    instead of the full ``tile_j`` when fewer than span blocks remain
    active — the trailing (span - w) blocks of a full-width tail are pure
    pair-math waste (measured 46.4 us/step of 394 at N=16384 slab,
    scripts/exp_tailwaste.py; only 3.4 us at N=4000 where runs are long).
    Tail visits land in per-width lists: rows 9 + 2*(w-1) / +1 hold the
    i/j block indices of width-w tails (w in 1..span-1), counts at
    tcounts[4 + w - 1]; the sweep kernel runs them through a full-MIC
    masked body (no category specialization — tails are a small slot
    fraction). Returns shapes ((9 + 2*(span-1), max_t), (4 + span-1,))."""
    g = tile_i
    span = tile_j // g
    n_i = n_pad // tile_i
    n_b = n_pad // g
    f2 = flags.reshape(n_i, n_b)
    it = jnp.arange(n_i)[:, None]
    b_idx = jnp.arange(n_b)[None, :]
    # Active blocks at/above the diagonal block trigger coverage (the
    # diagonal block itself is always active: zero self-gap).
    trigger = (f2 > 0) & (b_idx >= it)
    max_start = n_b - span

    # Closed-form cover (a sequential greedy scan over blocks costs ~3us
    # of op LATENCY per step on TPU — ~96us per rebuild, measured): group
    # active blocks into clusters (consecutive active blocks < span
    # apart), emit visits on the stride-span grid anchored at each
    # cluster's first block. Cluster coverage never reaches the next
    # cluster (its last emission is at an active block, and the next
    # cluster starts >= span after that), so visits of different clusters
    # are disjoint; stride positions within a cluster are disjoint by
    # construction — every active block is covered exactly once.
    if span > 1:
        behind = [
            jnp.pad(trigger, ((0, 0), (k, 0)))[:, :n_b]
            for k in range(1, span)
        ]
        cstart = trigger & ~jnp.stack(behind).any(axis=0)
    else:
        cstart = trigger  # span 1: every active block is its own emission
    # most recent cluster start at/below b (valid wherever trigger holds)
    scs = jax.lax.cummax(jnp.where(cstart, b_idx, -1), axis=1)
    ep = b_idx - jnp.where(trigger, (b_idx - scs) % span, 0)
    ep = jnp.clip(ep, 0, n_b - 1)
    rows2d = jnp.broadcast_to(it, (n_i, n_b))
    emit = (
        jnp.zeros((n_i, n_b), bool).at[rows2d, ep].max(trigger)
    )                                                   # (n_i, n_b) at ORIG b
    starts = jnp.minimum(b_idx, max_start) * jnp.ones((n_i, 1), jnp.int32)
    origs = b_idx * jnp.ones((n_i, 1), jnp.int32)

    # Effective coverage of an emission at b is [b, min(b+span, n_b)) (the
    # jmin mask excludes [start, b)); a visit needs an axis's MIC round iff
    # any covered block has that axis's round bit.
    def windowed_any(bit):
        bb = (f2 & bit) != 0
        bbp = jnp.concatenate(
            [bb, jnp.zeros((n_i, span - 1), dtype=bb.dtype)], axis=1
        )
        return jnp.stack(
            [bbp[:, k:k + n_b] for k in range(span)], axis=0
        ).any(axis=0)

    zneed = windowed_any(2)
    xneed = windowed_any(4)

    if tail_tiles and span > 1:
        # Exact cover width at each emission: 1 + the offset of the LAST
        # active block within the span window (blocks past it are pure
        # waste; blocks before it inside the window stay covered even if
        # inactive — same semantics as the full-width cover).
        shifted = jnp.stack([
            jnp.pad(trigger, ((0, 0), (0, k)))[:, k:k + n_b] * (k + 1)
            for k in range(span)
        ])
        width = shifted.max(axis=0)  # (n_i, n_b); >= 1 wherever emit holds
        is_tail = emit & (width < span)
        emit_bulk = emit & ~is_tail
    else:
        is_tail = jnp.zeros_like(emit)
        emit_bulk = emit

    i_lo = it * tile_i
    s_lo = starts * g
    needs_mask = (
        (s_lo < i_lo + tile_i)          # diagonal inside the slice
        | (s_lo + tile_j > n)           # padding columns inside the slice
        | (i_lo + tile_i > n)           # padding rows
        | (origs > starts)              # clamped: jmin prefix mask active
    )
    maskd = emit_bulk & needs_mask
    pure = emit_bulk & ~needs_mask
    cat_free = pure & ~zneed & ~xneed
    cat_x = pure & ~zneed & xneed
    cat_full = pure & zneed

    max_t = _window_max_t(n_pad, tile_i, tile_j)

    def pack(m, *vals):
        idx = jnp.nonzero(m.ravel(), size=max_t, fill_value=0)[0]
        packed = tuple(v.ravel()[idx].astype(jnp.int32) for v in vals)
        return packed + (m.sum().astype(jnp.int32),)

    rows = jnp.broadcast_to(it, (n_i, n_b))
    ai, aj, na = pack(cat_free, rows, starts)
    xi, xj, nx = pack(cat_x, rows, starts)
    wi, wj, nw = pack(cat_full, rows, starts)
    mi, mj, mjmin, nm = pack(maskd, rows, starts, origs)
    # A clamped visit's jmin prefix is pure slack; zero jmin (== "no
    # prefix mask") for unclamped masked visits keeps the mask a no-op.
    mjmin = jnp.where(mjmin > mj, mjmin, 0)
    tile_rows = [ai, aj, xi, xj, wi, wj, mi, mj, mjmin]
    counts = [na, nx, nw, nm]
    if tail_tiles and span > 1:
        for w in range(1, span):
            # Tail visits start AT the block (never clamped: b + w <= n_b).
            twi, twj, ntw = pack(is_tail & (width == w), rows, origs)
            tile_rows += [twi, twj]
            counts.append(ntw)
    return jnp.stack(tile_rows), jnp.stack(counts)


def _fused_dense_list_kernel(
    tcounts_ref,  # SMEM (1, 4 + n_tails) int32: visit count per category
    tiles_ref,    # SMEM (6 or 9, max_t) int32: i/j block indices per category
    *args,        # ins (3 or 5), outs (3 or 5), f_acc scratch
    n: int,
    tile_i: int,
    tile_j: int,
    box_length: float,
    inv_box_length: float,
    rc_square: float,
    dt: float,
    n_steps: int,
    approx_reciprocal: bool,
    extended: bool = False,
    dual_acc: bool = True,
    j_granule: int | None = None,
    mxu_reduce: bool = False,
    n_tails: int = 0,
    trans_acc: bool = False,
    obs_last: bool = False,
):
    jg = tile_j if j_granule is None else j_granule
    has_jmin = j_granule is not None
    assert n_tails == 0 or has_jmin, "tail lists require the window contract"
    n_state = 5 if extended else 3
    ins = args[:n_state]
    outs = args[n_state:2 * n_state]
    # obs_last: one extra (8, n_pad) output after the state outs — the
    # FINAL step's sweep also accumulates the per-particle e/du/ddu
    # partials into its rows 3..5 (the per-step sweep row contract,
    # pallas_lj._lj_tri_kernel), so a sampled cycle needs no separate
    # observable sweep. Rows 0..2 double as the second obs accumulator
    # of the dual-RMW-chain scheme (folded + zeroed at step end).
    obs_out = args[2 * n_state] if obs_last else None
    sc = args[2 * n_state + (1 if obs_last else 0):]
    f_acc = sc[0]
    f_acc2 = sc[1]
    # Transposed i-side accumulators (see fused_dense_chunk_list doc):
    # (n_pad, 8) scratches, components in lanes 0..2.
    fT_acc = sc[2] if trans_acc else None
    fT_acc2 = sc[3] if trans_acc else None
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

    # Loop-invariant mask geometry, hoisted out of the visit loops: the
    # masked category's rank/padding tests reduce to broadcast compares
    # against these instead of materializing two fresh (tile_i, tile_j)
    # iotas + adds per visit (~61% of flagship visits are masked —
    # diagonal + padding — so the per-pair mask cost is on the hot path).
    dmat = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_i, tile_j), 1)
        - jax.lax.broadcasted_iota(jnp.int32, (tile_i, tile_j), 0)
    )
    jrow = jax.lax.broadcasted_iota(jnp.int32, (1, tile_j), 1)
    icol = jax.lax.broadcasted_iota(jnp.int32, (tile_i, 1), 0)

    def _comp_add(x_ref, c_ref, delta):
        """Neumaier-compensated x_ref += delta (see _fused_dense_kernel)."""
        x = x_ref[:, :]
        y = delta + c_ref[:, :]
        t = x + y
        big_x = jnp.abs(x) >= jnp.abs(y)
        c_ref[:, :] = jnp.where(big_x, (x - t) + y, (y - t) + x)
        x_ref[:, :] = t

    def step_body(_s, carry, want_obs=False):
        if extended:
            delta = (v_out[:, :] + vc_out[:, :]) * dt + a_out[:, :] * half_dt_sq
            _comp_add(r_out, rlo_out, delta)
            _comp_add(v_out, vc_out, a_out[:, :] * half_dt)
        else:
            r_out[:, :] = r_out[:, :] + v_out[:, :] * dt + a_out[:, :] * half_dt_sq
            v_out[:, :] = v_out[:, :] + a_out[:, :] * half_dt
        f_acc[:, :] = jnp.zeros_like(f_acc)
        f_acc2[:, :] = jnp.zeros_like(f_acc2)
        if want_obs:
            obs_out[:, :] = jnp.zeros_like(obs_out)
        if trans_acc:
            zcol = jnp.zeros((fT_acc.shape[0], 3), fT_acc.dtype)
            fT_acc[:, 0:3] = zcol
            fT_acc2[:, 0:3] = zcol

        def visit(row, t, masked, fa, faT=None, mic_z=True, mic_x=True,
                  width=tile_j, use_jmin=False, orow=None):
            """One (i,j) tile visit accumulating into ``fa``. ``mic_z=False``
            / ``mic_x=False`` skip that axis's minimum-image round() — valid
            only for visit categories whose covered blocks all lack the
            axis's round bit (no wrapped image within the window, no face
            -crossing hazard; see compute_tile_flags). ``width`` (static,
            a multiple of tile_i) is the j-slice width — tail visits
            (exact-width cover ends, see build_window_lists) use
            width < tile_j."""
            i_lo = tiles_ref[row, t] * tile_i
            j_lo = tiles_ref[row + 1, t] * jg
            isl = pl.ds(i_lo, tile_i)
            jsl = pl.ds(j_lo, width)
            xi = r_out[0, isl].reshape(tile_i, 1)
            yi = r_out[1, isl].reshape(tile_i, 1)
            zi = r_out[2, isl].reshape(tile_i, 1)
            xj = r_out[0, jsl].reshape(1, width)
            yj = r_out[1, jsl].reshape(1, width)
            zj = r_out[2, jsl].reshape(1, width)
            dx = xi - xj
            dy = yi - yj
            dz = zi - zj
            if extended:
                # Two-float pair-displacement correction (restores the
                # sub-ulp position bits, see _fused_dense_kernel doc).
                dx = dx + (rlo_out[0, isl].reshape(tile_i, 1)
                           - rlo_out[0, jsl].reshape(1, width))
                dy = dy + (rlo_out[1, isl].reshape(tile_i, 1)
                           - rlo_out[1, jsl].reshape(1, width))
                dz = dz + (rlo_out[2, isl].reshape(tile_i, 1)
                           - rlo_out[2, jsl].reshape(1, width))
            if mic_x:
                dx = dx - L * jnp.round(dx * inv_l)
            dy = dy - L * jnp.round(dy * inv_l)
            if mic_z:
                dz = dz - L * jnp.round(dz * inv_l)
            r2 = dx * dx + dy * dy + dz * dz
            mask = r2 < rc_square
            if masked:
                # Rank + padding masks; both are no-ops on tiles that
                # don't need them, so one body covers all cases. All four
                # tests are broadcast compares against the hoisted iota
                # geometry: gj > gi <=> dmat > i_lo - j_lo, etc.
                mask = (
                    mask
                    & (dmat[:, :width] > i_lo - j_lo)
                    & (jrow[:, :width] < n - j_lo)
                    & (icol < n - i_lo)
                )
                if use_jmin:
                    # Window-list clamped visits: exclude the slice prefix
                    # already covered by an earlier visit of this i-row
                    # (jmin == 0 for ordinary masked visits -> no-op).
                    mask = mask & (jrow[:, :width] >= tiles_ref[8, t] * jg - j_lo)
            want = orow is not None
            coef, du_p, e_p, ddu_p = lj_pair_terms(
                r2, mask, approx_reciprocal, want_observables=want
            )
            if want:
                # Pair-once e/du/ddu partials, i-side (the tri-sweep row
                # contract: row+0 = e, row+1 = du, row+2 = ddu). ``orow``
                # selects the accumulator bank inside obs_out (3 = rows
                # 3..5, 0 = rows 0..2): visits alternate banks with the
                # force dual-accumulator scheme so the obs RMW chain does
                # not serialize the final sweep; banks fold at step end.
                obs_out[orow + 0, isl] += jnp.sum(e_p, axis=1)
                obs_out[orow + 1, isl] += jnp.sum(du_p, axis=1)
                obs_out[orow + 2, isl] += jnp.sum(ddu_p, axis=1)
            fx = coef * dx
            fy = coef * dy
            fz = coef * dz
            if mxu_reduce:
                # Route the row/column force sums through the MXU (ones-
                # vector matmuls) instead of VPU cross-lane reduction
                # trees; the MXU is otherwise idle in this kernel.
                # Numerically exact vs jnp.sum: the bf16x3 f32-matmul
                # splits each f32 operand exactly (3x8 mantissa bits) and
                # 1.0 is exact in bf16, so products and the f32
                # accumulation match the VPU reduction bit-for-bit up to
                # summation order.
                dtt = fx.dtype
                ones_j = jnp.ones((width, 8), dtt)
                ones_i = jnp.ones((8, tile_i), dtt)
                si = jax.lax.dot_general(
                    fx, ones_j, (((1,), (0,)), ((), ())),
                    preferred_element_type=dtt,
                )
                sy = jax.lax.dot_general(
                    fy, ones_j, (((1,), (0,)), ((), ())),
                    preferred_element_type=dtt,
                )
                sz = jax.lax.dot_general(
                    fz, ones_j, (((1,), (0,)), ((), ())),
                    preferred_element_type=dtt,
                )
                fa[0, isl] += si[:, 0]
                fa[1, isl] += sy[:, 0]
                fa[2, isl] += sz[:, 0]
                tx = jax.lax.dot_general(
                    ones_i, fx, (((1,), (0,)), ((), ())),
                    preferred_element_type=dtt,
                )
                ty = jax.lax.dot_general(
                    ones_i, fy, (((1,), (0,)), ((), ())),
                    preferred_element_type=dtt,
                )
                tz = jax.lax.dot_general(
                    ones_i, fz, (((1,), (0,)), ((), ())),
                    preferred_element_type=dtt,
                )
                fa[0, jsl] -= tx[0, :]
                fa[1, jsl] -= ty[0, :]
                fa[2, jsl] -= tz[0, :]
            elif faT is not None:
                # Transposed i-side accumulation: the cross-lane reduction
                # of (tile_i, width) along lanes yields a SUBLANE-major
                # (tile_i, 1) vector; accumulating it into the (n_pad, 8)
                # transposed scratch keeps it sublane-major — no per-visit
                # sublane->lane relayout on the RMW dependency chain (the
                # dominant per-visit cost, docs/RESULTS.md round-3
                # accounting). One (n_pad, 8) -> (8, n_pad) transpose per
                # step folds it back (see step end).
                iT = pl.ds(i_lo, tile_i)
                faT[iT, 0:1] += jnp.sum(fx, axis=1, keepdims=True)
                faT[iT, 1:2] += jnp.sum(fy, axis=1, keepdims=True)
                faT[iT, 2:3] += jnp.sum(fz, axis=1, keepdims=True)
                fa[0, jsl] -= jnp.sum(fx, axis=0)
                fa[1, jsl] -= jnp.sum(fy, axis=0)
                fa[2, jsl] -= jnp.sum(fz, axis=0)
            else:
                fa[0, isl] += jnp.sum(fx, axis=1)
                fa[1, isl] += jnp.sum(fy, axis=1)
                fa[2, isl] += jnp.sum(fz, axis=1)
                fa[0, jsl] -= jnp.sum(fx, axis=0)
                fa[1, jsl] -= jnp.sum(fy, axis=0)
                fa[2, jsl] -= jnp.sum(fz, axis=0)

        # 2-way unrolled visit loops with INDEPENDENT accumulators: the
        # f_acc read-modify-write is the per-visit serial dependency, and
        # alternating two scratch buffers lets Mosaic overlap visit t+1's
        # pair math with visit t's accumulation (measured on v5e,
        # scripts/exp_layout.py K4: 951 -> 439 ns/visit at (128,512)).
        # Category tuples: (tiles row, masks on, z round on, x round on).
        # Window lists (has_jmin) carry the 4-category slab-aware contract;
        # legacy tile lists the 3-category z-only one (x round always on).
        if has_jmin:
            categories = (
                (0, False, False, False),
                (2, False, False, True),
                (4, False, True, True),
                (6, True, True, True),
            )
        else:
            categories = (
                (0, False, False, True),
                (2, False, True, True),
                (4, True, True, True),
            )
        # Tail lists (exact-width cover ends): rows 9 + 2*(w-1), counts at
        # tcounts[4 + w - 1], run through the full-MIC masked body at
        # width w*tile_i (see build_window_lists tail_tiles).
        tail_rows = tuple(
            (9 + 2 * (w - 1), 4 + w - 1, w * tile_i)
            for w in range(1, n_tails + 1)
        )
        if dual_acc:
            def make_pair_body(row, masked, mic_z, mic_x, width, use_jmin):
                def body(t, c2):
                    visit(row, 2 * t, masked, f_acc, fT_acc, mic_z, mic_x,
                          width=width, use_jmin=use_jmin,
                          orow=3 if want_obs else None)
                    visit(row, 2 * t + 1, masked, f_acc2, fT_acc2, mic_z,
                          mic_x, width=width, use_jmin=use_jmin,
                          orow=0 if want_obs else None)
                    return c2

                return body

            def run_dual(row, cidx, masked, mic_z, mic_x, width, use_jmin):
                cnt = tcounts_ref[0, cidx]
                jax.lax.fori_loop(
                    0, cnt // 2,
                    make_pair_body(row, masked, mic_z, mic_x, width,
                                   use_jmin), 0,
                )

                @pl.when(cnt % 2 == 1)
                def _odd_tail():
                    visit(row, cnt - 1, masked, f_acc, fT_acc, mic_z, mic_x,
                          width=width, use_jmin=use_jmin,
                          orow=3 if want_obs else None)

            for row, masked, mic_z, mic_x in categories:
                run_dual(row, row // 2, masked, mic_z, mic_x, tile_j,
                         masked and has_jmin)
            for row, cidx, width in tail_rows:
                run_dual(row, cidx, True, True, True, width, False)

            tot = f_acc[:, :] + f_acc2[:, :]
            if trans_acc:
                tot = tot + (fT_acc[:, :] + fT_acc2[:, :]).T
            a_out[:, :] = 24.0 * tot
        else:
            def make_body(row, masked, mic_z, mic_x, width, use_jmin):
                def body(t, c2):
                    visit(row, t, masked, f_acc, fT_acc, mic_z, mic_x,
                          width=width, use_jmin=use_jmin,
                          orow=3 if want_obs else None)
                    return c2

                return body

            for row, masked, mic_z, mic_x in categories:
                jax.lax.fori_loop(
                    0, tcounts_ref[0, row // 2],
                    make_body(row, masked, mic_z, mic_x, tile_j,
                              masked and has_jmin), 0,
                )
            for row, cidx, width in tail_rows:
                jax.lax.fori_loop(
                    0, tcounts_ref[0, cidx],
                    make_body(row, True, True, True, width, False), 0,
                )
            tot = f_acc[:, :]
            if trans_acc:
                tot = tot + fT_acc[:, :].T
            a_out[:, :] = 24.0 * tot
        if want_obs:
            # Fold the second obs bank (rows 0..2) into the contract rows
            # 3..5, then zero the scratch bank so obs_out leaves the kernel
            # in the per-step sweep layout (rows 0..2 unused).
            obs_out[3:6, :] = obs_out[3:6, :] + obs_out[0:3, :]
            obs_out[0:3, :] = jnp.zeros_like(obs_out[0:3, :])
        if extended:
            _comp_add(v_out, vc_out, a_out[:, :] * half_dt)
        else:
            v_out[:, :] = v_out[:, :] + a_out[:, :] * half_dt
        return carry

    if obs_last:
        # The final step is statically expanded with the obs-accumulating
        # visit bodies; the first n_steps-1 run the plain force-only body.
        if n_steps > 1:
            jax.lax.fori_loop(0, n_steps - 1, step_body, 0)
        step_body(0, 0, want_obs=True)
    else:
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
        "dual_acc",
        "j_granule",
        "mxu_reduce",
        "trans_acc",
        "obs_last",
    ),
)
def fused_dense_chunk_list(
    r: jax.Array,
    v: jax.Array,
    a: jax.Array,
    tiles: jax.Array,
    tcounts: jax.Array,
    n: int,
    box_length: float,
    rc_square: float,
    dt: float,
    n_steps: int,
    tile_i: int = 128,
    tile_j: int = 512,
    interpret: bool = False,
    approx_reciprocal: bool = True,
    r_lo: jax.Array | None = None,
    vc: jax.Array | None = None,
    dual_acc: bool = True,
    j_granule: int | None = None,
    mxu_reduce: bool = False,
    trans_acc: bool = False,
    obs_last: bool = False,
) -> tuple[jax.Array, ...]:
    """``fused_dense_chunk_flags`` with the active tiles given as a compact
    LIST (from ``build_tile_lists``) instead of a per-tile flag sweep —
    removes the unrolled-region code-footprint floor (see module comment).
    Same contracts as ``fused_dense_chunk``: no wrap inside the chunk,
    outputs (r, v, a), ``a`` 24-prefactored. Passing ``r_lo``/``vc`` enables
    the extended two-float-precision mode (fused_dense_chunk_ext semantics);
    the return is then (r, r_lo, v, vc, a).

    ``j_granule``: j entries of ``tiles`` are in units of this many columns
    (from ``build_window_lists``; tiles is then the 4-category (9, max_t)
    layout with jmin in row 8 and tile_i-granular starts). None = tile_j
    units (build_tile_lists' 3-category (6, max_t) layout).

    ``trans_acc``: accumulate the i-side force sums in TRANSPOSED
    (n_pad, 8) scratches so the per-visit cross-lane reduction result
    ((tile_i, 1), sublane-major) is accumulated without a sublane->lane
    relayout — the relayout sat on the f_acc RMW dependency chain and was
    the dominant per-visit overhead (round-3 accounting,
    docs/RESULTS.md). One (n_pad, 8) transpose per step folds the i sums
    back into row layout. Costs 2 x n_pad x 128 x 4 bytes of VMEM
    (physical lane padding), so it is for small/mid n_pad only; summation
    ORDER differs from the lane-layout path (i and j contributions fold
    at step end instead of interleaving), so results are equivalent but
    not bit-identical.

    ``obs_last``: the FINAL step's sweep also accumulates the pair-once
    per-particle e/du/ddu partials (rows 3..5 of one extra (8, n_pad)
    output appended to the return tuple, the per-step tri-sweep row
    contract) — a sampled production cycle then needs no separate
    observable sweep program (measured +32 us/bstep at config-4 scale,
    scripts/exp_ens_attrib2.py). Force rows and the trajectory are
    bit-identical to obs_last=False (the obs accumulation adds
    instructions but reuses the same force arithmetic)."""
    if n_steps > MAX_CHUNK_STEPS:
        raise ValueError(f"n_steps={n_steps} exceeds MAX_CHUNK_STEPS={MAX_CHUNK_STEPS}")
    if trans_acc and mxu_reduce:
        raise ValueError("trans_acc and mxu_reduce are mutually exclusive")
    extended = r_lo is not None
    n_pad = r.shape[1]
    # Tail lists are present iff the builder emitted the extended row
    # layout (window contract only): rows 9 + 2*(span-1).
    n_tails = (tiles.shape[0] - 9) // 2 if j_granule is not None else 0
    kernel = functools.partial(
        _fused_dense_list_kernel,
        n=n,
        tile_i=tile_i,
        tile_j=tile_j,
        box_length=float(box_length),
        inv_box_length=1.0 / float(box_length),
        rc_square=float(rc_square),
        dt=float(dt),
        n_steps=n_steps,
        approx_reciprocal=approx_reciprocal and not interpret,
        extended=extended,
        dual_acc=dual_acc,
        j_granule=j_granule,
        mxu_reduce=mxu_reduce,
        n_tails=n_tails,
        trans_acc=trans_acc,
        obs_last=obs_last,
    )
    n_state = 5 if extended else 3
    n_out = n_state + (1 if obs_last else 0)
    out_shape = [jax.ShapeDtypeStruct((8, n_pad), r.dtype)] * n_out
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    pairs_per_step = n_pad * n_pad // 2
    # leading dummy axis on the 1-D counts: batch-legal under vmap (see
    # _pack_window_kernel note)
    tcounts2 = tcounts.reshape(1, -1)
    ins = (tcounts2, tiles, r, r_lo, v, vc, a) if extended else (tcounts2, tiles, r, v, a)
    scratch = [pltpu.VMEM((8, n_pad), r.dtype)] * 2
    if trans_acc:
        scratch += [pltpu.VMEM((n_pad, 8), r.dtype)] * 2
    return tuple(
        pl.pallas_call(
            kernel,
            in_specs=[smem, smem] + [vmem] * n_state,
            out_specs=[vmem] * n_out,
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=int((26 if extended else 20) * pairs_per_step) * n_steps,
                bytes_accessed=int(4 * 8 * n_pad * (2 * n_state + 1)),
                transcendentals=0,
            ),
        )(*ins)
    )
