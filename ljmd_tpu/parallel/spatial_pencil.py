"""Particle-axis sharding of the STRUCTURED pencil engine.

VERDICT round-2 item 3b: the rect/ring spatial layer (``parallel/spatial.py``)
does O(N²/d) work per chip — fine for mid N, wrong asymptotics for BASELINE
config 5 (N=65536). This module shards the pencil (cell-column) engine over
the mesh's particle axis so per-chip pair work is O(N/d + halo):

- The global slot array (8, n_slots) is laid out x-major (pencil
  p = ix * m + iy, slots p*cap..), so sharding the slot axis into ``d`` equal
  pieces gives each device a contiguous strip of ``m/d`` pencil x-columns.
- The half-shell sweep needs the +x neighbor column only (offsets (0,1),
  (1,-1), (1,0), (1,1) — ``ops/pallas_pencil2.build_half_shell_tables``), so
  each device ``ppermute``-receives ONE halo strip (the next device's first
  x-column, m pencils) over ICI, computes pair-once forces for its local
  pencils (self-triangular + 4 neighbors, full 3-axis MIC so no image-shift
  tables are needed), and ``ppermute``s the halo reaction forces back.
  Scalar observables are ``psum``-reduced.
- Integration, the displacement-triggered rebin, and bookkeeping run on the
  GLOBAL sharded arrays with plain jnp — XLA partitions the elementwise work;
  only the force sweep is an explicit ``shard_map``.

Scaling caveat (documented, deliberate): the rebin itself is a global
packed sort + gather (O(N log N) with cross-device traffic), amortized over the
~10-16 step rebin cadence; the per-step sweep is the O(N/d + halo) part. The
local sweep is vectorized jnp over (pencils, cap, cap) blocks — on TPU the
XLA fusion of these dense blocks is decent but not Pallas-grade; this path's
purpose is the multi-chip decomposition (validated on the virtual CPU mesh —
real multi-chip hardware is not available in this environment).

Precision: follows the effective-dtype policy with Neumaier compensation at
f32 dt <= 1e-3, like every single-chip engine (commit 72192a8's invariant).

Reference anchor: this replaces the serial ensemble loop of
``run_many_md_simuations/run_many_md.f90:57-82`` with a spatial decomposition
the reference never had (SURVEY §5.7/§5.8 design).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ljmd_tpu.config import SimConfig
from ljmd_tpu.models.engine import Engine, _comp_add, _effective_dtype
from ljmd_tpu.ops.cell_list import bin_to_slots, make_pencil_grid, rebin_gather
from ljmd_tpu.ops.geometry import minimum_image, wrap_positions
from ljmd_tpu.ops.lj import _pair_terms, tail_corrections
from ljmd_tpu.parallel.mesh import PARTICLE_AXIS
from ljmd_tpu.state import MDState, StepObs

__all__ = ["ShardedPencilCarry", "make_sharded_pencil_engine"]

_HALF_SHELL = ((0, 1), (1, -1), (1, 0), (1, 1))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedPencilCarry:
    """Slot-layout carry, every array (8, n_slots) sharded on the slot axis.
    Rows 0..2 = x/y/z; in ``r`` row 3 = validity, row 4 = particle id.
    ``r_ref``: positions at the last rebin (displacement criterion);
    ``rc``/``vc``: Neumaier compensation terms (zeros when off);
    ``overflow``: sticky capacity/displacement diagnostic."""

    r: jax.Array
    ru: jax.Array
    v: jax.Array
    a: jax.Array
    r_ref: jax.Array
    rc: jax.Array
    vc: jax.Array
    overflow: jax.Array


def _local_half_shell_table(m: int, m_xl: int) -> np.ndarray:
    """(P_loc, 4) int32 neighbor ids in the LOCAL augmented pencil space:
    local pencils 0..P_loc-1 (p = lx * m + iy), halo column pencils
    P_loc..P_loc+m-1 (the next device's first x-column). Identical on every
    device — the x-major strip layout is translation invariant, and full
    3-axis MIC in the sweep removes any need for device-specific image
    shifts."""
    p_loc = m_xl * m
    tbl = np.empty((p_loc, 4), dtype=np.int32)
    for lx in range(m_xl):
        for iy in range(m):
            p = lx * m + iy
            for k, (dx, dy) in enumerate(_HALF_SHELL):
                gy = (iy + dy) % m
                gx = lx + dx
                tbl[p, k] = gx * m + gy if gx < m_xl else p_loc + gy
    return tbl


def make_sharded_pencil_engine(
    cfg: SimConfig,
    mesh: Mesh,
    axis: str = PARTICLE_AXIS,
    compensated: bool | None = None,
) -> Engine:
    """Engine with the pencil pair sweep sharded over ``mesh``'s ``axis``.

    Requires the pencil grid's x-column count to be divisible by the axis
    size (m_xy % d == 0). Works for d == 1 as well (the halo is the device's
    own first column — the torus closes on itself)."""
    d = mesh.shape[axis]
    L = cfg.box_length
    skin = cfg.neighbor_skin
    r_list = cfg.rc + skin
    grid = make_pencil_grid(cfg.n, L, r_list, cfg.density, cfg.neighbor_capacity)
    m = grid.m_xy
    if m % d != 0:
        raise ValueError(
            f"pencil grid {m}x{m} does not split over {d} devices "
            "(m_xy % d != 0); choose a divisor axis size"
        )
    m_xl = m // d
    p_loc = m_xl * m
    cap = grid.capacity
    ns = grid.n_slots
    n = cfg.n
    dtype = _effective_dtype(cfg)
    if compensated is None:
        compensated = (cfg.compensated_sum or cfg.dt <= 1.0e-3) and dtype == jnp.float32
    tbl = jnp.asarray(_local_half_shell_table(m, m_xl))

    e_t, d_t, dd_t = (
        tail_corrections(n, cfg.volume, cfg.rc)
        if cfg.use_tail_corrections
        else (0.0, 0.0, 0.0)
    )
    row_mask = jnp.zeros((8, 1), dtype).at[0:3].set(1.0)
    xyz_mask = row_mask
    slot_spec = P(None, axis)
    perm_fwd = [(s, (s - 1) % d) for s in range(d)]   # first strip -> prev dev
    perm_back = [(s, (s + 1) % d) for s in range(d)]  # halo reactions return

    rc_sq = jnp.asarray(cfg.rc_square, dtype)

    def _pair_block(ri, vi, rj, vj, tri: bool, want_obs: bool):
        """Pair-once partials between (P, cap, 3) i-blocks and j-blocks.
        Returns (f_i (P,cap,3), f_j (P,cap,3), e, du, ddu scalars)."""
        dxyz = ri[:, :, None, :] - rj[:, None, :, :]
        dxyz = minimum_image(dxyz, L)
        r2 = jnp.sum(dxyz * dxyz, axis=-1)
        mask = (r2 < rc_sq) & (vi[:, :, None] > 0.5) & (vj[:, None, :] > 0.5)
        if tri:
            rank = jnp.arange(cap)
            mask = mask & (rank[None, :, None] < rank[None, None, :])
        pair_e, du_r, pair_ddu, inv_r2 = _pair_terms(r2, mask, dtype)
        coef = (-du_r * inv_r2)[..., None]
        f_pairs = coef * dxyz
        f_i = jnp.sum(f_pairs, axis=2)
        f_j = -jnp.sum(f_pairs, axis=1)
        if want_obs:
            return f_i, f_j, jnp.sum(pair_e), jnp.sum(du_r), jnp.sum(pair_ddu)
        z = jnp.zeros((), dtype)
        return f_i, f_j, z, z, z

    def _sweep_local(r_loc, want_obs: bool):
        """shard_map body: local (8, p_loc*cap) slots -> (forces, e, du, ddu
        partial sums). Halo = next device's first x-column strip."""
        halo = lax.ppermute(r_loc[:, : m * cap], axis, perm_fwd)
        r_aug = jnp.concatenate([r_loc, halo], axis=1)
        p_aug = p_loc + m
        pos = jnp.stack(
            [r_aug[0], r_aug[1], r_aug[2]], axis=-1
        ).reshape(p_aug, cap, 3)
        valid = r_aug[3].reshape(p_aug, cap)

        ri = pos[:p_loc]
        vi = valid[:p_loc]
        f_aug = jnp.zeros((p_aug, cap, 3), dtype)
        e = jnp.zeros((), dtype)
        du = jnp.zeros((), dtype)
        ddu = jnp.zeros((), dtype)

        # self pencil: slot-triangular (each in-pencil pair once)
        f_i, f_j, e_b, du_b, ddu_b = _pair_block(ri, vi, ri, vi, True, want_obs)
        f_aug = f_aug.at[:p_loc].add(f_i + f_j)
        e, du, ddu = e + e_b, du + du_b, ddu + ddu_b

        # 4 upper half-shell neighbors (pair-once by construction)
        for k in range(4):
            nbr = tbl[:, k]
            f_i, f_j, e_b, du_b, ddu_b = _pair_block(
                ri, vi, pos[nbr], valid[nbr], False, want_obs
            )
            f_aug = f_aug.at[:p_loc].add(f_i)
            f_aug = f_aug.at[nbr].add(f_j)
            e, du, ddu = e + e_b, du + du_b, ddu + ddu_b

        # reactions accumulated on the halo strip go home (reverse ring hop)
        f_halo_home = lax.ppermute(f_aug[p_loc:], axis, perm_back)
        f_loc = f_aug[:p_loc].at[:m].add(f_halo_home)

        f_rows = jnp.zeros((8, p_loc * cap), dtype)
        f_rows = f_rows.at[0:3].set(
            f_loc.reshape(p_loc * cap, 3).T
        )
        return f_rows, lax.psum(e, axis), lax.psum(du, axis), lax.psum(ddu, axis)

    sweep = {}
    for wo in (False, True):
        sweep[wo] = shard_map(
            partial(_sweep_local, want_obs=wo),
            mesh=mesh,
            in_specs=(slot_spec,),
            out_specs=(slot_spec, P(), P(), P()),
            check_vma=False,
        )

    def _force_obs(r8, want_obs: bool):
        f_rows, e, du, ddu = sweep[want_obs](r8)
        a8 = 24.0 * f_rows * row_mask
        obs_part = (
            4.0 * e + jnp.asarray(e_t, dtype),
            24.0 * du + jnp.asarray(d_t, dtype),
            24.0 * ddu + jnp.asarray(dd_t, dtype),
        )
        return a8, obs_part

    def _shard(x):
        return jax.device_put(x, NamedSharding(mesh, slot_spec))

    def _scatter_rows(arr_particles, slot):
        out = jnp.zeros((8, ns + 1), dtype)
        out = out.at[0:3, slot].set(arr_particles.T.astype(dtype))
        return out[:, :ns]

    def init(state: MDState):
        slot, overflow = bin_to_slots(state.r, grid)
        r8 = _scatter_rows(state.r, slot)
        valid = jnp.zeros((ns + 1,), dtype).at[slot].set(1.0)[:ns]
        ids = jnp.full((ns + 1,), 0.0, dtype).at[slot].set(
            jnp.arange(n, dtype=dtype)
        )[:ns]
        r8 = r8.at[3, :].set(valid).at[4, :].set(ids)
        ru8 = _scatter_rows(state.ru, slot)
        v8 = _scatter_rows(state.v, slot)
        r8, ru8, v8 = _shard(r8), _shard(ru8), _shard(v8)
        a8, (epot, d_epot, dd_epot) = _force_obs(r8, True)
        ekin = 0.5 * jnp.sum(v8 * v8)
        zero = jnp.zeros_like(r8)
        carry = ShardedPencilCarry(
            r=r8, ru=ru8, v=v8, a=a8, r_ref=r8, rc=zero, vc=zero,
            overflow=overflow,
        )
        return carry, StepObs(epot=epot, ekin=ekin, d_epot=d_epot, dd_epot=dd_epot)

    dt = cfg.dt
    half_dt = 0.5 * cfg.dt
    half_dt_sq = 0.5 * cfg.dt * cfg.dt
    rebuild_thresh = (0.5 * skin) ** 2

    def _rebin(args):
        # Gather-form slot permutation (rebin_gather): XLA's scatter lowering
        # blows up super-linearly at big ns on v5e (exp_permute, 2026-08-18)
        # while the equivalent gather stays ~linear. Only the data-carrying
        # rows ride the gather — r8 rows 0..2 + ids row 4, 3 rows of each
        # other array; validity is rebuilt from ``valid_new`` and rows 5..7
        # are identically zero in this engine (no sentinel fill; the sweep
        # masks by validity).
        r8, ru8, v8, rc8, vc8 = args
        r8 = r8.at[0:3].set(wrap_positions(r8[0:3], L))
        old_of_new, valid_new, overflow = rebin_gather(
            r8, r8[3, :], grid, z_order=False
        )
        vmask = valid_new.astype(dtype)
        parts = [r8[0:3], r8[4:5], ru8[0:3], v8[0:3]] + (
            [vc8[0:3]] if compensated else []
        )
        stacked = jnp.concatenate(parts, axis=0)[:, old_of_new] * vmask[None, :]
        pad3 = jnp.zeros((3, ns), dtype)
        pad5 = jnp.zeros((5, ns), dtype)
        r8p = jnp.concatenate(
            [stacked[0:3], vmask[None, :], stacked[3:4], pad3], axis=0
        )
        ru8p = jnp.concatenate([stacked[4:7], pad5], axis=0)
        v8p = jnp.concatenate([stacked[7:10], pad5], axis=0)
        vc8p = (
            jnp.concatenate([stacked[10:13], pad5], axis=0)
            if compensated else vc8
        )
        return (
            r8p, ru8p, v8p,
            jnp.zeros_like(r8p),  # position compensation resets at the wrap
            vc8p,
            r8p, overflow,
        )

    def _no_rebin(args):
        r8, ru8, v8, rc8, vc8 = args
        return r8, ru8, v8, rc8, vc8, None, jnp.asarray(False)

    def _step(c: ShardedPencilCarry, want_obs: bool):
        delta = (c.v * dt + c.a * half_dt_sq) * xyz_mask
        if compensated:
            r_new, rc_new = _comp_add(c.r, c.rc, delta)
            v_half, vc_half = _comp_add(c.v, c.vc, c.a * half_dt)
        else:
            r_new = c.r + delta
            rc_new = c.rc
            v_half, vc_half = c.v + c.a * half_dt, c.vc
        ru_new = c.ru + delta

        dsp = minimum_image(r_new[0:3] - c.r_ref[0:3], L)
        moved = jnp.max(jnp.sum(dsp * dsp, axis=0) * r_new[3]) > rebuild_thresh

        def do(args):
            out = _rebin(args)
            return out[:5] + (out[5], out[6])

        def dont(args):
            out = _no_rebin(args)
            return out[:5] + (c.r_ref, out[6])

        r_new, ru_new, v_half, rc_new, vc_half, r_ref, ovf = lax.cond(
            moved, do, dont, (r_new, ru_new, v_half, rc_new, vc_half)
        )

        a_new, obs_part = _force_obs(r_new, want_obs)
        if compensated:
            v_new, vc_new = _comp_add(v_half, vc_half, a_new * half_dt)
            v_eff = v_new + vc_new
        else:
            v_new, vc_new = v_half + a_new * half_dt, vc_half
            v_eff = v_new
        ekin = 0.5 * jnp.sum(v_eff * v_eff)
        carry = ShardedPencilCarry(
            r=r_new, ru=ru_new, v=v_new, a=a_new, r_ref=r_ref,
            rc=rc_new, vc=vc_new, overflow=c.overflow | ovf,
        )
        epot, d_epot, dd_epot = obs_part
        return carry, StepObs(epot=epot, ekin=ekin, d_epot=d_epot, dd_epot=dd_epot)

    def get_state(c: ShardedPencilCarry) -> MDState:
        valid = c.r[3, :] > 0.5
        ids = jnp.where(valid, c.r[4, :].astype(jnp.int32), n)

        def gather(arr):
            out = jnp.zeros((n + 1, 3), dtype)
            out = out.at[ids].set(arr[0:3, :].T)
            return out[:n]

        v8 = c.v + c.vc if compensated else c.v
        return MDState(
            r=wrap_positions(gather(c.r), L),
            ru=gather(c.ru),
            v=gather(v8),
            a=gather(c.a),
        )

    return Engine(
        init=init,
        step=lambda c: _step(c, True),
        get_state=get_state,
        diagnostics=lambda c: {"pencil_overflow": c.overflow},
        step_fast=lambda c: _step(c, False),
    )
