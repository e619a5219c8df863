"""Particle-axis (spatial) sharding of the pair sweep over a device mesh.

TPU-native large-N mode (SURVEY §5.7/§5.8): the i-axis of the N x N pair
matrix is sharded over the mesh's "particle" axis; each device gathers the
full position set over ICI (``all_gather``) and computes forces for its own
i-rows against all j; scalar energy/virial sums are ``psum``-reduced. This is
the ring-attention-shaped decomposition of pair interactions, expressed with
XLA collectives instead of hand-written NCCL (the reference has no
distribution at all — its ensemble is a serial do-loop,
``run_many_md_simuations/run_many_md.f90:57-82``).

All functions here are written for ``shard_map`` bodies: they see LOCAL
shards and use ``jax.lax`` collectives explicitly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ljmd_tpu.config import SimConfig
from ljmd_tpu.ops.geometry import minimum_image, wrap_positions
from ljmd_tpu.ops.lj import _pair_terms, tail_corrections
from ljmd_tpu.parallel.mesh import PARTICLE_AXIS
from ljmd_tpu.state import MDState, StepObs

__all__ = ["lj_rect_partials", "make_spatial_step_fn", "shard_state", "spatial_state_specs"]


def lj_rect_partials(
    r_local: jax.Array,
    r_all: jax.Array,
    gi_offset,
    box_length: float,
    rc_square: float,
):
    """Rectangular pair sweep: local i rows (ni, 3) against all j (nj, 3).

    Returns (a_local (ni,3), e_sum, du_sum, ddu_sum) where the scalar sums
    run over ordered pairs (i local, j any, i != j) WITHOUT prefactors; the
    caller restores prefactors, halves the double count after psum, and adds
    tail corrections. Self-pairs are excluded by global index
    (gi = gi_offset + row).
    """
    ni = r_local.shape[0]
    nj = r_all.shape[0]
    dtype = r_local.dtype
    inv_l = 1.0 / box_length

    xi, yi, zi = (r_local[:, k][:, None] for k in range(3))
    xj, yj, zj = (r_all[:, k][None, :] for k in range(3))
    dx = minimum_image(xi - xj, box_length, inv_l)
    dy = minimum_image(yi - yj, box_length, inv_l)
    dz = minimum_image(zi - zj, box_length, inv_l)
    r2 = dx * dx + dy * dy + dz * dz

    gi = gi_offset + lax.broadcasted_iota(jnp.int32, (ni, nj), 0)
    gj = lax.broadcasted_iota(jnp.int32, (ni, nj), 1)
    mask = jnp.logical_and(r2 < jnp.asarray(rc_square, dtype), gi != gj)

    pair_e, du_r, pair_ddu, inv_r2 = _pair_terms(r2, mask, dtype)
    coef = -du_r * inv_r2
    a_local = jnp.stack(
        [jnp.sum(coef * dx, axis=1), jnp.sum(coef * dy, axis=1), jnp.sum(coef * dz, axis=1)],
        axis=-1,
    )
    return a_local, jnp.sum(pair_e), jnp.sum(du_r), jnp.sum(pair_ddu)


def spatial_state_specs():
    """PartitionSpecs for an MDState sharded on the particle axis."""
    p = P(PARTICLE_AXIS, None)
    return MDState(r=p, ru=p, v=p, a=p)


def shard_state(state: MDState, mesh: Mesh) -> MDState:
    """Place a host/global MDState with particle-axis sharding."""
    spec = spatial_state_specs()
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, spec,
        is_leaf=lambda x: isinstance(x, P),
    )


def _make_local_step(cfg: SimConfig, axis: str):
    """The shard-local velocity-Verlet step body (one particle shard)."""
    dtype = jnp.dtype(cfg.dtype)
    dt = cfg.dt
    half_dt = 0.5 * cfg.dt
    half_dt_sq = 0.5 * cfg.dt * cfg.dt
    L = cfg.box_length

    e_t, d_t, dd_t = (
        tail_corrections(cfg.n, cfg.volume, cfg.rc)
        if cfg.use_tail_corrections
        else (0.0, 0.0, 0.0)
    )

    def local_force(r_local):
        r_all = lax.all_gather(r_local, axis, axis=0, tiled=True)
        gi0 = lax.axis_index(axis) * r_local.shape[0]
        a_loc, e, du, ddu = lj_rect_partials(r_local, r_all, gi0, L, cfg.rc_square)
        e = lax.psum(e, axis)
        du = lax.psum(du, axis)
        ddu = lax.psum(ddu, axis)
        epot = 2.0 * e + jnp.asarray(e_t, dtype)      # 4 * (1/2) + tail
        d_epot = 12.0 * du + jnp.asarray(d_t, dtype)
        dd_epot = 12.0 * ddu + jnp.asarray(dd_t, dtype)
        return 24.0 * a_loc, epot, d_epot, dd_epot

    def step_local(state: MDState):
        r_new = wrap_positions(state.r + state.v * dt + state.a * half_dt_sq, L)
        v_half = state.v + state.a * half_dt
        a_new, epot, d_epot, dd_epot = local_force(r_new)
        v_new = v_half + a_new * half_dt
        ekin = lax.psum(0.5 * jnp.sum(v_new * v_new), axis)
        ru_new = state.ru + minimum_image(r_new - state.r, L)
        new_state = MDState(r=r_new, ru=ru_new, v=v_new, a=a_new)
        return new_state, StepObs(epot=epot, ekin=ekin, d_epot=d_epot, dd_epot=dd_epot)

    return step_local


def make_spatial_step_fn(cfg: SimConfig, mesh: Mesh, axis: str = PARTICLE_AXIS):
    """A velocity-Verlet step over particle shards via shard_map.

    State arrays are sharded (N/d, 3) per device; the force evaluation
    all-gathers positions over ICI and psums the scalar observables, which
    come back replicated. cfg.n must be divisible by the axis size.
    """
    n_shards = mesh.shape[axis]
    if cfg.n % n_shards != 0:
        raise ValueError(f"N={cfg.n} not divisible by particle-axis size {n_shards}")

    step_local = _make_local_step(cfg, axis)
    spec = spatial_state_specs()
    return shard_map(
        step_local,
        mesh=mesh,
        in_specs=(spec,),
        out_specs=(spec, StepObs(P(), P(), P(), P())),
    )


def make_ensemble_spatial_step_fn(cfg: SimConfig, mesh: Mesh, axis: str = PARTICLE_AXIS):
    """Combined replica x particle sharding: batched MDState arrays
    (R, N, 3) sharded P(replica, particle, None); one velocity-Verlet step
    for every replica. Observables come back per replica, shape (R,).

    This is the full multi-chip production step: ensemble data-parallelism
    over the replica axis, spatial parallelism over the particle axis, all
    collectives (all_gather/psum) riding the mesh.
    """
    from ljmd_tpu.parallel.mesh import REPLICA_AXIS

    n_shards = mesh.shape[axis]
    if cfg.n % n_shards != 0:
        raise ValueError(f"N={cfg.n} not divisible by particle-axis size {n_shards}")

    single_step = _make_local_step(cfg, axis)

    def step_local(state: MDState):
        return jax.vmap(single_step)(state)

    spec = MDState(*(P(REPLICA_AXIS, axis, None),) * 4)
    obs_spec = StepObs(*(P(REPLICA_AXIS),) * 4)
    return shard_map(
        step_local,
        mesh=mesh,
        in_specs=(spec,),
        out_specs=(spec, obs_spec),
    )
