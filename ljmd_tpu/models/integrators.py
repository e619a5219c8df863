"""Velocity-Verlet integrator as a pure JAX step function.

Rebuild of ``scripts/physics/verlet.f90:41-97`` plus the driver-owned
unwrapped-coordinate tracking (``scripts/md_simulation_program.f90:339-353``),
folded into one pure function suitable as a ``lax.scan`` body:

  step(state, ...) -> (new_state, StepObs)

Contract (SURVEY §3.3): on entry ``state.a`` holds accelerations consistent
with ``state.r``; on exit positions are wrapped into [0, L), accelerations are
recomputed from the new positions, and the returned observables
(epot, ekin, d_epot, dd_epot) are evaluated at t + dt. The initial force
evaluation before the first step is the caller's job (``init_forces``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ljmd_tpu.ops.geometry import minimum_image, wrap_positions
from ljmd_tpu.ops.lj import LJResult
from ljmd_tpu.state import MDState, StepObs, kinetic_energy

__all__ = ["velocity_verlet_step", "init_forces", "make_step_fn"]

ForceFn = Callable[[jax.Array], LJResult]


def init_forces(state: MDState, force_fn: ForceFn) -> tuple[MDState, StepObs]:
    """Evaluate forces/energies at the current positions and store the
    accelerations in the state (the t=0 force call the reference drivers make
    before the loop, md_simulation_program.f90:236)."""
    res = force_fn(state.r)
    ekin = kinetic_energy(state.v)
    obs = StepObs(epot=res.epot, ekin=ekin, d_epot=res.d_epot, dd_epot=res.dd_epot)
    return MDState(r=state.r, ru=state.ru, v=state.v, a=res.a), obs


def velocity_verlet_step(
    state: MDState,
    force_fn: ForceFn,
    dt: float,
    box_length: float,
) -> tuple[MDState, StepObs]:
    """One velocity-Verlet step (verlet.f90:58-95), in functional form.

      r'  = wrap(r + v dt + a dt^2/2)
      v_h = v + a dt/2
      a'  = F(r') / m
      v'  = v_h + a' dt/2
      ru' = ru + MIC(r' - r)   (unwrap update, md_simulation_program.f90:339-353)
      K   = 1/2 sum |v'|^2
    """
    dtype = state.r.dtype
    dt_ = jnp.asarray(dt, dtype)
    half_dt = jnp.asarray(0.5 * dt, dtype)
    half_dt_sq = jnp.asarray(0.5 * dt * dt, dtype)

    r_new = state.r + state.v * dt_ + state.a * half_dt_sq
    r_new = wrap_positions(r_new, box_length)

    v_half = state.v + state.a * half_dt

    res = force_fn(r_new)

    v_new = v_half + res.a * half_dt
    ekin = kinetic_energy(v_new)

    # Unwrapped positions advance by the minimum-image displacement of the
    # wrapped positions across the step: continuous across PBC crossings.
    ru_new = state.ru + minimum_image(r_new - state.r, box_length)

    new_state = MDState(r=r_new, ru=ru_new, v=v_new, a=res.a)
    obs = StepObs(epot=res.epot, ekin=ekin, d_epot=res.d_epot, dd_epot=res.dd_epot)
    return new_state, obs


def make_step_fn(force_fn: ForceFn, dt: float, box_length: float):
    """Bind parameters, returning a ``lax.scan``-compatible step function."""

    def step(state: MDState, _=None):
        return velocity_verlet_step(state, force_fn, dt, box_length)

    return step
