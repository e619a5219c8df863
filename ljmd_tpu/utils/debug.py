"""Debug / sanitizer utilities (SURVEY §5.2 — the reference relies on
``stop`` guards and compiler warnings; the JAX-native equivalents live here).

- ``validate_state``: host-side fail-fast checks of an MDState (finite,
  wrapped positions, kinetic energy > 0) — the analogue of the reference's
  precondition ``stop`` calls (lj_potential_energy.f90:77-82,
  md_means.f90:244).
- ``nan_guard``: wrap an engine so every step checks observables for
  NaN/inf via ``jax.debug`` and an error flag in the carry (works under
  jit/scan; a diverged run flags itself instead of silently streaming
  garbage — SURVEY §5.3 policy).
- ``JAX_DEBUG_NANS`` / checkify remain available for interactive debugging;
  these helpers are the always-on production-grade subset.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ljmd_tpu.models.engine import Engine
from ljmd_tpu.state import MDState, StepObs

__all__ = ["validate_state", "nan_guard"]


def validate_state(state: MDState, box_length: float, require_wrapped: bool = True) -> None:
    """Raise with a precise message if the state is unusable (host-side)."""
    for name in ("r", "ru", "v", "a"):
        arr = getattr(state, name)
        if arr.ndim != 2 or arr.shape[-1] != 3:
            raise ValueError(f"state.{name} must be (N, 3), got {arr.shape}")
        if not bool(jnp.isfinite(arr).all()):
            raise FloatingPointError(f"state.{name} contains NaN/inf")
    if require_wrapped:
        r = state.r
        if bool((r < 0).any()) or bool((r >= box_length).any()):
            raise ValueError("positions must be wrapped into [0, L)")
    shapes = {getattr(state, k).shape for k in ("r", "ru", "v", "a")}
    if len(shapes) != 1:
        raise ValueError(f"state arrays disagree in shape: {shapes}")


def nan_guard(engine: Engine) -> Engine:
    """Wrap an engine so the carry tracks a sticky ``error`` flag set when
    any step observable goes non-finite. ``diagnostics`` then reports
    ``nonfinite_observables``."""

    def init(state: MDState):
        carry, obs = engine.init(state)
        flag = ~_obs_finite(obs)
        return (carry, flag), obs

    def step(guarded: tuple[Any, jax.Array]):
        carry, flag = guarded
        carry, obs = engine.step(carry)
        flag = flag | ~_obs_finite(obs)
        return (carry, flag), obs

    def diagnostics(guarded):
        carry, flag = guarded
        d = dict(engine.diagnostics(carry))
        d["nonfinite_observables"] = flag
        return d

    return Engine(
        init=init,
        step=step,
        get_state=lambda g: engine.get_state(g[0]),
        diagnostics=diagnostics,
    )


def _obs_finite(obs: StepObs) -> jax.Array:
    return (
        jnp.isfinite(obs.epot)
        & jnp.isfinite(obs.ekin)
        & jnp.isfinite(obs.d_epot)
        & jnp.isfinite(obs.dd_epot)
    )
