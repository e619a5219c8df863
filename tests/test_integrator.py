"""Velocity-Verlet tests: NVE energy conservation, momentum conservation,
time reversibility, and unwrap-tracking correctness (SURVEY §4 oracles (b),(c))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.forces import make_force_fn
from ljmd_tpu.models.integrators import init_forces, make_step_fn, velocity_verlet_step
from ljmd_tpu.models.lattice import (
    fcc_lattice,
    random_velocities,
    remove_com_velocity,
    rescale_to_target_energy,
)
from ljmd_tpu.state import MDState


def make_equilibrated_state(cfg, temperature=1.0, seed=0):
    r = fcc_lattice(cfg.num_cells, cfg.box_length, dtype=jnp.float64)
    key = jax.random.PRNGKey(seed)
    v = random_velocities(key, cfg.n, dtype=jnp.float64)
    v = remove_com_velocity(v)
    # scale to rough temperature
    v = v * jnp.sqrt(temperature / (jnp.sum(v * v) / (3 * cfg.n)))
    state = MDState(r=r, ru=r, v=v, a=jnp.zeros_like(r))
    force_fn = make_force_fn(cfg, "dense")
    state, _ = init_forces(state, force_fn)
    return state, force_fn


@pytest.fixture(scope="module")
def cfg():
    return config_from_density(num_cells=2, density=0.8, dt=0.004, dtype="float64")


def run_scan(state, step_fn, n_steps):
    def body(s, _):
        return step_fn(s)

    return jax.lax.scan(body, state, None, length=n_steps)


def _solid_drift(dt, n_steps=1000, temperature=0.05):
    """Max relative total-energy deviation for a low-T FCC solid with rc
    placed between neighbor shells, so no pair crosses the cutoff and the
    measured deviation is pure integrator error (the truncated-unshifted LJ
    potential of the reference has an energy discontinuity at rc, so NVE
    conservation is only exact between cutoff crossings)."""
    c = config_from_density(num_cells=3, density=1.0, rc=2.1, dt=dt, dtype="float64")
    state, force_fn = make_equilibrated_state(c, temperature=temperature)
    step_fn = make_step_fn(force_fn, c.dt, c.box_length)
    _, obs = jax.jit(lambda s: run_scan(s, step_fn, n_steps))(state)
    e = np.asarray(obs.epot + obs.ekin)
    return np.abs(e - e[0]).max() / abs(e[0])


def test_energy_conservation_f64():
    assert _solid_drift(0.004) < 2e-5


def test_energy_error_scales_as_dt_squared():
    """Velocity-Verlet is 2nd order: halving dt must shrink the energy error
    by ~4x (symplectic-integrator oracle)."""
    d1 = _solid_drift(0.004)
    d2 = _solid_drift(0.002)
    assert d2 / d1 < 0.35


def test_energy_conservation_fluid_reference_cutoff(cfg):
    """Melting fluid at the reference-style cutoff rc = 0.49 L: conservation
    is limited by cutoff-crossing discontinuities, so the bound is loose."""
    fluid = config_from_density(num_cells=3, density=0.5, dt=1e-3, dtype="float64")
    fluid = fluid.replace(rc_over_box=0.49)
    state, force_fn = make_equilibrated_state(fluid, temperature=1.0)
    step_fn = make_step_fn(force_fn, fluid.dt, fluid.box_length)
    _, obs = jax.jit(lambda s: run_scan(s, step_fn, 2000))(state)
    e = np.asarray(obs.epot + obs.ekin)
    assert np.abs(e - e[0]).max() / abs(e[0]) < 1e-2


def test_momentum_conservation(cfg):
    state, force_fn = make_equilibrated_state(cfg)
    step_fn = make_step_fn(force_fn, cfg.dt, cfg.box_length)
    final, _ = jax.jit(lambda s: run_scan(s, step_fn, 500))(state)
    p = np.asarray(final.v.sum(axis=0))
    np.testing.assert_allclose(p, 0.0, atol=1e-10)


def test_time_reversibility(cfg):
    """Integrate forward n steps, flip velocities, integrate n steps: must
    return to the initial positions (velocity Verlet is symplectic/reversible)."""
    state, force_fn = make_equilibrated_state(cfg)
    step_fn = make_step_fn(force_fn, cfg.dt, cfg.box_length)
    fwd, _ = jax.jit(lambda s: run_scan(s, step_fn, 200))(state)
    flipped = MDState(r=fwd.r, ru=fwd.ru, v=-fwd.v, a=fwd.a)
    back, _ = jax.jit(lambda s: run_scan(s, step_fn, 200))(flipped)
    # Compare wrapped positions modulo the box
    d = np.array(back.r - state.r)
    L = cfg.box_length
    d -= L * np.round(d / L)
    np.testing.assert_allclose(d, 0.0, atol=1e-8)


def test_positions_stay_wrapped(cfg):
    state, force_fn = make_equilibrated_state(cfg)
    step_fn = make_step_fn(force_fn, cfg.dt, cfg.box_length)
    final, _ = jax.jit(lambda s: run_scan(s, step_fn, 300))(state)
    r = np.asarray(final.r)
    assert (r >= 0).all() and (r < cfg.box_length).all()


def test_unwrapped_tracks_true_displacement(cfg):
    """For a free particle (no neighbors in range), ru must advance linearly
    with v even as r wraps around the box."""
    small = cfg.replace(num_cells=1, dt=0.01)
    L = small.box_length
    # Spread 4 particles far apart with rc small enough that nothing interacts
    iso = small.replace(rc_over_box=0.05)
    r = jnp.asarray(
        np.array([[0.1, 0.1, 0.1], [2.0, 2.0, 0.1], [0.1, 2.0, 2.0], [2.0, 0.1, 2.0]])
        * (L / 4.0),
        dtype=jnp.float64,
    )
    # Same velocity for all particles: relative distances are constant, so
    # they never come within rc of each other.
    v = jnp.asarray(np.tile([1.0, 0.7, -0.3], (4, 1)))
    state = MDState(r=r, ru=r, v=v, a=jnp.zeros_like(r))
    force_fn = make_force_fn(iso, "dense")
    state, _ = init_forces(state, force_fn)
    step_fn = make_step_fn(force_fn, iso.dt, L)
    n_steps = int(3 * L / (1.0 * iso.dt))  # ~3 box crossings
    final, _ = jax.jit(lambda s: run_scan(s, step_fn, n_steps))(state)
    expected_ru = np.asarray(r) + np.asarray(v) * iso.dt * n_steps
    np.testing.assert_allclose(np.asarray(final.ru), expected_ru, atol=1e-9)
    assert (np.asarray(final.r) < L).all()


def test_single_step_matches_hand_integration(cfg):
    """One step against hand-computed update from the Verlet equations."""
    state, force_fn = make_equilibrated_state(cfg)
    new, obs = velocity_verlet_step(state, force_fn, cfg.dt, cfg.box_length)
    # position update (before wrap): r + v dt + a dt^2/2
    expect_r = np.array(state.r + state.v * cfg.dt + state.a * (0.5 * cfg.dt**2))
    L = cfg.box_length
    expect_r -= L * np.floor(expect_r / L)
    np.testing.assert_allclose(np.asarray(new.r), expect_r, atol=1e-12)
    # velocity update with recomputed forces
    res_new = force_fn(new.r)
    expect_v = np.asarray(state.v + 0.5 * cfg.dt * (state.a + res_new.a))
    np.testing.assert_allclose(np.asarray(new.v), expect_v, atol=1e-12)
    assert float(obs.ekin) == pytest.approx(0.5 * float(jnp.sum(new.v**2)))


def test_rescale_to_target_energy(cfg):
    state, force_fn = make_equilibrated_state(cfg)
    res = force_fn(state.r)
    target = float(res.epot) + 100.0
    v2 = rescale_to_target_energy(state.v, res.epot, target)
    assert float(res.epot + 0.5 * jnp.sum(v2 * v2)) == pytest.approx(target, rel=1e-12)


def test_remove_com_velocity():
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(100, 3)))
    v2 = remove_com_velocity(v)
    np.testing.assert_allclose(np.asarray(v2.sum(axis=0)), 0.0, atol=1e-12)
