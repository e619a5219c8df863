"""End-to-end slice tests: initialize -> production -> stats (SURVEY §7 build
step 3; BASELINE config 1 shape, shrunk for CI speed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ljmd_tpu.config import SimConfig, config_from_density
from ljmd_tpu.models.simulation import (
    SERIES_OBSERVABLES,
    initialize,
    run_production,
    sample_steps,
    simulate,
)


def small_cfg(**kw):
    base = dict(
        total_steps=600,
        output_interval=20,
        warmup_steps=100,
        dt=0.002,
        dtype="float64",
        target_total_energy=-100.0,
        seed=7,
    )
    base.update(kw)
    return config_from_density(num_cells=2, density=0.6, **base)


def test_sample_steps_match_reference_rule():
    cfg = small_cfg()
    steps = sample_steps(cfg)
    # reference: multiples of interval in (warmup, total]
    want = [s for s in range(1, cfg.total_steps + 1) if s % 20 == 0 and s > 100]
    assert steps.tolist() == want
    assert len(steps) == cfg.n_samples


def test_sample_steps_nondivisible_warmup():
    cfg = small_cfg(warmup_steps=130)  # 130 % 20 != 0
    steps = sample_steps(cfg)
    want = [s for s in range(1, 601) if s % 20 == 0 and s > 130]
    assert steps.tolist() == want
    # reference count formula: total//interval - warmup//interval
    assert len(steps) == 600 // 20 - 130 // 20


def test_sample_steps_with_epilogue():
    cfg = small_cfg(total_steps=610)  # 10 trailing unsampled steps
    steps = sample_steps(cfg)
    assert steps[-1] == 600


def test_initialize_energy_target():
    cfg = small_cfg(warmup_steps=0)
    state = initialize(cfg, backend="dense")
    from ljmd_tpu.models.forces import make_force_fn

    res = make_force_fn(cfg, "dense")(state.r)
    etot = float(res.epot) + 0.5 * float(jnp.sum(state.v**2))
    assert etot == pytest.approx(cfg.target_total_energy, rel=1e-10)
    # zero momentum preserved by rescaling
    np.testing.assert_allclose(np.asarray(state.v.sum(axis=0)), 0.0, atol=1e-10)
    # ru reset to r
    np.testing.assert_allclose(np.asarray(state.ru), np.asarray(state.r))


def test_simulate_end_to_end_shapes_and_consistency():
    cfg = small_cfg()
    out = simulate(cfg, backend="dense", record_frames=True)
    ns = cfg.n_samples
    assert out.series.shape == (5, ns)
    assert out.times.shape == (ns,)
    np.testing.assert_allclose(
        np.asarray(out.times), sample_steps(cfg) * cfg.dt, rtol=1e-12
    )
    # means report consistent with the recorded series
    for i, name in enumerate(SERIES_OBSERVABLES):
        assert float(out.means.mean(name)) == pytest.approx(
            float(out.series[i].mean()), rel=1e-10
        ), name
    assert int(out.means.count) == ns
    # etot row = epot + ekin rows
    np.testing.assert_allclose(
        np.asarray(out.series[2]), np.asarray(out.series[0] + out.series[1]), rtol=1e-12
    )
    # correlations: C_norm(0) = 1 for fluctuating series
    np.testing.assert_allclose(np.asarray(out.corr_norm[:, 0]), 1.0, rtol=1e-9)
    lag = cfg.corr_max_lag
    assert out.corr.shape == (5, lag + 1)
    assert out.corr_mean.shape == (5, lag + 1)
    # frames
    assert out.frames.r.shape == (ns, cfg.n, 3)
    # last recorded frame == final state (no epilogue for this cfg)
    np.testing.assert_allclose(np.asarray(out.frames.r[-1]), np.asarray(out.final_state.r))
    np.testing.assert_allclose(np.asarray(out.frames.v[-1]), np.asarray(out.final_state.v))
    # Energy stability across production: loose bound only — at N=32 the
    # truncated-unshifted potential's cutoff-crossing jumps dominate (strict
    # integrator conservation is covered in test_integrator).
    e = np.asarray(out.series[2])
    assert np.abs(e - e[0]).max() / abs(e[0]) < 5e-2


def test_simulate_deterministic():
    cfg = small_cfg(total_steps=200, warmup_steps=40)
    a = simulate(cfg, backend="dense")
    b = simulate(cfg, backend="dense")
    np.testing.assert_array_equal(np.asarray(a.series), np.asarray(b.series))
    np.testing.assert_array_equal(np.asarray(a.final_state.r), np.asarray(b.final_state.r))


def test_simulate_thermo_finite():
    cfg = small_cfg()
    out = simulate(cfg, backend="dense")
    coefs = out.thermo(cfg).check_finite()
    # T from coefficients uses f=3N-3; sampled T uses 3N (reference quirk):
    t_coef = float(coefs.temperature)
    t_series = float(out.means.mean("temp"))
    assert t_coef == pytest.approx(t_series * (3 * cfg.n) / (3 * cfg.n - 3), rel=1e-10)


def test_no_samples_raises():
    cfg = small_cfg(total_steps=90, warmup_steps=85, output_interval=100)
    state = initialize(cfg.replace(warmup_steps=0), backend="dense")
    with pytest.raises(ValueError):
        run_production(cfg, state, backend="dense")
