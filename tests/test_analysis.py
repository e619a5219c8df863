"""On-device MSD/VACF/RDF/diffusion/ACF-timescale analysis vs NumPy oracles
written directly from the definitions (SURVEY §4 oracle (h))."""

import jax.numpy as jnp
import numpy as np
import pytest

from ljmd_tpu.analysis.diffusion import diffusion_einstein, diffusion_green_kubo, tau_1e, tau_int
from ljmd_tpu.analysis.msd_vacf import compute_msd, compute_vacf, default_origin_stride
from ljmd_tpu.analysis.rdf import compute_rdf, rdf_bin_centers


# ----------------------------------------------------------------------
# Oracles
# ----------------------------------------------------------------------
def np_msd(ru, max_lag, stride=1):
    n_snap = ru.shape[0]
    max_lag = min(max_lag, n_snap - 1)
    msd = np.zeros(max_lag + 1)
    counts = np.zeros(max_lag + 1)
    for t0 in range(0, n_snap - 1, stride):
        L = min(max_lag, n_snap - 1 - t0)
        if L <= 0:
            continue
        d = ru[t0 : t0 + L + 1] - ru[t0][None]
        msd[: L + 1] += (d * d).sum(-1).mean(-1)
        counts[: L + 1] += 1
    m = counts > 0
    msd[m] /= counts[m]
    return msd


def np_vacf(v, max_lag, stride=1):
    n_snap = v.shape[0]
    max_lag = min(max_lag, n_snap - 1)
    vacf = np.zeros(max_lag + 1)
    counts = np.zeros(max_lag + 1)
    for t0 in range(0, n_snap - 1, stride):
        L = min(max_lag, n_snap - 1 - t0)
        if L <= 0:
            continue
        dot = (v[t0 : t0 + L + 1] * v[t0][None]).sum(-1).mean(-1)
        vacf[: L + 1] += dot
        counts[: L + 1] += 1
    m = counts > 0
    vacf[m] /= counts[m]
    return vacf


def np_rdf(r, L, nbins, rmax):
    n_snap, n = r.shape[:2]
    dr = rmax / nbins
    hist = np.zeros(nbins)
    for s in range(n_snap):
        for i in range(n - 1):
            d = r[s, i + 1 :] - r[s, i]
            d -= L * np.rint(d / L)
            rr = np.sqrt((d * d).sum(-1))
            sel = rr < rmax
            np.add.at(hist, (rr[sel] / dr).astype(int), 2.0)
    edges = np.linspace(0, rmax, nbins + 1)
    shell = (4 / 3) * np.pi * (edges[1:] ** 3 - edges[:-1] ** 3)
    rho = n / L**3
    return hist / (n_snap * n * rho * shell)


def random_frames(n_snap=40, n=24, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return rng.normal(scale=scale, size=(n_snap, n, 3))


# ----------------------------------------------------------------------
# MSD / VACF
# ----------------------------------------------------------------------
@pytest.mark.parametrize("stride", [1, 3])
def test_msd_vs_oracle(stride):
    ru = np.cumsum(random_frames(50, 16, seed=1), axis=0)  # random-walk-ish
    got = np.asarray(compute_msd(jnp.asarray(ru), max_lag=20, origin_stride=stride))
    want = np_msd(ru, 20, stride)
    np.testing.assert_allclose(got, want, rtol=1e-12)


@pytest.mark.parametrize("stride", [1, 4])
def test_vacf_vs_oracle(stride):
    v = random_frames(45, 20, seed=2)
    got = np.asarray(compute_vacf(jnp.asarray(v), max_lag=15, origin_stride=stride))
    want = np_vacf(v, 15, stride)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_msd_ballistic_free_particles():
    """ru(t) = r0 + v t (constant v): MSD(tau) = <|v|^2> tau^2 exactly."""
    rng = np.random.default_rng(3)
    n, n_snap, dt = 10, 30, 0.1
    v = rng.normal(size=(n, 3))
    t = np.arange(n_snap) * dt
    ru = t[:, None, None] * v[None] + rng.normal(size=(1, n, 3))
    msd = np.asarray(compute_msd(jnp.asarray(ru), max_lag=n_snap - 1))
    v2 = (v * v).sum(-1).mean()
    np.testing.assert_allclose(msd, v2 * t**2, rtol=1e-10)


def test_vacf_constant_velocity():
    v0 = random_frames(1, 8, seed=4)[0]
    v = np.repeat(v0[None], 25, axis=0)
    vacf = np.asarray(compute_vacf(jnp.asarray(v), max_lag=24))
    np.testing.assert_allclose(vacf, (v0 * v0).sum(-1).mean(), rtol=1e-12)


def test_default_origin_stride():
    assert default_origin_stride(5000) == 1
    assert default_origin_stride(20000) == 5
    assert default_origin_stride(30000) == 20


# ----------------------------------------------------------------------
# RDF
# ----------------------------------------------------------------------
def test_rdf_vs_oracle():
    L = 6.0
    rng = np.random.default_rng(5)
    r = rng.uniform(0, L, size=(5, 30, 3))
    nbins = 50
    got = np.asarray(compute_rdf(jnp.asarray(r), L, nbins=nbins))
    want = np_rdf(r, L, nbins, rmax=0.5 * L)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_rdf_ideal_gas_tends_to_one():
    """Uniform random particles: g(r) ~ 1 for r away from 0."""
    L = 10.0
    rng = np.random.default_rng(6)
    r = rng.uniform(0, L, size=(20, 200, 3))
    g = np.asarray(compute_rdf(jnp.asarray(r), L, nbins=40))
    centers = rdf_bin_centers(L, nbins=40)
    sel = centers > 1.0
    assert abs(g[sel].mean() - 1.0) < 0.05


def test_rdf_subsampling_matches_oracle_on_subset():
    L = 5.0
    rng = np.random.default_rng(7)
    r = rng.uniform(0, L, size=(10, 40, 3))
    # cap snapshots at 4 -> evenly spaced indices 0,3,6,9
    got = np.asarray(compute_rdf(jnp.asarray(r), L, nbins=30, max_snapshots=4))
    idx = np.linspace(0, 9, 4, dtype=int)
    want = np_rdf(r[idx], L, 30, rmax=2.5)
    np.testing.assert_allclose(got, want, rtol=1e-10)


# ----------------------------------------------------------------------
# Diffusion estimators + ACF timescales
# ----------------------------------------------------------------------
def test_einstein_on_exact_line():
    t = jnp.asarray(np.linspace(0, 10, 100))
    D = 0.37
    msd = 6 * D * t + 0.5
    assert float(diffusion_einstein(t, msd)) == pytest.approx(D, rel=1e-10)


def test_einstein_matches_lstsq_tail():
    rng = np.random.default_rng(8)
    t = np.linspace(0, 5, 80)
    msd = 2.1 * t + 0.3 + rng.normal(scale=0.01, size=80)
    i0 = int(0.5 * 80)
    A = np.vstack([t[i0:], np.ones(80 - i0)]).T
    slope = np.linalg.lstsq(A, msd[i0:], rcond=None)[0][0]
    got = float(diffusion_einstein(jnp.asarray(t), jnp.asarray(msd), fit_frac=0.5))
    assert got == pytest.approx(slope / 6, rel=1e-8)


def test_green_kubo_exponential():
    """VACF = v2 exp(-t/tau): D = v2*tau/3 (integrating far into the tail)."""
    tau, v2 = 0.5, 3.0
    t = np.linspace(0, 10, 4001)
    vacf = v2 * np.exp(-t / tau)
    got = float(diffusion_green_kubo(jnp.asarray(t), jnp.asarray(vacf)))
    assert got == pytest.approx(v2 * tau / 3, rel=1e-4)


def test_green_kubo_matches_trapz_fraction():
    rng = np.random.default_rng(9)
    t = np.linspace(0, 3, 61)
    vacf = rng.normal(size=61)
    imax = int(0.8 * 60)
    want = np.trapezoid(vacf[: imax + 1], t[: imax + 1]) / 3
    got = float(diffusion_green_kubo(jnp.asarray(t), jnp.asarray(vacf), tmax_frac=0.8))
    assert got == pytest.approx(want, rel=1e-10)


def test_tau_int_truncates_at_first_nonpositive():
    cn = jnp.asarray([1.0, 0.5, 0.25, -0.1, 0.4])
    # sum stops before -0.1: s = 0.5 + 0.25
    assert float(tau_int(cn, dt_sample=2.0)) == pytest.approx(2.0 * (1 + 2 * 0.75))


def test_tau_int_all_positive():
    cn = jnp.asarray([1.0, 0.4, 0.2, 0.1])
    assert float(tau_int(cn, 1.0)) == pytest.approx(1 + 2 * 0.7)


def test_tau_1e_interpolation():
    target = 1 / np.e
    # cn crosses between lag 1 (0.6) and lag 2 (0.2)
    cn = jnp.asarray([1.0, 0.6, 0.2, 0.1])
    dt = 0.5
    frac = (target - 0.6) / (0.2 - 0.6)
    assert float(tau_1e(cn, dt)) == pytest.approx(dt * (1 + frac), rel=1e-10)


def test_tau_1e_no_crossing_nan():
    cn = jnp.asarray([1.0, 0.9, 0.8])
    assert np.isnan(float(tau_1e(cn, 1.0)))


def test_tau_1e_exponential():
    dt = 0.1
    lags = np.arange(50)
    tau = 0.7
    cn = np.exp(-lags * dt / tau)
    assert float(tau_1e(jnp.asarray(cn), dt)) == pytest.approx(tau, rel=0.02)
