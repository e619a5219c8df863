"""Unit contract for the shared in-kernel pair math (ops/pallas_common).

Two invariants the engines rely on:

1. The force coefficient is BIT-IDENTICAL between the fast
   (want_observables=False) and observable paths — step_fast vs step
   trajectory identity (tests/test_fast_step.py) reduces to this.
2. coef equals the analytic (2 r^-12 - r^-6) r^-2 of the reference pair
   kernel (lj_potential_energy.f90:109-193, prefactor 24 applied by the
   callers) against an f64 oracle, and is exactly zero outside the mask.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ljmd_tpu.ops.pallas_common import lj_pair_terms


def _r2_grid(dtype):
    # Dense sweep across the interaction range, including the zero-force
    # point r = 2^(1/6) where the factored form's cancellation matters,
    # and sub-sigma close approaches.
    r = np.concatenate([
        np.linspace(0.3, 3.2, 4001),
        [2.0 ** (1.0 / 6.0), 1.0, 2.5],
    ])
    return jnp.asarray(r * r, dtype)


def test_fast_and_observable_coef_bit_identical():
    for dtype in (jnp.float32, jnp.float64):
        r2 = _r2_grid(dtype)
        mask = r2 < dtype(2.5 * 2.5)
        c_fast, du, e, ddu = lj_pair_terms(r2, mask, want_observables=False)
        c_obs, du2, e2, ddu2 = lj_pair_terms(r2, mask, want_observables=True)
        assert du is None and e is None and ddu is None
        np.testing.assert_array_equal(np.asarray(c_fast), np.asarray(c_obs))
        assert du2 is not None and e2 is not None and ddu2 is not None


def _emulated_reciprocal(monkeypatch):
    """Stand-in for the TPU hardware fast reciprocal on CPU test runs.

    ``pl.reciprocal(approx=True)`` only lowers inside a Mosaic kernel
    (NotImplementedError in plain jnp), so the approx path is exercised
    here with a bf16-rounded estimate: ~8 mantissa bits of relative error
    (2^-9), WORSE than the hardware rcp's typical precision — a Newton
    bound that holds for it holds for the hardware."""
    import ljmd_tpu.ops.pallas_common as pc

    def fake(x, approx=True):
        assert approx
        return (1.0 / x).astype(jnp.bfloat16).astype(x.dtype)

    monkeypatch.setattr(pc.pl, "reciprocal", fake)


@pytest.mark.parametrize("approx_reciprocal", [False, True])
def test_coef_matches_f64_oracle_and_mask_zeroes(approx_reciprocal, monkeypatch):
    # approx_reciprocal=True is what the production TPU kernels call: a
    # hardware estimate plus one Newton step. The estimate is emulated at
    # bf16 precision (see _emulated_reciprocal); the Newton step squares
    # its relative error (2^-9 -> ~4e-6 on 1/r^2), so the oracle bound is
    # slightly looser than the exact-divide path's.
    if approx_reciprocal:
        _emulated_reciprocal(monkeypatch)
    r2 = _r2_grid(jnp.float32)
    mask = r2 < jnp.float32(2.5 * 2.5)
    coef, _, _, _ = lj_pair_terms(
        r2, mask, want_observables=False, approx_reciprocal=approx_reciprocal
    )
    coef = np.asarray(coef, np.float64)

    r2_64 = np.asarray(r2, np.float64)
    inv = 1.0 / r2_64
    want = (2.0 * inv ** 6 - inv ** 3) * inv * np.asarray(mask)
    # f32 path vs f64 analytic: a few ulps of f32 relative where the
    # coefficient is large, absolute near the r = 2^(1/6) zero crossing
    err = np.abs(coef - want) / np.maximum(np.abs(want), 1.0)
    # Emulated-estimate bound (measured max ~1.4e-4 with the bf16 stand-in;
    # the real hardware rcp estimate is tighter, so this is conservative).
    bound = 3e-4 if approx_reciprocal else 1e-5
    assert float(err[np.asarray(mask)].max()) < bound
    np.testing.assert_array_equal(coef[~np.asarray(mask)], 0.0)


@pytest.mark.parametrize("approx_reciprocal", [False, True])
def test_fast_obs_bit_identity_holds_with_fast_reciprocal(
    approx_reciprocal, monkeypatch
):
    if approx_reciprocal:
        _emulated_reciprocal(monkeypatch)
    r2 = _r2_grid(jnp.float32)
    mask = r2 < jnp.float32(2.5 * 2.5)
    c_fast, _, _, _ = lj_pair_terms(
        r2, mask, want_observables=False, approx_reciprocal=approx_reciprocal
    )
    c_obs, _, _, _ = lj_pair_terms(
        r2, mask, want_observables=True, approx_reciprocal=approx_reciprocal
    )
    np.testing.assert_array_equal(np.asarray(c_fast), np.asarray(c_obs))


def test_observable_rows_unchanged():
    # e / du / ddu keep the reference's canonical per-pair forms
    # (U/4, r dU/dr / 24, r^2 d2U/dr2 / 24).
    r2 = _r2_grid(jnp.float64)
    mask = r2 < jnp.float64(2.5 * 2.5)
    _, du, e, ddu = lj_pair_terms(r2, mask, want_observables=True)
    r2_64 = np.asarray(r2, np.float64)
    inv6 = (1.0 / r2_64) ** 3
    m = np.asarray(mask)
    # atol floor: each observable has a zero crossing in-range (r = 1,
    # 2^(1/6), (26/7)^(1/6)) where the relative error is unbounded by
    # construction (catastrophic cancellation of ulp-different operands)
    np.testing.assert_allclose(
        np.asarray(e), (inv6 * inv6 - inv6) * m, rtol=1e-13, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(du), (inv6 - 2 * inv6 * inv6) * m, rtol=1e-13, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(ddu), (26 * inv6 * inv6 - 7 * inv6) * m, rtol=1e-13, atol=1e-11
    )
