"""Diffusion-coefficient estimators and ACF timescales.

Rebuild of ``scripts/md_one_run_analysis.py``:

- Einstein route (:492-513): least-squares slope of the MSD tail (last
  ``fit_frac`` of the points, clamped like the reference), D = slope / 6.
- Green-Kubo route (:516-534): D = (1/3) * trapezoid(VACF) up to
  ``tmax_frac`` of the time range.
- tau_int (:209-223): dt * (1 + 2 * sum cn[l]) truncated at the first
  non-positive cn.
- tau_1e (:226-239): first crossing of cn below 1/e with linear
  interpolation; NaN if it never crosses.

All are pure jnp (jit/vmap-friendly); the truncated sums and first-crossing
searches are vectorized with cumulative masks instead of Python loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["diffusion_einstein", "diffusion_green_kubo", "tau_int", "tau_1e"]


def diffusion_einstein(t: jax.Array, msd: jax.Array, fit_frac: float = 0.5):
    """D from the linear tail fit of MSD(t): slope/6. Returns NaN for fewer
    than 10 points (reference guard)."""
    n = t.shape[0]
    if n < 10:
        return jnp.asarray(jnp.nan, t.dtype)
    fit_frac = max(0.05, min(float(fit_frac), 1.0))
    i0 = int((1.0 - fit_frac) * n)
    i0 = max(0, min(i0, n - 5))
    x = t[i0:]
    y = msd[i0:]
    xm = jnp.mean(x)
    ym = jnp.mean(y)
    slope = jnp.sum((x - xm) * (y - ym)) / jnp.sum((x - xm) ** 2)
    return slope / 6.0


def diffusion_green_kubo(t: jax.Array, vacf: jax.Array, tmax_frac: float = 1.0):
    """D = (1/3) * integral of VACF (trapezoid) up to tmax_frac of the
    range."""
    n = t.shape[0]
    if n < 2:
        return jnp.asarray(jnp.nan, t.dtype)
    tmax_frac = max(0.05, min(float(tmax_frac), 1.0))
    imax = int(tmax_frac * (n - 1))
    imax = max(1, min(imax, n - 1))
    tt = t[: imax + 1]
    vv = vacf[: imax + 1]
    integral = jnp.sum(0.5 * (vv[1:] + vv[:-1]) * (tt[1:] - tt[:-1]))
    return integral / 3.0


def tau_int(cn: jax.Array, dt_sample: float, max_lag: int | None = None):
    """Integrated autocorrelation time: dt*(1 + 2*sum cn[1..L*]) where the
    sum stops at the first non-positive cn (vectorized via a cumulative
    positivity gate)."""
    n = cn.shape[0]
    if n < 2:
        return jnp.asarray(jnp.nan, cn.dtype)
    L = n - 1 if max_lag is None else min(int(max_lag), n - 1)
    tail = cn[1 : L + 1]
    gate = jnp.cumprod((tail > 0).astype(cn.dtype))
    return dt_sample * (1.0 + 2.0 * jnp.sum(tail * gate))


def tau_1e(cn: jax.Array, dt_sample: float):
    """Time of the first crossing of cn below 1/e (linear interpolation
    between the bracketing lags); NaN when cn never crosses."""
    n = cn.shape[0]
    if n < 2:
        return jnp.asarray(jnp.nan, cn.dtype)
    target = 1.0 / jnp.e
    below = cn[1:] <= target  # lags 1..n-1
    any_cross = jnp.any(below)
    i = jnp.argmax(below) + 1  # first crossing lag
    y0 = cn[i - 1]
    y1 = cn[i]
    x0 = (i - 1) * dt_sample
    x1 = i * dt_sample
    frac = jnp.where(y1 == y0, 1.0, (target - y0) / jnp.where(y1 == y0, 1.0, y1 - y0))
    t_cross = x0 + frac * (x1 - x0)
    t_cross = jnp.where(y1 == y0, x1, t_cross)
    return jnp.where(any_cross, t_cross, jnp.nan)
