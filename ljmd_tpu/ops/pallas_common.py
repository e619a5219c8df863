"""Shared in-kernel LJ pair math for all Pallas sweeps.

One implementation of the per-pair algebra (reference
``lj_potential_energy.f90:134-178`` without the 4/24 prefactors, restored by
callers) so the dense, triangular, pencil, and z-band kernels cannot drift
apart. Pure jnp ops — Mosaic-compatible inside any kernel body.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["lj_pair_terms"]


def lj_pair_terms(r2, mask, approx_reciprocal: bool = False, want_observables: bool = True):
    """Per-pair LJ terms on a squared-distance tile.

    Args:
      r2: pair squared distances (any tile shape).
      mask: boolean tile; contributions outside are exactly zero.
      approx_reciprocal: VPU fast reciprocal + one Newton step (~1 ulp) in
        place of the exact divide.
      want_observables: also return the (du, e, ddu) per-pair partials; when
        False the result is (coef, None, None, None) and the r^-12 product
        is skipped entirely (force-only path).

    Returns (coef, du, e, ddu):
      coef = r^-2 r^-6 (2 r^-6 - 1)   — the factored force coefficient;
             analytically == -du / r^2 (force = 24 * coef * dr), computed
             identically on both paths (the fast/obs bit-identity contract,
             tests/test_pair_terms.py)
      du   = r dU/dr / 24     = r^-6 - 2 r^-12
      e    = U / 4            = r^-12 - r^-6
      ddu  = r^2 d2U/dr2 / 24 = 26 r^-12 - 7 r^-6
    """
    one = jnp.asarray(1.0, r2.dtype)
    r2_safe = jnp.where(mask, r2, one)
    if approx_reciprocal:
        est = pl.reciprocal(r2_safe, approx=True)
        recip = est * (2.0 - r2_safe * est)
    else:
        recip = one / r2_safe
    inv_r2 = jnp.where(mask, recip, 0.0)
    inv_r6 = inv_r2 * inv_r2 * inv_r2
    # coef = (2 r^-12 - r^-6) r^-2 factored as r^-2 r^-6 (2 r^-6 - 1):
    # skips the r^-12 product on the force-only path (one fma + two muls
    # total) and is MORE accurate near the zero-force point r = 2^(1/6)
    # (2*inv_r6 - 1 is exact by Sterbenz for inv_r6 in [0.5, 1], where the
    # old du = inv_r6 - 2*inv_r12 carried inv_r12's rounding error).
    coef = inv_r2 * inv_r6 * (2.0 * inv_r6 - 1.0)
    if not want_observables:
        return coef, None, None, None
    inv_r12 = inv_r6 * inv_r6
    du = inv_r6 - 2.0 * inv_r12
    e = inv_r12 - inv_r6
    ddu = 26.0 * inv_r12 - 7.0 * inv_r6
    return coef, du, e, ddu
