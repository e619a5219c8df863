"""Bit-exact port of the reference's subtractive (ran3-style) RNG.

Reference: ``scripts/base/random_numbers.f90:48-116`` — a Knuth subtractive
generator with a 55-entry REAL table, constants mbig=4e6, mseed=1618033,
returning uniforms in (0,1) as multiples of 1/mbig. The Fortran version keeps
SAVE state, so its "seed" only matters on the first call (reference quirk,
SURVEY §2.3.7); this port makes the state explicit (one instance per stream)
while reproducing the exact sequence for a given seed — all arithmetic is on
small integers represented exactly in float64, so the port is bit-identical.

The production framework uses JAX threefry keys (splittable, counter-based);
this class exists for parity tests against Fortran-generated initial
configurations (e.g. regenerating the velocity stream of
``md_initial_config_program.f90:196-209`` with seed -12345).
"""

from __future__ import annotations

import numpy as np

__all__ = ["Ran3", "reference_initial_velocities"]

_MBIG = 4.0e6
_MSEED = 1618033.0


class Ran3:
    """One independent ran3 stream. ``seed`` follows the Fortran convention:
    any integer; initialization uses |mseed - |seed|| mod mbig."""

    def __init__(self, seed: int):
        ma = np.zeros(56)  # 1-based like the Fortran table
        mj = abs(_MSEED - abs(float(seed)))
        mj = mj % _MBIG
        ma[55] = mj
        mk = 1.0
        for i in range(1, 55):
            ii = (21 * i) % 55
            ma[ii] = mk
            mk = mj - mk
            if mk < 0.0:
                mk += _MBIG
            mj = ma[ii]
        for _ in range(4):
            for i in range(1, 56):
                ma[i] -= ma[1 + (i + 30) % 55]
                if ma[i] < 0.0:
                    ma[i] += _MBIG
        self._ma = ma
        self._inext = 0
        self._inextp = 31

    def next(self) -> float:
        """Next uniform in (0,1)."""
        self._inext += 1
        if self._inext == 56:
            self._inext = 1
        self._inextp += 1
        if self._inextp == 56:
            self._inextp = 1
        mj = self._ma[self._inext] - self._ma[self._inextp]
        if mj < 0.0:
            mj += _MBIG
        self._ma[self._inext] = mj
        return mj / _MBIG

    def uniform(self, n: int) -> np.ndarray:
        return np.array([self.next() for _ in range(n)])


def reference_initial_velocities(n: int, seed: int = -12345) -> np.ndarray:
    """The exact initial velocity draw of the reference init program
    (md_initial_config_program.f90:196-209): per particle, three consecutive
    uniforms shifted by -0.5, in (vx, vy, vz) order. Returns (n, 3)."""
    rng = Ran3(seed)
    v = np.empty((n, 3))
    for i in range(n):
        v[i, 0] = rng.next() - 0.5
        v[i, 1] = rng.next() - 0.5
        v[i, 2] = rng.next() - 0.5
    return v
