"""Microcanonical thermodynamic response coefficients from time averages.

Rebuild of ``scripts/physics/thermodynamic_coefs.f90:87-205`` — the CANONICAL
formulas (the WIP ensemble path in the reference has drifted/stale variants;
SURVEY §2.3.3 — deliberately not replicated):

  f        = 3N - 3                       (:105)
  aux1     = 1 - 2/f                      (:109)
  aux2     = f/2 - 1                      (:110)
  T        = 2 <K> / f                    (:118; NOTE: f here, while the
                                           sampling-time T uses 3N —
                                           documented quirk, SURVEY §2.3.4)
  Ca_v     = 1 / (1 - aux1 <K><1/K>)      (:128-130)
  Ce_v     = Ca_v / N                     (:132)
  gamma    = 1/Ce_v + (aux2/3)(<dU><1/K> - <dU/K>)          (:137)
  K_S_aux  = N T (1 + 2 gamma - 1/Ce_v)/V + (<ddU> - 2<dU>)/(9V)   (:163)
  K_S      = K_S_aux - aux2 (<dU^2/K> - 2<dU><dU/K> + <dU>^2<1/K>)/(9V^2) (:164)
  kappa_S  = 1/K_S                        (:167)
  K_T      = K_S - T Ca_v gamma^2 / V     (:172)
  kappa_T  = 1/K_T                        (:174)
  Ca_p     = Ca_v K_S/K_T; Ce_p = Ca_p/N  (:181-182)
  alpha_E1 = 1 / (P V / Ca_v - gamma T)   (:188-190)
  alpha_E2 = 1 / ((1/3)(aux1 <K><dU/K> - <dU>))             (:193-195)
  alpha_S  = -1/(gamma T)                 (:198-200)
  alpha_P  = Ca_v gamma / (V K_T)         (:203)

The reference hard-stops when any guarded denominator is ~0 (:107,129,...);
here the pure-jnp path lets divisions produce inf/nan (vmappable over
ensemble replicas; a diverged replica invalidates only itself, SURVEY §5.3),
and ``check_finite`` offers the fail-fast behavior for host-side drivers.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ljmd_tpu.stats.moments import MeansReport

__all__ = ["ThermoCoefs", "thermo_coefs", "thermo_coefs_from_report"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ThermoCoefs:
    temperature: jax.Array
    pressure: jax.Array
    Ca_v: jax.Array
    Ce_v: jax.Array
    Ca_p: jax.Array
    Ce_p: jax.Array
    gamma: jax.Array
    K_S: jax.Array
    K_S_inv: jax.Array
    K_T: jax.Array
    K_T_inv: jax.Array
    alpha_E1: jax.Array
    alpha_E2: jax.Array
    alpha_S: jax.Array
    alpha_P: jax.Array

    def as_dict(self) -> dict:
        return {f.name: getattr(self, f.name) for f in dataclasses.fields(self)}

    def check_finite(self) -> "ThermoCoefs":
        """Host-side fail-fast equivalent of the reference's stop guards."""
        bad = [k for k, v in self.as_dict().items() if not bool(jnp.isfinite(v).all())]
        if bad:
            raise FloatingPointError(
                f"non-finite thermodynamic coefficients: {bad} "
                "(reference would stop on a ~0 denominator)"
            )
        return self


def thermo_coefs(
    n: int,
    volume: float,
    ekin_mean,
    press_mean,
    ekin_inv_mean,
    d_epot_mean,
    dd_epot_mean,
    d_epot_ekin_inv_mean,
    d_epot2_ekin_inv_mean,
) -> ThermoCoefs:
    npd = float(n)
    f = 3.0 * npd - 3.0
    if f <= 0.0:
        raise ValueError("degrees_of_freedom <= 0 (check N)")
    aux1 = 1.0 - 2.0 / f
    aux2 = f / 2.0 - 1.0

    # IEEE semantics for degenerate denominators (inf/nan instead of Python
    # ZeroDivisionError) regardless of whether inputs are floats or arrays.
    (
        ekin_mean,
        press_mean,
        ekin_inv_mean,
        d_epot_mean,
        dd_epot_mean,
        d_epot_ekin_inv_mean,
        d_epot2_ekin_inv_mean,
    ) = (
        jnp.asarray(v)
        for v in (
            ekin_mean,
            press_mean,
            ekin_inv_mean,
            d_epot_mean,
            dd_epot_mean,
            d_epot_ekin_inv_mean,
            d_epot2_ekin_inv_mean,
        )
    )

    temperature = 2.0 * ekin_mean / f
    pressure = press_mean

    ca_v = 1.0 / (1.0 - aux1 * ekin_mean * ekin_inv_mean)
    ce_v = ca_v / npd

    gamma = 1.0 / ce_v + (aux2 / 3.0) * (
        d_epot_mean * ekin_inv_mean - d_epot_ekin_inv_mean
    )

    k_s_aux = (
        npd * temperature * (1.0 + 2.0 * gamma - 1.0 / ce_v)
    ) / volume + (dd_epot_mean - 2.0 * d_epot_mean) / (9.0 * volume)
    fluct = (
        d_epot2_ekin_inv_mean
        - 2.0 * d_epot_mean * d_epot_ekin_inv_mean
        + d_epot_mean * d_epot_mean * ekin_inv_mean
    )
    k_s = k_s_aux - aux2 * fluct / (9.0 * volume * volume)
    k_s_inv = 1.0 / k_s

    k_t = k_s - (temperature * ca_v * gamma * gamma) / volume
    k_t_inv = 1.0 / k_t

    ca_p = ca_v * (k_s / k_t)
    ce_p = ca_p / npd

    alpha_e1 = 1.0 / (pressure * volume / ca_v - gamma * temperature)
    alpha_e2 = 1.0 / (
        (1.0 / 3.0) * (aux1 * ekin_mean * d_epot_ekin_inv_mean - d_epot_mean)
    )
    alpha_s = -1.0 / (gamma * temperature)
    alpha_p = (ca_v * gamma) / volume * k_t_inv

    as_arr = jnp.asarray
    return ThermoCoefs(
        temperature=as_arr(temperature),
        pressure=as_arr(pressure),
        Ca_v=as_arr(ca_v),
        Ce_v=as_arr(ce_v),
        Ca_p=as_arr(ca_p),
        Ce_p=as_arr(ce_p),
        gamma=as_arr(gamma),
        K_S=as_arr(k_s),
        K_S_inv=as_arr(k_s_inv),
        K_T=as_arr(k_t),
        K_T_inv=as_arr(k_t_inv),
        alpha_E1=as_arr(alpha_e1),
        alpha_E2=as_arr(alpha_e2),
        alpha_S=as_arr(alpha_s),
        alpha_P=as_arr(alpha_p),
    )


def thermo_coefs_from_report(n: int, volume: float, report: MeansReport) -> ThermoCoefs:
    """Wire the 7 required means out of a MeansReport, mirroring the driver
    call (md_simulation_program.f90:411-413)."""
    return thermo_coefs(
        n,
        volume,
        ekin_mean=report.mean("ekin"),
        press_mean=report.mean("press"),
        ekin_inv_mean=report.mean("ekin_inv"),
        d_epot_mean=report.mean("d_epot"),
        dd_epot_mean=report.mean("dd_epot"),
        d_epot_ekin_inv_mean=report.mean("d_epot_ekin_inv"),
        d_epot2_ekin_inv_mean=report.mean("d_epot2_ekin_inv"),
    )
