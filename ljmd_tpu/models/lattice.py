"""Initial-configuration builders: FCC lattice and velocity initialization.

Rebuild of the init pipeline in ``scripts/md_initial_config_program.f90``:

- ``fcc_lattice``: k^3 unit cells x 4-atom basis (0,0,0), (0,1/2,1/2),
  (1/2,0,1/2), (1/2,1/2,0), lattice constant a = L/k, cell-major ordering
  (ix outer, iy, iz, then basis) to match the reference's particle indexing
  exactly (md_initial_config_program.f90:132-187).
- ``random_velocities``: uniform in (-0.5, 0.5) per component
  (md_initial_config_program.f90:196-209). The reference's SAVE-state ran3
  RNG is replaced by JAX's counter-based threefry (splittable per replica —
  fixes the reference's global-stream reproducibility quirk, SURVEY §2.3.7);
  a bit-exact ran3 port for parity lives in ``ljmd_tpu/utils/ran3.py``.
- ``remove_com_velocity``: zero total momentum
  (md_initial_config_program.f90:218-234).
- ``rescale_to_target_energy``: v *= sqrt((E_target - U) / K)
  (md_initial_config_program.f90:244-266).

All are pure functions on arrays, built with constant folding in mind: the
lattice is computed in float64 numpy at trace time (positions are exact
multiples of a/2) then cast to the working dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "fcc_lattice",
    "random_velocities",
    "remove_com_velocity",
    "rescale_to_target_energy",
]

# FCC basis in units of the lattice constant, reference order
# (md_initial_config_program.f90:156-178).
_FCC_BASIS = np.array(
    [
        [0.0, 0.0, 0.0],
        [0.0, 0.5, 0.5],
        [0.5, 0.0, 0.5],
        [0.5, 0.5, 0.0],
    ]
)


def fcc_lattice(num_cells: int, box_length: float, dtype=jnp.float32) -> jax.Array:
    """(4 k^3, 3) FCC positions in [0, L), reference ordering."""
    k = num_cells
    a = box_length / k
    # Cell origins in ix-major / iy / iz order (md_initial_config_program.f90:144-146).
    ix, iy, iz = np.meshgrid(np.arange(k), np.arange(k), np.arange(k), indexing="ij")
    origins = np.stack([ix, iy, iz], axis=-1).reshape(-1, 3) * a  # (k^3, 3)
    pos = origins[:, None, :] + _FCC_BASIS[None, :, :] * a        # (k^3, 4, 3)
    return jnp.asarray(pos.reshape(-1, 3), dtype=dtype)


def random_velocities(key: jax.Array, n: int, dtype=jnp.float32) -> jax.Array:
    """(N, 3) velocities uniform in (-0.5, 0.5) per component."""
    return jax.random.uniform(key, (n, 3), dtype=dtype, minval=-0.5, maxval=0.5)


def remove_com_velocity(v: jax.Array) -> jax.Array:
    """Subtract the center-of-mass velocity: sum_i v_i = 0 afterwards."""
    return v - jnp.mean(v, axis=-2, keepdims=True)


def rescale_to_target_energy(v: jax.Array, epot, target_total_energy) -> jax.Array:
    """Uniformly rescale velocities so E_pot + E_kin = target.

    alpha = sqrt((E_target - U) / K_old). The reference aborts when the
    required kinetic energy is non-positive (md_initial_config_program.f90:257);
    here that produces NaN velocities, which the driver-level checkify/NaN
    guards surface (SURVEY §5.2 rebuild policy).
    """
    ekin_old = 0.5 * jnp.sum(v * v)
    ekin_new = jnp.asarray(target_total_energy, v.dtype) - epot
    scale = jnp.sqrt(ekin_new / ekin_old)
    return v * scale
