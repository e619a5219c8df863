"""Generate engine-level golden parity fixtures (VERDICT round 1, item 6).

No gfortran exists in this image, so the fixtures are produced by a
transparent scalar-loop float64 mirror of the reference engine's algorithm,
written directly against the cited Fortran:

- FCC lattice, cell-major ix/iy/iz loop with the 4-atom basis in the
  reference's order (``md_initial_config_program.f90:132-187``)
- ran3 velocity draw with seed -12345, (vx, vy, vz) per particle
  (``md_initial_config_program.f90:196-209``; bit-exact stream from
  ``ljmd_tpu/utils/ran3.py``)
- COM removal (``:218-234``), rescale to target E
  (``:244-266``)
- LJ kernel: sequential i<j scalar loop, MIC via nint, cutoff, prefactors
  4/24 restored after the loop, mean-field tail corrections
  (``scripts/physics/lj_potential_energy.f90:109-223``)
- velocity-Verlet steps (``scripts/physics/verlet.f90:41-97``)

Everything is exact-order scalar float64 accumulation — the same arithmetic
the gfortran -O2 binary performs up to instruction-level reassociation, so
agreement far tighter than the 1e-6 north-star bound is expected from any
correct engine. Output JSON files are checked in; re-run this script only to
regenerate them (python tests/golden/generate_golden.py).
"""

from __future__ import annotations

import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from ljmd_tpu.utils.ran3 import reference_initial_velocities  # noqa: E402


def fcc(num_cells: int, L: float) -> np.ndarray:
    a = L / num_cells
    basis = [(0.0, 0.0, 0.0), (0.0, 0.5, 0.5), (0.5, 0.0, 0.5), (0.5, 0.5, 0.0)]
    out = []
    for ix in range(num_cells):
        for iy in range(num_cells):
            for iz in range(num_cells):
                for bx, by, bz in basis:
                    out.append(((ix + bx) * a, (iy + by) * a, (iz + bz) * a))
    return np.asarray(out, dtype=np.float64)


def lj_kernel(r: np.ndarray, L: float, rc: float, volume: float):
    """Scalar-loop mirror of compute_lj_potential_energy (f90:85-223)."""
    n = r.shape[0]
    rc2 = rc * rc
    inv_L = 1.0 / L
    epot = 0.0
    d_epot = 0.0
    dd_epot = 0.0
    acc = np.zeros((n, 3), dtype=np.float64)
    for i in range(n - 1):
        xi, yi, zi = r[i]
        for j in range(i + 1, n):
            dx = xi - r[j, 0]
            dy = yi - r[j, 1]
            dz = zi - r[j, 2]
            # dnint = round-half-away-from-zero; nearest-even differs only at
            # exact .5 which has measure zero for fluid configs
            dx -= L * np.round(dx * inv_L)
            dy -= L * np.round(dy * inv_L)
            dz -= L * np.round(dz * inv_L)
            r2 = dx * dx + dy * dy + dz * dz
            if r2 < rc2:
                inv_r2 = 1.0 / r2
                inv_r6 = inv_r2 * inv_r2 * inv_r2
                inv_r12 = inv_r6 * inv_r6
                epot += inv_r12 - inv_r6
                du = -2.0 * inv_r12 + inv_r6
                fx = -du * dx * inv_r2
                fy = -du * dy * inv_r2
                fz = -du * dz * inv_r2
                acc[i, 0] += fx
                acc[i, 1] += fy
                acc[i, 2] += fz
                acc[j, 0] -= fx
                acc[j, 1] -= fy
                acc[j, 2] -= fz
                d_epot += du
                dd_epot += 26.0 * inv_r12 - 7.0 * inv_r6
    epot *= 4.0
    acc *= 24.0
    d_epot *= 24.0
    dd_epot *= 24.0
    # tail corrections (f90:205-223)
    tail = 8.0 * math.pi * n * n / (volume * rc**3)
    epot += tail * ((1.0 / (3.0 * rc**6)) - 1.0) / 3.0
    d_epot += 2.0 * tail * (-2.0 / (3.0 * rc**6) + 1.0)
    dd_epot += 2.0 * tail * (26.0 / (3.0 * rc**6) - 7.0)
    return epot, d_epot, dd_epot, acc


def wrap(r: np.ndarray, L: float) -> np.ndarray:
    return r - L * np.floor(r / L)


def verlet_step(r, v, a, dt, L, rc, volume):
    """verlet.f90:41-97 in functional form."""
    r = wrap(r + v * dt + a * (0.5 * dt * dt), L)
    v = v + a * (0.5 * dt)
    epot, d_epot, dd_epot, a = lj_kernel(r, L, rc, volume)
    v = v + a * (0.5 * dt)
    ekin = 0.5 * float(np.sum(v * v))
    return r, v, a, epot, ekin, d_epot, dd_epot


def make_case(num_cells: int, L: float, rc_over_L: float, e_target: float,
              n_verlet: int, dt: float) -> dict:
    n = 4 * num_cells**3
    rc = rc_over_L * L
    volume = L**3
    r = fcc(num_cells, L)
    v = reference_initial_velocities(n, seed=-12345)
    v -= v.mean(axis=0, keepdims=True)

    epot0, d0, dd0, acc0 = lj_kernel(r, L, rc, volume)
    ekin_old = 0.5 * float(np.sum(v * v))
    ekin_new = e_target - epot0
    assert ekin_new > 0, "target energy too low for this lattice"
    v *= math.sqrt(ekin_new / ekin_old)

    rr, vv, aa = r.copy(), v.copy(), acc0.copy()
    traj = []
    for _ in range(n_verlet):
        rr, vv, aa, e, k, d, dd = verlet_step(rr, vv, aa, dt, L, rc, volume)
        traj.append({"epot": e, "ekin": k, "d_epot": d, "dd_epot": dd})

    return {
        "num_cells": num_cells,
        "box_length": L,
        "rc_over_box": rc_over_L,
        "target_total_energy": e_target,
        "dt": dt,
        "n": n,
        "lattice": {
            "epot": epot0,
            "d_epot": d0,
            "dd_epot": dd0,
            "force_abs_sum": float(np.sum(np.abs(acc0))),
            "forces_first3": acc0[:3].tolist(),
            "ekin_after_rescale": ekin_new,
            "v_first3": v[:3].tolist(),
            "v_abs_sum": float(np.sum(np.abs(v))),
        },
        "verlet": traj,
        "final_r_first3": rr[:3].tolist(),
        "final_r_abs_sum": float(np.sum(np.abs(rr))),
    }


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    cases = [
        # (num_cells, L, rc/L, E_target, n_verlet, dt)
        (2, 4.2, 0.45, -60.0, 5, 0.002),   # N=32, dense liquid-ish box
        (3, 6.0, 0.40, -280.0, 5, 0.002),   # N=108
    ]
    for num_cells, L, rcl, et, nv, dt in cases:
        case = make_case(num_cells, L, rcl, et, nv, dt)
        path = os.path.join(here, f"golden_k{num_cells}.json")
        with open(path, "w") as f:
            json.dump(case, f, indent=1)
        print("wrote", path, "epot_lattice=", case["lattice"]["epot"])


if __name__ == "__main__":
    main()
