"""TPU drift measurement: max |dE/E| over a long NVE run at dt=0.005, f32,
N=4000 (the BASELINE accuracy target: < 1e-4 per 1e6 steps).

Usage: timeout 590 python scripts/bench_drift.py [n_steps] [variant ...]
Variants: rows, ext (rows+extended precision), zsort.
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _pallas_rows_engine, _zsort_engine
from ljmd_tpu.models.lattice import fcc_lattice, random_velocities, remove_com_velocity
from ljmd_tpu.state import MDState


def main(n_steps: int, variants):
    cfg = config_from_density(num_cells=10, density=0.8442, dt=0.005, dtype="float32")
    n = cfg.n
    dtype = jnp.float32
    r = fcc_lattice(cfg.num_cells, cfg.box_length, dtype=dtype)
    v = remove_com_velocity(random_velocities(jax.random.PRNGKey(0), n, dtype=dtype))
    v = v * jnp.sqrt(0.728 / (jnp.sum(v * v) / (3 * n)))
    state0 = MDState(r=r, ru=r, v=v, a=jnp.zeros_like(r))

    def make(name):
        if name == "rows":
            return _pallas_rows_engine(cfg)
        if name == "ext":
            return _pallas_rows_engine(dataclasses.replace(cfg, compensated_sum=True))
        if name == "zsort":
            return _zsort_engine(cfg)
        if name == "zsortext":
            return _zsort_engine(cfg, extended=True)
        if name == "zsort_notails":
            return _zsort_engine(cfg, tail_tiles=False)
        raise ValueError(name)

    check_every = 10_000
    for name in variants:
        eng = make(name)
        # equilibrate 2000 steps, then measure from there
        carry, _ = eng.init(state0)
        carry = jax.jit(lambda c, eng=eng: eng.run_fast(c, 2000))(carry)
        carry, ob0 = jax.jit(eng.step)(carry)
        e0 = float(ob0.epot) + float(ob0.ekin)

        block = jax.jit(lambda c, eng=eng: eng.run_fast(c, check_every - 1))
        step1 = jax.jit(eng.step)
        rels = []
        t0 = time.perf_counter()
        done = 0
        while done < n_steps:
            carry = block(carry)
            carry, ob = step1(carry)
            done += check_every
            e = float(ob.epot) + float(ob.ekin)
            rels.append((e - e0) / abs(e0))
        dt_s = time.perf_counter() - t0
        rels = np.asarray(rels)
        steps_axis = np.arange(1, len(rels) + 1) * check_every
        slope = np.polyfit(steps_axis, rels, 1)[0] * 1e6  # secular dE/E per 1e6
        diag = {k: bool(jax.device_get(v))
                for k, v in eng.diagnostics(carry).items()}
        print(f"{name:6s}: steps={done} max|dE/E|={np.max(np.abs(rels)):.3e} "
              f"final={rels[-1]:+.3e} secular_slope={slope:+.3e}/1e6 "
              f"fluct_std={np.std(rels):.3e} E0={e0:.2f} "
              f"rate={n*done/dt_s:.3e} p-s/s {diag}", flush=True)


if __name__ == "__main__":
    ns = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    vs = sys.argv[2:] or ["rows", "ext"]
    main(ns, vs)
