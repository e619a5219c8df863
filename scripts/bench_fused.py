"""TPU micro-bench: per-step scan vs fused multi-step kernel.

Usage: timeout 600 python scripts/bench_fused.py [num_cells ...]
Times by chained data-dependent fetch (CLAUDE.md TPU measurement rules).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import make_engine, _pallas_rows_engine, _zsort_engine
from ljmd_tpu.models.lattice import fcc_lattice, random_velocities, remove_com_velocity
from ljmd_tpu.state import MDState


def bench(num_cells: int, n_steps: int = 2000):
    cfg = config_from_density(
        num_cells=num_cells, density=0.8442, dt=0.005, dtype="float32",
    )
    dtype = jnp.float32
    r = fcc_lattice(cfg.num_cells, cfg.box_length, dtype=dtype)
    v = remove_com_velocity(random_velocities(jax.random.PRNGKey(0), cfg.n, dtype=dtype))
    v = v * jnp.sqrt(0.728 / (jnp.sum(v * v) / (3 * cfg.n)))
    state = MDState(r=r, ru=r, v=v, a=jnp.zeros_like(r))

    engines = [("rows", _pallas_rows_engine(cfg))]
    try:
        engines.append(("zsort", _zsort_engine(cfg)))
    except ValueError as e:
        print("zsort unavailable:", e)

    def sync(c):
        return float(jnp.sum(c.v))

    for ename, eng in engines:
        carry0, _ = eng.init(state)

        @jax.jit
        def run_fused(c, eng=eng):
            return eng.run_fast(c, n_steps)

        c = run_fused(carry0)
        sync(c)  # compile + settle
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            c = run_fused(carry0)
            sync(c)
            best = min(best, time.perf_counter() - t0)
        us_per_step = best / n_steps * 1e6
        rate = cfg.n * n_steps / best
        diag = {k: bool(jax.device_get(v)) for k, v in eng.diagnostics(c).items()}
        print(f"N={cfg.n:6d} {ename:6s}: {us_per_step:8.2f} us/step  "
              f"{rate:.3e} particle-steps/s  {diag}", flush=True)


if __name__ == "__main__":
    cells = [int(x) for x in sys.argv[1:]] or [6, 10]
    for k in cells:
        bench(k)
