"""TPU param sweep for the zsort engine at N=4000."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _zsort_engine
from ljmd_tpu.models.lattice import fcc_lattice, random_velocities, remove_com_velocity
from ljmd_tpu.state import MDState


def main():
    cfg = config_from_density(num_cells=10, density=0.8442, dt=0.005, dtype="float32")
    n = cfg.n
    dtype = jnp.float32
    r = fcc_lattice(cfg.num_cells, cfg.box_length, dtype=dtype)
    v = remove_com_velocity(random_velocities(jax.random.PRNGKey(0), n, dtype=dtype))
    v = v * jnp.sqrt(0.728 / (jnp.sum(v * v) / (3 * n)))
    state = MDState(r=r, ru=r, v=v, a=jnp.zeros_like(r))
    n_steps = 2000

    variants = [
        dict(sort_skin=0.7, inner_chunk=8, tile_j=512),
        dict(sort_skin=0.7, inner_chunk=8, tile_j=512, extended=True),
        dict(sort_skin=0.5, inner_chunk=8, tile_j=512),
        dict(sort_skin=0.7, inner_chunk=16, tile_j=512),
    ]
    for kw in variants:
        eng = _zsort_engine(cfg, **kw)
        c0, _ = eng.init(state)
        run = jax.jit(lambda c, eng=eng: eng.run_fast(c, n_steps))
        c = run(c0)
        float(jnp.sum(c.v))
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            c = run(c0)
            float(jnp.sum(c.v))
            best = min(best, time.perf_counter() - t0)
        inv = bool(jax.device_get(c.invalid))
        print(f"{kw}: {best/n_steps*1e6:8.2f} us/step  "
              f"{n*n_steps/best:.3e} p-s/s  invalid={inv}", flush=True)


if __name__ == "__main__":
    main()
