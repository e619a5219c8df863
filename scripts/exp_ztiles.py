"""TPU experiment: zsort engine tile-geometry sweep at N=4000.

Per exp_overhead.py the fused flags kernel pays ~0.6us per VISITED tile pair
(even when skipped) and only ~7ns/candidate of pair math — so visit count,
not candidate count, rules at this N. Sweep (tile_i, tile_j) to find the
minimum of  visits * overhead + candidates / 136G.

Usage: timeout 590 python scripts/exp_ztiles.py
"""

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
    cfg = config_from_density(num_cells=10, density=0.8442, dt=0.005,
                              dtype="float32")
    n = cfg.n
    r = fcc_lattice(cfg.num_cells, cfg.box_length, dtype=jnp.float32)
    v = remove_com_velocity(random_velocities(jax.random.PRNGKey(0), n,
                                              dtype=jnp.float32))
    v = v * jnp.sqrt(0.728 / (jnp.sum(v * v) / (3 * n)))
    state0 = MDState(r=r, ru=r, v=v, a=jnp.zeros_like(r))

    # melt once with the default engine
    eng0 = _zsort_engine(cfg, extended=False)
    c0, _ = eng0.init(state0)
    c0 = jax.jit(lambda cc: eng0.run_fast(cc, 1024))(c0)
    state = eng0.get_state(c0)
    float(jnp.sum(state.r))
    print("melt done", flush=True)

    n_steps = 1024
    for ti, tj in [(128, 512), (256, 512), (512, 512), (256, 256),
                   (512, 1024), (256, 1024), (1024, 1024)]:
        try:
            eng = _zsort_engine(cfg, extended=False, tile_i=ti, tile_j=tj)
        except ValueError as e:
            print(f"TI={ti} TJ={tj}: {e}", flush=True)
            continue
        carry, _ = eng.init(state)

        @jax.jit
        def run(c, eng=eng):
            return eng.run_fast(c, n_steps)

        cend = run(carry)
        float(jnp.sum(cend.v))
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(run(carry).v))
            best = min(best, time.perf_counter() - t0)
        n_active = int(jax.device_get((carry.flags > 0).sum()))
        n_flags = carry.flags.shape[0]
        print(f"TI={ti:4d} TJ={tj:5d}: {best/n_steps*1e6:7.2f} us/step  "
              f"{n*n_steps/best:.3e} ps/s  active={n_active}/{n_flags} "
              f"invalid={bool(jax.device_get(cend.invalid))}", flush=True)


if __name__ == "__main__":
    main()
