"""TPU bench: cellpair engine variants at large N (config-5 scale).

Usage: timeout 590 python scripts/bench_pencil.py [num_cells]
Default num_cells=25 -> N=62500 (the round-1 large-N measurement point).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _cellpair_engine
from ljmd_tpu.models.lattice import fcc_lattice, random_velocities, remove_com_velocity
from ljmd_tpu.state import MDState


def main(num_cells: int = 25, n_steps: int = 200):
    cfg = config_from_density(
        num_cells=num_cells, density=0.8442, dt=0.005, dtype="float32",
        neighbor_skin=0.4,
    )
    n = cfg.n
    dtype = jnp.float32
    r = fcc_lattice(cfg.num_cells, cfg.box_length, dtype=dtype)
    v = remove_com_velocity(random_velocities(jax.random.PRNGKey(0), n, dtype=dtype))
    v = v * jnp.sqrt(0.728 / (jnp.sum(v * v) / (3 * n)))
    state = MDState(r=r, ru=r, v=v, a=jnp.zeros_like(r))

    # Melt the lattice with the lattice-safe default capacity, then time the
    # equilibrated fluid with the tight capacity (production restart pattern).
    eng0 = _cellpair_engine(cfg)
    c0, _ = eng0.init(state)

    @jax.jit
    def warm(c):
        def body(cc, _):
            cc2, _ob = eng0.step_fast(cc)
            return cc2, None
        out, _ = jax.lax.scan(body, c, None, length=300)
        return out

    c0 = warm(c0)
    state = eng0.get_state(c0)
    print(f"warmup done (default cap, overflow={bool(jax.device_get(c0.overflow))})",
          flush=True)

    import dataclasses as _dc

    cfg_tight = _dc.replace(cfg, neighbor_capacity=384)

    for name, cfg_b, kwargs in [
        ("full9", cfg_tight, dict(half_shell=False)),
        ("halfshell", cfg_tight, dict(half_shell=True)),
    ]:
        eng = _cellpair_engine(cfg_b, **kwargs)
        carry, _ = eng.init(state)

        @jax.jit
        def run(c, eng=eng):
            def body(cc, _):
                cc2, _ob = eng.step_fast(cc)
                return cc2, None
            out, _ = jax.lax.scan(body, c, None, length=n_steps)
            return out

        c = run(carry)
        float(jnp.sum(c.v))
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            c = run(carry)
            float(jnp.sum(c.v))
            best = min(best, time.perf_counter() - t0)
        print(f"N={n} {name:10s}: {best/n_steps*1e3:8.3f} ms/step  "
              f"{n*n_steps/best:.3e} particle-steps/s  "
              f"overflow={bool(jax.device_get(c.overflow))}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 25)
