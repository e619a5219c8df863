"""TPU bench: fused pencil run_fast vs per-step cellpair at large N.

Usage: timeout 590 python scripts/bench_pencil_fused.py [num_cells]
"""

import dataclasses as _dc
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


def main(num_cells: int = 25, n_steps: int = 400, skin: float = 0.49):
    cfg = config_from_density(
        num_cells=num_cells, density=0.8442, dt=0.005, dtype="float32",
        neighbor_skin=skin,
    )
    n = cfg.n
    dtype = jnp.float32
    r = fcc_lattice(cfg.num_cells, cfg.box_length, dtype=dtype)
    v = remove_com_velocity(random_velocities(jax.random.PRNGKey(0), n, dtype=dtype))
    v = v * jnp.sqrt(0.728 / (jnp.sum(v * v) / (3 * n)))
    state = MDState(r=r, ru=r, v=v, a=jnp.zeros_like(r))

    # Melt + velocity-rescale cycles to the intended LIQUID point: the bare
    # FCC melt absorbs kinetic energy and freezes at T*~0.4 (a glass with
    # lattice-aliased pencil occupancy ~400 > the fluid's 384 capacity).
    eng0 = _cellpair_engine(cfg)
    c0, _ = eng0.init(state)

    @jax.jit
    def warm(c, k=400):
        def body(cc, _):
            cc2, _ob = eng0.step_fast(cc)
            return cc2, None
        out, _ = jax.lax.scan(body, c, None, length=k)
        return out

    for _ in range(4):
        c0 = warm(c0)
        st = eng0.get_state(c0)
        T_now = jnp.sum(st.v * st.v) / (3 * n)
        st = MDState(r=st.r, ru=st.ru, v=st.v * jnp.sqrt(0.728 / T_now),
                     a=st.a)
        c0, _ = eng0.init(st)
    c0 = warm(c0)
    state = eng0.get_state(c0)
    T_f = float(jnp.sum(state.v * state.v) / (3 * n))
    print(f"warmup done, T*={T_f:.3f}", flush=True)

    cfg_t = _dc.replace(cfg, neighbor_capacity=384)
    eng = _cellpair_engine(cfg_t, half_shell=True)
    carry, _ = eng.init(state)
    print(f"run_fast available: {eng.run_fast is not None}", flush=True)

    # per-step baseline
    @jax.jit
    def run_step(c):
        def body(cc, _):
            cc2, _ob = eng.step_fast(cc)
            return cc2, None
        out, _ = jax.lax.scan(body, c, None, length=n_steps)
        return out
    cend = run_step(carry)
    float(jnp.sum(cend.v))
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(run_step(carry).v))
        best = min(best, time.perf_counter() - t0)
    print(f"per-step: {best/n_steps*1e6:9.1f} us/step  "
          f"{n*n_steps/best:.3e} particle-steps/s", flush=True)

    # fused run_fast
    @jax.jit
    def run_fused(c):
        return eng.run_fast(c, n_steps)
    cend = run_fused(carry)
    float(jnp.sum(cend.v))
    print(f"fused overflow={bool(jax.device_get(cend.overflow))}", flush=True)
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(run_fused(carry).v))
        best = min(best, time.perf_counter() - t0)
    print(f"fused:    {best/n_steps*1e6:9.1f} us/step  "
          f"{n*n_steps/best:.3e} particle-steps/s", flush=True)

if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 25,
         skin=float(sys.argv[2]) if len(sys.argv) > 2 else 0.49)
