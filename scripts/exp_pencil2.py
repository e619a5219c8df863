"""TPU experiment: decompose the fused-pencil path at N=62500.

1. fused_pencil_chunk alone (chained, no rebin) -> in-kernel cost/step
2. rebin (argsort + 5 scatters) cost
3. implied rebin cadence

Usage: timeout 590 python scripts/exp_pencil2.py
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
from ljmd_tpu.ops.cell_list import make_pencil_grid, rebin_slots
from ljmd_tpu.ops.pallas_pencil2 import build_half_shell_tables, sentinel_fill
from ljmd_tpu.ops.pallas_pencil_fused import fused_pencil_chunk
from ljmd_tpu.state import MDState


def main(num_cells: int = 25):
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
    print("warmup done", flush=True)

    cfg_t = _dc.replace(cfg, neighbor_capacity=384)
    eng = _cellpair_engine(cfg_t, half_shell=True)
    carry, _ = eng.init(state)
    grid = make_pencil_grid(cfg_t.n, cfg_t.box_length, cfg_t.rc + 0.4,
                            cfg_t.density, 384)
    tbl, shf = build_half_shell_tables(grid)
    tbl = jnp.asarray(tbl)
    shf = jnp.asarray(shf)
    L = cfg_t.box_length

    # 1. fused kernel alone, 8-step chunks chained, NO rebin (flags go stale
    # but timing is what we want)
    k = 8
    n_chunks = 50

    @jax.jit
    def run_kernel(r8, v8, a8):
        def body(carry2, _):
            r_, v_, a_ = carry2
            r_, v_, a_ = fused_pencil_chunk(
                r_, v_, a_, tbl, shf, grid.n_pencils, grid.capacity,
                L, cfg_t.rc_square, cfg_t.dt, k, interpret=False)
            return (r_, v_, a_), None
        out, _ = jax.lax.scan(body, (r8, v8, a8), None, length=n_chunks)
        return out

    out = run_kernel(carry.r, carry.v, carry.a)
    float(jnp.sum(out[0]))
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(run_kernel(carry.r, carry.v, carry.a)[0]))
        best = min(best, time.perf_counter() - t0)
    t_kern = best / (k * n_chunks)
    print(f"fused kernel alone: {t_kern*1e6:9.1f} us/step "
          f"({n/t_kern:.3e} ps/s)", flush=True)

    # 2. rebin cost (argsort + sentinel + scatters of 5 arrays)
    @jax.jit
    def rebin(c):
        r8 = c.r
        new_slot, ovf = rebin_slots(r8, r8[3, :], grid)

        def permute(arr):
            out = jnp.zeros((8, grid.n_slots + 1), dtype)
            out = out.at[:, new_slot].set(arr)
            return out[:, :grid.n_slots]

        r8p = sentinel_fill(permute(r8), None, grid.capacity) if False else permute(r8)
        r8p = sentinel_fill(r8p, r8p[3, :], grid.capacity)
        return r8p, permute(c.ru), permute(c.v), permute(c.a), ovf

    outp = rebin(carry)
    float(jnp.sum(outp[0]))
    best = 1e30
    for _ in range(5):
        t0 = time.perf_counter()
        float(jnp.sum(rebin(carry)[0]))
        best = min(best, time.perf_counter() - t0)
    print(f"rebin (sort + 4 permutes): {best*1e6:9.1f} us", flush=True)

    # 3. cadence: steps until max displacement crosses thresholds
    c = carry
    moved_hist = []
    for i in range(6):
        c = eng.run_fast(c, 8) if eng.run_fast else c
        from ljmd_tpu.ops.geometry import minimum_image
        d = minimum_image(c.r[0:3] - c.r_ref[0:3], L)
        m2 = float(jnp.max(jnp.sum(d * d, axis=0) * c.r[3]))
        moved_hist.append(m2 ** 0.5)
    print("max displacement after each 8-step chunk:",
          [f"{x:.3f}" for x in moved_hist],
          f" rebuild at {0.25*0.4:.3f}, invalid at {0.5*0.4:.3f}", flush=True)


if __name__ == "__main__":
    main()
