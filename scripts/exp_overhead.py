"""TPU experiment: decompose fixed overheads in the two hot kernels.

Part A (zsort, N=4000): time fused_dense_chunk_flags with all-zero /
all-one / real flags to split per-tile-visit overhead from pair math.

Part B (pencil, N=62500): time the half-shell sweep kernel alone (chained,
data-dependent) vs the full engine step to split kernel vs engine overhead.

Usage: timeout 590 python scripts/exp_overhead.py [a|b|ab]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.lattice import fcc_lattice, random_velocities, remove_com_velocity
from ljmd_tpu.state import MDState


def fetch(x):
    return float(jnp.sum(x))


def best_of(fn, reps=3):
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def part_a():
    from ljmd_tpu.models.engine import _zsort_engine
    from ljmd_tpu.ops.pallas_fused import fused_dense_chunk_flags

    cfg = config_from_density(num_cells=10, density=0.8442, dt=0.005,
                              dtype="float32")
    n = cfg.n
    r = fcc_lattice(cfg.num_cells, cfg.box_length, dtype=jnp.float32)
    v = remove_com_velocity(random_velocities(jax.random.PRNGKey(0), n,
                                              dtype=jnp.float32))
    v = v * jnp.sqrt(0.728 / (jnp.sum(v * v) / (3 * n)))
    state = MDState(r=r, ru=r, v=v, a=jnp.zeros_like(r))
    eng = _zsort_engine(cfg, extended=False)
    c, _ = eng.init(state)
    # melt a bit so flags are realistic
    c = jax.jit(lambda cc: eng.run_fast(cc, 512), static_argnums=())(c)
    fetch(c.v)

    tile_i, tile_j = 128, 512
    n_pad = c.r.shape[1]
    n_tiles = (n_pad // tile_i) * (n_pad // tile_j)
    real_flags = c.flags
    n_active = int(jax.device_get((real_flags > 0).sum()))
    print(f"N={n} n_pad={n_pad} tiles={n_tiles} active={n_active}", flush=True)

    k = 8
    n_chunks = 125  # 1000 steps

    def run(flags):
        @jax.jit
        def go(r0, v0, a0):
            def body(carry, _):
                r_, v_, a_ = carry
                r_, v_, a_ = fused_dense_chunk_flags(
                    r_, v_, a_, flags, n, cfg.box_length, cfg.rc_square,
                    cfg.dt, k, tile_i=tile_i, tile_j=tile_j, interpret=False)
                return (r_, v_, a_), None
            (r_, v_, a_), _ = jax.lax.scan(body, (r0, v0, a0), None,
                                           length=n_chunks)
            return r_, v_, a_
        out = go(c.r, c.v, c.a)
        fetch(out[0])
        t = best_of(lambda: fetch(go(c.r, c.v, c.a)[0]))
        return t / (k * n_chunks)

    zero = jnp.zeros_like(real_flags)
    ones = jnp.full_like(real_flags, 3)
    t_zero = run(zero)
    t_real = run(real_flags)
    t_ones = run(ones)
    # candidates: real ~ active fraction * full; diagonal tiles triangular
    print(f"zsort fused chunk us/step:  zero={t_zero*1e6:.2f}  "
          f"real={t_real*1e6:.2f}  ones={t_ones*1e6:.2f}", flush=True)
    full_cand = n_pad * n_pad / 2
    rate = full_cand / (t_ones - t_zero)
    print(f"pair-math rate (ones-zero): {rate/1e9:.1f} Gcand/s; "
          f"per-tile-visit overhead ~ {t_zero*1e6/n_tiles*1000:.1f} ns "
          f"(incl integrator)", flush=True)


def part_b():
    import dataclasses as _dc

    from ljmd_tpu.models.engine import _cellpair_engine
    from ljmd_tpu.ops.cell_list import make_pencil_grid
    from ljmd_tpu.ops.pallas_pencil2 import (
        build_half_shell_tables, pallas_pencil_sweep_hs)

    cfg = config_from_density(num_cells=25, density=0.8442, dt=0.005,
                              dtype="float32", neighbor_skin=0.4)
    n = cfg.n
    r = fcc_lattice(cfg.num_cells, cfg.box_length, dtype=jnp.float32)
    v = remove_com_velocity(random_velocities(jax.random.PRNGKey(0), n,
                                              dtype=jnp.float32))
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
    print(f"grid m={grid.m_xy} cap={grid.capacity} pencils={grid.n_pencils}",
          flush=True)

    n_steps = 200

    # 1) full engine step_fast (the round-2 measured number)
    @jax.jit
    def run_step(c):
        def body(cc, _):
            cc2, _ob = eng.step_fast(cc)
            return cc2, None
        out, _ = jax.lax.scan(body, c, None, length=n_steps)
        return out
    cend = run_step(carry)
    fetch(cend.v)
    t_step = best_of(lambda: fetch(run_step(carry).v)) / n_steps
    print(f"engine step_fast: {t_step*1e6:9.1f} us/step", flush=True)

    # 2) sweep alone, chained (data-dependent feedback, negligible change)
    pos0 = carry.r
    counts = carry.counts

    @jax.jit
    def run_sweep(pos):
        def body(p, _):
            out = pallas_pencil_sweep_hs(
                p, tbl, counts, shf, grid, cfg_t.rc_square,
                interpret=False, want_observables=False,
                approx_reciprocal=True)
            p = p + 1e-30 * out
            return p, None
        p, _ = jax.lax.scan(body, pos, None, length=n_steps)
        return p
    pend = run_sweep(pos0)
    fetch(pend)
    t_sweep = best_of(lambda: fetch(run_sweep(pos0))) / n_steps
    print(f"hs sweep alone:   {t_sweep*1e6:9.1f} us/call "
          f"(engine overhead ~ {(t_step - t_sweep)*1e6:.1f} us/step)",
          flush=True)

    # candidates per program for the rate
    cap = grid.capacity
    n_sub = cap // 128
    cand = grid.n_pencils * (
        sum(128 * (cap - 128 * si) for si in range(n_sub))
        + n_sub * 4 * 128 * cap)
    print(f"candidates/step = {cand/1e6:.1f}M -> sweep rate "
          f"{cand/t_sweep/1e9:.1f} Gcand/s", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "ab"
    if "a" in which:
        part_a()
    if "b" in which:
        part_b()
