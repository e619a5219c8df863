"""TPU differential-timing benchmark matrix: the headline configs.

Each measurement times TWO run lengths and reports the slope — the axon
tunnel charges a ~30 ms fixed cost per dispatch+fetch (measured with an
empty kernel, scripts/exp_* round 2), which single absolute timings at
n_steps <= 2000 inflate by 15-30%.

Usage: timeout 850 python scripts/bench_matrix.py [config ...]
  configs: 864 4000 4000ext 16384 62500 62500step (default: all)
"""

import dataclasses as _dc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _cellpair_engine, _zsort_engine
from ljmd_tpu.models.lattice import fcc_lattice, random_velocities, remove_com_velocity
from ljmd_tpu.state import MDState


def melt(cfg, cycles=4, steps=400, temp=0.728):
    n = cfg.n
    r = fcc_lattice(cfg.num_cells, cfg.box_length, dtype=jnp.float32)
    v = remove_com_velocity(
        random_velocities(jax.random.PRNGKey(0), n, dtype=jnp.float32)
    )
    v = v * jnp.sqrt(temp / (jnp.sum(v * v) / (3 * n)))
    state = MDState(r=r, ru=r, v=v, a=jnp.zeros_like(r))
    # zsort at large N would unroll a huge flags-kernel tile grid (compile
    # bomb); melt with the pencil engine there (lattice-safe default cap).
    if n >= 8192:
        eng = _cellpair_engine(cfg)
    else:
        eng = _zsort_engine(cfg, extended=False)
    if eng.run_fast is not None:
        adv = jax.jit(lambda cc: eng.run_fast(cc, steps))
    else:
        @jax.jit
        def adv(cc):
            def body(c2, _):
                c3, _o = eng.step_fast(c2)
                return c3, None
            out, _ = jax.lax.scan(body, cc, None, length=steps)
            return out
    c, _ = eng.init(state)
    for _ in range(cycles):
        c = adv(c)
        st = eng.get_state(c)
        T = jnp.sum(st.v * st.v) / (3 * n)
        c, _ = eng.init(
            MDState(r=st.r, ru=st.ru, v=st.v * jnp.sqrt(temp / T), a=st.a)
        )
    c = adv(c)
    return eng.get_state(c)


def diff_time(label, eng, state, n_short, n_long):
    n = state.r.shape[0]
    carry, _ = eng.init(state)

    if eng.run_fast is not None:
        runs = {k: jax.jit(lambda c, k=k: eng.run_fast(c, k))
                for k in (n_short, n_long)}
    else:
        def make(k):
            @jax.jit
            def run(c):
                def body(cc, _):
                    cc2, _o = eng.step_fast(cc)
                    return cc2, None
                out, _ = jax.lax.scan(body, c, None, length=k)
                return out
            return run
        runs = {k: make(k) for k in (n_short, n_long)}

    c = runs[n_short](carry)
    float(jnp.sum(c.v if hasattr(c, "v") else c[0].v))
    c = runs[n_long](carry)
    float(jnp.sum(c.v if hasattr(c, "v") else c[0].v))

    slopes = []
    for _ in range(5):
        t0 = time.perf_counter()
        c = runs[n_short](carry)
        float(jnp.sum(c.v if hasattr(c, "v") else c[0].v))
        t1 = time.perf_counter()
        c = runs[n_long](carry)
        float(jnp.sum(c.v if hasattr(c, "v") else c[0].v))
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (n_long - n_short))
    slopes.sort()
    slope = slopes[len(slopes) // 2]  # median: single-rep flukes poison max
    best = n / slope if slope > 0 else 0.0
    us = slope * 1e6 if slope > 0 else float("inf")
    diag = {k2: bool(jax.device_get(v2))
            for k2, v2 in eng.diagnostics(c).items()}
    print(f"{label:28s}: {us:9.2f} us/step  {best:.3e} particle-steps/s  "
          f"{diag}", flush=True)


def main(which):
    if "864" in which:
        cfg = config_from_density(num_cells=6, density=0.8442, dt=0.005,
                                  dtype="float32")
        st = melt(cfg)
        diff_time("N=864   zsort", _zsort_engine(cfg, extended=False), st,
                  2000, 10000)
    if "4000" in which:
        cfg = config_from_density(num_cells=10, density=0.8442, dt=0.005,
                                  dtype="float32")
        st = melt(cfg)
        diff_time("N=4000  zsort", _zsort_engine(cfg, extended=False), st,
                  2000, 8000)
    if "4000ext" in which:
        cfg = config_from_density(num_cells=10, density=0.8442, dt=0.005,
                                  dtype="float32")
        st = melt(cfg)
        diff_time("N=4000  zsort ext", _zsort_engine(cfg, extended=True), st,
                  2000, 8000)
    if "16384" in which:
        cfg = config_from_density(num_cells=16, density=0.8442, dt=0.005,
                                  dtype="float32", neighbor_skin=0.49)
        st = melt(cfg)
        diff_time("N=16384 zsort slab",
                  _zsort_engine(cfg, extended=False, slab_sort=True), st,
                  500, 2000)
        diff_time("N=16384 pencil-fused", _cellpair_engine(cfg), st, 500, 2000)
    if "19652" in which:
        # Just under the window-list SMEM cliff (154^2 = 23716 <= 32768
        # block pairs): the largest N the auto policy routes to zsort.
        # Measured 2026-08-18: zsort slab 3.51e7 vs pencil 3.43e7 ps/s —
        # routing boundary confirmed on the zsort side up to the cliff.
        cfg = config_from_density(num_cells=17, density=0.8442, dt=0.005,
                                  dtype="float32", neighbor_skin=0.49)
        st = melt(cfg)
        diff_time("N=19652 zsort slab",
                  _zsort_engine(cfg, extended=False, slab_sort=True), st,
                  400, 1600)
        diff_time("N=19652 pencil-fused", _cellpair_engine(cfg), st, 400, 1600)
    if "62500" in which:
        cfg = config_from_density(num_cells=25, density=0.8442, dt=0.005,
                                  dtype="float32", neighbor_skin=0.49)
        st = melt(cfg)
        cfg_t = _dc.replace(cfg, neighbor_capacity=384)
        diff_time("N=62500 pencil-fused c384",
                  _cellpair_engine(cfg_t), st, 400, 1600)
        if "62500step" in which:
            eng = _cellpair_engine(cfg_t)
            eng = eng._replace(run_fast=None)
            diff_time("N=62500 pencil per-step", eng, st, 200, 800)


if __name__ == "__main__":
    args = sys.argv[1:] or ["864", "4000", "4000ext", "16384", "19652",
                            "62500"]
    main(args)
