"""Round-5: tile_j sweep for the triangular self-block sweep of the
half-ring decomposition (pallas_pair_sweep_tri + reaction reduction).

mesh=1 half-ring measured 175.6 us/step at N=4000 vs the single-chip rows
engine's 117.9 (bench_sharded_mesh1, 2026-08-20). At TJ=1024 the
whole-tile triangular skip rate is only 37.5% (48/128 tiles) vs 48.4% at
TJ=128; smaller TJ buys skip rate at the cost of per-visit overhead and a
larger out2 reaction buffer (grid_i rows). This times the raw sweep+reduce
(chained lax.scan repeats, differential) per TJ.

Usage: timeout 1800 python scripts/exp_r5_tri_tj.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench_matrix import melt
from ljmd_tpu.config import config_from_density
from ljmd_tpu.ops.pallas_lj import pallas_pair_sweep_tri

print("devices:", jax.devices(), flush=True)

cfg = config_from_density(num_cells=10, density=0.8442, dt=0.005,
                          dtype="float32")
st = melt(cfg)
n = cfg.n
ni_pad = 4096
pos = jnp.zeros((8, ni_pad), jnp.float32).at[0:3, :n].set(st.r.T)


def make_run(tile_j, reps):
    @jax.jit
    def run(p):
        def body(c, _):
            out = pallas_pair_sweep_tri(
                c, n, cfg.box_length, cfg.rc_square,
                tile_i=128, tile_j=tile_j, interpret=False,
            )
            # data-dependence chain: nudge positions by a zero-ish amount
            return c + 0.0 * out, None
        c, _ = jax.lax.scan(body, p, None, length=reps)
        return c
    return run


for tile_j in (128, 256, 512, 1024):
    short, long_ = 200, 800
    runs = {k: make_run(tile_j, k) for k in (short, long_)}
    for k in (short, long_):
        float(jnp.sum(runs[k](pos)))  # warm
    slopes = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(jnp.sum(runs[short](pos)))
        t1 = time.perf_counter()
        float(jnp.sum(runs[long_](pos)))
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (long_ - short))
    slopes.sort()
    us = slopes[len(slopes) // 2] * 1e6
    print(f"tri TJ={tile_j:5d}: {us:8.2f} us/sweep", flush=True)
