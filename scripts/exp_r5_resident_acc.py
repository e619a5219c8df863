"""Round-5: TPU validation + timing of the VMEM-resident reaction
accumulator in pallas_pair_sweep_tri / pallas_pair_sweep_rect_newton
(replaces the (grid_i, 8, n_pad) HBM reaction buffer + XLA reduce that
bench_sharded_mesh1 identified as part of the half-ring mesh=1 residual).

Three stages:
  1. numeric parity on real TPU: tri(out1+out2) forces vs the full ordered
     sweep's forces; pair-once scalars x2 vs ordered scalars; rect_newton
     i+j sides vs the ordered rect sweep both ways.
  2. tri TJ sweep (exp_r5_tri_tj's measurement, now on the resident
     accumulator) — raw sweep time per TJ at N=4000/ni_pad=4096.
  3. half-ring mesh=1 differential (the bench_sharded_mesh1 half-ring leg)
     vs the single-chip dense rows engine.

Usage: timeout 2400 python scripts/exp_r5_resident_acc.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench_matrix import diff_time, melt
from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _pallas_rows_engine
from ljmd_tpu.ops.pallas_lj import (
    pallas_pair_sweep,
    pallas_pair_sweep_rect,
    pallas_pair_sweep_rect_newton,
    pallas_pair_sweep_tri,
)
from ljmd_tpu.parallel.mesh import PARTICLE_AXIS
from ljmd_tpu.parallel.spatial import make_spatial_engine

print("devices:", jax.devices(), flush=True)

cfg = config_from_density(num_cells=10, density=0.8442, dt=0.005,
                          dtype="float32")
st = melt(cfg)
n = cfg.n
L, rc2 = cfg.box_length, cfg.rc_square
ni_pad = 4096
pos = jnp.zeros((8, ni_pad), jnp.float32).at[0:3, :n].set(st.r.T)

# --- stage 1: numeric parity on the real chip ---
full = pallas_pair_sweep(pos, n, L, rc2, tile_i=128, tile_j=1024)
tri = pallas_pair_sweep_tri(pos, n, L, rc2, tile_i=128, tile_j=1024)
f_err = float(jnp.max(jnp.abs(tri[0:3, :n] - full[0:3, :n])))
f_scale = float(jnp.max(jnp.abs(full[0:3, :n])))
s_err = float(jnp.max(jnp.abs(2.0 * tri[3:6].sum(axis=1) - full[3:6].sum(axis=1))))
s_scale = float(jnp.max(jnp.abs(full[3:6].sum(axis=1))))
print(f"tri parity: force rel err {f_err / f_scale:.2e}, "
      f"scalar rel err {s_err / s_scale:.2e}", flush=True)

# rect_newton: split particles into two halves, i-half vs j-half.
h = n // 2
h_pad = 2048
pos_a = jnp.zeros((8, h_pad), jnp.float32).at[0:3, :h].set(st.r[:h].T)
pos_b = jnp.zeros((8, h_pad), jnp.float32).at[0:3, : n - h].set(st.r[h:].T)
out_i, out_j = pallas_pair_sweep_rect_newton(
    pos_a, pos_b, h, n - h, 0, h, L, rc2, tile_i=128, tile_j=1024)
ord_i = pallas_pair_sweep_rect(pos_a, pos_b, h, n - h, 0, h, L, rc2,
                               tile_i=128, tile_j=1024)
ord_j = pallas_pair_sweep_rect(pos_b, pos_a, n - h, h, h, 0, L, rc2,
                               tile_i=128, tile_j=1024)
ei = float(jnp.max(jnp.abs(out_i[0:3, :h] - ord_i[0:3, :h])))
ej = float(jnp.max(jnp.abs(out_j[0:3, : n - h] - ord_j[0:3, : n - h])))
sc = float(jnp.max(jnp.abs(ord_i[0:3, :h])))
print(f"rect_newton parity: i-side rel {ei / sc:.2e}, j-side rel {ej / sc:.2e}",
      flush=True)
assert f_err / f_scale < 1e-5 and ei / sc < 1e-5 and ej / sc < 1e-5

# --- stage 2: tri TJ sweep on the resident accumulator ---
def make_run(tile_j, reps):
    @jax.jit
    def run(p):
        def body(c, _):
            out = pallas_pair_sweep_tri(
                c, n, L, rc2, tile_i=128, tile_j=tile_j)
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
    print(f"tri TJ={tile_j:5d}: {us:8.2f} us/sweep (resident acc)", flush=True)

# --- stage 3: half-ring mesh=1 vs single-chip rows ---
mesh = jax.sharding.Mesh(np.array(jax.devices()[:1]), (PARTICLE_AXIS,))
eng_r = _pallas_rows_engine(cfg)
diff_time("N=4000 single-chip rows", eng_r, st, 512, 2048)
eng_h = make_spatial_engine(cfg, mesh, comm="half_ring")
diff_time("N=4000 half-ring mesh=1", eng_h, st, 512, 2048)
