"""Slab TJ decision sweep with tails on (follow-up to exp_tails2).

exp_tails2 measured TJ=768 beating TJ=512 at N=16384 with tails on
(350.4 vs 360.7 us/step) but did not include the current default
TJ=384 in the same run. This sweep puts 384/512/768 head-to-head at
both slab-engine bench points to decide the tails-on default.

Run: timeout 2400 python scripts/exp_tails3.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from bench_matrix import diff_time, melt
from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _zsort_engine

print("devices:", jax.devices(), flush=True)

cfg = config_from_density(num_cells=16, density=0.8442, dt=0.005,
                          dtype="float32")
st = melt(cfg)
for tj in (384, 512, 768):
    eng = _zsort_engine(cfg, extended=False, slab_sort=True, tile_j=tj,
                        tail_tiles=True)
    diff_time(f"N=16384 slab TJ={tj} tails", eng, st, 400, 1600)

cfg = config_from_density(num_cells=17, density=0.8442, dt=0.005,
                          dtype="float32")
st = melt(cfg)
for tj in (384, 512, 768):
    eng = _zsort_engine(cfg, extended=False, slab_sort=True, tile_j=tj,
                        tail_tiles=True)
    diff_time(f"N=19652 slab TJ={tj} tails", eng, st, 300, 1200)
