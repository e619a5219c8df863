"""Tail-tile follow-up sweep: TJ re-tuning with tails on, small-N gain.

Tails remove the cover-end waste, which was the penalty that made wide
bulk tiles lose (TJ=1024 measured 615 us at N=16384 pre-tails); with
exact tails the wide-tile visit amortization may win. Also measures
N=864 (short runs -> large tail fraction).

Run: timeout 1800 python scripts/exp_tails2.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from bench_matrix import diff_time, melt
from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _zsort_engine

print("devices:", jax.devices(), flush=True)

cfg = config_from_density(num_cells=6, density=0.8442, dt=0.005,
                          dtype="float32")
st = melt(cfg)
for tails in (False, True):
    eng = _zsort_engine(cfg, extended=False, tail_tiles=tails)
    diff_time(f"N=864 zsort tails={tails}", eng, st, 2000, 8000)

cfg = config_from_density(num_cells=10, density=0.8442, dt=0.005,
                          dtype="float32")
st = melt(cfg)
for tj in (768, 1024):
    eng = _zsort_engine(cfg, extended=False, tile_j=tj, tail_tiles=True)
    diff_time(f"N=4000 zsort TJ={tj} tails", eng, st, 1000, 4000)

cfg = config_from_density(num_cells=16, density=0.8442, dt=0.005,
                          dtype="float32")
st = melt(cfg)
for tj in (512, 768):
    eng = _zsort_engine(cfg, extended=False, slab_sort=True, tile_j=tj,
                        tail_tiles=True)
    diff_time(f"N=16384 slab TJ={tj} tails", eng, st, 400, 1600)
