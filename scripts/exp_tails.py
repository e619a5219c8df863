"""Measure tail-tile visit lists on TPU: flagship + mid-N, tails on/off.

Predicted from the census (exp_tailwaste): tails remove 3.4 us of pair
waste at N=4000 (of 62.8) and 46.4 us at N=16384 slab (of 394).

Run: timeout 1200 python scripts/exp_tails.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from bench_matrix import diff_time, melt
from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _zsort_engine

print("devices:", jax.devices(), flush=True)

cfg = config_from_density(num_cells=10, density=0.8442, dt=0.005,
                          dtype="float32")
st = melt(cfg)
for tails in (False, True):
    eng = _zsort_engine(cfg, extended=False, tail_tiles=tails)
    diff_time(f"N=4000 zsort tails={tails}", eng, st, 1000, 4000)

cfg = config_from_density(num_cells=16, density=0.8442, dt=0.005,
                          dtype="float32")
st = melt(cfg)
for tails in (False, True):
    eng = _zsort_engine(cfg, extended=False, slab_sort=True, tail_tiles=tails)
    diff_time(f"N=16384 slab tails={tails}", eng, st, 400, 1600)

# extended (compensated) flagship: tails flow through the ext kernel too
cfg = config_from_density(num_cells=10, density=0.8442, dt=0.005,
                          dtype="float32")
st = melt(cfg)
for tails in (False, True):
    eng = _zsort_engine(cfg, extended=True, tail_tiles=tails)
    diff_time(f"N=4000 ext tails={tails}", eng, st, 1000, 4000)
