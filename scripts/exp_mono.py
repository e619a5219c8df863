"""Single-program ("mono") per-step pencil sweep vs the grid kernel.

The grid kernel pays ~2.5us/program (block DMAs + prologues; 289 programs
at N=131072 ~ 0.7ms/step) plus a 5-buffer reaction reduction. The mono
kernel holds positions + output in VMEM (viable to ~196k slots) and runs
the affine fori-over-pencils body in ONE program.

Run: timeout 2400 python scripts/exp_mono.py
"""
import dataclasses as _dc
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from bench_matrix import diff_time, melt
from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _cellpair_engine

print("devices:", jax.devices(), flush=True)

cfg = config_from_density(num_cells=32, density=0.8442, dt=0.005,
                          dtype="float32", neighbor_skin=0.49)
st = melt(cfg)
for mono in (False, True):
    eng = _cellpair_engine(cfg, mono=mono)
    diff_time(f"N=131072 per-step mono={int(mono)}", eng, st, 150, 600)

cfg = config_from_density(num_cells=25, density=0.8442, dt=0.005,
                          dtype="float32", neighbor_skin=0.49)
st = melt(cfg)
cfg_t = _dc.replace(cfg, neighbor_capacity=384)
for mono in (False, True):
    eng = _cellpair_engine(cfg_t, use_fused=False, mono=mono)
    diff_time(f"N=62500 c384 per-step mono={int(mono)}", eng, st, 200, 800)
