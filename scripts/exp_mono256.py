"""x-strip mono sweep at N=256000 (3 strips of x-rows vs grid kernel).

Run: timeout 2400 python scripts/exp_mono256.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from bench_matrix import diff_time, melt
from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _cellpair_engine

print("devices:", jax.devices(), flush=True)

cfg = config_from_density(num_cells=40, density=0.8442, dt=0.005,
                          dtype="float32", neighbor_skin=0.49)
st = melt(cfg)
# mono=True (3 x-strips at this N) became the default 2026-08-19 after the
# conservation strips leg passed; mono=False forces the grid kernel.
for mono in (False, True):
    eng = _cellpair_engine(cfg, mono=mono)
    diff_time(f"N=256000 per-step mono={int(mono)}", eng, st, 80, 320)
