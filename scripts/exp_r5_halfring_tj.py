"""Round-5: half-ring mesh=1 re-bench after the tri/rect_newton tile_j
pick moved to the largest 128-multiple divisor <= 512 (the resident
reaction accumulator made TJ=512 the fastest tri tile —
exp_r5_resident_acc 2026-08-20: 166.9 us/sweep vs 176.1 at 1024).

Usage: timeout 1800 python scripts/exp_r5_halfring_tj.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from bench_matrix import diff_time, melt
from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _pallas_rows_engine
from ljmd_tpu.parallel.mesh import PARTICLE_AXIS
from ljmd_tpu.parallel.spatial import make_spatial_engine

print("devices:", jax.devices(), flush=True)

cfg = config_from_density(num_cells=10, density=0.8442, dt=0.005,
                          dtype="float32")
st = melt(cfg)

mesh = jax.sharding.Mesh(np.array(jax.devices()[:1]), (PARTICLE_AXIS,))
eng_r = _pallas_rows_engine(cfg)
diff_time("N=4000 single-chip rows", eng_r, st, 512, 2048)
eng_h = make_spatial_engine(cfg, mesh, comm="half_ring")
diff_time("N=4000 half-ring mesh=1 TJ<=512", eng_h, st, 512, 2048)
