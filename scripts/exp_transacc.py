"""Transposed i-side accumulator A/B (round 4): the per-visit sublane->lane
relayout of the cross-lane force-sum results sat on the f_acc RMW chain and
was the round-3 accounting's dominant per-visit cost. trans_acc accumulates
them sublane-major in (n_pad, 8) scratches and folds with ONE transpose per
step. Round 3 rejected "transposed accumulator" on VMEM grounds at mid-N
(2 x 8 MB at n_pad=16384) — at the flagship n_pad=4096 it costs 2 x 2 MB.

Run: timeout 1800 python scripts/exp_transacc.py
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
for ta in (False, True, True, False):
    diff_time(f"N=4000 trans_acc={ta}",
              _zsort_engine(cfg, extended=False, trans_acc=ta),
              st, 2000, 8000)
# floor split with trans_acc on
diff_time("N=4000 trans never (floor)",
          _zsort_engine(cfg, extended=False, trans_acc=True,
                        trigger="never"), st, 2000, 8000)

# N=864: n_pad=1024, scratch 0.5 MB each
cfg8 = config_from_density(num_cells=6, density=0.8442, dt=0.005,
                           dtype="float32")
st8 = melt(cfg8)
for ta in (False, True):
    diff_time(f"N=864  trans_acc={ta}",
              _zsort_engine(cfg8, extended=False, trans_acc=ta),
              st8, 4000, 16000)

# extended path at the reference dt
cfge = config_from_density(num_cells=10, density=0.8442, dt=1e-4,
                           dtype="float32")
for ta in (False, True):
    diff_time(f"N=4000 ext trans_acc={ta}",
              _zsort_engine(cfge, extended=True, trans_acc=ta),
              st, 2000, 8000)
