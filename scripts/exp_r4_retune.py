"""Round-4 flagship retune (VERDICT item 1a): (inner_chunk, tile_j) matrix
at N=4000 on the current code (stacked 3-row sort, zero_fill=False pack,
tail lists, factored coefficient) — the round-2/3 ck=8 loss and TJ ordering
predate all of those, so the optimum may have moved.

Also measures the trigger="never" floor (same skin) to split the step into
sweep vs resort bill, and dual_acc on/off at the default point.

Run: timeout 3000 python scripts/exp_r4_retune.py
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

# Baseline + resort-bill split at the default point.
diff_time("ck=16 TJ=512 always (dflt)",
          _zsort_engine(cfg, extended=False), st, 2000, 8000)
diff_time("ck=16 TJ=512 never (floor)",
          _zsort_engine(cfg, extended=False, trigger="never"), st, 2000, 8000)
diff_time("ck=16 TJ=512 (repeat)",
          _zsort_engine(cfg, extended=False), st, 2000, 8000)

# inner_chunk sweep: travel-bound skin auto-follows ck (8.5*ck*dt), so
# smaller ck = tighter window = fewer candidates but more resorts.
for ck in (8, 12, 20, 24):
    diff_time(f"ck={ck:2d} TJ=512 always",
              _zsort_engine(cfg, extended=False, inner_chunk=ck),
              st, 2000, 8000)

# TJ re-tune at the default ck and at the best small ck.
for tj in (384, 640):
    diff_time(f"ck=16 TJ={tj} always",
              _zsort_engine(cfg, extended=False, tile_j=tj), st, 2000, 8000)
for tj in (384, 640):
    diff_time(f"ck=8  TJ={tj} always",
              _zsort_engine(cfg, extended=False, inner_chunk=8, tile_j=tj),
              st, 2000, 8000)
