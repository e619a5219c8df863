"""Re-measure the slab-vs-pure-z routing boundary on the tails-on,
slab-TJ=768 defaults (the old n >= 10000 boundary was set pre-tails,
when slab mode was 5-10% slower than it is now).

Run: timeout 2400 python scripts/exp_boundary2.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from bench_matrix import diff_time, melt
from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _zsort_engine

print("devices:", jax.devices(), flush=True)

for nc, short, long_ in ((12, 800, 3200), (13, 800, 3200), (14, 600, 2400)):
    cfg = config_from_density(num_cells=nc, density=0.8442, dt=0.005,
                              dtype="float32")
    st = melt(cfg)
    n = cfg.n
    for slab in (False, True):
        try:
            eng = _zsort_engine(cfg, extended=False, slab_sort=slab)
        except ValueError as e:
            print(f"N={n} slab={slab}: {e}", flush=True)
            continue
        diff_time(f"N={n} zsort slab={int(slab)}", eng, st, short, long_)
