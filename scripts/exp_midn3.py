"""Follow-up to exp_midn2: TJ=384 won at N=16384 slab (4.49e7 vs 3.34e7 at
TJ=512) — candidate count AND per-visit overhead both fell. Probe the
frontier: TJ=256 at mid-N, z-only TJ=384 at mid-N for reference, and the
flagship (N=4000, z-only) at TJ 256/384 vs the current 512.

Usage: timeout 1100 python scripts/exp_midn3.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from bench_matrix import diff_time, melt
from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _zsort_engine


def run(cfg, st, label, n_short, n_long, **kw):
    try:
        eng = _zsort_engine(cfg, extended=False, **kw)
        c, _ = eng.init(st)
        tc = np.asarray(c.tcounts)
        tj = kw.get("tile_j", 512)
        print(f"  {label}: tcounts={tc.tolist()} visits={tc.sum()} "
              f"cand={tc.sum() * 128 * tj / 1e6:.1f}M", flush=True)
        diff_time(label, eng, st, n_short, n_long)
    except Exception as e:
        print(f"  {label}: FAILED {type(e).__name__}: {e}", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)

    cfg = config_from_density(num_cells=10, density=0.8442, dt=0.005,
                              dtype="float32")
    st = melt(cfg)
    for tj in (256, 384, 512):
        run(cfg, st, f"N=4000 zonly TJ={tj}", 1000, 4000,
            slab_sort=False, tile_j=tj)

    cfg = config_from_density(num_cells=16, density=0.8442, dt=0.005,
                              dtype="float32")
    st = melt(cfg)
    for tj in (256, 384):
        run(cfg, st, f"N=16384 slab TJ={tj}", 500, 2000,
            slab_sort=True, tile_j=tj)
    run(cfg, st, "N=16384 zonly TJ=384", 500, 2000,
        slab_sort=False, tile_j=384)


if __name__ == "__main__":
    main()
