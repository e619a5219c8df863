"""Mid-N (N=16384) zsort slab-mode tile-geometry sweep.

exp_slab.py measured slab zsort at (TI=128, TJ=512): 489us/step = 3.35e7,
beating same-state pencil (2.61e7) and z-only zsort (2.87e7). Budget: 548
visits x ~0.86us — per-visit overhead (~0.38us) is 44% of visit cost, so
fewer/larger visits may win even at more candidate slots. Sweep (TI, TJ):

  TI=128: TJ 384 / 512 / 768 / 1024   (tighter vs wider cluster cover)
  TI=256: TJ 512 / 1024               (half the rows, double the window)

Usage: timeout 1100 python scripts/exp_midn2.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from bench_matrix import diff_time, melt
from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _zsort_engine


def main():
    print("devices:", jax.devices(), flush=True)
    cfg = config_from_density(num_cells=16, density=0.8442, dt=0.005,
                              dtype="float32")
    st = melt(cfg)
    for ti, tj in ((128, 384), (128, 512), (128, 768), (128, 1024),
                   (256, 512), (256, 1024)):
        try:
            eng = _zsort_engine(cfg, extended=False, slab_sort=True,
                                tile_i=ti, tile_j=tj)
            c, _ = eng.init(st)
            tc = np.asarray(c.tcounts)
            print(f"  TI={ti} TJ={tj}: tcounts={tc.tolist()} "
                  f"visits={tc.sum()} cand={tc.sum() * ti * tj / 1e6:.1f}M",
                  flush=True)
            diff_time(f"N=16384 slab TI={ti} TJ={tj}", eng, st, 500, 2000)
        except Exception as e:
            print(f"  TI={ti} TJ={tj}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
