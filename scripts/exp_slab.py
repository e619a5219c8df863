"""(x-slab, z) lexicographic sort vs pure z-sort, flagship + mid-N.

Round-3 question: at N=16384 the pencil engine sits in a capacity-
quantization valley (3.4e7 ps/s). The zsort window-list engine now (a)
scales past its old 8192-block-pair cliff and (b) optionally sorts by
(x-slab, z), adding x discrimination that cuts visits ~2x at mid-N
geometry (estimate). This measures, differentially:

  N=4000:  zsort z-only (current champion) vs slab mode
  N=16384: zsort z-only vs slab mode vs pencil (current default)

and prints the visit/candidate counts + invalid flags for each.

Usage: timeout 900 python scripts/exp_slab.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench_matrix import diff_time, melt
from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _cellpair_engine, _zsort_engine


def visit_stats(label, eng, state):
    c, _ = eng.init(state)
    tc = np.asarray(c.tcounts)
    print(f"  {label}: tcounts={tc.tolist()} visits={tc.sum()}", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)

    for nc, n_short, n_long in ((10, 1000, 4000), (16, 500, 2000)):
        cfg = config_from_density(num_cells=nc, density=0.8442, dt=0.005,
                                  dtype="float32")
        n = cfg.n
        print(f"== N={n} L={cfg.box_length:.3f} ==", flush=True)
        st = melt(cfg)
        for slab in (False, True):
            try:
                eng = _zsort_engine(cfg, extended=False, slab_sort=slab)
            except ValueError as e:
                print(f"  slab={slab}: {e}", flush=True)
                continue
            visit_stats(f"zsort slab={slab}", eng, st)
            diff_time(f"N={n} zsort slab={slab}", eng, st, n_short, n_long)
        if n >= 8192:
            eng = _cellpair_engine(cfg)
            diff_time(f"N={n} pencil (default)", eng, st, n_short, n_long)


if __name__ == "__main__":
    main()
