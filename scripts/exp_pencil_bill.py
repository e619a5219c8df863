"""Pencil (cellpair) rebin-bill decomposition at N=62500 and N=16384.

Mirrors exp_resort for the zsort engine: measure the no-rebin floor
(rebin_trigger="never" — timing only, physics invalid over long runs)
against the predictive cond'd default and the branchless always mode,
to see how the ~300 us/step rebin bill splits between the rebuild
itself and the lax.cond/copy overhead around it.

Usage: timeout 1800 python scripts/exp_pencil_bill.py
"""

import dataclasses as _dc
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from bench_matrix import diff_time, melt
from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _cellpair_engine


def main():
    print("devices:", jax.devices(), flush=True)

    cfg = config_from_density(num_cells=25, density=0.8442, dt=0.005,
                              dtype="float32", neighbor_skin=0.49)
    st = melt(cfg)
    cfg_t = _dc.replace(cfg, neighbor_capacity=384)
    for trig in ("predictive", "always", "never"):
        eng = _cellpair_engine(cfg_t, rebin_trigger=trig)
        diff_time(f"N=62500 pencil trig={trig}", eng, st, 400, 1600)

    cfg = config_from_density(num_cells=16, density=0.8442, dt=0.005,
                              dtype="float32", neighbor_skin=0.49)
    st = melt(cfg)
    for trig in ("predictive", "never"):
        eng = _cellpair_engine(cfg, rebin_trigger=trig)
        diff_time(f"N=16384 pencil trig={trig}", eng, st, 500, 2000)


if __name__ == "__main__":
    main()
