"""Round-3 default-change confirmation matrix (TJ=384, slab auto, n_pad
128-granular): regression-check the small-N points and confirm the auto
routing picks the measured winners at mid-N.

Usage: timeout 1400 python scripts/exp_confirm3.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from bench_matrix import diff_time, melt
from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _zsort_engine, make_engine


def main():
    print("devices:", jax.devices(), flush=True)

    cfg = config_from_density(num_cells=6, density=0.8442, dt=0.005,
                              dtype="float32")
    st = melt(cfg)
    diff_time("N=864   zsort TJ=384", _zsort_engine(cfg, extended=False),
              st, 2000, 10000)

    cfg = config_from_density(num_cells=10, density=0.8442, dt=0.005,
                              dtype="float32")
    st = melt(cfg)
    diff_time("N=4000  zsort TJ=384", _zsort_engine(cfg, extended=False),
              st, 2000, 8000)
    diff_time("N=4000  zsort ext TJ=384", _zsort_engine(cfg, extended=True),
              st, 2000, 8000)

    for nc, n_short, n_long in ((13, 1000, 4000), (16, 500, 2000)):
        cfg = config_from_density(num_cells=nc, density=0.8442, dt=0.005,
                                  dtype="float32")
        st = melt(cfg)
        eng = make_engine(cfg, backend="auto")
        c, _ = eng.init(st)
        tc = np.asarray(getattr(c, "tcounts", np.zeros(1)))
        print(f"  auto N={cfg.n}: engine visits={tc.sum()}", flush=True)
        diff_time(f"N={cfg.n} auto", eng, st, n_short, n_long)


if __name__ == "__main__":
    main()
