"""n_pad power-of-two pathology probe.

Observed: identical configs and visit counts, 23% slower at n_pad=16384
(=2^14, 128 blocks) than at n_pad=16512 (129 blocks); flagship N=4000
likewise slower at 4096 than at 4224. Hypothesis: power-of-two (or
even-block-count) row strides alias VMEM banks under the dynamic 128-
aligned j-slices. Sweep n_pad at fixed physics:

  N=4000:  n_pad 4096 / 4224 / 4352      (2^12, 33 blocks, 34 blocks)
  N=16384: n_pad 16384 / 16512 / 16640   (2^14, 129, 130 blocks)

Usage: timeout 1200 python scripts/exp_pow2.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from bench_matrix import diff_time, melt
from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _zsort_engine


def main():
    print("devices:", jax.devices(), flush=True)

    cfg = config_from_density(num_cells=10, density=0.8442, dt=0.005,
                              dtype="float32")
    st = melt(cfg)
    for pad in (4096, 4224, 4352):
        eng = _zsort_engine(cfg, extended=False, n_pad=pad)
        diff_time(f"N=4000 pad={pad}", eng, st, 2000, 8000)

    cfg = config_from_density(num_cells=16, density=0.8442, dt=0.005,
                              dtype="float32")
    st = melt(cfg)
    for pad in (16384, 16512, 16640):
        eng = _zsort_engine(cfg, extended=False, slab_sort=True, n_pad=pad)
        diff_time(f"N=16384 slab pad={pad}", eng, st, 500, 2000)


if __name__ == "__main__":
    main()
