"""Sort-skin sweep under the 1.2x flag-window margin.

The round-3 margin fix (window = rc + 1.2*skin, invalid at 0.6*skin)
removed the ~1-per-12.5k-steps sticky 'invalid' trips but widened the
candidate window by 0.2*skin (~9% more candidates at skin=0.7). Sweep
skin: smaller skin restores the old window width at the cost of ~20%
more resorts. Also re-times inner_chunk and tile_j at the best skin.

Usage: timeout 1800 python scripts/exp_skin.py
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
    for skin in (0.5, 0.58, 0.7):
        eng = _zsort_engine(cfg, extended=False, sort_skin=skin)
        diff_time(f"N=4000 skin={skin}", eng, st, 2000, 8000)
    for tj in (256, 384, 512):
        eng = _zsort_engine(cfg, extended=False, sort_skin=0.58, tile_j=tj)
        diff_time(f"N=4000 skin=0.58 TJ={tj}", eng, st, 2000, 8000)
    # TI=256 measured a 2x LOSS at N=16384 (exp_midn2: 732 vs 365 us/step
    # — coarser z-intervals + 256-granular starts swamp the amortization);
    # not retried here.

    cfg = config_from_density(num_cells=16, density=0.8442, dt=0.005,
                              dtype="float32")
    st = melt(cfg)
    for skin in (0.5, 0.58, 0.7):
        eng = _zsort_engine(cfg, extended=False, slab_sort=True,
                            sort_skin=skin)
        diff_time(f"N=16384 slab skin={skin}", eng, st, 500, 2000)


if __name__ == "__main__":
    main()
