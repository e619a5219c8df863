"""Mid-N valley (N=16384) tuning: pencil grid geometry vs throughput.

At N=16384 / skin 0.49 the pencil grid is 8x8 with mean occupancy 256 ->
capacity rounds up to 384 (the 128-lane alignment): 50% padding, and the
j-sweep work scales with capacity^2. Shrinking the skin to 0.35 fits a 9x9
grid (width 2.985 >= rc+skin), mean occupancy 202 -> capacity 256: ~1.8x
less sweep work at a mildly higher rebin cadence. This measures the actual
step-time for several (skin, capacity) combos on an equilibrated state
(melted with the lattice-safe default capacity, timed with the tuned one;
overflow stays detected via the sticky flag printed per row).

Usage: timeout 560 python scripts/bench_midn.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from bench_matrix import diff_time, melt
from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _cellpair_engine


def main():
    print("devices:", jax.devices(), flush=True)
    base = dict(num_cells=16, density=0.8442, dt=0.005, dtype="float32")
    cfg_melt = config_from_density(neighbor_skin=0.49, **base)
    st = melt(cfg_melt)
    for skin, cap in ((0.49, 0), (0.49, 384), (0.35, 0), (0.35, 256),
                      (0.30, 256)):
        cfg = config_from_density(neighbor_skin=skin, neighbor_capacity=cap,
                                  **base)
        eng = _cellpair_engine(cfg)
        diff_time(f"N=16384 skin={skin} cap={cap or 'auto'}", eng, st,
                  500, 2000)


if __name__ == "__main__":
    main()
