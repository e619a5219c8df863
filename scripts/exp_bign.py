"""Large-N scaling point: N=256,000 (k=40) pencil engine.

Above the fused kernel's VMEM budget the engine runs per-step pencil
sweeps from HBM. Round-2 prediction: z-band windows start paying at
capacity >= 5 blocks (N >= ~150k) — test both at the first N where
that holds. Also times N=131072-ish (k=32, N=131072) as the midpoint.

Usage: timeout 2400 python scripts/exp_bign.py
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

    for cells, lens in ((32, (100, 400)), (40, (50, 200))):
        cfg = config_from_density(num_cells=cells, density=0.8442, dt=0.005,
                                  dtype="float32", neighbor_skin=0.49)
        n = cfg.n
        st = melt(cfg, cycles=2, steps=200)
        for trig in ("always", "predictive", "never"):
            eng = _cellpair_engine(cfg, rebin_trigger=trig)
            diff_time(f"N={n} pencil chunked trig={trig}", eng, st, *lens)


if __name__ == "__main__":
    main()
