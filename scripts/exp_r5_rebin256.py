"""Round-5: 256k leg of the big-N rebin-cadence matrix (exp_r5_rebin.py's
cells=40 case, split out so a flaky tunnel session can land it alone).

131k already measured (2026-08-20): ck8 3.246e7, ck12 3.373e7 clean,
ck16 3.438e7 but TRIPS the sticky xy-drift flag (margin 1.15x) -> ck=12 is
the adopted unfused default. This measures the same matrix at N=256000
(grid kernel, unfused chunks) against the rebuild-free floor.

Usage: timeout 3000 python scripts/exp_r5_rebin256.py
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

    cfg = config_from_density(num_cells=40, density=0.8442, dt=0.005,
                              dtype="float32", neighbor_skin=0.49)
    n = cfg.n
    st = melt(cfg, cycles=2, steps=200)
    for label, kw in (
        ("ck12 always (midstep)", dict(rebin_trigger="always", inner_chunk=12)),
        ("ck8 always (midstep)", dict(rebin_trigger="always", inner_chunk=8)),
        ("ck16 always (midstep)", dict(rebin_trigger="always", inner_chunk=16)),
        ("ck12 never (floor)", dict(rebin_trigger="never", inner_chunk=12)),
    ):
        eng = _cellpair_engine(cfg, **kw)
        diff_time(f"N={n} {label}", eng, st, 48, 192)


if __name__ == "__main__":
    main()
