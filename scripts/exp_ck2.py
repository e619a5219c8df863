"""Post-coef-refactor inner_chunk re-sweep at the flagship N=4000.

The factored coefficient cheapened the sweep by ~1.4%, shifting the
rebuild-amortization balance slightly toward longer chunks; exp_resort4
(pre-tails) had ck=20 (64.8) ahead of ck=16 (65.4). Re-test on the
shipping defaults (tails on, travel-bound skin).

Usage: timeout 1200 python scripts/exp_ck2.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: F401

from bench_matrix import diff_time, melt
from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _zsort_engine


def run(label, cfg, st, lens=(2000, 8000), **kw):
    try:
        eng = _zsort_engine(cfg, **kw)
        diff_time(label, eng, st, *lens)
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {e}", flush=True)


def main():
    cfg = config_from_density(
        num_cells=10, density=0.8442, dt=0.005, dtype="float32"
    )
    st = melt(cfg)
    for ck in (16, 20, 24):
        run(f"N=4000 always ck={ck} TJ=512", cfg, st,
            trigger="always", inner_chunk=ck, tile_j=512)


if __name__ == "__main__":
    main()
