"""Follow-up to exp_resort3: uncapped always-skin, TJ widths, 16384 legs.

exp_resort3 at N=4000: always ck=16 TJ=512 = 65.4 us (6.12e7) best;
ck=20/24 ran with the skin UNCAPPED bound violated (0.7 clip) and ck=24
tripped 'invalid' — retest with the travel-bound skin (0.85 / 1.02).

Usage: timeout 2400 python scripts/exp_resort4.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from bench_matrix import diff_time, melt
from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _zsort_engine


def run(label, cfg, st, lens=(2000, 8000), extended=False, **kw):
    try:
        eng = _zsort_engine(cfg, extended=extended, **kw)
        diff_time(label, eng, st, *lens)
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {e}", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)

    cfg = config_from_density(num_cells=10, density=0.8442, dt=0.005,
                              dtype="float32")
    st = melt(cfg)
    for ck in (20, 24):
        run(f"N=4000 always ck={ck} TJ=512 skin-bound", cfg, st,
            trigger="always", inner_chunk=ck, tile_j=512)
    run("N=4000 always ck=16 TJ=640", cfg, st, trigger="always",
        inner_chunk=16, tile_j=640)
    run("N=4000 always ck=16 TJ=512 (repro)", cfg, st, trigger="always",
        inner_chunk=16, tile_j=512)

    cfg = config_from_density(num_cells=16, density=0.8442, dt=0.005,
                              dtype="float32")
    st = melt(cfg)
    for ck in (16, 24):
        for tj in (384, 512):
            run(f"N=16384 slab always ck={ck} TJ={tj}", cfg, st,
                trigger="always", inner_chunk=ck, slab_sort=True,
                tile_j=tj, lens=(500, 2000))
    run("N=16384 zonly always ck=16 TJ=512", cfg, st, trigger="always",
        inner_chunk=16, slab_sort=False, tile_j=512, lens=(500, 2000))
    run("N=16384 slab static ck=8 (base)", cfg, st, trigger="static",
        slab_sort=True, lens=(500, 2000))


if __name__ == "__main__":
    main()
