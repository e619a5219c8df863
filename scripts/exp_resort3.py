"""Periodic-resort geometry sweep (round 3, after exp_resort2).

exp_resort2: branchless "always" resort at chunk=16 (71.2 us) beat the
cond'd static trigger (72.4) and always/8 (76.8) at N=4000 — the rebuild
amortizes over 16 steps AND chunk-boundary XLA glue halves. This sweeps
the period (skin follows 8.5*chunk*dt), tile geometry at the best
period, the extended kernel, and the N=16384 slab leg.

Usage: timeout 2400 python scripts/exp_resort3.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from bench_matrix import diff_time, melt
from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _zsort_engine


def run(label, cfg, st, **kw):
    try:
        eng = _zsort_engine(cfg, extended=kw.pop("extended", False), **kw)
        diff_time(label, eng, st, *kw.pop("lens", (2000, 8000)))
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {e}", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)

    cfg = config_from_density(num_cells=10, density=0.8442, dt=0.005,
                              dtype="float32")
    st = melt(cfg)
    for ck in (12, 16, 20, 24):
        run(f"N=4000 always ck={ck}", cfg, st, trigger="always",
            inner_chunk=ck)
    for tj in (256, 512):
        run(f"N=4000 always ck=16 TJ={tj}", cfg, st, trigger="always",
            inner_chunk=16, tile_j=tj)
    run("N=4000 always ck=16 TI=64", cfg, st, trigger="always",
        inner_chunk=16, tile_i=64, tile_j=384)
    run("N=4000 ext always ck=16", cfg, st, trigger="always",
        inner_chunk=16, extended=True)
    run("N=4000 ext static ck=8", cfg, st, trigger="static", extended=True)

    cfg = config_from_density(num_cells=16, density=0.8442, dt=0.005,
                              dtype="float32")
    st = melt(cfg)
    for ck in (16, 24):
        run(f"N=16384 slab always ck={ck}", cfg, st, trigger="always",
            inner_chunk=ck, slab_sort=True, lens=(500, 2000))
    run("N=16384 zonly always ck=16", cfg, st, trigger="always",
        inner_chunk=16, slab_sort=False, lens=(500, 2000))


if __name__ == "__main__":
    main()
