"""Small-dt chunk scaling for the zsort engine.

At dt <= 1e-3 the one-chunk travel bound allows inner_chunk=32 with the
skin still at its 0.3 floor (window 2.86 — narrower than the dt=0.005
window 3.32): rebuild+glue amortize 2x AND the candidate set shrinks.
Risk: Mosaic compile time scales with the in-kernel step trip count
(STEPS=500 never finished; 16 is the production default) — wall-clock
compile time is printed per variant.

Usage: timeout 2400 python scripts/exp_chunk.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench_matrix import diff_time, melt
from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _zsort_engine


def timed_compile(label, eng, st, n):
    carry, _ = jax.jit(eng.init)(st)
    t0 = time.perf_counter()
    c = jax.jit(lambda cc: eng.run_fast(cc, n))(carry)
    float(jnp.sum(c.v[0]))
    print(f"{label:34s}: first-call wall {time.perf_counter()-t0:.1f}s",
          flush=True)


def main():
    print("devices:", jax.devices(), flush=True)

    for dt in (1e-3, 1e-4):
        cfg = config_from_density(num_cells=10, density=0.8442, dt=dt,
                                  dtype="float32")
        st = melt(cfg)
        for ck in (16, 32):
            eng = _zsort_engine(cfg, inner_chunk=ck)  # extended auto-on
            timed_compile(f"N=4000 dt={dt} ext ck={ck}", eng, st, 2000)
            diff_time(f"N=4000 dt={dt} ext ck={ck}", eng, st, 2000, 8000)
        # cond'd static for comparison (fires ~never at tiny dt)
        eng = _zsort_engine(cfg, trigger="static")
        diff_time(f"N=4000 dt={dt} ext static ck=16", eng, st, 2000, 8000)


if __name__ == "__main__":
    main()
