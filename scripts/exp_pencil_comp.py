"""Compensated-pencil rebin policy: does always-rebin still conserve?

The rebin now wraps two-float positions exactly (wrap_positions_ext)
and permutes the position-compensation rows with the slots instead of
resetting them — the reason compensated mode kept the cond'd
predictive trigger. Measure drift + throughput at dt=1e-4 (the
reference's own regime, compensation auto-on) for predictive vs
always at N=16384, plus plain-dt throughput sanity.

Usage: timeout 2400 python scripts/exp_pencil_comp.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench_matrix import diff_time, melt
from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _cellpair_engine


def drift(label, eng, st, n_steps=100_000, check_every=10_000):
    carry, _ = jax.jit(eng.init)(st)
    carry = jax.jit(lambda c: eng.run_fast(c, 2000))(carry)
    carry, ob0 = jax.jit(eng.step)(carry)
    e0 = float(ob0.epot) + float(ob0.ekin)
    block = jax.jit(lambda c: eng.run_fast(c, check_every - 1))
    step1 = jax.jit(eng.step)
    worst = 0.0
    t0 = time.perf_counter()
    done = 0
    while done < n_steps:
        carry = block(carry)
        carry, ob = step1(carry)
        done += check_every
        e = float(ob.epot) + float(ob.ekin)
        worst = max(worst, abs((e - e0) / e0))
        rel = (e - e0) / abs(e0)
    dt_s = time.perf_counter() - t0
    diag = {k: bool(jax.device_get(v))
            for k, v in eng.diagnostics(carry).items()}
    n = st.r.shape[0]
    print(f"{label:34s}: steps={done} max|dE/E|={worst:.3e} "
          f"final={rel:+.3e} rate={n*done/dt_s:.3e} p-s/s {diag}",
          flush=True)


def main():
    print("devices:", jax.devices(), flush=True)

    cfg = config_from_density(num_cells=16, density=0.8442, dt=1e-4,
                              dtype="float32", neighbor_skin=0.49)
    st = melt(cfg)  # melt runs dt=1e-4 cfg; state is near-lattice, fine
    for trig in ("predictive", "always"):
        eng = _cellpair_engine(cfg, rebin_trigger=trig)
        drift(f"N=16384 dt=1e-4 comp trig={trig}", eng, st)

    # plain-dt timing sanity: the ext wrap change must not slow dt=0.005
    cfg = config_from_density(num_cells=16, density=0.8442, dt=0.005,
                              dtype="float32", neighbor_skin=0.49)
    st = melt(cfg)
    eng = _cellpair_engine(cfg)
    diff_time("N=16384 pencil plain (sanity)", eng, st, 500, 2000)


if __name__ == "__main__":
    main()
