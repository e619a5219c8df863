"""Measure the reference-default config (N=500, dt=1e-4, 500k steps) on TPU.

Round 2 recorded ~230s wall for the full run (~1.1e6 particle-steps/s).
The rows engine has since gained the fused compensated run_fast path;
this re-measures (a) the steady-state per-step slope at the engine level,
(b) the end-to-end production wall via run_production on a shortened run.

Run: timeout 900 python scripts/exp_refdefault.py
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ljmd_tpu.config import load_config
from ljmd_tpu.models.engine import make_engine
from ljmd_tpu.models.simulation import initialize, run_production

print("devices:", jax.devices(), flush=True)

cfg0 = load_config("examples/reference_default.json")
print("n:", cfg0.n, "dt:", cfg0.dt, "dtype:", cfg0.dtype,
      "steps:", cfg0.total_steps, "interval:", cfg0.output_interval, flush=True)

# (a) engine-level steady state, differential
cfg = dataclasses.replace(cfg0, warmup_steps=100)
engine = make_engine(cfg, "auto")
state = initialize(cfg, jax.random.PRNGKey(0))
carry, _ = engine.init(state)


def make_run(k):
    @jax.jit
    def run(c):
        return engine.run_fast(c, k)
    return run


short, long = 2000, 20000
run_s, run_l = make_run(short), make_run(long)
carry = run_s(carry)
_ = float(jnp.sum(engine.get_state(carry).v[0]))
carry = run_l(carry)
_ = float(jnp.sum(engine.get_state(carry).v[0]))
slopes = []
for _ in range(3):
    t0 = time.perf_counter()
    carry = run_s(carry)
    _ = float(jnp.sum(engine.get_state(carry).v[0]))
    t1 = time.perf_counter()
    carry = run_l(carry)
    _ = float(jnp.sum(engine.get_state(carry).v[0]))
    t2 = time.perf_counter()
    slopes.append(((t2 - t1) - (t1 - t0)) / (long - short))
slopes.sort()
us = slopes[1] * 1e6
print(f"engine steady state: {us:.2f} us/step = {cfg.n/slopes[1]:.3e} ps/s",
      flush=True)

# (b) end-to-end production wall (full 500k steps incl. compile + stats)
t0 = time.time()
res = run_production(cfg0, initialize(cfg0, jax.random.PRNGKey(1)))
etot = float(res.means.mean("etot"))
t1 = time.time()
print(f"full run_production ({cfg0.total_steps} steps): {t1-t0:.1f}s wall, "
      f"<Etot>={etot:.2f} (target {cfg0.target_total_energy})", flush=True)
