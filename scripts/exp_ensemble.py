"""Measure ensemble-mode steady-state throughput on TPU (BASELINE config 4).

The wall numbers quoted in docs (42-97s for 64 x N=256 x 11k steps) are
dominated by jit compile + tunnel; this script separates compile from
steady-state by timing the SECOND call of the same jitted ensemble at two
run lengths and taking the slope (differential, per CLAUDE.md TPU rules).

Run: timeout 900 python scripts/exp_ensemble.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ljmd_tpu.config import load_config
from ljmd_tpu.parallel.ensemble import ensemble_simulate

print("devices:", jax.devices(), flush=True)

cfg0 = load_config("examples/ensemble64.json")
R = 64


def run_once(cfg):
    agg = ensemble_simulate(cfg, n_replicas=R)
    # data-dependent fetch (block_until_ready is unreliable via the tunnel)
    return float(jnp.sum(agg.mean_of_means))


for total in (2000, 10000):
    import dataclasses
    cfg = dataclasses.replace(cfg0, total_steps=total, warmup_steps=200)
    t0 = time.time()
    s = run_once(cfg)
    t1 = time.time()
    s = run_once(cfg)
    t2 = time.time()
    s = run_once(cfg)
    t3 = time.time()
    print(
        f"total={total}: cold {t1-t0:.2f}s, warm {t2-t1:.3f}s / {t3-t2:.3f}s"
        f" (sum={s:.3f})",
        flush=True,
    )
