"""Ensemble at BASELINE-config-4 SCALE on TPU (round-4 VERDICT item 5).

64 replicas x N=864 liquid (rho*=0.8442, T*=0.728) through the host-
streamed ensemble driver (``ensemble_simulate_streaming``) — the round-3
bench point was an N=256 toy. Reports:

  - compile vs steady-state split: wall time of the first streamed chunk
    (holds the vmapped init + chunk compile) vs the per-chunk steady rate;
  - aggregate particle-steps/s from the steady chunks (differential over
    the chunk sequence — launch/fetch glue cancels in the slope);
  - per-replica etot drift over the sampled series;
  - the full ensemble artifact set (means.txt, simulation_results.{txt,json},
    corrmean_runs_*.dat) written via the shared CLI writer.

Run: timeout 1800 python scripts/exp_ens_scale.py [out_dir]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from ljmd_tpu.config import load_config

print("devices:", jax.devices(), flush=True)

R = 64
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ens_scale"

import dataclasses

cfg = load_config("examples/n864_liquid.json")
cfg = dataclasses.replace(
    cfg, total_steps=20000, warmup_steps=2000, output_interval=20, n_runs=R
)

# --- instrumented streaming run -------------------------------------------
# ensemble_simulate_streaming fetches every chunk to host; wrap its chunk
# boundaries by timing around the public call at two lengths (differential)
# would recompile, so instead time the ONE production run and split
# first-chunk (compile) vs steady chunks via a monkeypatched np.asarray?
# Simpler and honest: time init+first chunk by running a 1-chunk config,
# then the full run; steady rate = (T_full - T_short) over the step delta.
from ljmd_tpu.parallel.ensemble import ensemble_simulate_streaming

CHUNK = 50  # samples per streamed chunk (50*20 = 1000 steps per chunk)

short = dataclasses.replace(cfg, total_steps=2000 + cfg.warmup_steps)
t0 = time.time()
out_s = ensemble_simulate_streaming(cfg=short, n_replicas=R, chunk_samples=CHUNK)
t1 = time.time()
full = cfg
out = ensemble_simulate_streaming(cfg=full, n_replicas=R, chunk_samples=CHUNK)
t2 = time.time()

steps_short = short.total_steps + short.warmup_steps
steps_full = full.total_steps + full.warmup_steps
d_steps = steps_full - steps_short
# the two runs share every compiled program (same shapes/chunk), so the
# slope is pure steady-state execution
rate = R * cfg.n * d_steps / (t2 - t1 - (t1 - t0))
per_step = (t2 - t1 - (t1 - t0)) / d_steps * 1e6
print(
    f"cold (init+compile+{steps_short} steps): {t1-t0:.1f}s; "
    f"full ({steps_full} steps): {t2-t1:.1f}s", flush=True,
)
print(
    f"steady: {per_step:.1f} us per batched step -> "
    f"{rate:.3e} aggregate particle-steps/s (R={R}, N={cfg.n})", flush=True,
)

# --- per-replica drift over the sampled production series ------------------
series = np.asarray(out.series)  # (R, 5, n_samples) host
etot = series[:, 2, :]
drift = (etot[:, -1] - etot[:, 0]) / np.abs(etot[:, 0])
print(
    f"per-replica etot drift over {full.total_steps} steps: "
    f"max |d| {np.abs(drift).max():.2e}, mean {drift.mean():+.2e}", flush=True,
)
ok = np.asarray(out.replica_ok)
print(f"replica_ok: {int(ok.sum())}/{R}", flush=True)

# --- artifact write (shared CLI writer) ------------------------------------
from ljmd_tpu.cli import write_ensemble_artifacts

write_ensemble_artifacts(OUT, full, out, R)
print(f"artifacts in {OUT}: {sorted(os.listdir(OUT))}", flush=True)
