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
# Differential over two WARM runs (each length compiled by its own cold
# call first: the corr stage's shapes depend on n_samples, so the short
# and full runs compile separate corr programs; the chunk/advance programs
# are shared). Slope = steady-state chunked execution + host streaming.
from ljmd_tpu.parallel.ensemble import ensemble_simulate_streaming

CHUNK = 50  # samples per streamed chunk (50*20 = 1000 steps per chunk)

short = dataclasses.replace(cfg, total_steps=4000)
full = cfg

t0 = time.time()
out_s = ensemble_simulate_streaming(cfg=short, n_replicas=R, chunk_samples=CHUNK)
t1 = time.time()
out = ensemble_simulate_streaming(cfg=full, n_replicas=R, chunk_samples=CHUNK)
t2 = time.time()

steps_short = short.total_steps + short.warmup_steps
steps_full = full.total_steps + full.warmup_steps
d_steps = steps_full - steps_short
# MEDIAN of repeated warm pairs: a single warm run on this 1-core host
# carries multi-second tunnel/host jitter, and one slow leg poisons a
# single-pair slope by 2x in either direction (measured 2026-08-19: the
# same code gave 287 and 590 us/bstep on single pairs an hour apart,
# while the in-jit attribution harness, exp_ens_attrib2, pinned the
# pipeline at ~502; a 3-rep median lands within its error).
REPS = 3
slopes, pairs = [], []
for _ in range(REPS):
    ta = time.time()
    ensemble_simulate_streaming(cfg=short, n_replicas=R, chunk_samples=CHUNK)
    tb = time.time()
    out = ensemble_simulate_streaming(cfg=full, n_replicas=R, chunk_samples=CHUNK)
    tc = time.time()
    pairs.append((tb - ta, tc - tb))
    slopes.append((tc - tb) - (tb - ta))
slopes.sort()
warm = slopes[len(slopes) // 2]
rate = R * cfg.n * d_steps / warm
per_step = warm / d_steps * 1e6
print(
    f"cold: short {t1-t0:.1f}s, full {t2-t1:.1f}s; warm pairs: "
    + " ".join(f"({a:.1f},{b:.1f})" for a, b in pairs), flush=True,
)
print(
    f"steady (median of {REPS}): {per_step:.1f} us per batched step -> "
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
