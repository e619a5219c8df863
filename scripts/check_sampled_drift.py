"""TPU drift check for the SAMPLED production path (run_sample obs chunks).

The round-4 obs_last kernel statically splits the fused chunk's step loop
(fori n_steps-1 + one expanded obs step). Per the v5e miscompile protocol
(CLAUDE.md), any chunk-loop structure change needs an energy-conservation
run on real TPU hardware — CPU tests and interpret-mode parity cannot see
a Mosaic/XLA miscompile. This drives run_production_streaming (which
routes every sampled cycle through run_sample) at the flagship point with
DENSE sampling, so every cycle exercises the obs chunk:

    N=4000, rho*=0.8442, dt=0.005, f32, interval=20 -> ck=20 aligned.

Streaming (not run_production): the monolithic 1M-step program is a
single ~60 s device dispatch, which the axon tunnel kills ("TPU worker
process crashed", observed twice 2026-08-19); streaming fetches every
``chunk_samples`` cycles like every long TPU run in this repo.

PASS (at >= 1M steps): |dE/E| at the 1e6-step endpoint < 1e-4 (the
BASELINE bound, "per 1e6 NVE steps"), max excursion < 5e-4, no invalid
diagnostic. The least-squares slope is PRINTED but not gated on: the
truncation-noise energy series is a random walk, so a fitted slope over
any window has O(noise/window) variance that does NOT shrink with
denser sampling (measured 2026-08-19: same trajectory family fits
-1.8e-4 at 100k, +2.3e-4 at 200k, +1.9e-4 at 1M while the 1M endpoint
is +5.6e-5 — and the OLD split path fits +1.1e-4 at 200k). The
run_sample-vs-split A/B (scripts/exp_sampled_ab.py) is the estimator
that isolates the kernel change.

Run: timeout 1800 python scripts/check_sampled_drift.py [total_steps]
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.simulation import initialize
from ljmd_tpu.models.streaming import run_production_streaming

total = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

print("devices:", jax.devices(), flush=True)
cfg = config_from_density(
    num_cells=10, density=0.8442, dt=0.005, dtype="float32",
    total_steps=total, warmup_steps=2000, output_interval=20,
    target_total_energy=-24000.0,
)
out = tempfile.mkdtemp(prefix="sampled_drift_")
t0 = time.time()
state = initialize(cfg)
res = run_production_streaming(
    cfg, state, out, chunk_samples=256, write_frames=False, resume=False,
)
shutil.rmtree(out, ignore_errors=True)
etot = np.asarray(res.series[2], np.float64)
wall = time.time() - t0
rel = (etot - etot[0]) / abs(etot[0])
steps = np.arange(len(etot)) * cfg.output_interval
slope = np.polyfit(steps, rel, 1)[0] * 1e6
diag = {k: bool(v) for k, v in res.diagnostics.items()}
print(f"wall {wall:.0f}s  n_samples {len(etot)}", flush=True)
print(f"etot[0] {etot[0]:.4f}  final rel {rel[-1]:+.3e}  "
      f"max|rel| {np.abs(rel).max():.3e}  secular {slope:+.3e}/1e6 steps",
      flush=True)
print("diagnostics:", diag, flush=True)
ok = (
    abs(rel[-1]) * (1e6 / max(steps[-1], 1)) < 1e-4
    and np.abs(rel).max() < 5e-4
    and not any(diag.values())
)
print("PASS" if ok else "FAIL", flush=True)
