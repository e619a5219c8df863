"""A/B drift comparison: sampled production with run_sample (fused obs
chunk) vs the old run_fast(n-1)+step split, same config and init state.

Separates "the obs_last kernel perturbs the trajectory / miscompiles"
from "a short-window secular fit is dominated by truncation-noise random
walk": both legs run the SAME number of steps from the SAME state, so a
run_sample-specific defect shows as a drift/max|rel| gap between legs.

Run: timeout 2400 python scripts/exp_sampled_ab.py [total_steps]
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
from ljmd_tpu.models.engine import make_engine
from ljmd_tpu.models.simulation import initialize
from ljmd_tpu.models.streaming import run_production_streaming

total = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000

print("devices:", jax.devices(), flush=True)
cfg = config_from_density(
    num_cells=10, density=0.8442, dt=0.005, dtype="float32",
    total_steps=total, warmup_steps=2000, output_interval=20,
    target_total_energy=-24000.0,
)
state = initialize(cfg)

for label in ("run_sample", "split"):
    eng = make_engine(cfg, state=state, sample_interval=cfg.output_interval)
    if label == "split":
        eng = eng._replace(run_sample=None)
    out = tempfile.mkdtemp(prefix=f"ab_{label}_")
    t0 = time.time()
    res = run_production_streaming(
        cfg, state, out, chunk_samples=256, write_frames=False,
        resume=False, engine=eng,
    )
    shutil.rmtree(out, ignore_errors=True)
    wall = time.time() - t0
    etot = np.asarray(res.series[2], np.float64)
    rel = (etot - etot[0]) / abs(etot[0])
    steps = np.arange(len(etot)) * cfg.output_interval
    slope = np.polyfit(steps, rel, 1)[0] * 1e6
    diag = {k: bool(v) for k, v in res.diagnostics.items()}
    print(f"{label:11s}: wall {wall:.0f}s  etot[0] {etot[0]:.4f}  "
          f"final {rel[-1]:+.3e}  max|rel| {np.abs(rel).max():.3e}  "
          f"secular {slope:+.3e}/1e6  {diag}", flush=True)
