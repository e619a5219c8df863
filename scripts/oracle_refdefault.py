"""Float64 CPU oracle for the reference-default exemplar run (round-4
VERDICT item 4): the same config (N=500, dt=1e-4, 500k steps, sample/100 —
/root/reference/inputs/input_simulation_parameters.txt:20-45) run at true
float64 on CPU, printing the sampled means the TPU f32+compensation bundle
is compared against in docs/EXEMPLAR.md.

Run: timeout 3600 python scripts/oracle_refdefault.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Force true f64 CPU regardless of the ambient TPU tunnel (this image's
# sitecustomize imports jax at startup, so env vars are too late; the
# config updates below still work because no backend is initialized yet).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from ljmd_tpu.config import load_config
from ljmd_tpu.models.simulation import initialize, run_production
from ljmd_tpu.stats.moments import OBSERVABLES

print("backend:", jax.default_backend(), flush=True)

cfg = load_config("examples/reference_default.json")
print("n:", cfg.n, "dt:", cfg.dt, "steps:", cfg.total_steps, flush=True)

t0 = time.time()
state = initialize(cfg, jax.random.PRNGKey(cfg.seed))
out = run_production(cfg, state, record_frames=False)
elapsed = time.time() - t0

means = {k: float(out.means.mean(k)) for k in OBSERVABLES}
stds = {k: float(out.means.std(k)) for k in OBSERVABLES}
series = out.series  # (5, n_samples)
etot = series[2]
drift = float((etot[-1] - etot[0]) / abs(etot[0]))
print(f"wall {elapsed:.0f}s; etot drift over production: {drift:+.2e}",
      flush=True)
print("ORACLE_MEANS " + json.dumps(means), flush=True)
print("ORACLE_STDS  " + json.dumps(stds), flush=True)
