"""N=62500 compensated (dt=1e-4) vs plain (dt=0.005) pencil throughput.

VERDICT round-2 item 2's done criterion: the compensated path at the
reference's own dt regime must stay within ~25% of the plain-path ps/s.
Differential timing per CLAUDE.md TPU rules. Melt runs at the default
(lattice-safe) capacity; timing re-inits a cap=384 engine on the
equilibrated state (the FCC-aliasing bound makes cap=384 overflow from a
lattice start — bench_matrix does the same two-stage setup).

Run: timeout 900 python scripts/exp_pencil_ext_timing.py
"""
import dataclasses as _dc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _cellpair_engine

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
from bench_matrix import melt  # noqa: E402

print("devices:", jax.devices(), flush=True)


def measure(label, cfg, st, short=400, long=1600, **eng_kw):
    eng = _cellpair_engine(cfg, **eng_kw)
    carry, _ = eng.init(st)

    def make(k):
        @jax.jit
        def run(c):
            return eng.run_fast(c, k)
        return run

    run_s, run_l = make(short), make(long)

    def sync(c):
        return float(jnp.sum(eng.get_state(c).v[0]))

    carry = run_s(carry)
    _ = sync(carry)
    carry = run_l(carry)
    _ = sync(carry)
    slopes = []
    for _ in range(3):
        t0 = time.perf_counter()
        carry = run_s(carry)
        _ = sync(carry)
        t1 = time.perf_counter()
        carry = run_l(carry)
        _ = sync(carry)
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (long - short))
        print(f"  T_short={t1-t0:.3f}s T_long={t2-t1:.3f}s", flush=True)
    slopes.sort()
    us = slopes[1] * 1e6
    diag = {k: bool(jax.device_get(v)) for k, v in eng.diagnostics(carry).items()}
    fin = bool(jnp.all(jnp.isfinite(eng.get_state(carry).r)))
    print(f"{label:40s}: {us:9.1f} us/step = {cfg.n/slopes[1]:.3e} ps/s "
          f"{diag} finite={fin}", flush=True)
    return us


cfg = config_from_density(num_cells=25, density=0.8442, dt=0.005,
                          dtype="float32", neighbor_skin=0.49)
st = melt(cfg)
cfg_plain = _dc.replace(cfg, neighbor_capacity=384)
cfg_comp = _dc.replace(cfg, neighbor_capacity=384, dt=1e-4)

t_plain = measure("N=62500 plain dt=0.005 cap384", cfg_plain, st)
t_comp = measure("N=62500 compensated dt=1e-4 cap384", cfg_comp, st)
print(f"compensated/plain = {t_comp/t_plain:.3f} (criterion <= ~1.25)",
      flush=True)
