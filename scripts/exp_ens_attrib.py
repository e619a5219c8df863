"""Attribute the ensemble batching loss (round-4 follow-up).

exp_ens_scale measured 739us per batched production step at 64 x N=864
(69% batching efficiency vs the 8.0us single-replica step) and blamed
"per-replica sorts" by analogy. This experiment measures the attribution:
the vmapped zsort engine's run_fast at R in {1, 8, 64}, each with
trigger="always" (default, resort every chunk) and trigger="never"
(rebuild-free floor, UNSAFE — timing only), differential slopes.

  batched resort bill  = always(R) - never(R)
  batched sweep floor  = never(R)  vs R x never(1)

If the resort bill scales super-linearly in R while the sweep floor is
linear, the sorts ARE the batching loss; if the floor itself is
super-linear, the loss is elsewhere (per-visit glue under vmap).

Run: timeout 2400 python scripts/exp_ens_attrib.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench_matrix import melt
from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _zsort_engine
from ljmd_tpu.state import MDState

print("devices:", jax.devices(), flush=True)

cfg = config_from_density(num_cells=6, density=0.8442, dt=0.005,
                          dtype="float32")
st = melt(cfg)
N = cfg.n


def rep_states(R):
    """R decorrelated replicas: same melted positions, re-scaled shuffled
    velocities (identical speed distribution -> identical work)."""
    def one(k):
        perm = jax.random.permutation(k, N)
        return MDState(r=st.r, ru=st.ru, v=st.v[perm], a=st.a)
    return jax.vmap(one)(jax.random.split(jax.random.PRNGKey(7), R))


def diff_time_batched(label, eng, R, n_short, n_long, reps=5):
    states = rep_states(R)
    carry, _ = jax.vmap(eng.init)(states)

    runs = {k: jax.jit(jax.vmap(lambda c, k=k: eng.run_fast(c, k)))
            for k in (n_short, n_long)}

    def fetch(c):
        float(jnp.sum(c.v))

    c = runs[n_short](carry); fetch(c)
    c = runs[n_long](carry); fetch(c)
    slopes = []
    for _ in range(reps):
        t0 = time.perf_counter()
        c = runs[n_short](carry); fetch(c)
        t1 = time.perf_counter()
        c = runs[n_long](carry); fetch(c)
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (n_long - n_short))
    slopes.sort()
    s = slopes[len(slopes) // 2]
    us = s * 1e6
    agg = R * N / s if s > 0 else 0.0
    print(f"{label:32s}: {us:9.2f} us/bstep  {us / R:7.3f} us/replica-step"
          f"  {agg:.3e} agg ps/s", flush=True)
    return s


results = {}
for R, (ns, nl) in ((1, (4000, 20000)), (8, (1500, 7500)), (64, (500, 2500))):
    for trig in ("always", "never"):
        eng = _zsort_engine(cfg, extended=False, trigger=trig)
        results[(R, trig)] = diff_time_batched(
            f"R={R:2d} {trig}", eng, R, ns, nl)

print("\n--- attribution (us per replica-step) ---", flush=True)
for R in (1, 8, 64):
    a, n_ = results[(R, "always")], results[(R, "never")]
    print(f"R={R:2d}: resort bill {(a - n_) / R * 1e6:6.3f}"
          f"  sweep floor {n_ / R * 1e6:6.3f}"
          f"  total {a / R * 1e6:6.3f}", flush=True)
