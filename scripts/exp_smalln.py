"""Small-N tile-geometry sweep for the dense rows engine (TPU).

Below n=1024 the rows engine used TJ=128, i.e. up to 10 tiny tile visits
per step at n_pad=512 where a single (128, n_pad) j-tile would do 4.
Measures run_fast differential for the reference-default N=500 and the
ensemble replica N=256 (single + vmapped x64) across tile_j choices.

Run: timeout 900 python scripts/exp_smalln.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ljmd_tpu.config import config_from_density, load_config
from ljmd_tpu.models.engine import _pallas_rows_engine
from ljmd_tpu.models.simulation import initialize

print("devices:", jax.devices(), flush=True)


def diff_time(label, run_s, run_l, sync, carry, short, long, reps=3):
    carry = run_s(carry)
    _ = sync(carry)
    carry = run_l(carry)
    _ = sync(carry)
    slopes = []
    for _ in range(reps):
        t0 = time.perf_counter()
        carry = run_s(carry)
        _ = sync(carry)
        t1 = time.perf_counter()
        carry = run_l(carry)
        _ = sync(carry)
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (long - short))
    slopes.sort()
    us = slopes[len(slopes) // 2] * 1e6
    print(f"{label:44s}: {us:8.3f} us/step", flush=True)
    return us


def single(cfg, tile_j, short=2000, long=20000):
    eng = _pallas_rows_engine(cfg, tile_j=tile_j)
    st = initialize(cfg, jax.random.PRNGKey(0))
    carry, _ = eng.init(st)

    def make(k):
        @jax.jit
        def run(c):
            return eng.run_fast(c, k)
        return run

    def sync(c):
        return float(jnp.sum(eng.get_state(c).v[0]))

    us = diff_time(f"N={cfg.n} single TJ={tile_j}", make(short), make(long),
                   sync, carry, short, long)
    return us


def vmapped(cfg, tile_j, n_rep=64, short=500, long=4000):
    eng = _pallas_rows_engine(cfg, tile_j=tile_j)
    keys = jax.random.split(jax.random.PRNGKey(0), n_rep)
    sts = jax.vmap(lambda k: initialize(cfg, k))(keys)
    carry, _ = jax.vmap(eng.init)(sts)

    def make(k):
        @jax.jit
        def run(c):
            return jax.vmap(lambda cc: eng.run_fast(cc, k))(c)
        return run

    def sync(c):
        return float(jnp.sum(jax.vmap(eng.get_state)(c).v[:, 0]))

    us = diff_time(f"N={cfg.n} vmap{n_rep} TJ={tile_j}", make(short),
                   make(long), sync, carry, short, long)
    return us


# reference default: N=500, dt=1e-4 (compensated auto-on), L=10 rc=4.9
ref = load_config("examples/reference_default.json", warmup_steps=100)
for tj in (128, 256, 512):
    single(ref, tj)

# ensemble replica: N=256 at the ensemble64 state point, dt=0.005 (plain)
ens = load_config("examples/ensemble64.json", warmup_steps=100)
for tj in (128, 256):
    single(ens, tj)
for tj in (128, 256):
    vmapped(ens, tj)
