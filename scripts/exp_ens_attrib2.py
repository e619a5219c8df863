"""Split the ensemble PRODUCTION overhead (exp_ens_attrib follow-up).

exp_ens_attrib showed batching is free (R=64 run_fast = 7.98 us/replica-step
vs 8.08 single): the 739 vs 511 us/bstep gap in exp_ens_scale lives in the
per-sample production cycle, not in vmap. This experiment times, at R=64 x
N=864, interval=20 (the config-4 cadence), jitted chunk programs of k sample
cycles, differential over k (slope = one sample cycle):

  floor     scan k x run_fast(20)                      (no sampling at all)
  obsstep   scan k x [run_fast(19) + step(want_obs)]   (the _advance shape)
  full      obsstep + means_update + series stack      (the streaming body)
  fetch     full, but ALSO pulling the (R,5,k) block to host each call
            (the streaming driver's per-chunk transfer, amortized over k)

Run: timeout 2400 python scripts/exp_ens_attrib2.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from bench_matrix import melt
from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _zsort_engine, _effective_dtype
from ljmd_tpu.models.simulation import _advance
from ljmd_tpu.state import MDState
from ljmd_tpu.stats.moments import (
    instantaneous_temp_press, means_init, means_update,
)

print("devices:", jax.devices(), flush=True)

R = 64
INTERVAL = 20
cfg = config_from_density(num_cells=6, density=0.8442, dt=0.005,
                          dtype="float32")
dtype = _effective_dtype(cfg)
st = melt(cfg)
N = cfg.n
# The shipped sampled-run configuration (make_engine sample_interval
# alignment): one resort per 20-step cycle.
eng = _zsort_engine(cfg, extended=False, inner_chunk=INTERVAL)


def rep_states(r):
    def one(k):
        perm = jax.random.permutation(k, N)
        return MDState(r=st.r, ru=st.ru, v=st.v[perm], a=st.a)
    return jax.vmap(one)(jax.random.split(jax.random.PRNGKey(7), r))


carry0, _ = jax.vmap(eng.init)(rep_states(R))
acc0 = jax.vmap(lambda _: means_init(dtype=dtype))(jnp.arange(R))


def mk_floor(k):
    @jax.jit
    def run(ec):
        def one(ec):
            def body(c, _):
                return eng.run_fast(c, INTERVAL), None
            c, _ = lax.scan(body, ec, None, length=k)
            return c
        return jax.vmap(one)(ec)
    return run


def mk_obsstep(k):
    @jax.jit
    def run(ec):
        def one(ec):
            def body(c, _):
                c2, ob = _advance(c, eng.step, INTERVAL, dtype,
                                  fast_fn=eng.step_fast,
                                  run_fast=eng.run_fast)
                return c2, ob.epot
            c, e = lax.scan(body, ec, None, length=k)
            return c, e
        return jax.vmap(one)(ec)
    return run


def mk_full(k, fetch_block=False):
    @jax.jit
    def run(ec, acc):
        def one(ec, acc):
            def body(carry, _):
                c, a = carry
                c, ob = _advance(c, eng.step, INTERVAL, dtype,
                                 fast_fn=eng.step_fast,
                                 run_fast=eng.run_fast)
                a = means_update(a, ob, cfg.n, cfg.volume)
                temp, press = instantaneous_temp_press(ob, cfg.n, cfg.volume)
                series = jnp.stack(
                    [ob.epot, ob.ekin, ob.epot + ob.ekin, temp, press])
                return (c, a), series
            (c, a), s = lax.scan(body, (ec, acc), None, length=k)
            return c, a, s.T
        return jax.vmap(one)(ec, acc)
    return run


def diff(label, mk, args, ks=(10, 60), reps=5, fetch_block=False):
    runs = {k: mk(k) for k in ks}

    def go(k):
        out = runs[k](*args)
        if fetch_block:
            np.asarray(out[2])          # (R, 5, k) block to host
        leaf = out[0] if isinstance(out, tuple) else out
        float(jnp.sum(leaf.v))
    for k in ks:
        go(k)
    slopes = []
    for _ in range(reps):
        t0 = time.perf_counter(); go(ks[0])
        t1 = time.perf_counter(); go(ks[1])
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (ks[1] - ks[0]))
    slopes.sort()
    s = slopes[len(slopes) // 2]
    per_step = s / INTERVAL
    agg = R * N / per_step
    print(f"{label:12s}: {s * 1e6:9.1f} us/cycle  {per_step * 1e6:8.2f}"
          f" us/bstep  {agg:.3e} agg ps/s", flush=True)
    return s


def mk_sampled(k):
    """The round-4 fused path: run_sample (obs accumulated by the final
    chunk step's own sweep, no separate obs program)."""
    @jax.jit
    def run(ec):
        def one(ec):
            def body(c, _):
                c2, ob = eng.run_sample(c, INTERVAL)
                return c2, ob.epot
            c, e = lax.scan(body, ec, None, length=k)
            return c, e
        return jax.vmap(one)(ec)
    return run


f = diff("floor", mk_floor, (carry0,))
o = diff("obsstep", mk_obsstep, (carry0,))
u = diff("full", mk_full, (carry0, acc0))
h = diff("fetch", lambda k: mk_full(k), (carry0, acc0), fetch_block=True)
s_ = diff("run_sample", mk_sampled, (carry0,))

print("\n--- per sample cycle (us, R=64 batched) ---", flush=True)
print(f"floor(20 fast steps)      {f*1e6:9.1f}", flush=True)
print(f"+ obs step (19+1 split)   {(o-f)*1e6:9.1f}", flush=True)
print(f"+ means/series            {(u-o)*1e6:9.1f}", flush=True)
print(f"+ host block fetch        {(h-u)*1e6:9.1f}", flush=True)
print(f"run_sample vs obsstep     {(s_-o)*1e6:9.1f}", flush=True)
