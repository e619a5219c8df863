"""Resort cadence/cost decomposition for the zsort window-list engine.

CORRECTION (2026-08-18): this script's R "resort cost" chained
iterations through an INTEGER *0 term, which XLA constant-folds — the
flags+pack stages were dead code and the 34.5us figure covered only
sort+gather. exp_rebuild2.py re-measures with fold-proof float
chaining (0.0*x is not foldable); its numbers supersede R here.

Round-3 finding: narrowing the flag window 3.34 -> 3.196 (skin 0.7 ->
0.58 under the 1.2x margin) bought only ~1 us/step at N=4000 — matching
the ~4% candidate cut — so the ~10 us gap between the engine (75-76 us)
and the pre-margin 65.9 us measurement must be RESORT cost x cadence
(the margin commit moved the trigger from 0.5*skin to 0.25*skin).

Measures at N=4000 (and a slab leg at N=16384):
  T*  engine throughput with trigger = static / predictive / never
      ("never" = the no-resort floor; unsafe, timing only)
  C*  resort fire rate per chunk for both triggers (external replica of
      the in-engine decision over a 2000-step window)
  R   per-resort cost: chained scan of forced sort+flags+lists rebuilds

Usage: timeout 1800 python scripts/exp_resort.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench_matrix import diff_time, melt
from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _zsort_engine
from ljmd_tpu.ops.geometry import minimum_image


def count_fires(engine, st, cfg, sort_skin, inner_chunk=8, n_chunks=250,
                slab=False):
    """Replicate both trigger decisions outside the engine, per chunk."""
    carry, _ = jax.jit(engine.init)(st)
    look = 1.3 * inner_chunk * cfg.dt
    inv_thresh = (0.6 * sort_skin) ** 2
    static_thresh = (0.25 * sort_skin) ** 2
    L = cfg.box_length

    @jax.jit
    def run(c):
        def body(cc, _):
            c, ns, np_ = cc
            d = minimum_image(c.r[0:3] - c.r_ref[0:3], L)
            valid = (c.ids >= 0).astype(c.r.dtype)
            dz2 = d[2] * d[2]
            m2 = jnp.max((jnp.maximum(d[0] * d[0], dz2) if slab else dz2)
                         * valid)
            pz = jnp.abs(d[2]) + look * jnp.abs(c.v[2]) + 0.02
            if slab:
                px = jnp.abs(d[0]) + look * jnp.abs(c.v[0]) + 0.02
                pred = jnp.max(jnp.maximum(px, pz) * valid)
            else:
                pred = jnp.max(pz * valid)
            c = engine.run_fast(c, inner_chunk)
            return (c, ns + (m2 > static_thresh),
                    np_ + (pred * pred > inv_thresh)), None
        (c, ns, np_), _ = jax.lax.scan(
            body, (c, jnp.int32(0), jnp.int32(0)), None, length=n_chunks)
        return c, ns, np_

    c, ns, np_ = run(carry)
    float(jnp.sum(c.v[0]))
    return int(ns), int(np_)


def time_resort(st, cfg, engine, n_short=50, n_long=200):
    """Chained forced rebuilds (sort + permute + flags + lists)."""
    from ljmd_tpu.ops.pallas_fused import (
        build_window_lists_pallas,
        compute_tile_flags,
    )
    carry, _ = jax.jit(engine.init)(st)
    n, L = cfg.n, cfg.box_length
    n_pad = carry.r.shape[1]
    window = cfg.rc + 1.2 * 0.58
    stacked = jnp.concatenate(
        [carry.r, carry.ru, carry.v, carry.a, carry.rlo, carry.vc], axis=0)

    def one(stacked, ids):
        key = jnp.where(ids >= 0, stacked[2], jnp.inf)
        order = jnp.argsort(key)
        stacked = stacked[:, order]
        ids = ids[order]
        flags = compute_tile_flags(
            stacked[0:8], n, 128, 128, L, window, x_window=None,
            cross_margin=0.6 * 0.58)
        tiles, tcounts = build_window_lists_pallas(
            flags, n, n_pad, 128, 384)
        # data-dependence chain without changing values
        eps = (tcounts[0] * 0).astype(stacked.dtype)
        return stacked + eps, ids

    def run(k):
        @jax.jit
        def f(s, ids):
            def body(cc, _):
                return one(*cc), None
            (s, ids), _ = jax.lax.scan(body, (s, ids), None, length=k)
            return s
        return f

    fs, fl = run(n_short), run(n_long)
    _ = float(jnp.sum(fs(stacked, carry.ids)[0]))
    _ = float(jnp.sum(fl(stacked, carry.ids)[0]))
    slopes = []
    for _i in range(5):
        t0 = time.perf_counter()
        float(jnp.sum(fs(stacked, carry.ids)[0]))
        t1 = time.perf_counter()
        float(jnp.sum(fl(stacked, carry.ids)[0]))
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (n_long - n_short))
    slopes.sort()
    print(f"R resort cost                 : {slopes[2]*1e6:9.2f} us/rebuild",
          flush=True)


def main():
    print("devices:", jax.devices(), flush=True)

    cfg = config_from_density(num_cells=10, density=0.8442, dt=0.005,
                              dtype="float32")
    st = melt(cfg)
    for trig in ("static", "predictive", "never"):
        eng = _zsort_engine(cfg, extended=False, trigger=trig)
        diff_time(f"N=4000 trig={trig}", eng, st, 2000, 8000)
    eng = _zsort_engine(cfg, extended=False, trigger="static")
    ns, np_ = count_fires(eng, st, cfg, 0.58)
    print(f"N=4000 fires/250 chunks: static={ns} predictive={np_}",
          flush=True)
    time_resort(st, cfg, eng)

    cfg = config_from_density(num_cells=16, density=0.8442, dt=0.005,
                              dtype="float32")
    st = melt(cfg)
    for trig in ("static", "predictive", "never"):
        eng = _zsort_engine(cfg, extended=False, slab_sort=True, trigger=trig)
        diff_time(f"N=16384 slab trig={trig}", eng, st, 500, 2000)
    eng = _zsort_engine(cfg, extended=False, slab_sort=True, trigger="static")
    ns, np_ = count_fires(eng, st, cfg, 0.58, n_chunks=125, slab=True)
    print(f"N=16384 fires/125 chunks: static={ns} predictive={np_}",
          flush=True)


if __name__ == "__main__":
    main()
