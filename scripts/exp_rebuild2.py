"""Rebuild-cost decomposition with FOLD-PROOF chaining.

exp_resort's rebuild timing chained iterations through an INTEGER *0
term, which XLA constant-folds — flags+pack were dead code and the
"34.5us" covered only sort+gather. This version chains through a
float 0.0*x term (not foldable: 0.0*NaN rules), isolating each stage:

  S1 argsort(f32 key) + ids gather
  S1i argsort(int32 quantized key) + ids gather
  S2 + stacked 12-row permute gather
  S3 + compute_tile_flags
  S4 + build_window_lists_pallas (banded, zero_fill=False)

Usage: timeout 1800 python scripts/exp_rebuild2.py [n_cells]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench_matrix import melt
from ljmd_tpu.config import config_from_density
from ljmd_tpu.ops.pallas_fused import (
    build_window_lists_pallas,
    compute_tile_flags,
)
from ljmd_tpu.ops.pallas_lj import _round_up

N_CELLS = int(sys.argv[1]) if len(sys.argv) > 1 else 10


def time_chain(label, body, state0, n_short=50, n_long=200):
    def run(k):
        @jax.jit
        def f(s):
            def it(cc, _):
                return body(cc), None
            s, _ = jax.lax.scan(it, s, None, length=k)
            return s
        return f

    fs, fl = run(n_short), run(n_long)
    float(jnp.sum(fs(state0)[0]))
    float(jnp.sum(fl(state0)[0]))
    slopes = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(jnp.sum(fs(state0)[0]))
        t1 = time.perf_counter()
        float(jnp.sum(fl(state0)[0]))
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (n_long - n_short))
    slopes.sort()
    print(f"{label:30s}: {slopes[2]*1e6:9.2f} us/rebuild", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    cfg = config_from_density(num_cells=N_CELLS, density=0.8442, dt=0.005,
                              dtype="float32")
    n, L = cfg.n, cfg.box_length
    n_pad = _round_up(n, 128)
    st = melt(cfg)
    window = cfg.rc + 1.2 * 0.68

    r12 = jnp.zeros((12, n_pad), jnp.float32)
    r12 = r12.at[0:3, :n].set(st.r.T).at[3:6, :n].set(st.ru.T)
    r12 = r12.at[6:9, :n].set(st.v.T)
    ids = jnp.where(jnp.arange(n_pad) < n, jnp.arange(n_pad), -1)
    ids = ids.astype(jnp.int32)
    state0 = (r12, ids)

    def chain(r12, scalar_i32):
        # float chain: 0.0 * float(x) is NOT foldable (NaN semantics)
        return r12 + 0.0 * scalar_i32.astype(jnp.float32)

    def s1(s):
        r12, ids = s
        key = jnp.where(ids >= 0, r12[2], jnp.inf)
        order = jnp.argsort(key)
        ids2 = ids[order]
        return chain(r12, ids2[0]), ids2

    def s1i(s):
        r12, ids = s
        zq = jnp.clip((r12[2] * ((1 << 21) / L)).astype(jnp.int32),
                      0, (1 << 21) - 1)
        key = jnp.where(ids >= 0, zq, jnp.iinfo(jnp.int32).max)
        order = jnp.argsort(key)
        ids2 = ids[order]
        return chain(r12, ids2[0]), ids2

    def s2(s):
        r12, ids = s
        key = jnp.where(ids >= 0, r12[2], jnp.inf)
        order = jnp.argsort(key)
        return r12[:, order], ids[order]

    def s3(s):
        r12, ids = s
        key = jnp.where(ids >= 0, r12[2], jnp.inf)
        order = jnp.argsort(key)
        r12 = r12[:, order]
        ids = ids[order]
        r8 = jnp.concatenate(
            [r12[0:3], jnp.zeros((5, n_pad), jnp.float32)], axis=0)
        flags = compute_tile_flags(r8, n, 128, 128, L, window,
                                   x_window=None, cross_margin=0.41)
        return chain(r12, flags[0]), ids

    def s4(s):
        r12, ids = s
        key = jnp.where(ids >= 0, r12[2], jnp.inf)
        order = jnp.argsort(key)
        r12 = r12[:, order]
        ids = ids[order]
        r8 = jnp.concatenate(
            [r12[0:3], jnp.zeros((5, n_pad), jnp.float32)], axis=0)
        flags = compute_tile_flags(r8, n, 128, 128, L, window,
                                   x_window=None, cross_margin=0.41)
        tiles, tcounts = build_window_lists_pallas(
            flags, n, n_pad, 128, 512, zero_fill=False)
        return chain(r12, tiles[0, 0] + tcounts[0]), ids

    time_chain("S1 argsort f32 + ids", s1, state0)
    time_chain("S1i argsort int32 + ids", s1i, state0)
    time_chain("S2 + 12-row permute", s2, state0)
    time_chain("S3 + tile flags", s3, state0)
    time_chain("S4 + pack kernel", s4, state0)


if __name__ == "__main__":
    main()
