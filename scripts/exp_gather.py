"""Amortized gather neighbor-list experiment (VERDICT r2 item 1).

Question: can a (N_pad, K) gathered neighbor list beat the window-tile
kernel at the flagship N=4000? The window lists sweep ~4.5M pair-once
candidate slots (~41x the ~110k physical pairs); a K-list caps candidates
at N*K ~ 0.65M. The unknowns are (a) the per-step XLA gather cost of the
neighbor coordinates and (b) the amortized list-rebuild cost. Round 1
measured "jnp gather 5x slower than dense" but that path rebuilt the list
every step; this measures the parts separately, differentially.

Measures (all chained through lax.scan with data dependence, slope of two
run lengths, ~100ms+ signal):
  G1  gather-only cost per step, layouts (3,N,K) and (3,K,N)
  G2  full force+Verlet step from a FIXED prebuilt list
  R*  one-shot rebuild costs: full argsort / top_k / sort-of-keys
  baseline: the committed zsort window-list engine, same state

Usage: timeout 1800 python scripts/exp_gather.py
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

N_CELLS = int(os.environ.get("EXP_CELLS", "10"))   # N = 4000
N_PAD = int(os.environ.get("EXP_PAD", "4096"))
RC = 2.5
SMOKE = os.environ.get("EXP_SMOKE", "") == "1"


def build_list_argsort(r, n, L, window, K):
    """(N_PAD, K) neighbor indices (self-padded), full O(N^2) argsort."""
    col = jnp.arange(N_PAD)
    real = col < n
    d = r[:, :, None] - r[:, None, :]
    d = d - L * jnp.round(d / L)
    r2 = jnp.sum(d * d, axis=0)
    ok = (r2 < window * window) & (col[None, :] != col[:, None])
    ok = ok & real[None, :] & real[:, None]
    key = jnp.where(ok, r2, jnp.inf)
    idx = jnp.argsort(key, axis=1)[:, :K]
    counts = jnp.sum(ok, axis=1)
    # self-pad the dead slots so gathered coords give r2=0 (masked by k<count)
    k_iota = jnp.arange(K)[None, :]
    idx = jnp.where(k_iota < counts[:, None], idx, col[:, None])
    return idx.astype(jnp.int32), counts.astype(jnp.int32)


def time_fn(label, fn, carry, n_short, n_long, per_label="step"):
    runs = {k: jax.jit(lambda c, k=k: fn(c, k)) for k in (n_short, n_long)}
    c = runs[n_short](carry)
    float(jnp.sum(c[0]))
    c = runs[n_long](carry)
    float(jnp.sum(c[0]))
    slopes = []
    for _ in range(5):
        t0 = time.perf_counter()
        c = runs[n_short](carry)
        float(jnp.sum(c[0]))
        t1 = time.perf_counter()
        c = runs[n_long](carry)
        float(jnp.sum(c[0]))
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (n_long - n_short))
    slopes.sort()
    s = slopes[len(slopes) // 2]
    print(f"{label:34s}: {s*1e6:9.2f} us/{per_label}", flush=True)
    return s


def time_once(label, fn, *args):
    out = jax.jit(fn)(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    # block_until_ready unreliable on axon: force with a fetch
    float(jnp.sum(jnp.asarray(out[0] if isinstance(out, tuple) else out,
                              jnp.float32).ravel()[:8].sum()))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = jax.jit(fn)(*args)
        f = out[0] if isinstance(out, tuple) else out
        float(jnp.sum(jnp.asarray(f, jnp.float32).ravel()[:8].sum()))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"{label:34s}: {ts[len(ts)//2]*1e3:9.3f} ms once "
          f"(incl ~30ms fetch artifact; subtract)", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    cfg = config_from_density(num_cells=N_CELLS, density=0.8442, dt=0.005,
                              dtype="float32")
    n, L = cfg.n, cfg.box_length
    st = melt(cfg, cycles=1, steps=50) if SMOKE else melt(cfg)

    if not SMOKE:
        # same-session committed-engine baseline
        diff_time("baseline zsort (committed)", _zsort_engine(cfg), st,
                  2000, 8000)

    # z-sorted padded positions
    r = jnp.concatenate([st.r.T, jnp.zeros((3, N_PAD - n), jnp.float32)
                         + 0.5 * L], axis=1)
    order = jnp.argsort(jnp.where(jnp.arange(N_PAD) < n, r[2], jnp.inf))
    r = r[:, order]
    v = jnp.concatenate([st.v.T, jnp.zeros((3, N_PAD - n))], axis=1)[:, order]

    for skin, K in ((0.56, 128), (0.66, 160), (1.0, 224)):
        window = RC + skin
        idx, counts = jax.jit(
            lambda rr: build_list_argsort(rr, n, L, window, K)
        )(r)
        mx = int(jnp.max(counts))
        print(f"K={K} window={window:.2f}: max count={mx} "
              f"avg={float(jnp.mean(counts[:n])):.1f} "
              f"{'OVERFLOW' if mx > K else 'ok'}", flush=True)

        # ---- G1: gather only, both layouts ----
        def g1_nk(c, steps, idx=idx):
            rr, acc = c
            def body(cc, _):
                rr, acc = cc
                rg = rr[:, idx]            # (3, N_PAD, K)
                s = jnp.sum(rg, axis=(1, 2))  # consume ALL of rg (no DCE)
                return (rr + 1e-20 * s[:, None], acc + s[0]), None
            return jax.lax.scan(body, c, None, length=steps)[0]

        idx_t = idx.T  # (K, N_PAD)

        def g1_kn(c, steps, idx_t=idx_t):
            rr, acc = c
            def body(cc, _):
                rr, acc = cc
                rg = rr[:, idx_t]          # (3, K, N_PAD)
                s = jnp.sum(rg, axis=(1, 2))
                return (rr + 1e-20 * s[:, None], acc + s[0]), None
            return jax.lax.scan(body, c, None, length=steps)[0]

        c0 = (r, jnp.float32(0))
        ns, nl = (5, 10) if SMOKE else (500, 2500)
        time_fn(f"G1 gather (3,N,{K})", g1_nk, c0, ns, nl)
        time_fn(f"G1 gather (3,{K},N)", g1_kn, c0, ns, nl)

        # ---- G2: full force + Verlet from fixed list ----
        k_iota = jnp.arange(K)[None, :]
        live = (k_iota < counts[:, None])[None]  # (1, N_PAD, K)
        rc2 = jnp.float32(RC * RC)
        dt = jnp.float32(cfg.dt)

        def forces(rr, idx=idx):
            rg = rr[:, idx]                       # (3, N_PAD, K)
            d = rr[:, :, None] - rg
            d = d - L * jnp.round(d * (1.0 / L))
            r2 = jnp.sum(d * d, axis=0)           # (N_PAD, K)
            m = live[0] & (r2 < rc2)
            r2s = jnp.where(m, r2, 1.0)
            s2 = 1.0 / r2s
            s6 = s2 * s2 * s2
            coef = jnp.where(m, s6 * (s6 - 0.5) * s2, 0.0)
            return 48.0 * jnp.sum(coef[None] * d, axis=2)  # (3, N_PAD)

        def g2(c, steps):
            def body(cc, _):
                rr, vv, aa = cc
                vh = vv + (0.5 * dt) * aa
                rn = rr + dt * vh
                an = forces(rn)
                return (rn, vh + (0.5 * dt) * an, an), None
            return jax.lax.scan(body, c, None, length=steps)[0]

        a0 = forces(r)
        time_fn(f"G2 force+verlet K={K}", g2, (r, v, a0), ns, nl)

    # ---- rebuild costs (one-shot, minus ~30ms artifact) ----
    window = RC + 0.66
    time_once("R argsort full N^2",
              lambda rr: build_list_argsort(rr, n, L, window, 160), r)

    def r_topk(rr):
        d = rr[:, :, None] - rr[:, None, :]
        d = d - L * jnp.round(d / L)
        r2 = jnp.sum(d * d, axis=0)
        col = jnp.arange(N_PAD)
        ok = (r2 < window * window) & (col[None] != col[:, None])
        neg = jnp.where(ok, -r2, -jnp.inf)
        _, idx = jax.lax.top_k(neg, 160)
        return idx

    time_once("R top_k full N^2", r_topk, r)

    def r_sortkeys(rr):
        d = rr[:, :, None] - rr[:, None, :]
        d = d - L * jnp.round(d / L)
        r2 = jnp.sum(d * d, axis=0)
        col = jnp.arange(N_PAD)
        ok = (r2 < window * window) & (col[None] != col[:, None])
        keys = jnp.where(ok, col[None] * jnp.ones((N_PAD, 1), jnp.int32),
                         jnp.int32(1 << 30))
        return jnp.sort(keys, axis=1)[:, :160]

    time_once("R sort-js full N^2", r_sortkeys, r)

    # Band-limited rebuild: z-sorted rows only see a contiguous B-wide
    # index band; O(N*B) distance work + per-row B-sort instead of N.
    B = min(2048, N_PAD)

    def r_band(rr):
        col = jnp.arange(N_PAD)
        base = jnp.clip(col - B // 2, 0, N_PAD - B)
        cols = base[:, None] + jnp.arange(B)[None, :]      # (N, B) monotone
        rb = rr[:, cols]                                   # gather (3, N, B)
        d = rr[:, :, None] - rb
        d = d - L * jnp.round(d / L)
        r2 = jnp.sum(d * d, axis=0)
        ok = (r2 < window * window) & (cols != col[:, None])
        keys = jnp.where(ok, cols, jnp.int32(1 << 30))
        return jnp.sort(keys, axis=1)[:, :160]

    time_once(f"R band-sort B={B}", r_band, r)


if __name__ == "__main__":
    main()
