"""Rebuild-cost decomposition for the window-list path (N=4000).

The window-list kernel cut candidates 5.4M -> 4.5M but the bench moved
only +8%; the suspect is the rebuild (flags at 32x32 + greedy scan +
3x nonzero) which fires every ~10-16 steps. Differential timing of the
rebuild alone: chain K rebuilds via lax.scan (threading r through a
trivial dependence) at two K values -> slope = per-rebuild cost.

Usage: timeout 560 python scripts/exp_winlist.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np
from ljmd_tpu.ops.pallas_fused import (
    compute_tile_flags, build_tile_lists, build_window_lists,
    build_window_lists_pallas)

N, NPAD, TI, TJ = 4000, 4096, 128, 512
L, WINDOW = 16.796, 3.2

def make_r8():
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, L, size=(3, N))
    pos = pos[:, np.argsort(pos[2])]
    r8 = np.zeros((8, NPAD), np.float32); r8[0:3, :N] = pos
    return jnp.asarray(r8)

def timed(fn, r8, k):
    @jax.jit
    def g(r):
        def body(rr, _):
            out = fn(rr)
            # data dependence: fold a scalar from the outputs back into r
            bump = sum(jnp.sum(o).astype(jnp.float32) for o in out) * 1e-20
            return rr + bump, None
        rr, _ = jax.lax.scan(body, r, None, length=k)
        return rr
    out = g(r8); _ = float(jnp.sum(out))
    t0 = time.perf_counter(); out = g(r8); _ = float(jnp.sum(out))
    return time.perf_counter() - t0

def flags_old(r):
    f = compute_tile_flags(r, N, TI, TJ, L, WINDOW)
    t, c = build_tile_lists(f, N, NPAD, TI, TJ)
    return (t, c)

def flags_new(r):
    f = compute_tile_flags(r, N, TI, TI, L, WINDOW)
    t, c = build_window_lists(f, N, NPAD, TI, TJ)
    return (t, c)

def flags_pallas(r):
    f = compute_tile_flags(r, N, TI, TI, L, WINDOW)
    t, c = build_window_lists_pallas(f, N, NPAD, TI, TJ)
    return (t, c)

def sort_only(r):
    order = jnp.argsort(r[2])
    return (r[:, order],)

def main():
    print("devices:", jax.devices(), flush=True)
    r8 = make_r8()
    # parity check: pallas pack vs jnp builder on the real geometry
    tj, cj = flags_new(make_r8()); tp, cp = flags_pallas(make_r8())
    print("parity tcounts:", np.asarray(cj), np.asarray(cp),
          "tiles equal:", bool((np.asarray(tj) == np.asarray(tp)).all()),
          flush=True)
    for name, fn in (("flags_old", flags_old), ("flags_new", flags_new),
                     ("flags_pallas", flags_pallas),
                     ("sort_only", sort_only)):
        lo, hi = 50, 400
        tl = timed(fn, r8, lo); th = timed(fn, r8, hi)
        print(f"{name}: {(th-tl)/(hi-lo)*1e6:8.1f} us/rebuild", flush=True)



def flags128_only(r):
    return (compute_tile_flags(r, N, TI, TI, L, WINDOW),)


def flags512_only(r):
    return (compute_tile_flags(r, N, TI, TJ, L, WINDOW),)


_F128 = None


def builder_only(r):
    # flags fixed; only the cover+pack pipeline timed (r-dependence via a
    # no-op add so the scan carries r)
    t, c = build_window_lists(_F128 + (r[0, 0] * 0).astype(jnp.int32), N, NPAD, TI, TJ)
    return (t, c)


def main2():
    global _F128
    print("devices:", jax.devices(), flush=True)
    r8 = make_r8()
    _F128 = compute_tile_flags(r8, N, TI, TI, L, WINDOW)
    for name, fn in (("flags128_only", flags128_only),
                     ("flags512_only", flags512_only),
                     ("builder_only", builder_only)):
        lo, hi = 50, 400
        tl = timed(fn, r8, lo); th = timed(fn, r8, hi)
        print(f"{name}: {(th-tl)/(hi-lo)*1e6:8.1f} us/rebuild", flush=True)


if __name__ == "__main__":
    main2() if "part2" in sys.argv else main()
