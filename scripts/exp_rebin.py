"""TPU experiment: cost of rebin primitives at ns=75264.

Which part of the 44 ms rebin is expensive: argsort, the (8, ns) lane-dim
scatter permutes, searchsorted, or small (16k) sorts/gathers for an
incremental design?

Usage: timeout 590 python scripts/exp_rebin.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:45s}: {best*1e6:10.1f} us", flush=True)
    return best


def main():
    ns = 75264
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    keys_f = jax.random.uniform(k1, (ns,), jnp.float32) * 8000
    arr = jax.random.normal(k2, (8, ns), jnp.float32)
    perm = jax.random.permutation(k3, ns)

    bench("argsort f32 (ns)", jax.jit(lambda x: jnp.argsort(x)), keys_f)
    bench("sort f32 (ns)", jax.jit(lambda x: jnp.sort(x)), keys_f)
    bench("sort (key,iota) lax.sort 2-op", jax.jit(
        lambda x: jax.lax.sort((x, jnp.arange(ns)), num_keys=1)), keys_f)

    @jax.jit
    def scatter_perm(a, p):
        out = jnp.zeros((8, ns + 1), jnp.float32)
        out = out.at[:, p].set(a)
        return out[:, :ns]
    bench("scatter permute (8,ns) lane dim", scatter_perm, arr, perm)

    bench("gather permute (8,ns) lane dim", jax.jit(lambda a, p: a[:, p]),
          arr, perm)

    @jax.jit
    def gather_T(aT, p):
        return aT[p, :]
    bench("gather permute (ns,8) row dim", gather_T, arr.T, perm)

    @jax.jit
    def scatter_T(aT, p):
        out = jnp.zeros((ns + 1, 8), jnp.float32)
        out = out.at[p, :].set(aT)
        return out[:ns]
    bench("scatter permute (ns,8) row dim", scatter_T, arr.T, perm)

    bench("searchsorted ns-in-ns", jax.jit(
        lambda x: jnp.searchsorted(x, x)), jnp.sort(keys_f))

    bench("cumsum (ns,) int32", jax.jit(
        lambda m: jnp.cumsum(m)), (keys_f > 4000).astype(jnp.int32))

    mask = keys_f > 7600  # ~5% movers
    bench("nonzero size=4096", jax.jit(
        lambda m: jnp.nonzero(m, size=4096, fill_value=ns)[0]), mask)

    M = 4096
    small_keys = jax.random.uniform(k1, (M,), jnp.float32)
    small_dat = jax.random.normal(k2, (8, M), jnp.float32)
    bench("argsort 4096", jax.jit(lambda x: jnp.argsort(x)), small_keys)
    bench("gather (8,ns)->(8,4096)", jax.jit(
        lambda a, i: a[:, i]), arr,
        jax.random.randint(k3, (M,), 0, ns))
    bench("scatter (8,4096) into (8,ns)", jax.jit(
        lambda a, i, y: a.at[:, i].set(y)), arr,
        jax.random.randint(k3, (M,), 0, ns), small_dat)

    # roll on pencil axes (option K)
    m = 14
    cap = 384
    a4 = arr.reshape(8, m, m, cap)
    bench("roll (8,m,m,cap) axis 1+2", jax.jit(
        lambda a: jnp.roll(a, (1, 1), axis=(1, 2))), a4)

    # row-wise small sort with payloads: (196, 3456) 1 key + 3 payloads
    rows = jax.random.uniform(k1, (196, 3456), jnp.float32)
    pay = [jax.random.normal(k2, (196, 3456), jnp.float32) for _ in range(3)]
    bench("lax.sort rows 3456-wide, 1key+3pay", jax.jit(
        lambda r, p0, p1, p2: jax.lax.sort((r, p0, p1, p2), num_keys=1,
                                           dimension=1)), rows, *pay)


if __name__ == "__main__":
    main()
