"""TPU experiment: rebin primitive costs, async-safe methodology.

Each op runs inside a lax.scan with a data-dependent chain; time comes from
a final scalar fetch. (exp_rebin.py's block_until_ready numbers were all
~25-40us — the dispatch floor, not execution.)

Usage: timeout 590 python scripts/exp_rebin2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

ITERS = 50


def bench(name, make_body, init, reps=3):
    @jax.jit
    def run(x):
        out, _ = jax.lax.scan(lambda c, _: (make_body(c), None), x, None,
                              length=ITERS)
        return out

    out = run(init)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(jax.tree.leaves(run(init))[0].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:45s}: {best/ITERS*1e6:10.1f} us", flush=True)


def main():
    ns = 75264
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    keys_f = jax.random.uniform(k1, (ns,), jnp.float32) * 8000
    arr = jax.random.normal(k2, (8, ns), jnp.float32)
    perm = jax.random.permutation(k3, ns)
    eps = jnp.float32(1e-30)

    bench("argsort f32 (ns)",
          lambda k: k + eps * jnp.argsort(k).astype(jnp.float32), keys_f)

    def scatter_body(c):
        a, p = c
        out = jnp.zeros((8, ns + 1), jnp.float32)
        out = out.at[:, p].set(a)
        return (out[:, :ns], p)
    bench("scatter permute (8,ns) lane dim", scatter_body, (arr, perm))

    def gather_body(c):
        a, p = c
        return (a[:, p], p)
    bench("gather permute (8,ns) lane dim", gather_body, (arr, perm))

    bench("searchsorted ns-in-ns",
          lambda k: k + eps * jnp.searchsorted(k, k).astype(jnp.float32),
          jnp.sort(keys_f))

    bench("cumsum f32 (ns,)", lambda k: jnp.cumsum(k) * eps + k, keys_f)

    mask0 = keys_f > 7600

    def nz_body(k):
        idx = jnp.nonzero(k > 7600, size=4096, fill_value=ns)[0]
        return k + eps * jnp.sum(idx).astype(jnp.float32)
    bench("nonzero size=4096 (ns mask)", nz_body, keys_f)

    M = 4096
    small_keys = jax.random.uniform(k1, (M,), jnp.float32)
    bench("argsort 4096",
          lambda k: k + eps * jnp.argsort(k).astype(jnp.float32), small_keys)

    idx4k = jax.random.randint(k3, (M,), 0, ns)

    def gsm_body(c):
        a, i = c
        g = a[:, i]
        return (a + eps * jnp.sum(g), i)
    bench("gather (8,ns)->(8,4096)", gsm_body, (arr, idx4k))

    def ssm_body(c):
        a, i = c
        a2 = a.at[:, i].add(eps)
        return (a2, i)
    bench("scatter-add (8,4096) into (8,ns)", ssm_body, (arr, idx4k))

    # the actual full rebin, chained
    from ljmd_tpu.ops.cell_list import make_pencil_grid, rebin_slots
    from ljmd_tpu.ops.pallas_pencil2 import sentinel_fill
    from ljmd_tpu.config import config_from_density
    cfg = config_from_density(num_cells=25, density=0.8442, dt=0.005,
                              dtype="float32", neighbor_skin=0.4)
    grid = make_pencil_grid(cfg.n, cfg.box_length, cfg.rc + 0.4,
                            cfg.density, 384)
    # build a valid slot layout from the lattice
    from ljmd_tpu.models.lattice import fcc_lattice
    from ljmd_tpu.ops.cell_list import bin_to_slots
    r = fcc_lattice(cfg.num_cells, cfg.box_length, dtype=jnp.float32)
    slot, _ = bin_to_slots(r, grid)
    r8 = jnp.zeros((8, grid.n_slots + 1), jnp.float32)
    r8 = r8.at[0:3, slot].set(r.T)[:, :grid.n_slots]
    valid = jnp.zeros((grid.n_slots + 1,), jnp.float32).at[slot].set(1.0)[:grid.n_slots]
    r8 = r8.at[3, :].set(valid)
    r8 = sentinel_fill(r8, valid, grid.capacity)

    def rebin_body(c):
        r8c = c
        new_slot, ovf = rebin_slots(r8c, r8c[3, :], grid)
        out = jnp.zeros((8, grid.n_slots + 1), jnp.float32)
        out = out.at[:, new_slot].set(r8c)
        r8p = out[:, :grid.n_slots]
        r8p = sentinel_fill(r8p, r8p[3, :], grid.capacity)
        return r8p + eps * ovf.astype(jnp.float32)
    bench("FULL rebin_slots + 1 permute + sentinel", rebin_body, r8)


if __name__ == "__main__":
    main()
