"""TPU experiment: what is the zsort fused kernel's zero-work floor made of?

Time fused_dense_chunk_flags with ALL-ZERO flags across tile_j (fewer
visits) — if the floor scales with visit count it's branch overhead; if
flat, it's per-step fixed cost (integrator + loop machinery).

Usage: timeout 590 python scripts/exp_zfloor.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _zsort_engine
from ljmd_tpu.models.lattice import fcc_lattice, random_velocities, remove_com_velocity
from ljmd_tpu.ops.pallas_fused import compute_tile_flags, fused_dense_chunk_flags
from ljmd_tpu.state import MDState


def main():
    cfg = config_from_density(num_cells=10, density=0.8442, dt=0.005,
                              dtype="float32")
    n = cfg.n
    r = fcc_lattice(cfg.num_cells, cfg.box_length, dtype=jnp.float32)
    v = remove_com_velocity(random_velocities(jax.random.PRNGKey(0), n,
                                              dtype=jnp.float32))
    v = v * jnp.sqrt(0.728 / (jnp.sum(v * v) / (3 * n)))
    state0 = MDState(r=r, ru=r, v=v, a=jnp.zeros_like(r))
    eng0 = _zsort_engine(cfg, extended=False)
    c0, _ = eng0.init(state0)
    c0 = jax.jit(lambda cc: eng0.run_fast(cc, 512))(c0)
    float(jnp.sum(c0.r))
    print("melt done", flush=True)

    k = 8
    n_chunks = 125

    def run(flags, ti, tj):
        @jax.jit
        def go(r0, v0, a0):
            def body(carry, _):
                r_, v_, a_ = carry
                r_, v_, a_ = fused_dense_chunk_flags(
                    r_, v_, a_, flags, n, cfg.box_length, cfg.rc_square,
                    cfg.dt, k, tile_i=ti, tile_j=tj, interpret=False)
                return (r_, v_, a_), None
            (r_, v_, a_), _ = jax.lax.scan(body, (r0, v0, a0), None,
                                           length=n_chunks)
            return r_, v_, a_
        out = go(c0.r, c0.v, c0.a)
        float(jnp.sum(out[0]))
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(go(c0.r, c0.v, c0.a)[0]))
            best = min(best, time.perf_counter() - t0)
        return best / (k * n_chunks)

    n_pad = c0.r.shape[1]
    for ti, tj in [(128, 512), (128, 1024), (128, 2048), (128, 4096)]:
        n_tiles = (n_pad // ti) * (n_pad // tj)
        zero = jnp.zeros((n_tiles,), jnp.int32)
        flags = compute_tile_flags(c0.r, n, ti, tj, cfg.box_length,
                                   cfg.rc + 0.7)
        t0_ = run(zero, ti, tj)
        t1_ = run(flags, ti, tj)
        act = int(jax.device_get((flags > 0).sum()))
        print(f"TI={ti} TJ={tj:5d} visits={n_tiles:4d}: "
              f"zero={t0_*1e6:7.2f} real={t1_*1e6:7.2f} us/step "
              f"active={act}/{n_tiles}", flush=True)


if __name__ == "__main__":
    main()
