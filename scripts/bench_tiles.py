"""TPU micro-bench: fused kernel time vs tile_j (pair count constant, tile
count varies) to isolate per-tile fixed cost. Also measures argsort+permute
cost (the z-resort building block)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.lattice import fcc_lattice, random_velocities, remove_com_velocity
from ljmd_tpu.ops.pallas_fused import fused_dense_chunk


def main():
    cfg = config_from_density(num_cells=10, density=0.8442, dt=0.005, dtype="float32")
    n = cfg.n
    dtype = jnp.float32
    r = fcc_lattice(cfg.num_cells, cfg.box_length, dtype=dtype)
    v = remove_com_velocity(random_velocities(jax.random.PRNGKey(0), n, dtype=dtype))
    v = v * jnp.sqrt(0.728 / (jnp.sum(v * v) / (3 * n)))

    n_pad = 4096
    r8 = jnp.zeros((8, n_pad), dtype).at[0:3, :n].set(r.T)
    v8 = jnp.zeros((8, n_pad), dtype).at[0:3, :n].set(v.T)
    a8 = jnp.zeros((8, n_pad), dtype)

    K = 100

    for ti, tj in [(128, 1024), (128, 2048), (256, 1024), (256, 2048), (128, 512)]:
        try:
            fn = jax.jit(lambda r_, v_, a_, ti=ti, tj=tj: fused_dense_chunk(
                r_, v_, a_, n, cfg.box_length, cfg.rc_square, cfg.dt, K,
                tile_i=ti, tile_j=tj))
            out = fn(r8, v8, a8)
            float(jnp.sum(out[1]))
            best = 1e30
            for _ in range(3):
                t0 = time.perf_counter()
                out = fn(r8, v8, a8)
                float(jnp.sum(out[1]))
                best = min(best, time.perf_counter() - t0)
            print(f"tile=({ti:4d},{tj:4d}): {best/K*1e6:8.2f} us/step", flush=True)
        except Exception as e:
            print(f"tile=({ti:4d},{tj:4d}): FAILED {type(e).__name__}: {str(e)[:120]}")

    # argsort + row permute cost (z-resort building block)
    @jax.jit
    def resort(r_, ru_, v_, a_):
        order = jnp.argsort(r_[2, :])
        return tuple(x[:, order] for x in (r_, ru_, v_, a_))

    out = resort(r8, r8, v8, a8)
    float(jnp.sum(out[0]))
    best = 1e30
    for _ in range(5):
        t0 = time.perf_counter()
        out = resort(r8, r8, v8, a8)
        float(jnp.sum(out[0]))
        best = min(best, time.perf_counter() - t0)
    print(f"argsort+permute(4 arrays, n_pad={n_pad}): {best*1e6:8.1f} us")


if __name__ == "__main__":
    main()
