"""Differential decomposition of the PRODUCTION fused list kernel (N=4000).

bench.py showed the K4 unroll-2/dual-accumulator integration gave ~nothing
in situ (4.95e7 -> 4.91e7) although the isolated experiment measured
951 -> 439 ns/visit (scripts/exp_layout.py). This measures the production
kernel itself, decomposed:

  slope(real tiles)  - per-step cost with the real melted tile lists
  slope(zero tiles)  - per-step fixed cost (integration + zeroing + loop rim)
  (real - zero) / visits = true per-visit cost in the production body

for tile shapes (128, 512), (128, 256), (128, 128), using in-kernel n_steps
slopes (k_hi - k_lo steps inside ONE pallas_call), which cancels the ~30ms
tunnel dispatch+fetch cost AND all per-call glue.

Usage: timeout 560 python scripts/exp_prodkernel.py [tj512 tj256 tj128]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _zsort_engine
from ljmd_tpu.models.lattice import (
    fcc_lattice,
    random_velocities,
    remove_com_velocity,
)
from ljmd_tpu.ops.pallas_fused import (
    build_tile_lists,
    compute_tile_flags,
    fused_dense_chunk_list,
)
from ljmd_tpu.state import MDState

K_LO, K_HI = 64, 256
REPS = 5


def fetch(out):
    return float(jnp.sum(out[0]))


def melted_carry(cfg):
    """Equilibrated zsort carry (r/v/a rows + fresh tile lists)."""
    dtype = jnp.float32
    r = fcc_lattice(cfg.num_cells, cfg.box_length, dtype=dtype)
    v = remove_com_velocity(
        random_velocities(jax.random.PRNGKey(0), cfg.n, dtype=dtype)
    )
    v = v * jnp.sqrt(1.0 / (jnp.sum(v * v) / (3 * cfg.n)))
    eng = _zsort_engine(cfg, extended=False)
    c, _ = eng.init(MDState(r=r, ru=r, v=v, a=jnp.zeros_like(r)))

    @jax.jit
    def advance(c):
        def body(cc, _):
            cc2, _o = eng.step_fast(cc)
            return cc2, None

        c, _ = jax.lax.scan(body, c, None, length=400)
        return c

    c = advance(c)
    fetch((c.r,))
    return c


def main(which):
    print("devices:", jax.devices(), flush=True)
    cfg = config_from_density(num_cells=10, density=0.8442, dt=0.005,
                              dtype="float32")
    n, L = cfg.n, cfg.box_length
    c = melted_carry(cfg)
    window = cfg.rc + 0.7

    for tj in (512, 256, 128):
        if which and f"tj{tj}" not in which:
            continue
        n_pad = c.r.shape[1]
        flags = compute_tile_flags(c.r, n, 128, tj, L, window)
        tiles, tcounts = build_tile_lists(flags, n, n_pad, 128, tj)
        tc = np.asarray(tcounts)
        visits = int(tc.sum())
        cand = visits * 128 * tj

        args = (c.r, c.v, c.a)
        z_tiles = jnp.zeros_like(tiles)
        z_counts = jnp.zeros_like(tcounts)

        def make(k, tl, tc_, da, tj=tj):
            @jax.jit
            def run(r, v, a):
                return fused_dense_chunk_list(
                    r, v, a, tl, tc_, n, L, cfg.rc_square, cfg.dt, k,
                    tile_i=128, tile_j=tj, dual_acc=da,
                )
            return run

        def slope(tl, tc_, da, label):
            print(f"[compile] tj={tj} {label}", flush=True)
            run_lo, run_hi = make(K_LO, tl, tc_, da), make(K_HI, tl, tc_, da)
            fetch(run_lo(*args)); fetch(run_hi(*args))
            ss = []
            for _ in range(REPS):
                t0 = time.perf_counter(); fetch(run_lo(*args))
                t1 = time.perf_counter(); fetch(run_hi(*args))
                t2 = time.perf_counter()
                ss.append(((t2 - t1) - (t1 - t0)) / (K_HI - K_LO) * 1e6)
            ss.sort()
            return ss[len(ss) // 2]

        for da in (True, False):
            tag = "dual" if da else "mono"
            s_real = slope(tiles, tcounts, da, f"{tag} real")
            s_zero = slope(z_tiles, z_counts, da, f"{tag} zero")
            per_visit = (s_real - s_zero) / visits * 1e3
            rate = (cand / ((s_real - s_zero) * 1e-6) / 1e9
                    if s_real > s_zero else 0)
            print(
                f"tj={tj:4d} {tag}: visits={visits:4d} (pure {tc[0]}, "
                f"masked {tc[1]}) cand={cand/1e6:5.2f}M | "
                f"step real={s_real:7.2f}us zero={s_zero:5.2f}us | "
                f"per-visit={per_visit:6.0f}ns ({rate:5.1f} Gcand/s)",
                flush=True,
            )


if __name__ == "__main__":
    main(sys.argv[1:])
