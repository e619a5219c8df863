"""TPU diagnostic: why does the fused pencil run set the overflow flag?

Track per-chunk: max displacement vs r_ref, max pencil count, overflow.

Usage: timeout 590 python scripts/exp_pencil_diag.py
"""

import dataclasses as _dc
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _cellpair_engine
from ljmd_tpu.models.lattice import fcc_lattice, random_velocities, remove_com_velocity
from ljmd_tpu.ops.geometry import minimum_image
from ljmd_tpu.state import MDState


def main():
    skin = 0.49
    cfg = config_from_density(num_cells=25, density=0.8442, dt=0.005,
                              dtype="float32", neighbor_skin=skin)
    n = cfg.n
    dtype = jnp.float32
    r = fcc_lattice(cfg.num_cells, cfg.box_length, dtype=dtype)
    v = remove_com_velocity(random_velocities(jax.random.PRNGKey(0), n, dtype=dtype))
    v = v * jnp.sqrt(0.728 / (jnp.sum(v * v) / (3 * n)))
    state = MDState(r=r, ru=r, v=v, a=jnp.zeros_like(r))

    eng0 = _cellpair_engine(cfg)
    c0, _ = eng0.init(state)

    @jax.jit
    def warm(c):
        def body(cc, _):
            cc2, _ob = eng0.step_fast(cc)
            return cc2, None
        out, _ = jax.lax.scan(body, c, None, length=300)
        return out

    c0 = warm(c0)
    state = eng0.get_state(c0)
    print("warmup done", flush=True)

    cfg_t = _dc.replace(cfg, neighbor_capacity=384)
    eng = _cellpair_engine(cfg_t, half_shell=True)
    c, _ = eng.init(state)
    L = cfg_t.box_length

    run8 = jax.jit(lambda cc: eng.run_fast(cc, 8))
    prev_ovf = False
    for i in range(50):
        # displacement BEFORE the next chunk's rebin check sees it
        d = minimum_image(c.r[0:3] - c.r_ref[0:3], L)
        m = float(jnp.sqrt(jnp.max(jnp.sum(d * d, axis=0) * c.r[3])))
        cmax = int(jnp.max(c.counts))
        vmax = float(jnp.sqrt(jnp.max(jnp.sum(c.v[0:3] ** 2, axis=0))))
        ovf = bool(jax.device_get(c.overflow))
        if ovf and not prev_ovf:
            print(f"chunk {i:3d}: OVERFLOW TRIPPED  moved={m:.3f} "
                  f"maxcount={cmax} vmax={vmax:.2f}", flush=True)
            prev_ovf = True
        if i % 10 == 0:
            print(f"chunk {i:3d}: moved={m:.3f} (skin/2={skin/2:.3f}) "
                  f"maxcount={cmax}/384 vmax={vmax:.2f} ovf={ovf}", flush=True)
        c = run8(c)
    print("final overflow:", bool(jax.device_get(c.overflow)), flush=True)


if __name__ == "__main__":
    main()
