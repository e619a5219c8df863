"""How often does the zsort engine actually rebuild (resort + reflag)?

Runs the flagship config chunk by chunk and fingerprints carry.r_ref
after each inner_chunk=8 steps; a changed fingerprint = a rebuild fired.
Usage: timeout 560 python scripts/exp_cadence.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np
from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _zsort_engine
from ljmd_tpu.models.lattice import fcc_lattice, random_velocities, remove_com_velocity
from ljmd_tpu.state import MDState

def main():
    print("devices:", jax.devices(), flush=True)
    cfg = config_from_density(num_cells=10, density=0.8442, dt=0.005,
                              dtype="float32")
    r = fcc_lattice(cfg.num_cells, cfg.box_length, dtype=jnp.float32)
    v = remove_com_velocity(random_velocities(jax.random.PRNGKey(0), cfg.n,
                                              dtype=jnp.float32))
    v = v * jnp.sqrt(0.728 / (jnp.sum(v * v) / (3 * cfg.n)))
    eng = _zsort_engine(cfg)
    c, _ = eng.init(MDState(r=r, ru=r, v=v, a=jnp.zeros_like(r)))
    run8 = jax.jit(lambda cc: eng.run_fast(cc, 8))
    # melt 2000 steps first
    c = jax.jit(lambda cc: eng.run_fast(cc, 2000))(c)
    _ = float(jnp.sum(c.v[0]))
    fp_prev = float(jnp.sum(c.r_ref[0]))
    rebuilds = 0; chunks = 200
    gaps = []; last = 0
    for k in range(chunks):
        c = run8(c)
        fp = float(jnp.sum(c.r_ref[0]))
        if fp != fp_prev:
            rebuilds += 1; gaps.append(k - last); last = k
        fp_prev = fp
    print(f"rebuilds: {rebuilds}/{chunks} chunks; mean gap "
          f"{np.mean(gaps) if gaps else float('inf'):.2f} chunks "
          f"({np.mean(gaps)*8 if gaps else 0:.1f} steps); gaps={gaps[:20]}",
          flush=True)

if __name__ == "__main__":
    main()
