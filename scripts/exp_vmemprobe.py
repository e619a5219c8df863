"""Probe: which fused_pencil_chunk n_steps OOMs scoped VMEM at N=62500 cap=384.

Found via scripts/exp_pencil_ext_timing.py: initialize() with
warmup_steps=100 (remainder chunk n_steps=4) died with a 16.08M/16.00M
scoped-vmem stack OOM that bench_matrix's multiple-of-8 run lengths never
hit. Hypothesis: Mosaic fully unrolls small fori_loop trip counts,
inflating the stack.

Run: timeout 900 python scripts/exp_vmemprobe.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses as _dc

import jax
import jax.numpy as jnp

from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _cellpair_engine
from ljmd_tpu.models.lattice import fcc_lattice, random_velocities, remove_com_velocity
from ljmd_tpu.state import MDState

print("devices:", jax.devices(), flush=True)

cfg = config_from_density(num_cells=25, density=0.8442, dt=0.005,
                          dtype="float32", neighbor_skin=0.49,
                          neighbor_capacity=384)
n = cfg.n
r = fcc_lattice(cfg.num_cells, cfg.box_length, dtype=jnp.float32)
v = remove_com_velocity(random_velocities(jax.random.PRNGKey(0), n, dtype=jnp.float32))
v = v * jnp.sqrt(0.728 / (jnp.sum(v * v) / (3 * n)))
state = MDState(r=r, ru=r, v=v, a=jnp.zeros_like(r))

eng = _cellpair_engine(cfg)
carry, _ = eng.init(state)

for k in (8, 16, 4, 2, 1, 100):
    try:
        c2 = jax.jit(lambda c, k=k: eng.run_fast(c, k))(carry)
        s = float(jnp.sum(eng.get_state(c2).v[0]))
        print(f"n_steps={k}: OK (sum={s:.4f})", flush=True)
    except Exception as e:
        msg = str(e).splitlines()[0][:160]
        print(f"n_steps={k}: FAIL {msg}", flush=True)
