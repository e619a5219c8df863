"""Probe 2: eager (un-jitted) pencil run_fast at N=62500 cap=384.

exp_vmemprobe showed every jitted n_steps compiles; exp_pencil_ext_timing
OOM'd from initialize()'s EAGER warmup advance, where each
fused_pencil_chunk dispatches as its own one-op jit with layout-forcing
operand copies. Reproduce eagerly, then test the fix (jitting the warmup).

Run: timeout 900 python scripts/exp_vmemprobe2.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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

try:
    c2 = eng.run_fast(carry, 100)  # EAGER: no enclosing jit
    s = float(jnp.sum(eng.get_state(c2).v[0]))
    print(f"eager run_fast(100): OK (sum={s:.4f})", flush=True)
except Exception as e:
    msg = str(e).splitlines()[0][:200]
    print(f"eager run_fast(100): FAIL {msg}", flush=True)
