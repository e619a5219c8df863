"""State-aware pencil capacity: measure the default-path win at big N.

make_engine(cfg, 'auto', state=...) sizes the pencil capacity from the
equilibrated state's occupancy census instead of the FCC-lattice-safe
worst case (the sweeps pay for every padded slot every step). Expected:
N=62500 default 512-unfused -> 384-fused; N=131072 640 -> 512.

Run: timeout 2400 python scripts/exp_autocap.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from bench_matrix import diff_time, melt
from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import make_engine
from ljmd_tpu.ops.cell_list import capacity_from_state

print("devices:", jax.devices(), flush=True)

for nc, short, long_ in ((25, 400, 1600), (32, 150, 600)):
    cfg = config_from_density(num_cells=nc, density=0.8442, dt=0.005,
                              dtype="float32", neighbor_skin=0.49)
    st = melt(cfg)
    cap = capacity_from_state(cfg.box_length, cfg.rc + cfg.neighbor_skin,
                              st.r)
    print(f"N={cfg.n}: census capacity {cap}", flush=True)
    eng_d = make_engine(cfg, "auto")
    diff_time(f"N={cfg.n} auto default", eng_d, st, short, long_)
    eng_t = make_engine(cfg, "auto", state=st)
    diff_time(f"N={cfg.n} auto state-aware", eng_t, st, short, long_)
