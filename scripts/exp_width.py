"""Occupancy-width visit lists for the fused pencil kernel: measure.

Round-3 finding (first run): at N=62500/cap384 the equilibrated fill is
~83% (mean occ 319, P=196) so ceil(count/128)=3=n_sub for nearly every
pencil — width lists have NO padding to harvest there and the SMEM-driven
dynamic slices add ~0.28us/visit (the zsort window-list overhead), a pure
40% LOSS (1907 vs 1358 us/step). The padding exists at mid-N (fill ~67%,
w=2 of n_sub=3): this sweep measures N=16384/19652 where the cut is real.

Run: timeout 2400 python scripts/exp_width.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from bench_matrix import diff_time, melt
from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _cellpair_engine

print("devices:", jax.devices(), flush=True)


def census(cfg, st):
    from ljmd_tpu.ops.cell_list import bin_to_slots, make_pencil_grid

    grid = make_pencil_grid(cfg.n, cfg.box_length, cfg.rc + cfg.neighbor_skin,
                            cfg.density, cfg.neighbor_capacity)
    slot, _ = bin_to_slots(st.r, grid)
    occ = np.bincount(np.asarray(slot) // grid.capacity,
                      minlength=grid.n_pencils)
    w = np.minimum((occ + 127) // 128, grid.capacity // 128)
    n_sub = grid.capacity // 128
    print(f"  census: P={grid.n_pencils} cap={grid.capacity} "
          f"occ mean/min/max={occ.mean():.0f}/{occ.min()}/{occ.max()} "
          f"w histogram={np.bincount(w, minlength=n_sub + 1).tolist()} "
          f"(n_sub={n_sub})", flush=True)


for nc, short, long_ in ((16, 500, 2000), (17, 400, 1600)):
    cfg = config_from_density(num_cells=nc, density=0.8442, dt=0.005,
                              dtype="float32", neighbor_skin=0.49)
    st = melt(cfg)
    census(cfg, st)
    n = cfg.n
    for wl in (False, True):
        eng = _cellpair_engine(cfg, width_lists=wl)
        diff_time(f"N={n} pencil width={int(wl)}", eng, st, short, long_)
