"""MXU force-reduction experiment.

The list kernel's per-visit overhead (~0.4us of ~0.9us at (128,512)) is
dominated by six VPU cross-lane/sublane reduction trees + f_acc RMW. The
MXU is idle in this kernel; routing the row/column sums through ones-
matmuls (jax.lax.dot_general) may overlap them with the next visit's VPU
pair math. Numerically exact (bf16x3 splits f32 exactly; ones exact).

Usage: timeout 1200 python scripts/exp_mxured.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from bench_matrix import diff_time, melt
from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _zsort_engine


def main():
    print("devices:", jax.devices(), flush=True)

    cfg = config_from_density(num_cells=10, density=0.8442, dt=0.005,
                              dtype="float32")
    st = melt(cfg)
    for mx in (False, True):
        eng = _zsort_engine(cfg, extended=False, mxu_reduce=mx)
        diff_time(f"N=4000 zsort mxu={int(mx)}", eng, st, 2000, 8000)
    eng = _zsort_engine(cfg, extended=True, mxu_reduce=True)
    diff_time("N=4000 zsort ext mxu=1", eng, st, 2000, 8000)

    cfg = config_from_density(num_cells=16, density=0.8442, dt=0.005,
                              dtype="float32")
    st = melt(cfg)
    for mx in (False, True):
        eng = _zsort_engine(cfg, extended=False, slab_sort=True,
                            mxu_reduce=mx)
        diff_time(f"N=16384 slab mxu={int(mx)}", eng, st, 500, 2000)

    import dataclasses as _dc
    from ljmd_tpu.models.engine import _cellpair_engine
    cfg = config_from_density(num_cells=25, density=0.8442, dt=0.005,
                              dtype="float32", neighbor_skin=0.49)
    st = melt(cfg)
    cfg_t = _dc.replace(cfg, neighbor_capacity=384)
    for mx in (False, True):
        eng = _cellpair_engine(cfg_t, mxu_reduce=mx)
        diff_time(f"N=62500 pencil mxu={int(mx)}", eng, st, 400, 1600)


if __name__ == "__main__":
    main()
