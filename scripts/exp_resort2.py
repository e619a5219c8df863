"""Resort policy sweep: branchless unconditional resort vs lax.cond.

exp_resort.py decomposed the N=4000 resort bill: 75.0 us/step with the
cond'd resort vs 64.0 us floor, of which only ~2.2 us/step is the sort+
flags+lists rebuild itself (34.5 us x ~1 fire per 2 chunks) — the rest
is conditional/copy overhead around the cond. This sweeps the
"always" mode (resort every chunk, no cond, one-chunk skin 0.34 ->
window 2.91) against the cond'd modes, with the stacked 3-row sort
permute (both modes) in the tree.

Usage: timeout 1800 python scripts/exp_resort2.py
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
    for label, kw in (
        ("static skin-auto", dict(trigger="static")),
        ("always skin-auto", dict(trigger="always")),
        ("always skin=0.30", dict(trigger="always", sort_skin=0.30)),
        ("always skin=0.45", dict(trigger="always", sort_skin=0.45)),
        ("always chunk=16", dict(trigger="always", inner_chunk=16)),
        ("never (floor)", dict(trigger="never")),
    ):
        eng = _zsort_engine(cfg, extended=False, **kw)
        diff_time(f"N=4000 {label}", eng, st, 2000, 8000)

    cfg = config_from_density(num_cells=16, density=0.8442, dt=0.005,
                              dtype="float32")
    st = melt(cfg)
    for label, kw in (
        ("static skin-auto", dict(trigger="static")),
        ("always skin-auto", dict(trigger="always")),
        ("never (floor)", dict(trigger="never")),
    ):
        eng = _zsort_engine(cfg, extended=False, slab_sort=True, **kw)
        diff_time(f"N=16384 slab {label}", eng, st, 500, 2000)


if __name__ == "__main__":
    main()
