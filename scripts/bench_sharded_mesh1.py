"""mesh=1 TPU bench of the chunked sharded pencil engine vs single-chip.

VERDICT round-3 item 2's last "Done" criterion: with multi-chip hardware
unavailable, the honest proxy for the sharded engine's per-chip efficiency
is a ONE-device mesh on the real chip — the shard_map wrapper, the halo
ppermute (self-loop at d=1), the sentinel fill, and the per-chunk global
rebin all execute for real; only the ICI transfer is absent. Target:
the chunked sharded engine within ~15% of the single-chip pencil engine
at the same config (N=62500, cap=384 — the committed single-chip bench
point, docs/CEILINGS.md).

Also measured: the rect/ring sharded engine (O(N^2/d) dense local sweep,
``parallel/spatial.py``) at N=4000 against the single-chip dense rows
engine — its single-chip structural twin.

Run: timeout 2400 python scripts/bench_sharded_mesh1.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import numpy as np

from bench_matrix import diff_time, melt
from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _cellpair_engine, _pallas_rows_engine
from ljmd_tpu.parallel.mesh import PARTICLE_AXIS
from ljmd_tpu.parallel.spatial import make_spatial_engine
from ljmd_tpu.parallel.spatial_pencil import make_sharded_pencil_engine

print("devices:", jax.devices(), flush=True)

mesh = jax.sharding.Mesh(np.array(jax.devices()[:1]), (PARTICLE_AXIS,))

# Capacity 512 (the lattice/census default), NOT the 384 overflow-edge
# bench override: the first run of this script melted into a state whose
# occupancy tripped pencil_overflow at 384 on BOTH engines, and an
# overflowing sharded rebin drops particles into sentinels — the "3.1e8"
# it printed was a near-empty sweep, not a result.
cfg = config_from_density(num_cells=25, density=0.8442, dt=0.005,
                          dtype="float32", neighbor_skin=0.49)
cfg = dataclasses.replace(cfg, neighbor_capacity=512)
st = melt(cfg)

eng_c = _cellpair_engine(cfg)
eng_s = make_sharded_pencil_engine(cfg, mesh, inner_chunk=8)

diff_time("N=62500 single-chip pencil", eng_c, st, 80, 240)
diff_time("N=62500 sharded mesh=1", eng_s, st, 80, 240)

cfg4 = config_from_density(num_cells=10, density=0.8442, dt=0.005,
                           dtype="float32")
st4 = melt(cfg4)
eng_r = _pallas_rows_engine(cfg4)
eng_q = make_spatial_engine(cfg4, mesh, comm="ring")
eng_h = make_spatial_engine(cfg4, mesh, comm="half_ring")

diff_time("N=4000 single-chip dense", eng_r, st4, 200, 800)
diff_time("N=4000 rect/ring mesh=1", eng_q, st4, 200, 800)
diff_time("N=4000 half-ring mesh=1", eng_h, st4, 200, 800)
