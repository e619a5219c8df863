"""Measure the REAL tail waste of the window-list cover (TPU, equilibrated).

The mixed-TJ census model (exp_mixedtj_model.py, uniform positions)
predicts exact-cover tail tiles would cut the flagship pair math
5.70M -> 4.16M slots. This probe runs the engine's actual flags on a
melted state and reports the true cluster/tail census and the achievable
saving, per config, before any kernel work.

Run: timeout 900 python scripts/exp_tailwaste.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench_matrix import melt
from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _zsort_engine
from ljmd_tpu.ops.pallas_fused import compute_tile_flags

print("devices:", jax.devices(), flush=True)


def census(nc, slab, tile_j):
    cfg = config_from_density(num_cells=nc, density=0.8442, dt=0.005,
                              dtype="float32")
    n = cfg.n
    st = melt(cfg)
    eng = _zsort_engine(cfg, extended=False, slab_sort=slab, tile_j=tile_j)
    carry, _ = eng.init(st)
    r8 = carry.r
    n_pad = r8.shape[1]
    skin = max(0.3, 8.5 * 16 * cfg.dt)
    window = cfg.rc + 1.2 * skin  # engine's flag window (1.2x skin margin)
    flags = np.asarray(compute_tile_flags(
        r8, n, 128, 128, cfg.box_length, window,
        x_window=window if slab else None,
        cross_margin=0.6 * skin,
    ))
    nb = n_pad // 128
    f2 = flags.reshape(nb, nb)
    trigger = (f2 > 0) & (np.arange(nb)[None, :] >= np.arange(nb)[:, None])
    span = tile_j // 128
    active = int(trigger.sum())
    # cluster census (the builder's closed-form cover anchors the stride
    # grid at each cluster start; tail waste = (-len) % span per cluster)
    visits = 0
    waste = 0
    tails = np.zeros(span, dtype=int)  # tails[r] = clusters with len%span==r
    for i in range(nb):
        js = np.nonzero(trigger[i])[0]
        if len(js) == 0:
            continue
        # clusters: consecutive active blocks < span apart (the builder
        # treats blocks within span of the previous active block as the
        # same cluster)
        splits = np.nonzero(np.diff(js) >= span)[0] + 1
        for seg in np.split(js, splits):
            length = seg[-1] - seg[0] + 1  # grid covers [first, last]
            v = -(-length // span)
            visits += v
            waste += v * span - length
            # blocks inside [first,last] that are inactive also count as
            # computed-but-maskable only if truly inactive; the kernel
            # computes them regardless (they're within covered slices).
            tails[length % span] += 1
    slots = visits * 128 * tile_j
    exact = active * 128 * 128
    print(f"N={n} slab={slab} TJ={tile_j}: visits={visits} "
          f"slots={slots/1e6:.2f}M active-blocks={active} "
          f"({exact/1e6:.2f}M slots) waste={waste} blocks "
          f"= {waste*128*128/136e9*1e6:.1f} us pair; tail census "
          f"(len%span): {tails.tolist()}", flush=True)


census(10, False, 512)
census(16, True, 384)
