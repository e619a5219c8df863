"""CPU model: candidate slots + visits for 1-axis vs 2-axis slab sorts.

The mid-N (N=16384) window-list engine measures 29.9M pair-once candidate
slots / 608 visits (TI=128, TJ=384, (x-slab, z) sort, slab width =
window). docs/RESULTS.md argues finer subdivision collapses z-intervals —
true for pencil-fine columns, but UNTESTED for COARSE 2-axis slabs
(e.g. 4x4 columns keep ~8 blocks of z-resolution per column while adding
y discrimination). This script counts, for uniform random positions at
the state-point density, the exact visit/slot census the window-list
builder would produce for:

  (a) the shipping 1-axis layout (x-slabs of width=window, z-sorted)
  (b) 2-axis coarse layouts (nx x ny slabs, z-sorted within column)

and predicts step time via the measured cost model
  t = slots/136e9 + visits*0.21us + 36us (rebuild+glue at this N).

Validation: layout (a) must reproduce ~29.9M slots / ~608 visits.

Run (CPU, no TPU needed): python scripts/exp_slab2d_model.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = 16384
RHO = 0.8442
L = (N / RHO) ** (1 / 3)
RC = 2.5
# shipping geometry at mid-N: trigger="always", inner_chunk=16 -> travel
# bound skin (8.5 * 16 * 0.005 = 0.68); window = rc + skin
SKIN = 0.68
WIN = RC + SKIN
TI, TJ = 128, 384

rng = np.random.default_rng(7)
pos = rng.uniform(0, L, size=(N, 3))
n_pad = -(-N // 128) * 128


def census(order, keyfn=None, label=""):
    """Count pair-once visits/slots for the window-list cover.

    order: sort order of particles (indices). The builder tiles the sorted
    array into TI-blocks, computes per-block coordinate intervals, and for
    each (i-tile, j-tile) pair with j >= i tests per-axis interval gaps
    (direct or wrapped) against WIN; an active tile-pair becomes part of a
    TJ-granular visit run. This mirrors ops/pallas_fused.compute_tile_flags
    + build_window_lists at the censustaking level (128-granular tiles on
    both axes; TJ-wide visits = ceil(active 128-run / TJ-aligned cover)).
    """
    assert N % 128 == 0, "model assumes no padding blocks"
    p = pos[order]
    nb = N // 128
    lo = p.reshape(nb, 128, 3).min(axis=1)
    hi = p.reshape(nb, 128, 3).max(axis=1)

    def gap(alo, ahi, blo, bhi):
        # direct gap
        g = np.maximum(0.0, np.maximum(blo - ahi, alo - bhi))
        # wrapped gap (minimum image): distance across the periodic seam
        gw = np.maximum(0.0, np.maximum((blo + L) - ahi, alo - (bhi + L)))
        gw2 = np.maximum(0.0, np.maximum(blo - (ahi + L), (alo + L) - bhi))
        return np.minimum(g, np.minimum(gw, gw2))

    # vectorized per-axis gaps
    ok = np.ones((nb, nb), dtype=bool)
    for ax in range(3):
        g = gap(lo[:, None, ax], hi[:, None, ax], lo[None, :, ax], hi[None, :, ax])
        ok &= g <= WIN
    iu = np.triu(np.ones((nb, nb), dtype=bool))  # pair-once: j-block >= i-block
    act = ok & iu
    # visits: per i-tile, cover the active j-128-blocks with TJ-wide tiles.
    # The builder uses 128-granular starts; a TJ tile covers TJ//128 blocks.
    span = TJ // 128
    visits = 0
    for i in range(nb):
        js = np.nonzero(act[i])[0]
        if len(js) == 0:
            continue
        # greedy 128-granular cover of the active block set (the packer
        # emits runs of consecutive blocks, each run covered by ceil(len/span))
        k = 0
        while k < len(js):
            # start a tile at js[k], covering blocks js[k]..js[k]+span-1
            end = js[k] + span
            visits += 1
            while k < len(js) and js[k] < end:
                k += 1
    slots = visits * TI * TJ
    print(f"{label:34s}: visits={visits:5d} slots={slots/1e6:7.2f}M "
          f"t_pred={slots/136e9*1e6 + visits*0.21 + 36:7.1f} us "
          f"(pair {slots/136e9*1e6:6.1f} + visit {visits*0.21:6.1f} + 36)",
          flush=True)
    return visits, slots


# (a) shipping: x-slabs of width >= window, z-sorted within slab
n_slabs = int(L / WIN)
slab_w = L / n_slabs
xs = np.minimum((pos[:, 0] / slab_w).astype(int), n_slabs - 1)
order_a = np.lexsort((pos[:, 2], xs))
census(order_a, label=f"1-axis x{n_slabs} (shipping)")

# pure z for reference
census(np.argsort(pos[:, 2]), label="pure z")

# (b) 2-axis coarse slabs
for nx in (3, 4, 5):
    for ny in (3, 4, 5):
        sx = np.minimum((pos[:, 0] / (L / nx)).astype(int), nx - 1)
        sy = np.minimum((pos[:, 1] / (L / ny)).astype(int), ny - 1)
        order = np.lexsort((pos[:, 2], sy, sx))
        census(order, label=f"2-axis {nx}x{ny}")

# (c) finer 2-axis for the collapse demonstration
for nx, ny in ((8, 8), (6, 6)):
    sx = np.minimum((pos[:, 0] / (L / nx)).astype(int), nx - 1)
    sy = np.minimum((pos[:, 1] / (L / ny)).astype(int), ny - 1)
    order = np.lexsort((pos[:, 2], sy, sx))
    census(order, label=f"2-axis {nx}x{ny} (fine)")


# (d) hybrids: shipping fine x-slabs PLUS mild y-slabs (1-3), and TJ sweep
def census_tj(order, tj, label):
    global TJ
    old = TJ
    TJ = tj
    try:
        census(order, label=label)
    finally:
        TJ = old


for ny in (1, 2, 3):
    sx = np.minimum((pos[:, 0] / slab_w).astype(int), n_slabs - 1)
    sy = np.minimum((pos[:, 1] / (L / ny)).astype(int), ny - 1) if ny > 1 \
        else np.zeros(N, dtype=int)
    order = np.lexsort((pos[:, 2], sy, sx))
    for tj in (256, 384, 512):
        census_tj(order, tj, f"x{n_slabs} y{ny} TJ={tj}")
