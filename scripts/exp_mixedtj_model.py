"""CPU census model: mixed-TJ visit lists at the flagship (N=4000).

The list kernel covers each i-tile's active j-run with ONE static TJ
(512 at N=4000 pure-z). Runs are ~12 blocks long, so the last tile
wastes 0-3 blocks of pair math. A SECOND visit list with a narrower
tile (the kernel already runs separate fori_loops per category — this
is NOT per-tile branching) could trim the tail. This models the slot/
visit census for single-TJ vs optimal mixed covers using the measured
cost model (pair 136 Gcand/s, 0.36us/visit at N=4000, + ~5us rebuild/
glue) and the true active-block floor.

Run (CPU): python scripts/exp_mixedtj_model.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RHO = 0.8442
RC = 2.5
VISIT_US = 0.36
FIXED_US = 5.0


def runs_for(pos, L, win, order):
    n = pos.shape[0]
    n_pad = -(-n // 128) * 128
    p = pos[order]
    # pad with far-away sentinel (inactive)
    if n_pad > n:
        p = np.vstack([p, np.full((n_pad - n, 3), 1e9)])
    nb = n_pad // 128
    lo = p.reshape(nb, 128, 3).min(axis=1)
    hi = p.reshape(nb, 128, 3).max(axis=1)

    def gap(alo, ahi, blo, bhi):
        g = np.maximum(0.0, np.maximum(blo - ahi, alo - bhi))
        gw = np.maximum(0.0, np.maximum((blo + L) - ahi, alo - (bhi + L)))
        gw2 = np.maximum(0.0, np.maximum(blo - (ahi + L), (alo + L) - bhi))
        return np.minimum(g, np.minimum(gw, gw2))

    ok = np.ones((nb, nb), dtype=bool)
    for ax in range(3):
        g = gap(lo[:, None, ax], hi[:, None, ax], lo[None, :, ax], hi[None, :, ax])
        ok &= g <= win
    # drop padding blocks entirely
    real = np.arange(nb) < (n + 127) // 128
    ok &= real[:, None] & real[None, :]
    act = ok & np.triu(np.ones((nb, nb), dtype=bool))
    all_runs = []
    for i in range(nb):
        js = np.nonzero(act[i])[0]
        if len(js) == 0:
            continue
        # split into consecutive runs
        splits = np.nonzero(np.diff(js) > 1)[0] + 1
        for seg in np.split(js, splits):
            all_runs.append(len(seg))
    return all_runs


def cost(blocks, visits, n):
    slots = blocks * 128 * 128
    pair = slots / 136e9 * 1e6
    t = pair + visits * VISIT_US + FIXED_US
    return t, slots, pair


def cover_single(runs, span):
    visits = sum(-(-r // span) for r in runs)
    blocks = visits * span
    return blocks, visits


def cover_mixed(runs, spans):
    """Optimal cover of each run by tiles with widths in `spans`
    (dynamic program per run, minimizing pair+visit cost)."""
    spans = sorted(spans)
    total_b, total_v = 0, 0
    block_us = 128 * 128 / 136e9 * 1e6
    for r in runs:
        # dp[k] = (cost, blocks, visits) to cover k remaining blocks
        INF = (1e18, 0, 0)
        dp = [INF] * (r + 1)
        dp[0] = (0.0, 0, 0)
        for k in range(1, r + 1):
            for s in spans:
                kk = max(0, k - s)
                c = dp[kk][0] + s * block_us + VISIT_US
                if c < dp[k][0]:
                    dp[k] = (c, dp[kk][1] + s, dp[kk][2] + 1)
        total_b += dp[r][1]
        total_v += dp[r][2]
    return total_b, total_v


for n, k in ((4000, 10), (16384, 16)):
    L = (n / RHO) ** (1 / 3)
    skin = 8.5 * 16 * 0.005
    win = RC + skin
    rng = np.random.default_rng(3)
    pos = rng.uniform(0, L, size=(n, 3))
    if n >= 10000:
        ns = int(L / win)
        sx = np.minimum((pos[:, 0] / (L / ns)).astype(int), ns - 1)
        order = np.lexsort((pos[:, 2], sx))
        mode = f"slab x{ns}"
    else:
        order = np.argsort(pos[:, 2])
        mode = "pure z"
    runs = runs_for(pos, L, win, order)
    act_blocks = sum(runs)
    print(f"== N={n} ({mode}): {len(runs)} runs, active blocks={act_blocks} "
          f"(floor pair = {act_blocks*128*128/136e9*1e6:.1f} us)", flush=True)
    for span in (2, 3, 4, 8):
        b, v = cover_single(runs, span)
        t, slots, pair = cost(b, v, n)
        print(f"  single TJ={span*128:4d}: visits={v:4d} slots={slots/1e6:6.2f}M"
              f" t={t:6.1f} us (pair {pair:5.1f} + visit {v*VISIT_US:5.1f})",
              flush=True)
    for spans in ((4, 1), (4, 2), (3, 1), (4, 3, 2, 1), (8, 4, 2, 1)):
        b, v = cover_mixed(runs, spans)
        t, slots, pair = cost(b, v, n)
        lbl = "+".join(str(s * 128) for s in spans)
        print(f"  mixed {lbl:>15s}: visits={v:4d} slots={slots/1e6:6.2f}M"
              f" t={t:6.1f} us (pair {pair:5.1f} + visit {v*VISIT_US:5.1f})",
              flush=True)
