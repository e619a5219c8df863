"""Host-side study: candidate-slot counts vs particle SORT ORDER.

The fused dense kernel's tile-activity flags generalize from z-intervals to
3D bounding boxes: tile pair (I, J) is active iff the minimum-image distance
between bbox(I) and bbox(J) is < rc + skin. A more compact ordering (3D
Morton / pencil-major) shrinks tile bboxes -> fewer active tiles -> fewer
candidate slots, at the SAME (128, TJ) granularity where the per-visit cost
is already latency-bound (scripts/exp_layout.py).

This computes, for a realistic melted configuration (uniform random is close
enough for counting), the active-tile candidate totals for each ordering and
tile shape at N=4000 and N=16384. Pure numpy — no TPU.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RC = 2.5
SKIN = 0.7


def mic_gap_1d(lo_a, hi_a, lo_b, hi_b, L):
    """Min-image gap between two intervals on a circle of circumference L."""
    g_direct = np.maximum(0.0, np.maximum(lo_b - hi_a, lo_a - hi_b))
    g_p = np.maximum(0.0, np.maximum((lo_b + L) - hi_a, lo_a - (hi_b + L)))
    g_m = np.maximum(0.0, np.maximum((lo_b - L) - hi_a, lo_a - (hi_b - L)))
    return np.minimum(g_direct, np.minimum(g_p, g_m))


def count_candidates(r, order, L, ti, tj, window):
    n = r.shape[0]
    n_pad = ((n + max(ti, tj) - 1) // max(ti, tj)) * max(ti, tj)
    rs = r[order]
    # pad with far-away sentinels that never activate
    pad = np.full((n_pad - n, 3), 1e6)
    rs = np.concatenate([rs, pad], 0)

    def bboxes(t):
        b = rs.reshape(n_pad // t, t, 3)
        return b.min(1), b.max(1)

    ilo, ihi = bboxes(ti)
    jlo, jhi = bboxes(tj)
    gap2 = np.zeros((n_pad // ti, n_pad // tj))
    for k in range(3):
        g = mic_gap_1d(ilo[:, k][:, None], ihi[:, k][:, None],
                       jlo[:, k][None, :], jhi[:, k][None, :], L)
        # sentinel boxes: huge direct gap, but +-L images also huge
        gap2 += g * g
    active = gap2 < window * window
    # triangular visit rule: tile visited iff some gj > gi possible
    i0 = (np.arange(n_pad // ti) * ti)[:, None]
    j0 = (np.arange(n_pad // tj) * tj)[None, :]
    visited = (j0 + tj - 1) > i0
    # sentinel tiles off
    real_i = (i0[:, 0] < n)
    real_j = (j0[0, :] < n)
    act = active & visited & real_i[:, None] & real_j[None, :]
    return act.sum() * ti * tj, act.sum()


def orders(r, L):
    n = r.shape[0]
    out = {}
    out["zsort"] = np.argsort(r[:, 2], kind="stable")

    def grid_sort(m_xy, zbits_like=None):
        w = L / m_xy
        ix = np.clip((r[:, 0] / w).astype(int), 0, m_xy - 1)
        iy = np.clip((r[:, 1] / w).astype(int), 0, m_xy - 1)
        key = (ix * m_xy + iy) * (L + 1) + r[:, 2]
        return np.argsort(key, kind="stable")

    for m in (3, 4, 5):
        out[f"pencil{m}x{m}-z"] = grid_sort(m)

    def morton(bits):
        m = 1 << bits
        w = L / m
        ic = np.clip((r / w).astype(int), 0, m - 1)

        def spread(v):
            out = np.zeros_like(v)
            for b in range(bits):
                out |= ((v >> b) & 1) << (3 * b)
            return out

        code = spread(ic[:, 0]) | (spread(ic[:, 1]) << 1) | (spread(ic[:, 2]) << 2)
        key = code.astype(np.float64) * (L + 1) + r[:, 2]
        return np.argsort(key, kind="stable")

    for bits in (2, 3, 4):
        out[f"morton{1 << bits}^3"] = morton(bits)

    # slab-major: z slabs of >= rc+skin, pencil-morton within, z within
    def slab(ms_z, m_xy):
        wz = L / ms_z
        w = L / m_xy
        iz = np.clip((r[:, 2] / wz).astype(int), 0, ms_z - 1)
        ix = np.clip((r[:, 0] / w).astype(int), 0, m_xy - 1)
        iy = np.clip((r[:, 1] / w).astype(int), 0, m_xy - 1)
        key = ((iz * m_xy + ix) * m_xy + iy) * (L + 1) + r[:, 2]
        return np.argsort(key, kind="stable")

    for ms in (4, 5):
        out[f"slab{ms}-pencil{ms}"] = slab(ms, ms)
    return out


def main():
    rng = np.random.default_rng(0)
    for n, rho in ((4000, 0.8442), (16384, 0.8442)):
        L = (n / rho) ** (1 / 3)
        r = rng.uniform(0, L, (n, 3))
        window = RC + SKIN
        print(f"\nN={n}  L={L:.2f}  window={window}  "
              f"ideal(pair-once, rlist-ball)={int(n * rho * 4/3 * np.pi * window**3 / 2):,}")
        for (ti, tj) in ((128, 512), (128, 256), (128, 128)):
            print(f"  tiles ({ti},{tj}):")
            for name, o in orders(r, L).items():
                cand, nact = count_candidates(r, o, L, ti, tj, window)
                us = cand / 136e9 * 1e6
                print(f"    {name:18s}: {cand/1e6:7.2f}M slots "
                      f"({nact:4d} visits)  ~{us:5.1f}us math", flush=True)


if __name__ == "__main__":
    main()
