"""Round-5 big-N rebin-bill experiment (VERDICT round-4 item 1).

The only per-N points measured below their own rebuild-free floors are
131k (3.16e7 vs 3.41e7) and 256k (2.62e7 vs 2.92e7) — the per-chunk global
packed-sort + gather rebin. Levers measured here, cumulative:

  A. mid-step rebin (trigger="always" folds the rebin into step 1 of each
     unfused chunk, after the position update + half-kick): the acceleration
     row never crosses the rebin, so the permute gathers 10 rows not 13.
  B. geometric xy coverage slack: bin validity only needs per-particle XY
     drift < (pencil_width - rc)/2 = 0.331 at these configs (z columns are
     swept whole), vs the old 3D check against skin/2 = 0.245 — which
     unlocks...
  C. longer unfused chunks (inner_chunk 8 -> 12 -> 16): rebins per step drop
     1.5-2x. The 8-step 3D travel was measured 0.176; the XY projection is
     ~sqrt(2/3) of that, so 16 steps ~ 0.287 < 0.331 (sticky-flagged if
     exceeded).

Floors (trigger="never") re-measured in the same session for an honest
slope pair. MANDATORY follow-up for any adopted default:
scripts/check_conservation.py on TPU (the v5e rebin-graph miscompile
protocol — this exact code path).

Usage: timeout 3600 python scripts/exp_r5_rebin.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from bench_matrix import diff_time, melt
from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _cellpair_engine


def main():
    print("devices:", jax.devices(), flush=True)

    for cells, lens in ((32, (96, 384)), (40, (48, 192))):
        cfg = config_from_density(num_cells=cells, density=0.8442, dt=0.005,
                                  dtype="float32", neighbor_skin=0.49)
        n = cfg.n
        st = melt(cfg, cycles=2, steps=200)
        for label, kw in (
            ("ck8 always (midstep)", dict(rebin_trigger="always", inner_chunk=8)),
            ("ck12 always (midstep)", dict(rebin_trigger="always", inner_chunk=12)),
            ("ck16 always (midstep)", dict(rebin_trigger="always", inner_chunk=16)),
            ("ck16 predictive", dict(rebin_trigger="predictive", inner_chunk=16)),
            ("ck8 never (floor)", dict(rebin_trigger="never", inner_chunk=8)),
            ("ck16 never (floor)", dict(rebin_trigger="never", inner_chunk=16)),
        ):
            eng = _cellpair_engine(cfg, **kw)
            diff_time(f"N={n} {label}", eng, st, *lens)


if __name__ == "__main__":
    main()
