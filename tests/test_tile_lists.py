"""build_tile_lists: the active-tile compaction feeding the list kernel.

Every (visited, active) tile must appear in exactly one of the three lists
(pure-direct / pure-wrapped / masked); "pure" tiles must genuinely need no
rank/padding mask; pure-DIRECT tiles must carry flag 1 (no wrapped z-image
within the window — the kernel skips the z-MIC round for them); entries
beyond the counts must be zero (the kernel never reads them, but the
contract says deterministic padding).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ljmd_tpu.ops.pallas_fused import build_tile_lists


def _reference_partition(flags, n, n_pad, tile_i, tile_j):
    n_i, n_j = n_pad // tile_i, n_pad // tile_j
    direct, wrapped, masked = set(), set(), set()
    f2 = np.asarray(flags).reshape(n_i, n_j)
    for it in range(n_i):
        for jt in range(n_j):
            i_lo, j_lo = it * tile_i, jt * tile_j
            visited = j_lo + tile_j - 1 > i_lo
            if not (f2[it, jt] > 0 and visited):
                continue
            needs_mask = (
                j_lo < i_lo + tile_i or j_lo + tile_j > n or i_lo + tile_i > n
            )
            if needs_mask:
                masked.add((it, jt))
            elif f2[it, jt] >= 2:
                wrapped.add((it, jt))
            else:
                direct.add((it, jt))
    return direct, wrapped, masked


def test_tile_lists_partition_exact():
    rng = np.random.default_rng(0)
    n, n_pad, ti, tj = 4000, 4096, 128, 512
    n_i, n_j = n_pad // ti, n_pad // tj
    for trial in range(5):
        flags = jnp.asarray(
            rng.integers(0, 4, size=(n_i * n_j,)).astype(np.int32)
        )
        tiles, tcounts = build_tile_lists(flags, n, n_pad, ti, tj)
        tiles = np.asarray(tiles)
        nd, nw, nm = (int(x) for x in np.asarray(tcounts))
        got = [
            {(tiles[2 * c, k], tiles[2 * c + 1, k]) for k in range(cnt)}
            for c, cnt in enumerate((nd, nw, nm))
        ]
        ref = _reference_partition(flags, n, n_pad, ti, tj)
        for g, r, cnt in zip(got, ref, (nd, nw, nm)):
            assert g == r
            assert len(g) == cnt
        # padding entries zeroed
        for c, cnt in enumerate((nd, nw, nm)):
            assert (tiles[2 * c, cnt:] == 0).all()
            assert (tiles[2 * c + 1, cnt:] == 0).all()


def test_pure_tiles_need_no_masks_and_direct_skips_z():
    """For every pure tile, gj > gi and gj < n and gi < n hold for ALL its
    (gi, gj) pairs — the mask-free kernel body is exact there. Pure-direct
    tiles additionally have flag exactly 1 (z round skippable)."""
    rng = np.random.default_rng(1)
    n, n_pad, ti, tj = 4000, 4096, 128, 512
    n_i, n_j = n_pad // ti, n_pad // tj
    flags = jnp.asarray(rng.integers(0, 4, size=(n_i * n_j,)).astype(np.int32))
    tiles, tcounts = build_tile_lists(flags, n, n_pad, ti, tj)
    tiles = np.asarray(tiles)
    f2 = np.asarray(flags).reshape(n_i, n_j)
    nd, nw, _ = (int(x) for x in np.asarray(tcounts))
    for row, cnt in ((0, nd), (2, nw)):
        for k in range(cnt):
            it, jt = tiles[row, k], tiles[row + 1, k]
            i_lo, j_lo = it * ti, jt * tj
            assert j_lo >= i_lo + ti          # fully above diagonal
            assert j_lo + tj <= n             # no padding columns
            assert i_lo + ti <= n
            if row == 0:
                assert f2[it, jt] == 1        # direct-only: no wrapped image
            else:
                assert f2[it, jt] >= 2
