"""build_tile_lists: the active-tile compaction feeding the list kernel.

Every (visited, active) tile must appear in exactly one of the two lists;
"pure" tiles must genuinely need no rank/padding mask; entries beyond the
counts must be zero (the kernel never reads them, but the contract says
deterministic padding).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ljmd_tpu.ops.pallas_fused import build_tile_lists


def _reference_partition(flags, n, n_pad, tile_i, tile_j):
    n_i, n_j = n_pad // tile_i, n_pad // tile_j
    pure, masked = set(), set()
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
            (masked if needs_mask else pure).add((it, jt))
    return pure, masked


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
        np_, nm = (int(x) for x in np.asarray(tcounts))
        got_pure = {(tiles[0, k], tiles[1, k]) for k in range(np_)}
        got_mask = {(tiles[2, k], tiles[3, k]) for k in range(nm)}
        ref_pure, ref_mask = _reference_partition(flags, n, n_pad, ti, tj)
        assert got_pure == ref_pure
        assert got_mask == ref_mask
        assert len(got_pure) == np_ and len(got_mask) == nm
        # padding entries zeroed
        assert (tiles[0, np_:] == 0).all() and (tiles[1, np_:] == 0).all()
        assert (tiles[2, nm:] == 0).all() and (tiles[3, nm:] == 0).all()


def test_pure_tiles_need_no_masks():
    """For every pure tile, gj > gi and gj < n and gi < n hold for ALL its
    (gi, gj) pairs — the mask-free kernel body is exact there."""
    rng = np.random.default_rng(1)
    n, n_pad, ti, tj = 4000, 4096, 128, 512
    n_i, n_j = n_pad // ti, n_pad // tj
    flags = jnp.asarray(rng.integers(0, 2, size=(n_i * n_j,)).astype(np.int32))
    tiles, tcounts = build_tile_lists(flags, n, n_pad, ti, tj)
    tiles = np.asarray(tiles)
    for k in range(int(np.asarray(tcounts)[0])):
        it, jt = tiles[0, k], tiles[1, k]
        i_lo, j_lo = it * ti, jt * tj
        assert j_lo >= i_lo + ti          # fully above diagonal
        assert j_lo + tj <= n             # no padding columns
        assert i_lo + ti <= n
