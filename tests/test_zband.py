"""z-banded pencil sweep vs the full pencil sweep: identical forces and
per-slot partials, including PBC z-wrap windows (SURVEY §5.7 scaling path)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ljmd_tpu.ops.cell_list import (
    PencilGrid,
    bin_to_slots,
    compute_z_windows,
    default_z_window,
    make_pencil_grid,
)
from ljmd_tpu.ops.pallas_pencil import (
    TILE_I,
    build_tile_table,
    pallas_pencil_sweep,
    pallas_pencil_sweep_zband,
)


def build_slot_arrays(r, grid, n):
    slot, overflow = bin_to_slots(jnp.asarray(r), grid)
    assert not bool(overflow)
    ns = grid.n_slots
    pos = jnp.zeros((8, ns + 1), jnp.float64).at[0:3, slot].set(jnp.asarray(r).T)[:, :ns]
    valid = jnp.zeros((ns + 1,), jnp.float64).at[slot].set(1.0)[:ns]
    pos = pos.at[3, :].set(valid)
    counts = valid.reshape(grid.n_pencils, grid.capacity).sum(axis=1).astype(jnp.int32)
    return pos, valid, counts


@pytest.fixture(scope="module")
def tall_box():
    """Tall pencils (L >> rc) so the z-window is genuinely narrower than the
    pencil: L=40, 3x3 pencils of width 13.3, ~250 particles per pencil."""
    rng = np.random.default_rng(0)
    n, L = 3200, 60.0
    r = rng.uniform(0, L, size=(n, 3))
    grid = make_pencil_grid(n, L, r_list=20.0, density=n / L**3)
    assert grid.m_xy == 3
    return n, L, r, grid


def test_z_sorted_ranks(tall_box):
    n, L, r, grid = tall_box
    slot, _ = bin_to_slots(jnp.asarray(r), grid)
    slots = np.asarray(slot)
    z = r[:, 2]
    # within each pencil, ranks ascend with z
    for p in range(grid.n_pencils):
        members = np.where(slots // grid.capacity == p)[0]
        ranks = slots[members] % grid.capacity
        order = np.argsort(ranks)
        zs = z[members][order]
        assert (np.diff(zs) >= 0).all()


@pytest.mark.slow
def test_zband_matches_full_sweep(tall_box):
    n, L, r, grid = tall_box
    rc = 2.5
    r_extend = 2.9
    pos, valid, counts = build_slot_arrays(r, grid, n)
    window = default_z_window(grid, n, r_extend, TILE_I)
    assert window < grid.capacity, "banding must be active for this test"

    wa, wb, ub, ovf = compute_z_windows(pos, valid, counts, grid, window, r_extend, TILE_I)
    assert not bool(ovf)
    assert bool(jnp.any(ub > 0)), "uniform z should produce wrap windows"

    tbl = jnp.asarray(build_tile_table(grid))
    full = pallas_pencil_sweep(pos, tbl, counts, grid, rc * rc, interpret=True)
    band = pallas_pencil_sweep_zband(
        pos, tbl, counts, wa, wb, ub, grid, rc * rc, window, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(band), np.asarray(full), rtol=1e-10, atol=1e-12
    )


def test_zband_window_overflow_flag(tall_box):
    """A too-small window must raise the overflow flag, not silently drop
    pairs."""
    n, L, r, grid = tall_box
    pos, valid, counts = build_slot_arrays(r, grid, n)
    wa, wb, ub, ovf = compute_z_windows(pos, valid, counts, grid, 128, 15.0, TILE_I)
    assert bool(ovf)


def test_default_z_window_properties():
    grid = PencilGrid(m_xy=14, capacity=512, box_length=42.66)
    w = default_z_window(grid, 62500, 2.9)
    assert w % 128 == 0
    assert 128 <= w <= 512
    assert w < 512  # banding active at the BASELINE large-N point
