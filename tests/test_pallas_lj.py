"""Pallas kernel (interpreter mode on CPU) vs the dense jnp oracle
(SURVEY §5.2: interpret=True tests against the reference dense path)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ljmd_tpu.config import SimConfig, config_from_density
from ljmd_tpu.models.lattice import fcc_lattice
from ljmd_tpu.ops.lj import lj_force_energy_dense
from ljmd_tpu.ops.pallas_lj import lj_force_energy_pallas, make_pallas_force_fn


def random_positions(n, L, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0, L, size=(n, 3)))


@pytest.mark.parametrize("n,tile_i,tile_j", [(64, 8, 128), (200, 8, 128), (384, 128, 128)])
def test_pallas_matches_dense_random(n, tile_i, tile_j):
    L, rc = 7.0, 2.5
    r = random_positions(n, L, seed=n)
    want = lj_force_energy_dense(r, L, rc * rc, use_tail_corrections=False)
    got = lj_force_energy_pallas(
        r, L, rc * rc, use_tail_corrections=False,
        tile_i=tile_i, tile_j=tile_j, interpret=True,
    )
    assert float(got.epot) == pytest.approx(float(want.epot), rel=1e-10)
    assert float(got.d_epot) == pytest.approx(float(want.d_epot), rel=1e-10)
    assert float(got.dd_epot) == pytest.approx(float(want.dd_epot), rel=1e-10)
    np.testing.assert_allclose(np.asarray(got.a), np.asarray(want.a), rtol=1e-9, atol=1e-9)


def test_pallas_with_tails_matches_dense():
    cfg = config_from_density(num_cells=3, density=0.8, dtype="float64")
    r = random_positions(cfg.n, cfg.box_length, seed=1)
    want = lj_force_energy_dense(
        r, cfg.box_length, cfg.rc_square, True, cfg.volume, cfg.rc
    )
    got = lj_force_energy_pallas(
        r, cfg.box_length, cfg.rc_square, True, cfg.volume, cfg.rc,
        tile_i=8, tile_j=128, interpret=True,
    )
    assert float(got.epot) == pytest.approx(float(want.epot), rel=1e-10)
    assert float(got.d_epot) == pytest.approx(float(want.d_epot), rel=1e-10)


def test_pallas_padding_mask():
    """N not a multiple of the tile sizes: padded slots must not contribute."""
    L, rc = 6.0, 2.0
    r = random_positions(130, L, seed=9)  # pads to 256 with tile 8/128
    want = lj_force_energy_dense(r, L, rc * rc, use_tail_corrections=False)
    got = lj_force_energy_pallas(
        r, L, rc * rc, use_tail_corrections=False, tile_i=8, tile_j=128, interpret=True
    )
    assert got.a.shape == (130, 3)
    np.testing.assert_allclose(np.asarray(got.a), np.asarray(want.a), rtol=1e-9, atol=1e-9)
    assert float(got.epot) == pytest.approx(float(want.epot), rel=1e-10)


def test_make_pallas_force_fn_via_config():
    cfg = SimConfig(num_cells=2, box_length=4.0, rc_over_box=0.45, dtype="float64")
    force = make_pallas_force_fn(cfg, interpret=True)
    r = fcc_lattice(cfg.num_cells, cfg.box_length, dtype=jnp.float64)
    res = force(r)
    want = lj_force_energy_dense(
        r, cfg.box_length, cfg.rc_square, True, cfg.volume, cfg.rc
    )
    assert float(res.epot) == pytest.approx(float(want.epot), rel=1e-10)
    # Perfect FCC: forces ~ 0
    assert float(jnp.abs(res.a).max()) < 1e-8


def test_pallas_f32_accuracy_vs_f64():
    """f32 kernel against the f64 oracle: forces to ~1e-4 relative, energies
    to ~1e-5 relative (precision policy check, SURVEY §7 hard parts)."""
    L, rc = 8.0, 2.5
    r64 = random_positions(500, L, seed=4)
    want = lj_force_energy_dense(r64, L, rc * rc, use_tail_corrections=False)
    got = lj_force_energy_pallas(
        r64.astype(jnp.float32), L, rc * rc, use_tail_corrections=False,
        tile_i=128, tile_j=128, interpret=True,
    )
    assert float(got.epot) == pytest.approx(float(want.epot), rel=2e-5)
    fmax = float(jnp.abs(want.a).max())
    np.testing.assert_allclose(
        np.asarray(got.a, dtype=np.float64), np.asarray(want.a),
        atol=2e-4 * fmax,
    )
