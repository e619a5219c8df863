"""Fused multi-step kernel (ops/pallas_fused.py): run_fast must reproduce the
per-step trajectory (numerically — wrap timing and reduction order differ,
so identity is to rounding, not bit-exact) and conserve invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _pallas_rows_engine
from ljmd_tpu.models.simulation import initialize
from ljmd_tpu.state import MDState


def _scan_steps(eng, carry, n):
    def body(c, _):
        c2, _ob = eng.step_fast(c)
        return c2, None

    return jax.jit(lambda c: jax.lax.scan(body, c, None, length=n)[0])(carry)


@pytest.mark.parametrize("num_cells,density", [(4, 0.8), (3, 0.66)])
def test_run_fast_matches_per_step(num_cells, density):
    cfg = config_from_density(
        num_cells=num_cells, density=density, dt=0.004, dtype="float64",
        total_steps=10, warmup_steps=0,
        target_total_energy=-4.0 * (4 * num_cells**3),
    )
    eng = _pallas_rows_engine(cfg, interpret=True)
    state = initialize(cfg, backend="dense")
    c0, _ = eng.init(state)

    n_steps = 25
    c_scan = _scan_steps(eng, c0, n_steps)
    c_fused = jax.jit(lambda c: eng.run_fast(c, n_steps))(c0)

    s1 = eng.get_state(c_scan)
    s2 = eng.get_state(c_fused)
    for field in ("r", "ru", "v", "a"):
        np.testing.assert_allclose(
            np.asarray(getattr(s2, field)),
            np.asarray(getattr(s1, field)),
            rtol=1e-10, atol=1e-10,
            err_msg=f"{field} diverged between fused and per-step paths",
        )


def test_run_fast_chunk_split_and_conservation():
    """n_steps > MAX_CHUNK_STEPS splits into several fused calls; momentum
    stays zero and energy is conserved across the whole stretch."""
    from ljmd_tpu.ops.pallas_fused import MAX_CHUNK_STEPS

    cfg = config_from_density(
        num_cells=3, density=0.7, dt=0.003, dtype="float64",
        total_steps=10, warmup_steps=300, target_total_energy=-500.0,
    )
    eng = _pallas_rows_engine(cfg, interpret=True)
    state = initialize(cfg, backend="dense")
    c0, ob0 = eng.init(state)

    n_steps = MAX_CHUNK_STEPS + 37
    c1 = jax.jit(lambda c: eng.run_fast(c, n_steps))(c0)
    _, ob1 = eng.step(c1)

    # Energy must match the per-step path (absolute conservation at this tiny
    # N is dominated by cutoff-crossing noise of the unshifted potential, so
    # the per-step trajectory is the oracle, not a fixed drift bound).
    c_scan = _scan_steps(eng, c0, n_steps)
    _, ob_scan = eng.step(c_scan)
    e_fused = float(ob1.epot + ob1.ekin)
    e_scan = float(ob_scan.epot + ob_scan.ekin)
    assert abs(e_fused - e_scan) / abs(e_scan) < 1e-9, (e_fused, e_scan)

    s1 = eng.get_state(c1)
    p = np.asarray(jnp.sum(s1.v, axis=0))
    np.testing.assert_allclose(p, 0.0, atol=1e-9)
    # positions wrapped back into the box by the chunk wrapper
    r = np.asarray(s1.r)
    assert r.min() >= 0.0 and r.max() < cfg.box_length


def test_run_fast_production_driver_parity():
    """run_production with the rows engine (run_fast engaged) agrees with the
    dense per-step backend on sampled observables."""
    from ljmd_tpu.models.simulation import run_production

    cfg = config_from_density(
        num_cells=3, density=0.7, dt=0.003, dtype="float64",
        total_steps=60, output_interval=10, warmup_steps=10,
        target_total_energy=-500.0,
    )
    state = initialize(cfg, backend="dense")
    want = run_production(cfg, state, backend="dense")
    got = run_production(cfg, state, backend="pallas")
    np.testing.assert_allclose(
        np.asarray(got.series), np.asarray(want.series), rtol=1e-8, atol=1e-10
    )


def test_zsort_engine_matches_rows_engine():
    """z-sorted tile-skip fused engine == rows engine over fused stretches
    with resorts (f64 interpret); skipped tiles must contribute exact zeros."""
    from ljmd_tpu.models.engine import _zsort_engine

    cfg = config_from_density(
        num_cells=6, density=0.8, dt=0.004, dtype="float64",
        total_steps=10, warmup_steps=30, target_total_energy=-4000.0,
    )
    state = initialize(cfg, backend="dense")
    ez = _zsort_engine(cfg, interpret=True, inner_chunk=8)
    er = _pallas_rows_engine(cfg, interpret=True)

    cz, obz = ez.init(state)
    cr, obr = er.init(state)
    assert float(obz.epot) == pytest.approx(float(obr.epot), rel=1e-12)

    # 12 steps = one full inner chunk + remainder: crosses a resort boundary
    cz = jax.jit(lambda c: ez.run_fast(c, 12))(cz)
    cr = jax.jit(lambda c: er.run_fast(c, 12))(cr)
    sz, sr = ez.get_state(cz), er.get_state(cr)
    for field in ("r", "ru", "v", "a"):
        np.testing.assert_allclose(
            np.asarray(getattr(sz, field)), np.asarray(getattr(sr, field)),
            rtol=1e-10, atol=1e-10, err_msg=field,
        )
    assert not bool(jax.device_get(cz.invalid))
    _, ob1 = jax.jit(ez.step)(cz)
    _, ob2 = jax.jit(er.step)(cr)
    assert float(ob1.epot) == pytest.approx(float(ob2.epot), rel=1e-11)


def test_zsort_engine_vmap_matches_replica_loop():
    """vmapped zsort engine (batched ensembles, round-4) == per-replica
    loop: engine init + a fused stretch with a resort under jax.vmap must
    be bit-compatible with running each replica separately. Pins the
    batch-legality contract of the pack/list kernels (2-D SMEM operands:
    on TPU, 1-D operands batch to (R, k) blocks Mosaic rejects)."""
    from ljmd_tpu.models.engine import _zsort_engine

    cfg = config_from_density(
        num_cells=4, density=0.8, dt=0.004, dtype="float64",
        total_steps=10, warmup_steps=20, target_total_energy=-1100.0,
    )
    ez = _zsort_engine(cfg, interpret=True, inner_chunk=8)

    base = initialize(cfg, backend="dense")
    keys = jax.random.split(jax.random.PRNGKey(7), 2)

    def one(key):
        noise = 1e-3 * jax.random.normal(key, base.v.shape, base.v.dtype)
        st = MDState(r=base.r, ru=base.ru, v=base.v + noise, a=base.a)
        c, ob = ez.init(st)
        c = ez.run_fast(c, 12)  # crosses the inner_chunk=8 resort boundary
        _, ob2 = ez.step(c)
        s = ez.get_state(c)
        return s.r, s.v, ob.epot, ob2.epot

    rb, vb, e0b, e1b = jax.jit(jax.vmap(one))(keys)
    for i, k in enumerate(keys):
        r1, v1, e01, e11 = jax.jit(one)(k)
        np.testing.assert_allclose(np.asarray(rb[i]), np.asarray(r1),
                                   rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(np.asarray(vb[i]), np.asarray(v1),
                                   rtol=1e-12, atol=1e-12)
        assert float(e0b[i]) == pytest.approx(float(e01), rel=1e-12)
        assert float(e1b[i]) == pytest.approx(float(e11), rel=1e-12)


def test_zsort_slab_matches_rows_engine():
    """(x-slab, z) lexicographic mode == rows engine through resorts (f64
    interpret). Exercises the x interval test, the 4-category window lists
    (incl. 'free' visits skipping BOTH rounds), and the slab sort key.
    rc=1.3, skin=0.55 keeps window 1.96 so L=10.3 fits 5 x-slabs."""
    from ljmd_tpu.models.engine import _zsort_engine

    cfg = config_from_density(
        num_cells=6, density=0.8, rc=1.3, dt=0.004, dtype="float64",
        total_steps=10, warmup_steps=50, target_total_energy=-4000.0,
    )
    state = initialize(cfg, backend="dense")
    # tile_j=128 (span 1): at n_pad=1024 the default 512-wide visits all
    # touch the diagonal or padding (all 'masked'), leaving the round-skip
    # categories untested; 128-wide visits have interior pure tiles.
    ez = _zsort_engine(cfg, interpret=True, inner_chunk=8, slab_sort=True,
                       tile_j=128, sort_skin=0.55)
    er = _pallas_rows_engine(cfg, interpret=True)

    cz, obz = ez.init(state)
    cr, obr = er.init(state)
    assert float(obz.epot) == pytest.approx(float(obr.epot), rel=1e-12)
    # at this tiny N every block spans most of a slab's z range, so all
    # visits keep full MIC — the round-skipping categories are exercised
    # by test_zsort_slab_free_visits below
    tc = np.asarray(cz.tcounts)
    assert tc.sum() > 0, tc

    cz = jax.jit(lambda c: ez.run_fast(c, 12))(cz)
    cr = jax.jit(lambda c: er.run_fast(c, 12))(cr)
    sz, sr = ez.get_state(cz), er.get_state(cr)
    for field in ("r", "ru", "v", "a"):
        np.testing.assert_allclose(
            np.asarray(getattr(sz, field)), np.asarray(getattr(sr, field)),
            rtol=1e-10, atol=1e-10, err_msg=field,
        )
    assert not bool(jax.device_get(cz.invalid))


@pytest.mark.slow
def test_zsort_slab_free_visits():
    """Slab mode at N=2048 (blocks z-compact within slabs): 'free' visits —
    skipping BOTH the x and z MIC rounds in the kernel — must exist and the
    trajectory must still match the rows engine exactly."""
    from ljmd_tpu.models.engine import _zsort_engine

    cfg = config_from_density(
        num_cells=8, density=0.8, rc=1.3, dt=0.004, dtype="float64",
        total_steps=10, warmup_steps=30, target_total_energy=-9000.0,
    )
    state = initialize(cfg, backend="dense")
    # sort_skin pinned: the free-visit count is a function of the slab
    # geometry (slab count/width vs block z-spans), which the auto skin
    # legitimately changes; this test asserts the category machinery at
    # one KNOWN geometry.
    ez = _zsort_engine(cfg, interpret=True, inner_chunk=8, slab_sort=True,
                       tile_j=256, sort_skin=0.7)
    er = _pallas_rows_engine(cfg, interpret=True)
    cz, _ = ez.init(state)
    cr, _ = er.init(state)
    tc = np.asarray(cz.tcounts)
    assert tc[0] > 0, tc  # free visits present (kernel runs round-free body)

    cz = jax.jit(lambda c: ez.run_fast(c, 24))(cz)
    cr = jax.jit(lambda c: er.run_fast(c, 24))(cr)
    sz, sr = ez.get_state(cz), er.get_state(cr)
    for field in ("r", "v", "a"):
        np.testing.assert_allclose(
            np.asarray(getattr(sz, field)), np.asarray(getattr(sr, field)),
            rtol=1e-10, atol=1e-10, err_msg=field,
        )
    assert not bool(jax.device_get(cz.invalid))


def test_zsort_production_driver():
    """backend='zsort' through run_production matches dense."""
    from ljmd_tpu.models.simulation import run_production

    cfg = config_from_density(
        num_cells=5, density=0.8, dt=0.003, dtype="float64",
        total_steps=20, output_interval=5, warmup_steps=10,
        target_total_energy=-2300.0,
    )
    state = initialize(cfg, backend="dense")
    want = run_production(cfg, state, backend="dense")
    got = run_production(cfg, state, backend="zsort")
    np.testing.assert_allclose(
        np.asarray(got.series), np.asarray(want.series), rtol=1e-8, atol=1e-9
    )
    assert not bool(jax.device_get(got.diagnostics["zsort_invalid"]))


def test_wrap_positions_ext_preserves_two_float_sum():
    """Two-float wrap: hi' + lo' == (hi + lo) - k*L exactly (within f64
    evaluation of the f32 pair), including |k| = 2."""
    from ljmd_tpu.ops.pallas_fused import wrap_positions_ext

    L = 16.796875  # not a power of two
    hi = jnp.asarray([-2.0 * L + 0.3, -0.7, 0.1, L - 0.1, 1.9 * L, 2.0 * L + 0.4],
                     jnp.float32)
    lo = jnp.asarray([1e-7, -3e-8, 2e-8, 5e-8, -1e-7, 4e-8], jnp.float32)
    hi2, lo2 = wrap_positions_ext(hi, lo, L)
    assert float(jnp.min(hi2)) >= 0.0 and float(jnp.max(hi2)) < L
    k = np.floor(np.asarray(hi, np.float64) / L)
    want = np.asarray(hi, np.float64) + np.asarray(lo, np.float64) - k * L
    got = np.asarray(hi2, np.float64) + np.asarray(lo2, np.float64)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_compute_tile_flags_circular_and_padding():
    from ljmd_tpu.ops.pallas_fused import compute_tile_flags

    L = 10.0
    n_pad = 1024
    n = 896  # last 128 columns are padding; 7 real tiles of z-span ~1.43
    zreal = np.linspace(0.0, L, n, endpoint=False)
    r = jnp.zeros((8, n_pad), jnp.float64).at[2, :n].set(jnp.asarray(zreal))
    flags = np.asarray(compute_tile_flags(r, n, 128, 128, L, 1.0)).reshape(8, 8)
    # Encoding: bit0 active, bit1 z-round needed, bit2 x-round needed. With
    # x_window=None the x bit rides on every active tile (x is unsorted).
    # distant tiles off: tile 0 z~[0,1.42], tile 3 z~[4.29,5.7] -> gap 2.9 > 1
    assert flags[0, 3] == 0 and flags[3, 0] == 0
    # interior adjacent tiles: direct only (z-MIC skippable) -> 1|4 = 5
    assert flags[2, 3] == 5 and flags[3, 4] == 5
    # tiles 0/1: tile 0 holds face-crossers, but tile 1 starts 1.43 > window
    # from the face — no partner can be in range of a crosser, so the
    # crosser-x-partner hazard rule keeps the z round OFF (the old
    # either-side-near-face rule forced it on)
    assert flags[0, 1] == 5
    # circular wrap: first and last REAL tiles touch through z = 0/L only
    # via the wrapped image -> z round on -> 1|2|4 = 7
    assert flags[0, 6] == 7 and flags[6, 0] == 7
    # padding tile (7) inactive everywhere
    assert flags[7, :].sum() == 0 and flags[:, 7].sum() == 0
    # diagonal on: interior direct-only; face tiles hold both crossers and
    # partners of the SAME face -> full MIC
    assert flags[3, 3] == 5 and flags[0, 0] == 7 and flags[6, 6] == 7


def test_compute_tile_flags_x_window():
    """(x-slab, z) layouts: the x interval test prunes tiles whose x-slabs
    cannot interact, and the x-round bit clears on interior tile pairs."""
    from ljmd_tpu.ops.pallas_fused import compute_tile_flags

    L = 10.0
    n_pad = 512
    n = 512
    # 4 tiles: x-slabs [0,2), [2,4), [4,6), [6,8); z identical everywhere
    # (z-test passes for every pair), window 1.0.
    x = np.repeat([0.5 + 2 * k for k in range(4)], 128)
    r = jnp.zeros((8, n_pad), jnp.float64).at[0, :n].set(jnp.asarray(x))
    flags = np.asarray(
        compute_tile_flags(r, n, 128, 128, L, 1.0, x_window=1.0)
    ).reshape(4, 4)
    # x-gap between slab centers 0.5 / 2.5 is 2.0 > window -> inactive,
    # even though every z interval overlaps
    assert flags[0, 1] == 0 and flags[1, 2] == 0
    # same slab: active; x=0.5 is within window of face 0 (crosser and
    # partner share the face) -> x round on; z intervals are all [0,0]
    # at face 0 -> z round on too
    assert flags[0, 0] == 7
    # interior slab (x=4.5): x round off; z still pinned at face 0
    assert flags[2, 2] == 3
    # wrap: x=0.5 and x=6.5 are 4.0 apart directly and 3.0 through the
    # x faces — both beyond the window -> inactive
    assert flags[0, 3] == 0


def test_zsort_extended_matches_rows_compensated():
    """zsort extended (flags + two-float) fused path == per-step compensated
    rows engine (f64 interpret; explicit flags force the real code path)."""
    from ljmd_tpu.models.engine import _zsort_engine

    cfg = config_from_density(
        num_cells=6, density=0.8, dt=0.0008, dtype="float64",
        total_steps=10, warmup_steps=30, target_total_energy=-4000.0,
    )
    state = initialize(cfg, backend="dense")
    ez = _zsort_engine(cfg, interpret=True, inner_chunk=8, extended=True)
    er = _pallas_rows_engine(cfg, interpret=True, compensated=True)
    cz, _ = ez.init(state)
    cr, _ = er.init(state)

    def body(c, _):
        c2, _o = er.step_fast(c)
        return c2, None

    cr2 = jax.jit(lambda c: jax.lax.scan(body, c, None, length=12)[0])(cr)
    cz2 = jax.jit(lambda c: ez.run_fast(c, 12))(cz)
    sz, sr = ez.get_state(cz2), er.get_state(cr2)
    for field in ("r", "ru", "v", "a"):
        np.testing.assert_allclose(
            np.asarray(getattr(sz, field)), np.asarray(getattr(sr, field)),
            rtol=1e-10, atol=1e-12, err_msg=field,
        )


def test_zsort_frames_particle_order():
    """record_frames with the zsort backend must return frames in particle
    order (get_state unscrambles the sort permutation every sample)."""
    from ljmd_tpu.models.simulation import run_production

    cfg = config_from_density(
        num_cells=5, density=0.8, dt=0.003, dtype="float64",
        total_steps=10, output_interval=5, warmup_steps=0,
        target_total_energy=-2300.0,
    )
    state = initialize(cfg, backend="dense")
    want = run_production(cfg, state, backend="dense", record_frames=True)
    got = run_production(cfg, state, backend="zsort", record_frames=True)
    for field in ("r", "ru", "v", "a"):
        np.testing.assert_allclose(
            np.asarray(getattr(got.frames, field)),
            np.asarray(getattr(want.frames, field)),
            rtol=1e-8, atol=1e-9, err_msg=field,
        )


@pytest.mark.slow
def test_zsort_mxu_reduce_matches_rows_engine():
    """mxu_reduce=True (force sums via ones-matmul on the MXU) must match
    the rows engine exactly in interpret f64 — the bf16x3 question only
    exists on real hardware; this guards the dataflow (slices of the dot
    outputs, sign, accumulation order per visit)."""
    from ljmd_tpu.models.engine import _zsort_engine

    cfg = config_from_density(
        num_cells=6, density=0.8, dt=0.004, dtype="float64",
        total_steps=10, warmup_steps=50, target_total_energy=-4000.0,
    )
    state = initialize(cfg, backend="dense")
    ez = _zsort_engine(cfg, interpret=True, inner_chunk=8, mxu_reduce=True)
    er = _pallas_rows_engine(cfg, interpret=True)

    cz, _ = ez.init(state)
    cr, _ = er.init(state)
    cz = jax.jit(lambda c: ez.run_fast(c, 24))(cz)
    cr = jax.jit(lambda c: er.run_fast(c, 24))(cr)
    sz, sr = ez.get_state(cz), er.get_state(cr)
    for field in ("r", "v", "a"):
        np.testing.assert_allclose(
            np.asarray(getattr(sz, field)), np.asarray(getattr(sr, field)),
            rtol=1e-10, atol=1e-10, err_msg=field,
        )


def test_zsort_always_rejects_box_smaller_than_travel_bound():
    """always-mode must refuse a box whose MIC clamp undercuts the
    one-chunk travel skin instead of silently shipping stale flags."""
    import pytest
    from ljmd_tpu.models.engine import _zsort_engine

    # rc close to L/2 leaves no window room at chunk 16's skin
    cfg = config_from_density(
        num_cells=5, density=0.8, rc=2.5, dt=0.02, dtype="float64",
        total_steps=10, warmup_steps=0, target_total_energy=-2000.0,
    )
    with pytest.raises(ValueError):
        _zsort_engine(cfg, interpret=True, trigger="always", inner_chunk=64)


def test_zsort_rejects_unknown_trigger():
    import pytest
    from ljmd_tpu.models.engine import _zsort_engine

    cfg = config_from_density(
        num_cells=6, density=0.8, dt=0.003, dtype="float64",
        total_steps=10, warmup_steps=0, target_total_energy=-4000.0,
    )
    with pytest.raises(ValueError, match="trigger"):
        _zsort_engine(cfg, interpret=True, trigger="sometimes")


@pytest.mark.parametrize(
    "extended", [False, pytest.param(True, marks=pytest.mark.slow)]
)
def test_run_sample_matches_run_fast_plus_step(extended):
    """run_sample(n) == run_fast(n-1) + step: same trajectory (to rounding;
    the final Verlet runs in-kernel instead of the per-step jnp path) and
    the fused final-step observables match the per-step grid sweep's
    (f64 interpret: summation order is the only difference). N=500 is
    enough: the split/remainder handling and the in-kernel final Verlet do
    not depend on tile skipping (pinned at N=864 by
    test_zsort_engine_matches_rows_engine)."""
    from ljmd_tpu.models.engine import _zsort_engine

    cfg = config_from_density(
        num_cells=5, density=0.8, dt=0.004, dtype="float64",
        total_steps=10, warmup_steps=30, target_total_energy=-2300.0,
    )
    state = initialize(cfg, backend="dense")
    eng = _zsort_engine(cfg, interpret=True, inner_chunk=8,
                        extended=extended)

    c0, _ = eng.init(state)
    # default tier: the 8+8+4 split (remainder handling); the slow extended
    # variant adds the exact-multiple case (16)
    for n_steps in (20, 16) if extended else (20,):
        c_ref, _ = jax.jit(lambda c: eng.run_fast(c, n_steps - 1))(c0), None
        c_ref, ob_ref = jax.jit(eng.step)(c_ref)
        c_new, ob_new = jax.jit(
            lambda c: eng.run_sample(c, n_steps), static_argnums=()
        )(c0)

        s1, s2 = eng.get_state(c_ref), eng.get_state(c_new)
        for field in ("r", "ru", "v", "a"):
            np.testing.assert_allclose(
                np.asarray(getattr(s2, field)), np.asarray(getattr(s1, field)),
                rtol=1e-10, atol=1e-10, err_msg=field,
            )
        for ob_field in ("epot", "ekin", "d_epot", "dd_epot"):
            assert float(getattr(ob_new, ob_field)) == pytest.approx(
                float(getattr(ob_ref, ob_field)), rel=1e-10
            ), ob_field
        assert not bool(jax.device_get(c_new.invalid))
