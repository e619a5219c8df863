"""Pencil binning + structured cell-pair engine: binning invariants, force
parity with the dense kernel, trajectory parity with rebinning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _cellpair_engine, make_engine
from ljmd_tpu.models.simulation import initialize, run_production
from ljmd_tpu.ops.cell_list import bin_to_slots, make_pencil_grid, pencil_capacity
from ljmd_tpu.ops.lj import lj_force_energy_dense


def big_cfg(**kw):
    # N=500, L=~9.1: 3x3 pencils of width >= 2.9
    base = dict(
        density=0.66, dt=0.002, dtype="float64", neighbor_skin=0.4,
        total_steps=60, output_interval=10, warmup_steps=10,
        target_total_energy=-2000.0,
    )
    base.update(kw)
    return config_from_density(num_cells=5, **base)


def test_pencil_grid_geometry():
    grid = make_pencil_grid(n=500, box_length=9.1, r_list=2.9, density=0.66)
    assert grid.m_xy == 3
    assert grid.capacity % 128 == 0
    tbl = grid.neighbor_table()
    assert tbl.shape == (9, 9)
    # each pencil's neighborhood contains itself and has no duplicates
    for p in range(9):
        assert p in tbl[p]
        assert len(set(tbl[p].tolist())) == 9


def test_pencil_grid_rejects_small_box():
    with pytest.raises(ValueError):
        make_pencil_grid(n=32, box_length=5.0, r_list=2.9, density=0.5)


def test_bin_to_slots_invariants():
    cfg = big_cfg()
    grid = make_pencil_grid(cfg.n, cfg.box_length, cfg.rc + cfg.neighbor_skin, cfg.density)
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.uniform(0, cfg.box_length, (cfg.n, 3)))
    slot, overflow = bin_to_slots(r, grid)
    assert not bool(overflow)
    slots = np.asarray(slot)
    assert len(np.unique(slots)) == cfg.n  # injective
    # every particle is in the pencil containing its (x, y)
    w = grid.pencil_width
    for i in range(0, cfg.n, 37):
        p = slots[i] // grid.capacity
        ix, iy = p // grid.m_xy, p % grid.m_xy
        assert ix == min(int(r[i, 0] / w), grid.m_xy - 1)
        assert iy == min(int(r[i, 1] / w), grid.m_xy - 1)


def test_rebin_slots_packed_matches_stable():
    """The z_order=False rebin uses an unstable packed single-key sort
    (exp_sort, 2x faster on v5e); it must assign every particle to the same
    PENCIL as the stable z-ordered path and produce distinct in-range slots
    (any within-pencil rank order is contractually acceptable)."""
    from ljmd_tpu.ops.cell_list import rebin_slots

    cfg = big_cfg()
    grid = make_pencil_grid(cfg.n, cfg.box_length, cfg.rc + cfg.neighbor_skin,
                            cfg.density)
    rng = np.random.default_rng(3)
    r = jnp.asarray(rng.uniform(0, cfg.box_length, (cfg.n, 3)))
    slot, overflow = bin_to_slots(r, grid)
    assert not bool(overflow)
    ns = grid.n_slots
    rows = jnp.zeros((8, ns))
    rows = rows.at[0:3, slot].set(r.T)
    rows = rows.at[3, slot].set(1.0)

    new_z, ovf_z = rebin_slots(rows, rows[3], grid, z_order=True)
    new_p, ovf_p = rebin_slots(rows, rows[3], grid, z_order=False)
    assert not bool(ovf_z) and not bool(ovf_p)
    valid = np.asarray(rows[3]) > 0.5
    nz, np_ = np.asarray(new_z)[valid], np.asarray(new_p)[valid]
    # same pencil assignment, distinct in-range slots, invalid -> sentinel
    assert np.array_equal(nz // grid.capacity, np_ // grid.capacity)
    assert len(np.unique(np_)) == cfg.n
    assert np_.max() < ns
    assert np.all(np.asarray(new_p)[~valid] == ns)


def test_rebin_gather_matches_scatter_layout():
    """The engine's gather-form rebin (exp_permute: XLA lane scatters blow
    up super-linearly at big ns) must produce EXACTLY the layout the
    scatter form produces from the same sort key, for both key modes."""
    from ljmd_tpu.ops.cell_list import rebin_gather, rebin_slots

    cfg = big_cfg()
    grid = make_pencil_grid(cfg.n, cfg.box_length, cfg.rc + cfg.neighbor_skin,
                            cfg.density)
    rng = np.random.default_rng(7)
    r = jnp.asarray(rng.uniform(0, cfg.box_length, (cfg.n, 3)))
    slot, overflow = bin_to_slots(r, grid)
    assert not bool(overflow)
    ns = grid.n_slots
    rows = jnp.zeros((8, ns))
    rows = rows.at[0:3, slot].set(r.T)
    rows = rows.at[3, slot].set(1.0)
    rows = rows.at[4, slot].set(jnp.arange(cfg.n, dtype=rows.dtype))

    for z_order in (False, True):
        new_slot, ovf_s = rebin_slots(rows, rows[3], grid, z_order=z_order)
        old_of_new, valid_new, ovf_g = rebin_gather(rows, rows[3], grid,
                                                    z_order=z_order)
        assert bool(ovf_s) == bool(ovf_g) == False  # noqa: E712
        # scatter-form layout
        want = np.zeros((8, ns + 1))
        want[:, np.asarray(new_slot)] = np.asarray(rows)
        want = want[:, :ns]
        # gather-form layout
        got = np.asarray(rows)[:, np.asarray(old_of_new)]
        got *= np.asarray(valid_new)[None, :]
        np.testing.assert_array_equal(got, want, err_msg=f"z_order={z_order}")


def test_cellpair_init_force_parity():
    cfg = big_cfg()
    state = initialize(cfg, backend="dense")
    eng = _cellpair_engine(cfg, interpret=True)
    carry, obs = eng.init(state)
    want = lj_force_energy_dense(
        state.r, cfg.box_length, cfg.rc_square, True, cfg.volume, cfg.rc
    )
    assert float(obs.epot) == pytest.approx(float(want.epot), rel=1e-10)
    assert float(obs.d_epot) == pytest.approx(float(want.d_epot), rel=1e-10)
    assert float(obs.dd_epot) == pytest.approx(float(want.dd_epot), rel=1e-10)
    got = eng.get_state(carry)
    np.testing.assert_allclose(np.asarray(got.r), np.asarray(state.r), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(got.a), np.asarray(want.a), rtol=1e-9, atol=1e-9)
    assert not bool(eng.diagnostics(carry)["pencil_overflow"])


def test_cellpair_trajectory_matches_dense():
    cfg = big_cfg(neighbor_skin=0.2, total_steps=20)  # small skin -> several rebins
    state = initialize(cfg, backend="dense")
    out_d = run_production(cfg, state, backend="dense")
    out_c = run_production(cfg, state, backend="cellpair", record_frames=True)
    assert not bool(out_c.diagnostics["pencil_overflow"])
    np.testing.assert_allclose(
        np.asarray(out_c.series), np.asarray(out_d.series), rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(out_c.final_state.r), np.asarray(out_d.final_state.r),
        rtol=1e-9, atol=1e-10,
    )
    # frames preserve particle identity across rebins
    np.testing.assert_allclose(
        np.asarray(out_c.frames.ru[-1]), np.asarray(out_c.final_state.ru), rtol=1e-12
    )


def test_pencil_capacity_alignment():
    cap = pencil_capacity(65536, 0.8442, 42.66, 14)
    assert cap % 128 == 0
    assert cap >= 65536 / 196


def test_auto_backend_selects_cellpair_for_large_n(monkeypatch):
    from ljmd_tpu.models import engine as E

    # Past the window-list SMEM cliff (n_pad/128 squared > 32768, n ~ 23k)
    # auto must fall through to the structured pencil engine.
    cfg = config_from_density(num_cells=20, density=0.8442)  # N=32000
    monkeypatch.setattr(
        E.jax, "devices", lambda: [type("D", (), {"platform": "tpu"})()]
    )
    eng = E.make_engine(cfg, "auto")
    # cellpair engines expose the pencil_overflow diagnostic
    import jax.numpy as jnp

    class FakeCarry:
        overflow = jnp.asarray(False)

    assert "pencil_overflow" in eng.diagnostics(FakeCarry())


def test_auto_backend_selects_zsort_mid_n(monkeypatch):
    """Mid-N (16384) routes to the sorted window-list engine on TPU
    (measured faster than pencil there: 4.5e7 vs 2.6e7 ps/s on v5e)."""
    from ljmd_tpu.models import engine as E

    cfg = config_from_density(num_cells=16, density=0.8442)  # N=16384
    monkeypatch.setattr(
        E.jax, "devices", lambda: [type("D", (), {"platform": "tpu"})()]
    )
    eng = E.make_engine(cfg, "auto")
    import jax.numpy as jnp

    class FakeCarry:
        invalid = jnp.asarray(False)

    assert "zsort_invalid" in eng.diagnostics(FakeCarry())


def test_half_shell_matches_full_sweep():
    """Pair-once half-shell sweep == full 9-neighbor sweep (forces, obs) on
    an equilibrated fluid, f64 interpret."""
    import jax

    from ljmd_tpu.models.engine import _cellpair_engine
    from ljmd_tpu.models.simulation import initialize

    cfg = config_from_density(
        num_cells=5, density=0.66, dt=0.002, dtype="float64",
        total_steps=10, warmup_steps=30, target_total_energy=-2000.0,
        neighbor_skin=0.4,
    )
    state = initialize(cfg, backend="dense")
    eng_full = _cellpair_engine(cfg, interpret=True, half_shell=False)
    eng_hs = _cellpair_engine(cfg, interpret=True, half_shell=True)

    c_f, ob_f = eng_full.init(state)
    c_h, ob_h = eng_hs.init(state)
    for key in ("epot", "ekin", "d_epot", "dd_epot"):
        assert float(getattr(ob_h, key)) == pytest.approx(
            float(getattr(ob_f, key)), rel=1e-11
        ), key

    for _ in range(3):
        c_f, ob_f = jax.jit(eng_full.step)(c_f)
        c_h, ob_h = jax.jit(eng_hs.step)(c_h)
    s_f = eng_full.get_state(c_f)
    s_h = eng_hs.get_state(c_h)
    for field in ("r", "v", "a"):
        np.testing.assert_allclose(
            np.asarray(getattr(s_h, field)), np.asarray(getattr(s_f, field)),
            rtol=1e-9, atol=1e-11, err_msg=field,
        )
    assert float(ob_h.epot) == pytest.approx(float(ob_f.epot), rel=1e-9)


def test_compensated_rebin_preserves_parity_across_triggers():
    """The two-float-wrap rebin: compensated pencil trajectories must agree
    between the cond'd predictive trigger and the branchless always-rebin
    (which rebins 4-8x more often) to f64-roundoff — the rebin neither
    loses compensation bits nor perturbs the physics."""
    from ljmd_tpu.models.engine import _cellpair_engine

    cfg = big_cfg(neighbor_skin=0.3)
    state = initialize(cfg, backend="dense")
    outs = []
    for trig in ("predictive", "always"):
        eng = _cellpair_engine(cfg, compensated=True, rebin_trigger=trig)
        c, _ = eng.init(state)
        c = jax.jit(lambda cc, eng=eng: eng.run_fast(cc, 48))(c)
        assert not bool(jax.device_get(c.overflow))
        outs.append(eng.get_state(c))
    np.testing.assert_allclose(
        np.asarray(outs[0].r), np.asarray(outs[1].r), rtol=1e-9, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(outs[0].v), np.asarray(outs[1].v), rtol=1e-9, atol=1e-10
    )


def test_cellpair_rejects_unknown_rebin_trigger():
    from ljmd_tpu.models.engine import _cellpair_engine

    with pytest.raises(ValueError, match="rebin trigger"):
        _cellpair_engine(big_cfg(), rebin_trigger="sometimes")


def test_unfused_run_fast_matches_per_step():
    """The chunked unfused driver (rebin once per chunk, cond-free steps
    in between) must reproduce the per-step cond'd trajectory through
    several rebins."""
    from ljmd_tpu.models.engine import _cellpair_engine

    cfg = big_cfg(neighbor_skin=0.3)
    state = initialize(cfg, backend="dense")
    eng = _cellpair_engine(cfg, use_fused=False)
    assert eng.run_fast is not None

    c0, _ = eng.init(state)
    c_fast = jax.jit(lambda c: eng.run_fast(c, 24))(c0)

    def body(c, _):
        c2, _ob = eng.step_fast(c)
        return c2, None

    c_step = jax.jit(lambda c: jax.lax.scan(body, c, None, length=24)[0])(c0)
    assert not bool(jax.device_get(c_fast.overflow))
    s_f, s_s = eng.get_state(c_fast), eng.get_state(c_step)
    for field in ("r", "ru", "v"):
        np.testing.assert_allclose(
            np.asarray(getattr(s_f, field)), np.asarray(getattr(s_s, field)),
            rtol=1e-9, atol=1e-10, err_msg=field,
        )


@pytest.mark.slow
def test_unfused_run_fast_through_production_driver():
    """run_production must produce identical sampled observables whether
    the pencil engine runs the fused kernel or the chunked unfused
    driver (the >VMEM big-N path, forced here via use_fused=False)."""
    from ljmd_tpu.models.engine import _cellpair_engine
    from ljmd_tpu.models.simulation import run_production

    cfg = big_cfg(neighbor_skin=0.3)
    state = initialize(cfg, backend="dense")
    want = run_production(cfg, state, backend="cellpair")

    import ljmd_tpu.models.engine as eng_mod
    orig = eng_mod._cellpair_engine
    try:
        eng_mod._cellpair_engine = lambda c, **kw: orig(
            c, use_fused=False, **kw
        )
        got = run_production(cfg, state, backend="cellpair")
    finally:
        eng_mod._cellpair_engine = orig
    np.testing.assert_allclose(
        np.asarray(got.series), np.asarray(want.series),
        rtol=1e-9, atol=1e-11,
    )


def _iter_eqns(jaxpr):
    """All eqns in a jaxpr, recursing into sub-jaxprs carried in params
    (scan/cond/while/pjit bodies) but NOT into pallas_call kernels — the
    in-kernel fori_loop is Mosaic's, not part of the XLA graph the v5e
    miscompile guards care about."""
    for eqn in jaxpr.eqns:
        yield eqn
        if eqn.primitive.name == "pallas_call":
            continue
        for v in eqn.params.values():
            for o in v if isinstance(v, (list, tuple)) else (v,):
                sub = getattr(o, "jaxpr", o)
                if hasattr(sub, "eqns"):
                    yield from _iter_eqns(sub)


def test_miscompile_workarounds_stay_in_place():
    """Structural regression guards for the two v5e XLA miscompiles
    (docs/RESULTS.md "v5e XLA miscompiles"; CLAUDE.md invariants). Neither
    bug reproduces on CPU, so no behavioral test here can catch a
    regression — physics corrupts silently ONLY on TPU, and only
    scripts/check_conservation.py sees it. These assert the structure that
    avoids them instead.

    (a) rebin_gather must stay un-jitted and searchsorted-free: a
        searchsorted next to a live lax.scan in the same compiled module
        returns lane-tile-granular corrupt counts at N=131072.
    (b) run_fast_unfused's inner chunk steps must stay UNROLLED: a
        lax.scan over the per-step sweeps downstream of the gather rebin
        injects energy. The ONLY scan in its graph must be the outer
        once-per-chunk loop.
    """
    from ljmd_tpu.ops import cell_list

    # (a) plain functions (no jit wrapper) ...
    for fn_name in ("rebin_gather", "rebin_gather_parts", "_pencil_counts"):
        fn = getattr(cell_list, fn_name)
        assert type(fn).__name__ == "function", (
            f"{fn_name} must not be wrapped in jax.jit (v5e miscompile guard)"
        )
        # ... whose code object never loads the name 'searchsorted'
        # (co_names lists names the code actually references; the docstring
        # does not count)
        assert "searchsorted" not in fn.__code__.co_names, (
            f"{fn_name} must stay searchsorted-free (v5e miscompile guard)"
        )

    # (b) exactly one scan — the outer chunk loop — and nothing scanned
    # inside it (inner_chunk=8 in the unfused driver; 16 steps -> length-2
    # outer scan, the regime where the miscompile fired)
    cfg = big_cfg(neighbor_skin=0.3)
    state = initialize(cfg, backend="dense")
    eng = _cellpair_engine(cfg, use_fused=False)
    c0, _ = eng.init(state)
    closed = jax.make_jaxpr(lambda c: eng.run_fast(c, 16))(c0)
    scans = [e for e in _iter_eqns(closed.jaxpr) if e.primitive.name == "scan"]
    assert len(scans) == 1, (
        f"run_fast_unfused must contain exactly the outer chunk scan, found "
        f"{len(scans)} (inner steps must stay unrolled — v5e miscompile guard)"
    )


def test_capacity_from_state_census():
    from ljmd_tpu.ops.cell_list import capacity_from_state

    rng = np.random.default_rng(11)
    L, r_list = 12.0, 3.0  # 4x4 pencils
    r = rng.uniform(0, L, size=(600, 3))
    cap = capacity_from_state(L, r_list, r)
    # reference census
    ix = np.clip((r[:, 0] * 4 / L).astype(int), 0, 3)
    iy = np.clip((r[:, 1] * 4 / L).astype(int), 0, 3)
    occ_max = np.bincount(ix * 4 + iy, minlength=16).max()
    want = max(128, int(-(-(occ_max + 16) // 128) * 128))
    assert cap == want
    # piling everything into one pencil grows the capacity accordingly
    r1 = np.full((600, 3), 0.5)
    assert capacity_from_state(L, r_list, r1) == 640  # 616 -> 640


def test_make_engine_state_aware_capacity():
    """make_engine(state=...) sizes the pencil capacity from the state's
    census (not the lattice-safe default) and the tuned engine matches the
    default-capacity engine's trajectory (capacity is pure layout)."""
    cfg = big_cfg()
    state = initialize(cfg, jax.random.PRNGKey(2))

    # The equilibrated fluid at N=500 / 3x3 pencils has occ ~56 +- fluct,
    # so the census gives the 128 floor; the lattice-safe default is >= it.
    eng_t = make_engine(cfg, "cellpair", state=state)
    eng_d = _cellpair_engine(cfg)

    ct, _ = eng_t.init(state)
    cd, _ = eng_d.init(state)
    assert ct.r.shape[1] == 9 * 128  # census capacity applied
    step_t = jax.jit(lambda c: eng_t.step_fast(c)[0])
    step_d = jax.jit(lambda c: eng_d.step_fast(c)[0])
    for _ in range(3):
        ct = step_t(ct)
        cd = step_d(cd)
    st, sd = eng_t.get_state(ct), eng_d.get_state(cd)
    assert not bool(ct.overflow)
    for name in ("r", "v"):
        d = float(jnp.max(jnp.abs(getattr(st, name) - getattr(sd, name))))
        assert d < 1e-9, f"{name}: {d}"

    # explicit neighbor_capacity still wins over the census
    import dataclasses as dc

    cfg_o = dc.replace(cfg, neighbor_capacity=256)
    eng_o = make_engine(cfg_o, "cellpair", state=state)
    co, _ = eng_o.init(state)
    assert co.r.shape[1] == 9 * 256


def test_mono_sweep_matches_grid_sweep():
    """Single-program sweep == grid half-shell sweep (f64 interpret), all
    6 output rows, on a jittered-lattice slot state with partial fills.
    Both want_observables settings share one slot-state setup."""
    from ljmd_tpu.models.lattice import fcc_lattice
    from ljmd_tpu.ops.pallas_pencil2 import (
        build_half_shell_tables,
        pallas_pencil_sweep_hs,
        pallas_pencil_sweep_mono,
        sentinel_fill,
    )

    rng = np.random.default_rng(9)
    n, L = 2048, 13.4
    grid = make_pencil_grid(n, L, 2.9, n / L**3)
    r = fcc_lattice(8, L, dtype=jnp.float64)
    r = (r + jnp.asarray(rng.normal(0, 0.05, size=(n, 3)))) % L
    slot, ovf = bin_to_slots(r, grid)
    assert not bool(ovf)
    ns = grid.n_slots
    r8 = jnp.zeros((8, ns + 1)).at[0:3, slot].set(r.T)[:, :ns]
    valid = jnp.zeros((ns + 1,)).at[slot].set(1.0)[:ns]
    r8 = r8.at[3].set(valid)
    r8 = sentinel_fill(r8, valid, grid.capacity)
    counts = valid.reshape(grid.n_pencils, grid.capacity).sum(1).astype(jnp.int32)
    tbl, shf = build_half_shell_tables(grid)
    tbl, shf = jnp.asarray(tbl), jnp.asarray(shf)

    for want_obs in (True, False):
        kw = dict(interpret=True, want_observables=want_obs,
                  approx_reciprocal=False)
        out_g = pallas_pencil_sweep_hs(
            r8, tbl, counts, shf, grid, 6.25, **kw) * r8[3:4]
        out_m = pallas_pencil_sweep_mono(
            r8, tbl, counts, shf, grid, 6.25, **kw) * r8[3:4]
        for row in range(6):
            scale = max(1.0, float(jnp.max(jnp.abs(out_g[row]))))
            d = float(jnp.max(jnp.abs(out_g[row] - out_m[row])))
            assert d < 1e-12 * scale, (want_obs, row, d, scale)
        if not want_obs:
            # gate-free variant covers identical physics too
            out_u = pallas_pencil_sweep_mono(
                r8, tbl, counts, shf, grid, 6.25, i_gate=False, **kw) * r8[3:4]
            assert float(jnp.max(jnp.abs(out_m - out_u))) == 0.0


@pytest.mark.slow
def test_mono_strip_sweep_matches_grid(monkeypatch):
    """x-strip mono decomposition (i-rows + halo row per call, overlap-add
    merge) == the grid sweep, across rebins. Strips are forced by shrinking
    the viability threshold so the whole grid doesn't fit but a strip does."""
    import ljmd_tpu.ops.pallas_pencil2 as pp2

    cfg = config_from_density(
        num_cells=8, density=0.6, dt=0.004, dtype="float64",
        neighbor_skin=0.4,
    )
    grid = make_pencil_grid(cfg.n, cfg.box_length, cfg.rc + cfg.neighbor_skin,
                            cfg.density, cfg.neighbor_capacity)
    m, cap = grid.m_xy, grid.capacity
    assert m >= 4
    # allow (ceil(m/2)+1+eps) rows per call but not the full grid
    limit = (-(-m // 2) + 1) * m * cap
    monkeypatch.setattr(pp2, "pencil_mono_viable",
                        lambda ns, itemsize=4: ns <= limit)

    eng_s = _cellpair_engine(cfg, use_fused=False, mono=True)  # strips
    eng_g = _cellpair_engine(cfg, use_fused=False, mono=False)
    state = initialize(cfg, jax.random.PRNGKey(4))
    cs, _ = eng_s.init(state)
    cg, _ = eng_g.init(state)
    step_s = jax.jit(lambda c: eng_s.step(c)[0])
    step_g = jax.jit(lambda c: eng_g.step(c)[0])
    for _ in range(8):
        cs = step_s(cs)
        cg = step_g(cg)
    ss, sg = eng_s.get_state(cs), eng_g.get_state(cg)
    assert not bool(cs.overflow)
    for name in ("r", "v", "a"):
        a, b = getattr(ss, name), getattr(sg, name)
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        d = float(jnp.max(jnp.abs(a - b)))
        assert d < 1e-11 * scale, (name, d, scale)
    # observables agree too
    _, os_ = jax.jit(eng_s.step)(cs)
    _, og = jax.jit(eng_g.step)(cg)
    for f in ("epot", "d_epot", "dd_epot"):
        assert abs(float(getattr(os_, f) - getattr(og, f))) < 1e-8


def test_ensemble_vmap_cellpair_state_capacity():
    """The vmapped ensemble calls run_production on TRACER states; the
    state-aware capacity census must fall back to the lattice default
    instead of crashing on np.asarray(tracer) (regression)."""
    from ljmd_tpu.parallel.ensemble import ensemble_simulate

    cfg = big_cfg(total_steps=5, warmup_steps=2, output_interval=5)
    agg = ensemble_simulate(cfg, n_replicas=2, backend="cellpair", jit=False)
    assert np.all(np.isfinite(np.asarray(agg.mean_of_means)))
