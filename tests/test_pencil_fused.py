"""Fused multi-step pencil kernel (ops/pallas_pencil_fused.py) vs the
per-step cellpair path: trajectory parity in f64 interpret mode, including
across chunk-boundary rebins.

The fused kernel reorders the force summation (one in-program accumulator
instead of out1 + 4 permuted reaction blocks), so agreement is to roundoff,
not bit-exact — mirrors the dense run_fast tests.
"""

import jax
import jax.numpy as jnp
import pytest

from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _cellpair_engine
from ljmd_tpu.models.lattice import fcc_lattice, random_velocities, remove_com_velocity
from ljmd_tpu.state import MDState


def _liquid_state(cfg, temp, seed=0):
    n = cfg.n
    r = fcc_lattice(cfg.num_cells, cfg.box_length, dtype=jnp.float64)
    v = remove_com_velocity(
        random_velocities(jax.random.PRNGKey(seed), n, dtype=jnp.float64)
    )
    v = v * jnp.sqrt(temp / (jnp.sum(v * v) / (3 * n)))
    return MDState(r=r, ru=r, v=v, a=jnp.zeros_like(r))


@pytest.mark.parametrize(
    "temp", [0.8, pytest.param(1.5, marks=pytest.mark.slow)]
)
def test_fused_pencil_matches_per_step(temp):
    cfg = config_from_density(
        num_cells=5, density=0.5, dt=0.005, dtype="float64", neighbor_skin=0.4
    )
    eng = _cellpair_engine(cfg)
    assert eng.run_fast is not None
    step1 = jax.jit(lambda c: eng.step_fast(c)[0])
    c0, _ = eng.init(_liquid_state(cfg, temp))
    # advance off the lattice so rebins can trigger inside the window
    for _ in range(12):
        c0 = step1(c0)

    n_steps = 17  # 2 full chunks + remainder
    ca = c0
    for _ in range(n_steps):
        ca = step1(ca)
    cb = jax.jit(lambda c: eng.run_fast(c, n_steps))(c0)

    sa, sb = eng.get_state(ca), eng.get_state(cb)
    assert not bool(cb.overflow)
    for name in ("r", "ru", "v"):
        da = float(jnp.max(jnp.abs(getattr(sa, name) - getattr(sb, name))))
        assert da < 1e-10, f"{name} diverged: {da}"
    assert float(jnp.max(jnp.abs(sa.a - sb.a))) < 1e-8


def test_fused_pencil_extended_matches_per_step_compensated():
    """Extended two-float fused pencil path (VERDICT round-2 item 2) == the
    per-step compensated path, across rebins. In f64 the remainder rows are
    sub-roundoff, so trajectory agreement to 1e-10 pins pair coverage and
    the compensated integration plumbing (the f32 precision benefit itself
    is measured on TPU, docs/RESULTS.md)."""
    cfg = config_from_density(
        num_cells=5, density=0.5, dt=0.005, dtype="float64", neighbor_skin=0.4
    )
    eng = _cellpair_engine(cfg, compensated=True)
    assert eng.run_fast is not None, "extended fused path must be viable"
    step1 = jax.jit(lambda c: eng.step_fast(c)[0])
    c0, _ = eng.init(_liquid_state(cfg, 1.2))
    for _ in range(12):
        c0 = step1(c0)

    n_steps = 17
    ca = c0
    for _ in range(n_steps):
        ca = step1(ca)
    cb = jax.jit(lambda c: eng.run_fast(c, n_steps))(c0)

    sa, sb = eng.get_state(ca), eng.get_state(cb)
    assert not bool(cb.overflow)
    for name in ("r", "ru", "v"):
        da = float(jnp.max(jnp.abs(getattr(sa, name) - getattr(sb, name))))
        assert da < 1e-10, f"{name} diverged: {da}"
    assert float(jnp.max(jnp.abs(sa.a - sb.a))) < 1e-8


@pytest.mark.slow
def test_fused_pencil_energy_matches_per_step():
    """Total energy after 64 fused steps equals the per-step path's (a
    missed pair in the fused sweep would show up here at O(1), far above
    the summation-order roundoff). Absolute NVE conservation from this
    violent lattice-collapse start is integration error, identical in both
    paths and in the dense oracle — not what this test pins."""
    cfg = config_from_density(
        num_cells=5, density=0.5, dt=0.003, dtype="float64", neighbor_skin=0.4
    )
    eng = _cellpair_engine(cfg)
    stepj = jax.jit(eng.step)
    c0, _ = eng.init(_liquid_state(cfg, 1.0))
    ca = c0
    for _ in range(64):
        ca, oa = stepj(ca)
    cb = jax.jit(lambda c: eng.run_fast(c, 64))(c0)
    _, ob = stepj(cb)
    ea = float(oa.epot + oa.ekin)
    _, oa2 = stepj(ca)
    ea2 = float(oa2.epot + oa2.ekin)
    eb = float(ob.epot + ob.ekin)
    assert abs(eb - ea2) < 1e-6 * abs(ea2), (ea, ea2, eb)
    assert not bool(cb.overflow)


# ---- occupancy-width visit lists ------------------------------------------


def _width_cover(wl_self, wl_self_cnt, wl_nbr_i, wl_nbr_j, wl_nbr_off,
                 n_pencils, capacity, tile=128):
    """Reconstruct the (i_slot, j_slot, shift) candidate cover from width
    lists as python sets: self pairs (a < b, same pencil) and neighbor pairs
    (a, b, shx, shy) per half-shell visit."""
    import numpy as np

    n_sub = capacity // tile
    wl_self = np.asarray(wl_self)
    wl_self_cnt = np.asarray(wl_self_cnt)
    wl_nbr_i = np.asarray(wl_nbr_i)
    wl_nbr_j = np.asarray(wl_nbr_j)
    wl_nbr_off = np.asarray(wl_nbr_off)
    P = n_pencils
    self_pairs = []
    for u in range(1, n_sub + 1):
        for t in range(int(wl_self_cnt[u - 1])):
            ista = int(wl_self[(u - 1) * P + t]) * tile  # block index
            for a in range(ista, ista + tile):
                for b in range(a + 1, ista + u * tile):
                    self_pairs.append((a, b))
    nbr_pairs = []
    for w in range(1, n_sub + 1):
        for t in range(int(wl_nbr_off[w - 1]), int(wl_nbr_off[w])):
            ista = int(wl_nbr_i[t]) * tile
            pk = int(wl_nbr_j[t])
            jb, shx, shy = (pk >> 4) * tile, ((pk >> 2) & 3) - 1, (pk & 3) - 1
            for a in range(ista, ista + tile):
                for b in range(jb, jb + w * tile):
                    nbr_pairs.append((a, b, shx, shy))
    return self_pairs, nbr_pairs


def test_build_width_lists_exact_cover():
    """The width lists cover every valid-slot pair of the static-capacity
    structure EXACTLY once (multiset equality), for a synthetic 3-class
    count vector including empty and full pencils."""
    import numpy as np

    from ljmd_tpu.ops.cell_list import PencilGrid
    from ljmd_tpu.ops.pallas_pencil2 import build_half_shell_tables
    from ljmd_tpu.ops.pallas_pencil_fused import build_width_lists

    grid = PencilGrid(m_xy=4, capacity=256, box_length=12.0)
    tbl, shf = build_half_shell_tables(grid)
    rng = np.random.default_rng(7)
    counts = rng.integers(0, 257, size=grid.n_pencils).astype(np.int32)
    counts[0] = 0      # empty pencil
    counts[1] = 256    # full pencil
    counts[2] = 128    # exact class boundary
    counts[3] = 129    # just past it

    wl = build_width_lists(
        jnp.asarray(counts), jnp.asarray(tbl), jnp.asarray(shf),
        grid.n_pencils, grid.capacity,
    )
    self_pairs, nbr_pairs = _width_cover(*wl, grid.n_pencils, grid.capacity)

    # Valid-pair restriction: slot a of pencil p is valid iff rank < counts[p].
    cap = grid.capacity

    def valid(slot):
        p, rank = divmod(slot, cap)
        return rank < counts[p]

    got_self = sorted(x for x in self_pairs if valid(x[0]) and valid(x[1]))
    want_self = []
    for p in range(grid.n_pencils):
        base = p * cap
        for a in range(int(counts[p])):
            for b in range(a + 1, int(counts[p])):
                want_self.append((base + a, base + b))
    assert got_self == sorted(want_self)
    assert len(set(self_pairs)) == len(self_pairs)  # no double cover at all

    got_nbr = sorted(x for x in nbr_pairs if valid(x[0]) and valid(x[1]))
    want_nbr = []
    for p in range(grid.n_pencils):
        for k in range(4):
            j = int(tbl[p * 4 + k])
            shx, shy = int(shf[(p * 4 + k) * 2]), int(shf[(p * 4 + k) * 2 + 1])
            for a in range(int(counts[p])):
                for b in range(int(counts[j])):
                    want_nbr.append((p * cap + a, j * cap + b, shx, shy))
    assert got_nbr == sorted(want_nbr)
    assert len(set(nbr_pairs)) == len(nbr_pairs)


@pytest.mark.parametrize("extended", [False, True])
def test_width_kernel_matches_static_kernel(extended):
    """fused_pencil_width_chunk == fused_pencil_chunk on the same slot
    state (f64 interpret), at a density whose counts straddle the 128
    boundary so both width classes are populated."""
    import numpy as np

    from ljmd_tpu.ops.cell_list import bin_to_slots, make_pencil_grid
    from ljmd_tpu.ops.pallas_pencil2 import build_half_shell_tables, sentinel_fill
    from ljmd_tpu.ops.pallas_pencil_fused import (
        build_width_lists,
        fused_pencil_chunk,
        fused_pencil_width_chunk,
    )

    rng = np.random.default_rng(3)
    n, L = 2048, 13.4
    grid = make_pencil_grid(n, L, 2.9, n / L**3)
    assert grid.capacity // 128 >= 2
    # Jittered lattice, NOT uniform-random: random placements contain
    # near-overlaps whose r^-13 forces amplify the two kernels' different
    # summation order to ~1e-6 even in f64; bounded forces keep the
    # comparison at roundoff. The jitter still pushes boundary particles
    # across pencils, so counts straddle 128 (both width classes run).
    r = fcc_lattice(8, L, dtype=jnp.float64)
    r = (r + jnp.asarray(rng.normal(0, 0.05, size=(n, 3)))) % L
    slot, ovf = bin_to_slots(r, grid)
    assert not bool(ovf)
    ns = grid.n_slots
    r8 = jnp.zeros((8, ns + 1)).at[0:3, slot].set(r.T)[:, :ns]
    valid = jnp.zeros((ns + 1,)).at[slot].set(1.0)[:ns]
    r8 = r8.at[3].set(valid)
    r8 = sentinel_fill(r8, valid, grid.capacity)
    v8 = jnp.zeros((8, ns)).at[0:3].set(
        jnp.asarray(rng.normal(0, 1.0, size=(3, ns)))) * valid
    a8 = jnp.zeros((8, ns))
    counts = valid.reshape(grid.n_pencils, grid.capacity).sum(1).astype(jnp.int32)
    w = np.asarray((counts + 127) // 128)
    assert (w == 1).any() and (w >= 2).any(), "degenerate width test"

    tbl, shf = build_half_shell_tables(grid)
    tbl, shf = jnp.asarray(tbl), jnp.asarray(shf)
    wl = build_width_lists(counts, tbl, shf, grid.n_pencils, grid.capacity)

    ext = dict(r_lo=jnp.zeros((8, ns)), vc=jnp.zeros((8, ns))) if extended else {}
    out_a = fused_pencil_chunk(
        r8, v8, a8, tbl, shf, grid.n_pencils, grid.capacity,
        L, 6.25, 0.004, 3, interpret=True, approx_reciprocal=False, **ext,
    )
    out_b = fused_pencil_width_chunk(
        r8, v8, a8, *wl, grid.n_pencils, grid.capacity,
        L, 6.25, 0.004, 3, interpret=True, approx_reciprocal=False, **ext,
    )
    for xa, xb in zip(out_a, out_b):
        # Relative: the two kernels sum the same pair forces in different
        # orders, so agreement is to f64 roundoff of the row magnitude.
        scale = max(1.0, float(jnp.max(jnp.abs(xa))))
        da = float(jnp.max(jnp.abs(xa - xb) * (valid[None, :] > 0)))
        assert da < 1e-12 * scale, (da, scale)


@pytest.mark.parametrize(
    "compensated",
    [False, pytest.param(True, marks=pytest.mark.slow)],
)
def test_width_lists_engine_matches_per_step(compensated):
    """width_lists=True run_fast == the per-step sweep across rebins (the
    full plumbing: init lists, rebin list refresh, chunked width kernel)."""
    cfg = config_from_density(
        num_cells=6, density=0.8442, dt=0.005, dtype="float64",
        neighbor_skin=0.4,
    )
    eng = _cellpair_engine(cfg, compensated=compensated, width_lists=True)
    assert eng.run_fast is not None
    step1 = jax.jit(lambda c: eng.step_fast(c)[0])
    c0, _ = eng.init(_liquid_state(cfg, 1.2))
    for _ in range(6):
        c0 = step1(c0)

    # 9 = one full inner chunk (8, rebin at its head) + remainder chunk
    n_steps = 9
    ca = c0
    for _ in range(n_steps):
        ca = step1(ca)
    cb = jax.jit(lambda c: eng.run_fast(c, n_steps))(c0)

    sa, sb = eng.get_state(ca), eng.get_state(cb)
    assert not bool(cb.overflow)
    for name in ("r", "ru", "v"):
        da = float(jnp.max(jnp.abs(getattr(sa, name) - getattr(sb, name))))
        assert da < 1e-10, f"{name} diverged: {da}"
    assert float(jnp.max(jnp.abs(sa.a - sb.a))) < 1e-8
