"""Row-layout Pallas engine (interpret mode) vs dense engine parity."""

import jax
import numpy as np

from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _pallas_rows_engine, make_engine
from ljmd_tpu.models.simulation import initialize


def test_triangular_sweep_matches_full_sweep():
    import jax.numpy as jnp
    import numpy as np_

    from ljmd_tpu.ops.pallas_lj import _round_up, pallas_pair_sweep, pallas_pair_sweep_tri

    rng = np_.random.default_rng(0)
    n, L, rc = 300, 7.0, 2.5
    n_pad = _round_up(n, 128)
    pos = jnp.zeros((8, n_pad), jnp.float64).at[0:3, :n].set(
        jnp.asarray(rng.uniform(0, L, (3, n)))
    )
    full = pallas_pair_sweep(pos, n, L, rc * rc, tile_i=8, tile_j=128, interpret=True)
    tri = pallas_pair_sweep_tri(pos, n, L, rc * rc, tile_i=8, tile_j=128, interpret=True)
    # forces identical; scalar rows: tri counts each pair once = full/2
    np.testing.assert_allclose(np.asarray(tri[0:3]), np.asarray(full[0:3]), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(2 * tri[3:6].sum(axis=1)), np.asarray(full[3:6].sum(axis=1)), rtol=1e-10)


def test_pallas_rows_engine_matches_dense_trajectory():
    cfg = config_from_density(
        num_cells=2, density=0.7, dt=0.002, dtype="float64",
        total_steps=50, warmup_steps=0, target_total_energy=-60.0,
    )
    state = initialize(cfg, backend="dense")

    dense = make_engine(cfg, "dense")
    rows = _pallas_rows_engine(cfg, interpret=True)

    cd, od = dense.init(state)
    cr, orows = rows.init(state)
    np.testing.assert_allclose(float(orows.epot), float(od.epot), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(rows.get_state(cr).a), np.asarray(dense.get_state(cd).a),
        rtol=1e-10, atol=1e-10,
    )

    def run(engine, c, n):
        def body(carry, _):
            return engine.step(carry)
        return jax.lax.scan(body, c, None, length=n)

    cd, obs_d = jax.jit(lambda c: run(dense, c, 20))(cd)
    cr, obs_r = jax.jit(lambda c: run(rows, c, 20))(cr)
    np.testing.assert_allclose(np.asarray(obs_r.epot), np.asarray(obs_d.epot), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(obs_r.ekin), np.asarray(obs_d.ekin), rtol=1e-9)
    sd = dense.get_state(cd)
    sr = rows.get_state(cr)
    for k in ("r", "ru", "v", "a"):
        np.testing.assert_allclose(
            np.asarray(getattr(sr, k)), np.asarray(getattr(sd, k)),
            rtol=1e-9, atol=1e-9, err_msg=k,
        )
