"""The example configs (BASELINE state points) parse, validate, and — where
CPU-feasible — run end to end with shrunk step counts."""

import glob
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from ljmd_tpu.config import load_config
from ljmd_tpu.models.simulation import simulate
from ljmd_tpu.parallel.ensemble import ensemble_simulate

EXAMPLES = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "examples", "*.json")))


def test_examples_present():
    names = {os.path.basename(p) for p in EXAMPLES}
    assert {
        "n256_rho0.8.json",
        "n864_liquid.json",
        "n4000_production.json",
        "ensemble64.json",
        "n62500_large.json",
        "reference_default.json",
    } <= names


@pytest.mark.parametrize("path", EXAMPLES)
def test_examples_parse_and_validate(path):
    cfg = load_config(path)
    assert cfg.n == 4 * cfg.num_cells**3
    assert cfg.rc < 0.5 * cfg.box_length
    assert cfg.n_samples > 0


def test_n256_runs_end_to_end():
    cfg = load_config(
        os.path.join(os.path.dirname(EXAMPLES[0]), "n256_rho0.8.json"),
        total_steps=300, warmup_steps=50, output_interval=10, dtype="float64",
    )
    out = simulate(cfg, backend="auto")
    assert bool(jnp.isfinite(out.series).all())
    # density/state point sanity: U/N for LJ at rho*=0.8 near T*~1 is O(-5)
    u_per_n = float(out.means.mean("epot")) / cfg.n
    assert -8.0 < u_per_n < -3.0
    out.thermo(cfg).check_finite()


def test_ensemble64_shrunk():
    cfg = load_config(
        os.path.join(os.path.dirname(EXAMPLES[0]), "ensemble64.json"),
        total_steps=60, warmup_steps=10, output_interval=10,
        num_cells=2, box_length=3.42, rc_over_box=0.45,
        target_total_energy=-100.0, dtype="float64",
    )
    out = ensemble_simulate(cfg, n_replicas=6, backend="dense")
    assert out.replica_means.shape[0] == 6
    assert bool(out.replica_ok.all())
    assert int(out.n_ok) == 6


def test_diverged_replica_excluded():
    """Force one replica to blow up; aggregation must mask it out."""
    from ljmd_tpu.parallel.ensemble import ensemble_aggregate
    from ljmd_tpu.config import config_from_density
    from ljmd_tpu.models.simulation import initialize, run_production
    import jax

    cfg = config_from_density(
        num_cells=2, density=0.6, total_steps=20, output_interval=10,
        warmup_steps=10, dt=0.002, dtype="float64", target_total_energy=-60.0,
    )

    def one(k):
        state = initialize(cfg, k, backend="dense")
        return run_production(cfg, state, backend="dense")

    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    results = jax.vmap(one)(keys)
    # poison replica 1's means
    poisoned = results.means.means.at[1].set(jnp.nan)
    import dataclasses

    results = dataclasses.replace(
        results, means=dataclasses.replace(results.means, means=poisoned)
    )
    agg = ensemble_aggregate(cfg, results)
    assert not bool(agg.replica_ok[1])
    assert int(agg.n_ok) == 2
    good = np.asarray(results.means.means)[np.array([0, 2])]
    np.testing.assert_allclose(np.asarray(agg.mean_of_means), good.mean(axis=0), rtol=1e-12)
    assert bool(jnp.isfinite(agg.mean_of_means).all())
