"""IO layer: Fortran record codec round-trips, artifact writers/parsers,
checkpoints, and the ran3 parity RNG."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ljmd_tpu.config import config_from_density
from ljmd_tpu.io.artifacts import (
    parse_final_results,
    read_instantaneous_series,
    write_run_artifacts,
)
from ljmd_tpu.io.checkpoint import load_checkpoint, load_rv_init, save_checkpoint, save_rv_init
from ljmd_tpu.io.fortran_records import (
    read_records,
    read_rv_init,
    read_rva,
    write_record,
    write_rv_init,
    write_rva,
)
from ljmd_tpu.models.simulation import simulate
from ljmd_tpu.state import MDState
from ljmd_tpu.stats.moments import means_init, means_update
from ljmd_tpu.utils.ran3 import Ran3, reference_initial_velocities


# ----------------------------------------------------------------------
# Fortran records
# ----------------------------------------------------------------------
@pytest.mark.parametrize("marker_bytes", [4, 8])
def test_record_roundtrip_and_marker_detection(tmp_path, marker_bytes):
    p = tmp_path / "f.dat"
    payloads = [b"hello world!", np.arange(17, dtype="<f8").tobytes()]
    with open(p, "wb") as f:
        for pay in payloads:
            write_record(f, pay, marker_bytes)
    got = read_records(str(p))
    assert got == payloads


def test_corrupt_record_raises(tmp_path):
    p = tmp_path / "bad.dat"
    p.write_bytes(b"\x0c\x00\x00\x00hello world!\x0b\x00\x00\x00")  # footer mismatch
    with pytest.raises(ValueError):
        read_records(str(p))


def test_rv_init_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    r = rng.uniform(0, 5, (20, 3))
    v = rng.normal(size=(20, 3))
    p = str(tmp_path / "rv_init.dat")
    write_rv_init(p, r, v)
    r2, v2 = read_rv_init(p, 20)
    np.testing.assert_array_equal(r, r2)
    np.testing.assert_array_equal(v, v2)
    # component-major layout on disk: record = rx(1:N), ry, rz
    recs = read_records(p)
    flat = np.frombuffer(recs[0], dtype="<f8")
    np.testing.assert_array_equal(flat[:20], r[:, 0])


def test_rva_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    n_snap, n = 3, 8
    frames = {k: rng.normal(size=(n_snap, n, 3)) for k in ("r", "ru", "v", "a")}
    p = str(tmp_path / "rva.dat")
    write_rva(p, 6.5, 0.001, 100, frames["r"], frames["ru"], frames["v"], frames["a"])
    data = read_rva(p)
    assert data.n == n and data.n_snapshots == n_snap
    assert data.box_length == pytest.approx(6.5)
    assert data.dt == pytest.approx(0.001)
    assert data.output_interval == 100
    for k in ("r", "ru", "v", "a"):
        np.testing.assert_array_equal(getattr(data, k), frames[k])


# ----------------------------------------------------------------------
# ran3 parity RNG
# ----------------------------------------------------------------------
def test_ran3_range_and_determinism():
    a = Ran3(-12345).uniform(1000)
    b = Ran3(-12345).uniform(1000)
    np.testing.assert_array_equal(a, b)
    assert (a > 0).all() and (a < 1).all()
    assert abs(a.mean() - 0.5) < 0.03
    # values are exact multiples of 1/mbig (table arithmetic is integral)
    assert np.allclose(a * 4e6, np.round(a * 4e6), atol=1e-9)


def test_ran3_different_seeds_differ():
    assert not np.array_equal(Ran3(-12345).uniform(50), Ran3(-999).uniform(50))


def test_reference_initial_velocities_shape_and_com():
    v = reference_initial_velocities(100, -12345)
    assert v.shape == (100, 3)
    assert (np.abs(v) < 0.5).all()


# ----------------------------------------------------------------------
# Artifacts
# ----------------------------------------------------------------------
@pytest.fixture(scope="module")
def sim_output(tmp_path_factory):
    cfg = config_from_density(
        num_cells=2, density=0.6, total_steps=200, output_interval=10,
        warmup_steps=40, dt=0.002, dtype="float64", target_total_energy=-60.0,
    )
    out = simulate(cfg, backend="dense", record_frames=True)
    d = tmp_path_factory.mktemp("run")
    paths = write_run_artifacts(str(d), cfg, out)
    return cfg, out, str(d), paths


def test_instantaneous_series_roundtrip(sim_output):
    cfg, out, d, paths = sim_output
    t, series = read_instantaneous_series(paths["instantaneous_energies"])
    np.testing.assert_allclose(t, np.asarray(out.times), rtol=1e-6)
    np.testing.assert_allclose(series, np.asarray(out.series), rtol=1e-5)


def test_corr_files_written(sim_output):
    cfg, out, d, paths = sim_output
    arr = np.loadtxt(paths["corr_epot"])
    assert arr.shape == (cfg.corr_max_lag + 1, 3)
    np.testing.assert_allclose(arr[:, 1], np.asarray(out.corr[0]), rtol=1e-10)
    np.testing.assert_allclose(arr[:, 2], np.asarray(out.corr_norm[0]), rtol=1e-10)
    arrm = np.loadtxt(paths["corrmean_press"])
    np.testing.assert_allclose(arrm[:, 1], np.asarray(out.corr_mean[4]), rtol=1e-10)


def test_final_results_append_and_parse(sim_output):
    cfg, out, d, paths = sim_output
    parsed = parse_final_results(paths["final_results"])
    assert parsed["num_particles"] == cfg.n
    assert parsed["epot_mean"] == pytest.approx(float(out.means.mean("epot")), rel=1e-10)
    assert parsed["gamma"] == pytest.approx(float(out.thermo(cfg).gamma), rel=1e-10)
    # append semantics: write again, parser takes the LAST block
    from ljmd_tpu.io.artifacts import append_final_results

    means_named = {k: (0.0, 0.0) for k in ("epot", "ekin", "etot", "temp", "press")}
    means_named["epot"] = (42.0, 1.0)
    thermo = {k: 1.0 for k in (
        "temperature", "pressure", "Ca_v", "Ce_v", "Ca_p", "Ce_p",
        "K_S_inv", "K_T_inv", "gamma", "alpha_E1", "alpha_E2", "alpha_S", "alpha_P",
    )}
    append_final_results(paths["final_results"], cfg, means_named, thermo)
    parsed2 = parse_final_results(paths["final_results"])
    assert parsed2["epot_mean"] == pytest.approx(42.0)


def test_rva_artifact_matches_frames(sim_output):
    cfg, out, d, paths = sim_output
    data = read_rva(paths["rva"])
    assert data.n == cfg.n
    assert data.n_snapshots == cfg.n_samples
    np.testing.assert_allclose(data.r, np.asarray(out.frames.r), rtol=1e-12)
    np.testing.assert_allclose(data.ru, np.asarray(out.frames.ru), rtol=1e-12)


def test_summary_json(sim_output):
    import json

    cfg, out, d, paths = sim_output
    with open(paths["summary"]) as f:
        s = json.load(f)
    assert s["config"]["n"] == cfg.n
    assert s["means"]["epot"]["mean"] == pytest.approx(float(out.means.mean("epot")))
    assert "Ca_v" in s["thermodynamic_coefficients"]


# ----------------------------------------------------------------------
# Checkpoints
# ----------------------------------------------------------------------
def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    state = MDState(*(jnp.asarray(rng.normal(size=(12, 3))) for _ in range(4)))
    key = jax.random.PRNGKey(99)
    acc = means_init(dtype=jnp.float64)
    from ljmd_tpu.state import StepObs

    acc = means_update(
        acc,
        StepObs(jnp.asarray(-1.0), jnp.asarray(2.0), jnp.asarray(-3.0), jnp.asarray(4.0)),
        12,
        100.0,
    )
    p = str(tmp_path / "ckpt.npz")
    save_checkpoint(p, state, step=777, key=key, means=acc)
    ck = load_checkpoint(p)
    assert ck.step == 777
    assert ck.sample_count == 1
    np.testing.assert_array_equal(np.asarray(ck.state.r), np.asarray(state.r))
    np.testing.assert_array_equal(np.asarray(ck.means.moments), np.asarray(acc.moments))
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(ck.key)), np.asarray(jax.random.key_data(key))
    )


def test_rv_init_state_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    state = MDState(*(jnp.asarray(rng.normal(size=(10, 3))) for _ in range(4)))
    p = str(tmp_path / "rv_init.dat")
    save_rv_init(p, state)
    loaded = load_rv_init(p, 10, dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(loaded.r), np.asarray(state.r))
    np.testing.assert_allclose(np.asarray(loaded.v), np.asarray(state.v))
    np.testing.assert_array_equal(np.asarray(loaded.ru), np.asarray(loaded.r))
    assert float(jnp.abs(loaded.a).max()) == 0.0
