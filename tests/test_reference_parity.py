"""Cross-implementation parity: the REFERENCE's own Python analyzer
(/root/reference/scripts/md_one_run_analysis.py) is executed on artifacts
produced by THIS framework, and its derived quantities are compared against
our on-device analysis (SURVEY §4 oracle (i), file-contract level).

This exercises the full artifact surface end to end: the reference reads our
instantaneous_energies.dat, corr_*.dat, md_final_results.txt, and the binary
rva.dat, then computes MSD/VACF/diffusion/ACF-timescales with its own code.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from ljmd_tpu.config import config_from_density
from ljmd_tpu.io.artifacts import write_run_artifacts
from ljmd_tpu.models.simulation import simulate

REF_SCRIPT = "/root/reference/scripts/md_one_run_analysis.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_SCRIPT), reason="reference script not mounted"
)


@pytest.fixture(scope="module")
def run_with_reference_analysis(tmp_path_factory):
    cfg = config_from_density(
        num_cells=2, density=0.6, total_steps=400, output_interval=10,
        warmup_steps=100, dt=0.002, dtype="float64",
        target_total_energy=-60.0, seed=11,
    )
    out = simulate(cfg, backend="dense", record_frames=True)
    root = tmp_path_factory.mktemp("refparity")
    run_dir = root / "outputs" / "one_run"
    write_run_artifacts(str(run_dir), cfg, out)

    env = dict(os.environ)
    env["MPLBACKEND"] = "Agg"
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [
            sys.executable, REF_SCRIPT,
            "--root", str(root),
            "--msd-fit-frac", "0.5",
            "--vacf-tmax-frac", "1.0",
            "--origin-stride", "1",
        ],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    with open(run_dir / "analysis" / "summary.json") as f:
        ref_summary = json.load(f)
    return cfg, out, str(run_dir), ref_summary


def test_reference_reads_our_series_and_final_results(run_with_reference_analysis):
    cfg, out, run_dir, ref = run_with_reference_analysis
    assert ref["n_samples_instantaneous"] == cfg.n_samples
    assert ref["dt_sample_from_instantaneous"] == pytest.approx(
        cfg.dt * cfg.output_interval, rel=1e-9
    )
    parsed = ref["final_results_parsed"]
    # the reference regex parser keys means by their literal labels
    assert parsed["num_particles"] == cfg.n
    assert parsed["<Epot>"] == pytest.approx(float(out.means.mean("epot")), rel=1e-10)
    assert parsed["<Epot>_std"] == pytest.approx(float(out.means.std("epot")), rel=1e-10)
    assert parsed["<P>"] == pytest.approx(float(out.means.mean("press")), rel=1e-10)
    assert parsed["Temperature"] == pytest.approx(
        float(out.thermo(cfg).temperature), rel=1e-10
    )


def test_reference_diffusion_matches_ours(run_with_reference_analysis):
    """The reference computes MSD/VACF/Einstein/Green-Kubo from our rva.dat
    with its own NumPy code; our on-device analysis must agree to float
    tolerance (identical estimators by construction)."""
    from ljmd_tpu.analysis.report import analyze_run

    cfg, out, run_dir, ref = run_with_reference_analysis
    ours = analyze_run(
        run_dir, msd_fit_frac=0.5, vacf_tmax_frac=1.0, origin_stride=1,
        make_plots=False,
    )
    rva = ref["rva_stats"]
    traj = ours["trajectory"]
    assert rva["D_from_MSD_tau_fit"] == pytest.approx(traj["D_einstein"], rel=1e-8)
    assert rva["D_from_VACF_tau_int"] == pytest.approx(traj["D_green_kubo"], rel=1e-8)
    assert rva["max_lag_used"] == traj["max_lag"]


def test_reference_acf_timescales_match_ours(run_with_reference_analysis):
    from ljmd_tpu.analysis.report import analyze_run

    cfg, out, run_dir, ref = run_with_reference_analysis
    ours = analyze_run(run_dir, make_plots=False)
    for obs, d in ref["acf_tau_estimates"].items():
        if obs not in ours["acf"]:
            continue
        ref_tau_int = d.get("tau_int")
        our_tau_int = ours["acf"][obs]["tau_int"]
        if ref_tau_int is not None and np.isfinite(our_tau_int):
            assert ref_tau_int == pytest.approx(our_tau_int, rel=1e-8), obs
        ref_tau_1e = d.get("tau_1e")
        our_tau_1e = ours["acf"][obs]["tau_1e"]
        if ref_tau_1e is not None and not (
            ref_tau_1e != ref_tau_1e or our_tau_1e != our_tau_1e  # NaN-safe
        ):
            assert ref_tau_1e == pytest.approx(our_tau_1e, rel=1e-8), obs
