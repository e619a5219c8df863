"""Text/JSON artifact writers + parsers: the reference's file-based
observability contract (SURVEY §5.5), plus machine-friendly JSON.

Mirrored files (same columns/headers so the reference's analysis tooling —
or ours — can read either implementation's output):

- ``instantaneous_energies.dat``: '# time epot ekin etot T P'
  (md_simulation_program.f90:294,374)
- ``corr_<obs>.dat`` / ``corrmean_<obs>.dat``: '# lag C(lag) C_norm(lag)'
  (md_simulation_program.f90:594-634)
- ``md_final_results.txt``: APPEND-mode human summary (reruns accumulate
  blocks; parsers take the last block — md_simulation_program.f90:531-560,
  md_one_run_analysis.py:117-121)
- ``means.dat`` per run (machine-friendly, from the WIP ensemble path,
  run_many_md_simuations/md_simulation.f90:736-817) — written by
  ``write_run_artifacts`` alongside the richer ``summary.json``
- ``summary.json``: full machine-readable results (the analysis layer's
  summary.json analogue, md_one_run_analysis.py:958-1012)
"""

from __future__ import annotations

import json
import os
import re
from typing import Optional

import numpy as np

from ljmd_tpu.config import SimConfig
from ljmd_tpu.stats.moments import OBSERVABLES

__all__ = [
    "write_instantaneous_series",
    "read_instantaneous_series",
    "write_corr_file",
    "append_final_results",
    "parse_final_results",
    "write_means_dat",
    "write_summary_json",
    "write_run_artifacts",
]

CORR_OBS = ("epot", "ekin", "etot", "temp", "press")


def write_instantaneous_series(path: str, times, series) -> None:
    """series: (5, n) rows epot, ekin, etot, temp, press."""
    times = np.asarray(times)
    series = np.asarray(series)
    with open(path, "w") as f:
        f.write("# time   epot   ekin   etot   T   P\n")
        for k in range(times.shape[0]):
            row = "  ".join(f"{v: .6e}" for v in series[:, k])
            f.write(f"{times[k]: .6e}  {row}\n")


def read_instantaneous_series(path: str):
    data = np.loadtxt(path)
    data = np.atleast_2d(data)
    return data[:, 0], data[:, 1:].T  # times, (5, n)


def write_corr_file(path: str, corr, corr_norm, block_mean: bool = False) -> None:
    corr = np.asarray(corr)
    corr_norm = np.asarray(corr_norm)
    header = (
        "# lag   <C(lag)>_blocks   <C_norm(lag)>_blocks"
        if block_mean
        else "# lag   C(lag)   C_norm(lag)"
    )
    with open(path, "w") as f:
        f.write(header + "\n")
        for lag in range(corr.shape[0]):
            f.write(f"{lag:8d}  {corr[lag]: .12e}  {corr_norm[lag]: .12e}\n")


def append_final_results(path: str, cfg: SimConfig, means_named: dict, thermo: dict) -> None:
    """Append one summary block in the reference's layout (same field names,
    append semantics preserved)."""

    def e(x):
        return f"{float(x): .12e}"

    lines = [
        "************** MD PRODUCTION RESULTS **************",
        f"num_particles: {cfg.n}",
        f"num_cells: {cfg.num_cells}",
        f"box_length: {e(cfg.box_length)}",
        f"volume: {e(cfg.volume)}",
        f"density: {e(cfg.density)}",
        f"time_step: {e(cfg.dt)}",
        f"output_interval: {cfg.output_interval}",
        f"total_steps: {cfg.total_steps}",
        f"warmup_steps: {cfg.warmup_steps}",
        "-------------------- Averages --------------------",
        f"<Epot>: {e(means_named['epot'][0])}  std: {e(means_named['epot'][1])}",
        f"<Ekin>: {e(means_named['ekin'][0])}  std: {e(means_named['ekin'][1])}",
        f"<Etot>: {e(means_named['etot'][0])}  std: {e(means_named['etot'][1])}",
        f"<T>   : {e(means_named['temp'][0])}  std: {e(means_named['temp'][1])}",
        f"<P>   : {e(means_named['press'][0])}  std: {e(means_named['press'][1])}",
        "-------------- Thermodynamic coefficients --------------",
        f"Temperature: {e(thermo['temperature'])}  Pressure: {e(thermo['pressure'])}",
        f"Ca_v: {e(thermo['Ca_v'])}  Ce_v: {e(thermo['Ce_v'])}",
        f"Ca_p: {e(thermo['Ca_p'])}  Ce_p: {e(thermo['Ce_p'])}",
        f"kappa_S: {e(thermo['K_S_inv'])}  kappa_T: {e(thermo['K_T_inv'])}  Gamma: {e(thermo['gamma'])}",
        f"Alpha_E1: {e(thermo['alpha_E1'])}  Alpha_E2: {e(thermo['alpha_E2'])}",
        f"Alpha_S: {e(thermo['alpha_S'])}  Alpha_P: {e(thermo['alpha_P'])}",
        "--------------------------------------------------------",
        "",
    ]
    with open(path, "a") as f:
        f.write("\n".join(lines) + "\n")


_NUM = r"([-+]?[0-9]*\.?[0-9]+(?:[eEdD][-+]?[0-9]+)?)"


def _to_float(tok: str) -> float:
    return float(tok.replace("D", "e").replace("d", "e"))


def parse_final_results(path: str) -> Optional[dict]:
    """Tolerant parser of md_final_results.txt: takes the LAST block,
    handles Fortran D-exponents (the reference parser's behavior,
    md_one_run_analysis.py:107-167)."""
    if not os.path.exists(path):
        return None
    text = open(path).read()
    blocks = text.split("************** MD PRODUCTION RESULTS **************")
    if len(blocks) < 2:
        return None
    block = blocks[-1]
    out: dict = {}
    patterns = {
        "num_particles": r"num_particles:\s*(\d+)",
        "epot_mean": rf"<Epot>:\s*{_NUM}",
        "ekin_mean": rf"<Ekin>:\s*{_NUM}",
        "etot_mean": rf"<Etot>:\s*{_NUM}",
        "temp_mean": rf"<T>\s*:\s*{_NUM}",
        "press_mean": rf"<P>\s*:\s*{_NUM}",
        "temperature": rf"Temperature:\s*{_NUM}",
        "Ca_v": rf"Ca_v:\s*{_NUM}",
        "Ca_p": rf"Ca_p:\s*{_NUM}",
        "kappa_S": rf"kappa_S:\s*{_NUM}",
        "kappa_T": rf"kappa_T:\s*{_NUM}",
        "gamma": rf"Gamma:\s*{_NUM}",
        "alpha_E1": rf"Alpha_E1:\s*{_NUM}",
        "alpha_E2": rf"Alpha_E2:\s*{_NUM}",
        "alpha_S": rf"Alpha_S:\s*{_NUM}",
        "alpha_P": rf"Alpha_P:\s*{_NUM}",
    }
    for key, pat in patterns.items():
        m = re.search(pat, block)
        if m:
            out[key] = int(m.group(1)) if key == "num_particles" else _to_float(m.group(1))
    return out or None


def write_means_dat(
    path: str,
    cfg: SimConfig,
    means_named: dict,
    thermo: dict,
    num_samples: int,
) -> None:
    """Per-run machine-friendly means file in the WIP ensemble path's layout
    (``run_many_md_simuations/md_simulation.f90:736-817``): run parameters,
    the 5 headline means ± std, the 5 diagnostic means ± std, and the
    coefficient subset that writer emits (status='replace' semantics — the
    file is overwritten, unlike the appending md_final_results.txt)."""

    def e(x):
        return f"{float(x): .12e}"

    def ms(label, key):
        m, s = means_named[key]
        return f"{label} {e(m)}  std: {e(s)}"

    lines = [
        "# -------------------- Run parameters --------------------",
        f"num_particles: {cfg.n}",
        f"num_cells: {cfg.num_cells}",
        f"box_length: {e(cfg.box_length)}",
        f"volume: {e(cfg.volume)}",
        f"density: {e(cfg.density)}",
        f"time_step: {e(cfg.dt)}",
        f"rc_over_L: {e(cfg.rc / cfg.box_length)}",
        f"target_total_energy: {e(cfg.target_total_energy)}",
        f"output_interval: {cfg.output_interval}",
        f"total_steps: {cfg.total_steps}",
        f"warmup_steps: {cfg.warmup_steps}",
        f"n_samples_md_expected: {cfg.n_samples}",
        f"num_samples_taken: {num_samples}",
        f"corr_max_lag: {cfg.corr_max_lag}",
        "# -------------------- Means and std --------------------",
        ms("<Epot>:", "epot"),
        ms("<Ekin>:", "ekin"),
        ms("<Etot>:", "etot"),
        ms("<T>  :", "temp"),
        ms("<P>  :", "press"),
        "# -------------------- Extra means and std (diagnostics) --------------------",
        ms("<1/Ekin>:", "ekin_inv"),
        ms("<d_epot>:", "d_epot"),
        ms("<dd_epot>:", "dd_epot"),
        ms("<d_epot*(1/Ekin)>:", "d_epot_ekin_inv"),
        ms("<dd_epot*(1/Ekin)>:", "dd_epot_ekin_inv"),
        "# -------------------- Thermodynamic coefficients --------------------",
        f"Temperature: {e(thermo['temperature'])}",
        f"Pressure: {e(thermo['pressure'])}",
        f"Ca_v: {e(thermo['Ca_v'])}",
        f"Ce_v: {e(thermo['Ce_v'])}",
        f"Gamma: {e(thermo['gamma'])}",
        f"K_s: {e(thermo['K_S'])}",
        f"Alpha_E1: {e(thermo['alpha_E1'])}",
        f"Alpha_E2: {e(thermo['alpha_E2'])}",
        "",
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines))


def write_summary_json(path: str, cfg: SimConfig, means_named: dict, thermo: dict, extra: dict | None = None) -> None:
    payload = {
        "config": cfg.summary(),
        "means": {k: {"mean": float(v[0]), "std": float(v[1])} for k, v in means_named.items()},
        "thermodynamic_coefficients": {k: float(v) for k, v in thermo.items()},
    }
    if extra:
        payload.update(extra)
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)


def write_run_artifacts(out_dir: str, cfg: SimConfig, result, write_frames: bool = True) -> dict:
    """Write the full per-run artifact set from a SimResult (the file-level
    parity surface of the reference's production driver). Returns the paths
    written."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}

    times = np.asarray(result.times)
    series = np.asarray(result.series)
    p = os.path.join(out_dir, "instantaneous_energies.dat")
    write_instantaneous_series(p, times, series)
    paths["instantaneous_energies"] = p

    corr = np.asarray(result.corr)
    corr_norm = np.asarray(result.corr_norm)
    corr_mean = np.asarray(result.corr_mean)
    corr_mean_norm = np.asarray(result.corr_mean_norm)
    for i, obs in enumerate(CORR_OBS):
        pc = os.path.join(out_dir, f"corr_{obs}.dat")
        write_corr_file(pc, corr[i], corr_norm[i])
        paths[f"corr_{obs}"] = pc
        pm = os.path.join(out_dir, f"corrmean_{obs}.dat")
        write_corr_file(pm, corr_mean[i], corr_mean_norm[i], block_mean=True)
        paths[f"corrmean_{obs}"] = pm

    means_named = {
        k: (float(result.means.mean(k)), float(result.means.std(k))) for k in OBSERVABLES
    }
    thermo = {k: float(v) for k, v in result.thermo(cfg).as_dict().items()}

    p = os.path.join(out_dir, "md_final_results.txt")
    append_final_results(p, cfg, means_named, thermo)
    paths["final_results"] = p

    p = os.path.join(out_dir, "means.dat")
    write_means_dat(p, cfg, means_named, thermo, num_samples=series.shape[1])
    paths["means_dat"] = p

    p = os.path.join(out_dir, "summary.json")
    write_summary_json(p, cfg, means_named, thermo)
    paths["summary"] = p

    if write_frames and result.frames is not None:
        from ljmd_tpu.io.fortran_records import write_rva

        p = os.path.join(out_dir, "rva.dat")
        write_rva(
            p,
            cfg.box_length,
            cfg.dt,
            cfg.output_interval,
            np.asarray(result.frames.r, dtype=np.float64),
            np.asarray(result.frames.ru, dtype=np.float64),
            np.asarray(result.frames.v, dtype=np.float64),
            np.asarray(result.frames.a, dtype=np.float64),
        )
        paths["rva"] = p

    return paths
