"""TPU etot-conservation check for the pencil engine's rebin/chunk graph.

Two silent v5e XLA miscompiles were found in this graph on 2026-08-18
(docs/RESULTS.md "v5e XLA miscompiles in the rebin graph"): searchsorted
returning corrupt counts next to a live scan, and scan-wrapped sweeps
downstream of the gather rebin injecting energy. Both are invisible to the
CPU test suite and to layout-equality checks — only an energy-conservation
run on real TPU hardware catches them. Run this after ANY change to
rebin_gather / _permute_rebin / the chunk loop structure:

    timeout 1800 python scripts/check_conservation.py

PASS criteria (printed per config): |d| stays < 2e-3 with no secular
blow-up and ovf=False at N=131072 (cap 640 holds the perturbed lattice);
at N=62500 cap=384 the FCC aliasing overflow fires by design (equilibrated
runs override capacity; lattice needs 512) — there the check is fused vs
unfused agreement, not the flag.
"""

import dataclasses as _dc
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ljmd_tpu.config import config_from_density
from ljmd_tpu.models.engine import _cellpair_engine
from ljmd_tpu.models.lattice import (
    fcc_lattice,
    random_velocities,
    remove_com_velocity,
)
from ljmd_tpu.state import MDState


def perturbed_fcc_state(cfg, seed=5):
    n, L = cfg.n, cfg.box_length
    r = fcc_lattice(cfg.num_cells, L, dtype=jnp.float32)
    rng = np.random.default_rng(seed)
    r = r + jnp.asarray(rng.uniform(-0.03, 0.03, (n, 3)), jnp.float32)
    r = r - L * jnp.floor(r / L)
    v = remove_com_velocity(
        random_velocities(jax.random.PRNGKey(0), n, dtype=jnp.float32)
    )
    v = v * jnp.sqrt(0.728 / (jnp.sum(v * v) / (3 * n)))
    return MDState(r=r, ru=r, v=v, a=jnp.zeros_like(r))


def trace(label, eng, state, n_chunks=8, chunk=8):
    n = state.r.shape[0]
    c, _ = eng.init(state)
    adv = jax.jit(lambda cc: eng.run_fast(cc, chunk))
    step_j = jax.jit(eng.step)
    e0 = None
    worst = 0.0
    for k in range(n_chunks):
        c = adv(c)
        _, ob = step_j(c)
        et = float(ob.epot + ob.ekin)
        if e0 is None:
            e0 = et
        worst = max(worst, abs((et - e0) / e0))
    ovf = bool(jax.device_get(c.overflow))
    print(f"{label:42s}: etot/N {et / n:+.6f} worst|d| {worst:.2e} "
          f"ovf={ovf}", flush=True)
    return et, worst, ovf


def main():
    print("devices:", jax.devices(), flush=True)

    cfg = config_from_density(num_cells=32, density=0.8442, dt=0.001,
                              dtype="float32", neighbor_skin=0.49)
    st = perturbed_fcc_state(cfg)
    for trig in ("always", "never"):
        eng = _cellpair_engine(cfg, rebin_trigger=trig, compensated=False)
        trace(f"N=131072 chunked trig={trig}", eng, st)

    cfg = config_from_density(num_cells=25, density=0.8442, dt=0.001,
                              dtype="float32", neighbor_skin=0.49)
    cfg = _dc.replace(cfg, neighbor_capacity=384)
    st = perturbed_fcc_state(cfg)
    ets = {}
    variants = (
        ("fused", dict(use_fused=True)),
        ("fused-width", dict(use_fused=True, width_lists=True)),
        ("unfused", dict(use_fused=False)),
    )
    for name, kw in variants:
        eng = _cellpair_engine(cfg, rebin_trigger="always",
                               compensated=False, **kw)
        ets[name], _, _ = trace(f"N=62500 {name}", eng, st)
    for name in ("fused", "fused-width"):
        rel = abs(ets[name] - ets["unfused"]) / abs(ets["unfused"])
        print(f"{name}-vs-unfused agreement: {rel:.2e} (want < 1e-4)",
              flush=True)

    # x-strip mono at N=256000 (3 strips): the strips leg of the
    # miscompile protocol — agreement with the grid-sweep path.
    cfg = config_from_density(num_cells=40, density=0.8442, dt=0.001,
                              dtype="float32", neighbor_skin=0.49)
    st = perturbed_fcc_state(cfg)
    es = {}
    for mono in (True, False):
        eng = _cellpair_engine(cfg, rebin_trigger="always", mono=mono,
                               compensated=False)
        es[mono], _, _ = trace(
            f"N=256000 {'strips' if mono else 'grid'}", eng, st, n_chunks=4)
    rel = abs(es[True] - es[False]) / abs(es[False])
    print(f"strips-vs-grid agreement: {rel:.2e} (want < 1e-4)", flush=True)


if __name__ == "__main__":
    main()
