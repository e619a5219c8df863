"""Benchmark: particle-steps/sec/chip for the flagship N=4000 LJ fluid.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

The reference publishes no timing numbers (SURVEY §6); ``vs_baseline`` is
therefore reported against the driver-supplied north-star target of
1e9 particle-steps/sec/chip at N~4096 (BASELINE.json), i.e.
vs_baseline = value / 1e9.

Measures the fully-jitted production path: a lax.scan over velocity-Verlet
steps with the Pallas tiled force kernel (auto backend -> Pallas on TPU),
timed by fetching a data-dependent scalar (robust against async dispatch).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

NORTH_STAR = 1.0e9  # particle-steps/sec/chip (BASELINE.json)


def main() -> None:
    from ljmd_tpu.config import config_from_density
    from ljmd_tpu.models.engine import make_engine
    from ljmd_tpu.models.lattice import (
        fcc_lattice,
        random_velocities,
        remove_com_velocity,
    )
    from ljmd_tpu.state import MDState

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"

    cfg = config_from_density(
        num_cells=10 if on_tpu else 4,  # N = 4000 on TPU; N = 256 CPU smoke
        density=0.8442,
        dt=0.005,
        dtype="float32",
    )
    backend = "auto" if on_tpu else "dense"
    n_steps = 2000 if on_tpu else 100

    dtype = jnp.float32
    r = fcc_lattice(cfg.num_cells, cfg.box_length, dtype=dtype)
    v = remove_com_velocity(
        random_velocities(jax.random.PRNGKey(0), cfg.n, dtype=dtype)
    )
    # scale to T* ~ 0.728 (the classic liquid point)
    v = v * jnp.sqrt(0.728 / (jnp.sum(v * v) / (3 * cfg.n)))
    state = MDState(r=r, ru=r, v=v, a=jnp.zeros_like(r))

    engine = make_engine(cfg, backend)
    carry, _ = engine.init(state)

    # Production-representative loop: the driver runs the un-sampled steps
    # through run_fast (fused multi-step kernels) when the engine has one.
    def make_run(k):
        if engine.run_fast is not None:
            @jax.jit
            def run(c):
                return engine.run_fast(c, k)
        else:
            step_hot = engine.step_fast or engine.step

            @jax.jit
            def run(c):
                def body(cc, _):
                    cc2, ob = step_hot(cc)
                    return cc2, None

                out, _ = jax.lax.scan(body, c, None, length=k)
                return out
        return run

    def sync_scalar(c):
        # data-dependent fetch: robust sync even where block_until_ready is
        # unreliable (axon tunnel)
        return float(jnp.sum(engine.get_state(c).v[0]))

    # DIFFERENTIAL timing: each timed dispatch+fetch through the axon
    # tunnel carries a large fixed cost (~30 ms measured with an empty
    # kernel — scripts/exp_* round 2), so a single absolute measurement of
    # an n-step run overstates the per-step time by 30ms/n. Timing two run
    # lengths and taking the slope cancels the fixed cost exactly.
    n_long = 4 * n_steps if on_tpu else 2 * n_steps
    run_short = make_run(n_steps)
    run_long = make_run(n_long)

    # warmup/compile + short equilibration
    carry = run_short(carry)
    _ = sync_scalar(carry)
    carry = run_long(carry)
    _ = sync_scalar(carry)

    slopes = []
    for _ in range(3):
        t0 = time.perf_counter()
        carry = run_short(carry)
        _ = sync_scalar(carry)
        t1 = time.perf_counter()
        carry = run_long(carry)
        _ = sync_scalar(carry)
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (n_long - n_steps))
    # median: a single timer hiccup in either segment poisons min/max
    slopes.sort()
    slope = slopes[len(slopes) // 2]
    best = cfg.n / slope if slope > 0 else 0.0

    # quick energy sanity on the final state
    _, obs = engine.step(carry)
    etot_per_n = (float(obs.epot) + float(obs.ekin)) / cfg.n

    result = {
        "metric": f"particle-steps/sec/chip (LJ NVE, N={cfg.n}, rho*=0.8442, rc=2.5, f32, {backend})",
        "value": best,
        "unit": "particle-steps/s",
        "vs_baseline": best / NORTH_STAR,
        "platform": platform,
        "n": cfg.n,
        "steps_timed": n_steps + n_long,
        "timing": "differential (slope of two run lengths; cancels the ~30ms fixed dispatch+fetch cost of the TPU tunnel)",
        "note": "N=4000 (=4*10^3 FCC cells): the closest 4k^3 lattice to the BASELINE N~4096 target (4096 is not reachable as 4k^3)",
        "etot_per_particle": etot_per_n,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # surface failures as a JSON line too
        print(json.dumps({
            "metric": "particle-steps/sec/chip",
            "value": 0.0,
            "unit": "particle-steps/s",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}",
        }))
        sys.exit(1)
