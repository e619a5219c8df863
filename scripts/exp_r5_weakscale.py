"""Round-5: quantitative weak-scaling model for the sharded pencil engine
(VERDICT round-4 item 4).

The sharded pencil engine (parallel/spatial_pencil.py) gives each of d
devices a contiguous strip of m/d pencil x-columns plus ONE ppermute'd halo
column. Per-device, per-step cost decomposes as

  t(d) = pair(P_loc * 5 * cap^2 candidate slots) / R_pair     [the sweep]
       + halo_bytes / BW_ici                                  [2 x (8, m*cap)]
       + glue                                                  [launch etc.]

with P_loc = m^2/d — the sweep term scales exactly 1/d because the
half-shell visit count per i-pencil (1 self + 4 neighbors) is strip-size
independent; the halo term is d-INDEPENDENT (one column each way per step
regardless of d); the global per-chunk rebin is NOT divided (documented
caveat in the module header).

Part 1 (census, numpy): per-device candidate slots + halo traffic for
N in {62500, 131072, 262144} x d in {1, 2, 4, 8}, with R_pair calibrated
from the MEASURED single-chip mono numbers (docs/CEILINGS.md) so d=1
reproduces hardware. Emits the predicted per-chip throughput table.

Part 2 (validation, virtual CPU mesh): on the 1-core host, all shards
execute SERIALLY, so total wall time measures TOTAL work — if per-device
work is ~1/d, total stays ~flat in d (the halo adds m*cap slots per device,
so total grows by the modeled halo fraction). Timed at N=4000 (m=6 grid),
d in {1, 2, 3}, jnp path — the largest config the rendezvous limit
tolerates (CLAUDE.md).

Usage: python scripts/exp_r5_weakscale.py [--validate]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RC = 2.5
SKIN = 0.49
RHO = 0.8442
DT = 0.005

# Measured single-chip calibration (docs/CEILINGS.md, v5e differential):
# N=62500 mono per-step 4.62e7 ps/s => 1353 us/step at cap=384. The sweep
# sweeps P * 5 * cap^2 candidate slots; glue/launch is ~tens of us.
CAL_N = 62500
CAL_T_US = 62500 / 4.62e7 * 1e6  # 1353 us
GLUE_US = 36.0                   # the exp_slab2d_model fixed term
ICI_GBPS = 45.0                  # v5e per-link ICI ~45 GB/s effective


def geometry(n_particles, cap_override=None, d=1, skin_min=0.3):
    """Pencil grid for N at d devices: m is the LARGEST multiple of d whose
    pencil width L/m still covers rc + skin_min (a real deployment picks
    skin to make the grid divide the mesh; wider pencils = fewer, fatter
    columns = more slots — the model charges that honestly)."""
    L = (n_particles / RHO) ** (1 / 3)
    m_max = int(np.floor(L / (RC + skin_min)))
    m = (m_max // d) * d
    if m < 3:
        return L, 0, 0
    mean = n_particles / (m * m)
    # census capacity: equilibrated-fluid rule from ops/cell_list.py
    need = int(mean + 3.5 * mean ** 0.5) + 1
    cap = cap_override or max(128, -(-need // 128) * 128)
    return L, m, cap


def main():
    # calibrate the pair rate from the measured d=1 point
    _, m0, cap0 = geometry(CAL_N, cap_override=384)
    slots0 = m0 * m0 * 5 * cap0 * cap0
    r_pair = slots0 / ((CAL_T_US - GLUE_US) * 1e-6)  # candidate slots / s
    print(f"calibration: N={CAL_N} m={m0} cap={cap0} slots={slots0/1e6:.1f}M "
          f"-> R_pair = {r_pair/1e9:.1f} Gslots/s "
          f"(measured {CAL_T_US:.0f} us/step)", flush=True)

    print("\n# Weak-scaling prediction table (sharded pencil, v5e)")
    print("| N | d | m | cap | P_loc | slots/dev | halo MB/step | "
          "t_pred us | per-chip ps/s | halo % | ideal 1/d % |")
    print("|---|---|---|---|---|---|---|---|---|---|---|")
    for n_particles in (62500, 131072, 262144):
        t1 = None
        for d in (1, 2, 4, 8):
            L, m, cap = geometry(n_particles, d=d)
            if m == 0:
                continue
            p_loc = (m // d) * m
            slots = p_loc * 5 * cap * cap
            halo_bytes = 2 * 8 * m * cap * 4  # out + reactions back
            t_pair = slots / r_pair * 1e6
            t_halo = halo_bytes / (ICI_GBPS * 1e9) * 1e6 if d > 1 else 0.0
            t = t_pair + t_halo + GLUE_US
            if t1 is None:
                t1 = t
            rate = n_particles / (t * 1e-6)
            halo_frac = t_halo / t * 100
            ideal = t1 / (d * t) * 100
            print(f"| {n_particles} | {d} | {m} | {cap} | {p_loc} | "
                  f"{slots/1e6:.1f}M | {halo_bytes/1e6:.2f} | {t:.0f} | "
                  f"{rate:.2e} | {halo_frac:.1f} | {ideal:.0f} |", flush=True)

    if "--validate" not in sys.argv:
        print("\n(run with --validate for the virtual-CPU-mesh total-work check)")
        return

    # ---- Part 2: virtual-mesh validation (total work ~ flat in d) ----
    import time

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from bench_matrix import melt
    from ljmd_tpu.config import config_from_density
    from ljmd_tpu.parallel.mesh import PARTICLE_AXIS
    from ljmd_tpu.parallel.spatial_pencil import make_sharded_pencil_engine

    cfg = config_from_density(num_cells=10, density=RHO, rc=1.5,
                              dt=DT, dtype="float32", neighbor_skin=0.4)
    # rc=1.5 + skin 0.4 -> m = floor(16.79/1.9) = 8: divisible by 1/2/4
    st = melt(cfg, cycles=1, steps=100)
    print(f"\n# validation: N={cfg.n} jnp sharded-pencil, total wall on 1 core")
    for d in (1, 2, 4):
        mesh = Mesh(np.array(jax.devices()[:d]), (PARTICLE_AXIS,))
        eng = make_sharded_pencil_engine(cfg, mesh, use_pallas=False,
                                         inner_chunk=8)
        c, _ = eng.init(st)
        run = jax.jit(lambda cc: eng.run_fast(cc, 16))
        c2 = run(c)
        float(jnp.sum(c2.v))  # warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            c2 = run(c)
            float(jnp.sum(c2.v))
            ts.append(time.perf_counter() - t0)
        t_med = sorted(ts)[1]
        print(f"d={d}: total {t_med*1e3:8.1f} ms /16 steps "
              f"(per-device-equivalent {t_med/d*1e3:8.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
