"""Big-N rebin permute decomposition (follow-up to exp_sort).

After the unstable-sort fix the rebin bill at N=131k is still ~7.4 ms
(trig=always slope vs never floor, exp_bign re-run 2026-08-18): the sort is
only ~1.3 ms of it. The next suspect is ``_permute_stacked``'s 32-row
scatter — its docstring claims the index stream dominates (measured at
ns=75k), but 32 rows x 185k lanes x ~2.6 ns/elem would be ~15 ms of raw
element traffic if rows DO bill. Measure scatter cost vs row count at the
exp_bign geometries, plus the sentinel/counts/windows residue.

Usage: timeout 1200 python scripts/exp_permute.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from ljmd_tpu.config import config_from_density
from ljmd_tpu.ops.cell_list import make_pencil_grid, rebin_slots
from exp_sort import slot_layout


def time_op(label, fn, args, reps_short, reps_long):
    """Differential timing of fn(carry_rows, *args) -> new rows, chained."""

    def make_run(reps):
        @jax.jit
        def run(rows0):
            def body(rr, _):
                out = fn(rr, *args)
                rr = rr.at[0, 0].add(0.0 * out)
                return rr, None
            out, _ = lax.scan(body, rows0, None, length=reps)
            return out
        return run

    rows = args[-1]  # last arg is the rows template for chaining
    runs = {k: make_run(k) for k in (reps_short, reps_long)}
    for k in (reps_short, reps_long):
        float(jnp.sum(runs[k](rows)))
    slopes = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(jnp.sum(runs[reps_short](rows)))
        t1 = time.perf_counter()
        float(jnp.sum(runs[reps_long](rows)))
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (reps_long - reps_short))
    slopes.sort()
    ms = slopes[len(slopes) // 2] * 1e3
    print(f"  {label:36s}: {ms:8.3f} ms", flush=True)
    return ms


def main():
    print("devices:", jax.devices(), flush=True)
    for cells in (32, 40):
        cfg = config_from_density(num_cells=cells, density=0.8442, dt=0.005,
                                  dtype="float32", neighbor_skin=0.49)
        grid = make_pencil_grid(cfg.n, cfg.box_length,
                                cfg.rc + cfg.neighbor_skin, cfg.density)
        rows = slot_layout(cfg, grid)
        ns = grid.n_slots
        print(f"N={cfg.n} ns={ns}", flush=True)
        new_slot, _ = rebin_slots(rows, rows[3], grid, z_order=False)

        def scatter_k(rr, k, slot, _rows_tmpl):
            stacked = jnp.tile(rr[0:8], ((k + 7) // 8, 1))[:k]
            out = jnp.zeros((k, ns + 1), jnp.float32)
            out = out.at[:, slot].set(stacked, unique_indices=True)[:, :ns]
            return jnp.sum(out)  # full reduction: no partial-DCE of the scatter

        def gather_k(rr, k, slot, _rows_tmpl):
            # inverse permutation (1-row scatter of iota) + k-row gather
            inv = jnp.zeros((ns + 1,), jnp.int32).at[slot].set(
                jnp.arange(ns, dtype=jnp.int32), unique_indices=True)[:ns]
            stacked = jnp.tile(rr[0:8], ((k + 7) // 8, 1))[:k]
            out = stacked[:, inv]
            return jnp.sum(out)  # a point-read would let XLA shrink the gather

        reps = (8, 32) if cells == 32 else (4, 16)
        for k in (8, 14, 32):
            time_op(f"scatter {k} rows", scatter_k, (k, new_slot, rows), *reps)
        for k in (14, 32):
            time_op(f"inv + gather {k} rows", gather_k, (k, new_slot, rows),
                    *reps)

        # residue pieces the rebin also pays
        from ljmd_tpu.ops.cell_list import bin_to_slots  # noqa: F401

        def counts_piece(rr, _rows_tmpl):
            valid = rr[3]
            counts = jnp.sum(
                valid.reshape(grid.n_pencils, grid.capacity), axis=1
            ).astype(jnp.int32)
            return counts[0].astype(jnp.float32)

        time_op("counts from valid", counts_piece, (rows,), *reps)


if __name__ == "__main__":
    main()
