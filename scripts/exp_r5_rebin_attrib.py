"""Round-5: ATTRIBUTE the big-N per-rebin bill at N=256000 (ns=368,640).

CEILINGS.md's 256k row has measured ck12 = 86% of the rebuild-free floor —
a ~1.4 ms/step gap = ~17 ms per 12-step rebin. The rebin pipeline
(engine._step rebin="force" -> ops/cell_list.rebin_gather + _permute_rebin)
decomposes into: wrap, pencil ids, packed unstable sort (measured 2.09 ms at
ns=372k, exp_sort), per-pencil counts via an UNSORTED scatter-add, exclusive
cumsum, a 1-row int32 gather (old_of_new), the stacked 10-row data gather,
sentinel_fill, and a reshape-sum counts recompute.

Two prior measurements make the scatter-add and the stacked gather the
suspects:
  - exp_permute (2026-08-18): v5e scatter lowering blows up super-linearly,
    14.8-18 ms at ns=372k, ROW-COUNT-INSENSITIVE (per-index cost) — the
    counts scatter-add has the same index count (ns updates).
  - exp_gather (2026-08-18): random-access gather costs ~2.6 ns/element;
    10 rows x 368k = 3.7M elements would be ~9.6 ms IF the permutation
    gather paid random-access cost (it should not: old_of_new is
    near-monotonic between rebins).

This script times each piece standalone (float-chained lax.scan, exp_sort's
methodology — differential slope, >= 50 ms signal per leg) plus drop-in
counts alternatives:
  counts-sorted   : scatter-add over the ALREADY-SORTED pid payload with
                    indices_are_sorted=True (sorted_pid is free post-sort)
  counts-compare  : broadcast compare-reduce sum(pid == arange(P)), no
                    scatter at all (212M fused VPU ops at P=576)

Perf-only: standalone compositions are safe to time (the v5e miscompile is
a correctness bug of specific scan+rebin graphs; any production change that
comes out of this must still run scripts/check_conservation.py on TPU).

Usage: timeout 1800 python scripts/exp_r5_rebin_attrib.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from ljmd_tpu.config import config_from_density
from ljmd_tpu.ops.cell_list import (
    _pencil_ids,
    make_pencil_grid,
    rebin_gather,
)
from exp_sort import slot_layout


def time_piece(label, fn, rows, reps_short, reps_long):
    """fn(rows) -> array whose [..0] element chains the carry."""

    def make_run(reps):
        @jax.jit
        def run(rows0):
            def body(rr, _):
                out = fn(rr)
                rr = rr.at[0, 0].add(0.0 * out.reshape(-1)[0].astype(jnp.float32))
                return rr, None
            out, _ = lax.scan(body, rows0, None, length=reps)
            return out
        return run

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
    print(f"  {label:36s}: {ms:8.3f} ms/iter", flush=True)
    return ms


def main():
    print("devices:", jax.devices(), flush=True)
    for cells in (40,):
        cfg = config_from_density(num_cells=cells, density=0.8442, dt=0.005,
                                  dtype="float32", neighbor_skin=0.49)
        grid = make_pencil_grid(cfg.n, cfg.box_length,
                                cfg.rc + cfg.neighbor_skin, cfg.density)
        rows = slot_layout(cfg, grid)
        ns, P, cap = grid.n_slots, grid.n_pencils, grid.capacity
        print(f"N={cfg.n} n_pencils={P} cap={cap} ns={ns}", flush=True)

        bits = max(1, (ns - 1).bit_length())
        assert (P << bits) < 2**31

        # A realistic permutation for gather-locality timing.
        old_of_new, valid_new, _ = jax.jit(
            lambda rr: rebin_gather(rr, rr[3], grid)
        )(rows)
        old_of_new = jax.device_put(old_of_new)
        vmask = valid_new.astype(jnp.float32)

        def full_rebin(rr):
            o, vn, ovf = rebin_gather(rr, rr[3], grid)
            parts = jnp.concatenate(
                [rr[0:3], rr[4:5], rr[0:3], rr[0:3]], axis=0
            )
            stacked = parts[:, o] * vn.astype(jnp.float32)[None, :]
            return stacked

        def sort_only(rr):
            pid = _pencil_ids(rr[0], rr[1], grid)
            pid_key = jnp.where(rr[3] > 0.5, pid, P)
            packed = (pid_key << bits) | jnp.arange(ns, dtype=jnp.int32)
            packed = lax.sort(packed, is_stable=False)
            return packed

        def sort_plus_sorted_counts(rr):
            packed = sort_only(rr)
            sorted_pid = packed >> bits
            counts = jnp.zeros((P + 1,), jnp.int32).at[sorted_pid].add(
                1, indices_are_sorted=True
            )[:P]
            return counts

        def counts_scatter(rr):
            pid = _pencil_ids(rr[0], rr[1], grid)
            counts = jnp.zeros((P,), jnp.int32).at[
                jnp.clip(pid, 0, P - 1)
            ].add((rr[3] > 0.5).astype(jnp.int32))
            return counts

        def counts_compare(rr):
            pid = _pencil_ids(rr[0], rr[1], grid)
            pid_key = jnp.where(rr[3] > 0.5, pid, P)
            counts = jnp.sum(
                (pid_key[None, :] == jnp.arange(P, dtype=jnp.int32)[:, None])
                .astype(jnp.int32),
                axis=1,
            )
            return counts

        def gather10(rr):
            parts = jnp.concatenate(
                [rr[0:3], rr[4:5], rr[0:3], rr[0:3]], axis=0
            )
            return parts[:, old_of_new] * vmask[None, :]

        def gather1_int(rr):
            # the old_of_new build's own gather: 1 int32 row, data-dependent
            idx = (old_of_new + (rr[0, 0] * 0.0).astype(jnp.int32))
            return jnp.arange(ns, dtype=jnp.int32)[idx]

        def gather4(rr):
            parts = jnp.concatenate([rr[0:3], rr[4:5]], axis=0)
            return parts[:, old_of_new] * vmask[None, :]

        # parity guard for the counts variants (on realistic occupancy)
        c_ref = jax.jit(counts_scatter)(rows)
        for name, fn in (("sorted", None), ("compare", counts_compare)):
            if fn is None:
                c = jax.jit(sort_plus_sorted_counts)(rows)
            else:
                c = jax.jit(fn)(rows)
            ok = bool(jnp.all(c == c_ref))
            print(f"  counts parity {name}: {ok}", flush=True)
            assert ok

        def _sorted_order(rr):
            pid = _pencil_ids(rr[0], rr[1], grid)
            pid_key = jnp.where(rr[3] > 0.5, pid, P)
            packed = (pid_key << bits) | jnp.arange(ns, dtype=jnp.int32)
            packed = lax.sort(packed, is_stable=False)
            return pid, packed & ((1 << bits) - 1)

        def full_rebin_optA(rr):
            """counts via compare-reduce instead of the unsorted scatter-add."""
            pid, order = _sorted_order(rr)
            pid_key = jnp.where(rr[3] > 0.5, pid, P)
            counts = jnp.sum(
                (pid_key[None, :] == jnp.arange(P, dtype=jnp.int32)[:, None])
                .astype(jnp.int32),
                axis=1,
            )
            starts = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32),
                 jnp.cumsum(counts)[:-1].astype(jnp.int32)]
            )
            j = jnp.arange(cap, dtype=jnp.int32)
            src = (starts[:, None] + j[None, :]).reshape(ns)
            valid_new = (j[None, :] < jnp.minimum(counts, cap)[:, None]).reshape(ns)
            o = order[jnp.clip(src, 0, ns - 1)]
            parts = jnp.concatenate(
                [rr[0:3], rr[4:5], rr[0:3], rr[0:3]], axis=0
            )
            return parts[:, o] * valid_new.astype(jnp.float32)[None, :]

        def full_rebin_optB(rr):
            """optA + double gather: data[:, order][:, src] instead of
            materializing old_of_new = order[src] first."""
            pid, order = _sorted_order(rr)
            pid_key = jnp.where(rr[3] > 0.5, pid, P)
            counts = jnp.sum(
                (pid_key[None, :] == jnp.arange(P, dtype=jnp.int32)[:, None])
                .astype(jnp.int32),
                axis=1,
            )
            starts = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32),
                 jnp.cumsum(counts)[:-1].astype(jnp.int32)]
            )
            j = jnp.arange(cap, dtype=jnp.int32)
            src = jnp.clip((starts[:, None] + j[None, :]).reshape(ns), 0, ns - 1)
            valid_new = (j[None, :] < jnp.minimum(counts, cap)[:, None]).reshape(ns)
            parts = jnp.concatenate(
                [rr[0:3], rr[4:5], rr[0:3], rr[0:3]], axis=0
            )
            return parts[:, order][:, src] * valid_new.astype(jnp.float32)[None, :]

        # bitwise parity of the optimized pipelines vs the current one
        ref_out = jax.jit(full_rebin)(rows)
        for name, fn in (("optA", full_rebin_optA), ("optB", full_rebin_optB)):
            out = jax.jit(fn)(rows)
            ok = bool(jnp.all(out == ref_out))
            print(f"  full-rebin parity {name}: {ok}", flush=True)
            assert ok

        time_piece("full rebin (gather-form, 10 rows)", full_rebin, rows, 4, 16)
        time_piece("full rebin optA (compare counts)", full_rebin_optA, rows, 4, 16)
        time_piece("full rebin optB (+double gather)", full_rebin_optB, rows, 4, 16)
        t_sort = time_piece("packed unstable sort only", sort_only, rows, 8, 32)
        t_ssc = time_piece("sort + SORTED counts scatter",
                           sort_plus_sorted_counts, rows, 8, 32)
        print(f"    -> sorted-counts increment: {t_ssc - t_sort:.3f} ms",
              flush=True)
        time_piece("counts UNSORTED scatter (current)", counts_scatter,
                   rows, 8, 32)
        time_piece("counts compare-reduce", counts_compare, rows, 8, 32)
        time_piece("stacked 10-row gather", gather10, rows, 4, 16)
        time_piece("stacked 4-row gather", gather4, rows, 8, 32)
        time_piece("1-row int32 gather", gather1_int, rows, 8, 32)


if __name__ == "__main__":
    main()
