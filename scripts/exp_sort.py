"""Big-N rebin sort variants (the 8.7/31 ms slot-sort bill at N=131k/256k).

``rebin_slots(z_order=False)`` runs a STABLE 2-operand argsort (int32 key +
iota payload). The half-shell sweeps accept ANY within-pencil rank order, so
stability is unneeded; packing (pid << bits | slot) into ONE int32 and
sorting a single operand UNSTABLY halves the comparator data movement and
gets deterministic order for free (the low bits are the slot index).

Variants, timed per-rebin via a float-chained lax.scan (exp_rebuild2's
methodology — 0.0*x chains are not constant-foldable):
  A  current: jnp.argsort(key, stable=True) + run-starts + rank scatter
  B  packed single-operand lax.sort(is_stable=False)
  C  unstable 2-operand lax.sort_key_val
All variants end with the same rank scatter so the slope difference is the
sort alone.

Usage: timeout 1200 python scripts/exp_sort.py
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
    _run_starts,
    make_pencil_grid,
    rebin_slots,
)
from ljmd_tpu.models.lattice import fcc_lattice


def _pid_key(rows_r, valid, grid):
    pid = _pencil_ids(rows_r[0], rows_r[1], grid)
    is_valid = valid > 0.5
    return pid, is_valid, jnp.where(is_valid, pid, grid.n_pencils)


def rebin_packed(rows_r, valid, grid):
    """Variant B: single-operand unstable sort of (pid << b) | slot."""
    ns = grid.n_slots
    pid, is_valid, pid_key = _pid_key(rows_r, valid, grid)
    bits = max(1, (ns - 1).bit_length())
    assert (grid.n_pencils << bits) < 2**31, "packed key overflows int32"
    packed = (pid_key << bits) | jnp.arange(ns, dtype=jnp.int32)
    packed = lax.sort(packed, is_stable=False)
    order = packed & ((1 << bits) - 1)
    sorted_pid = packed >> bits
    ranks_sorted = (jnp.arange(ns) - _run_starts(sorted_pid)).astype(jnp.int32)
    ranks = jnp.zeros((ns,), jnp.int32).at[order].set(ranks_sorted)
    overflow = jnp.any(is_valid & (ranks >= grid.capacity))
    new_slot = jnp.where(
        is_valid,
        pid * grid.capacity + jnp.minimum(ranks, grid.capacity - 1),
        ns,
    )
    return new_slot, overflow


def rebin_unstable2(rows_r, valid, grid):
    """Variant C: unstable 2-operand sort_key_val (ties arbitrary — fine)."""
    ns = grid.n_slots
    pid, is_valid, pid_key = _pid_key(rows_r, valid, grid)
    sorted_pid, order = lax.sort_key_val(
        pid_key, jnp.arange(ns, dtype=jnp.int32), is_stable=False
    )
    ranks_sorted = (jnp.arange(ns) - _run_starts(sorted_pid)).astype(jnp.int32)
    ranks = jnp.zeros((ns,), jnp.int32).at[order].set(ranks_sorted)
    overflow = jnp.any(is_valid & (ranks >= grid.capacity))
    new_slot = jnp.where(
        is_valid,
        pid * grid.capacity + jnp.minimum(ranks, grid.capacity - 1),
        ns,
    )
    return new_slot, overflow


def slot_layout(cfg, grid):
    """Slot-layout r8 rows from an FCC lattice (occupancy-realistic)."""
    r = fcc_lattice(cfg.num_cells, cfg.box_length, dtype=jnp.float32)
    # jitter so pencil populations fluctuate like a liquid
    r = (r + 0.35 * jax.random.normal(jax.random.PRNGKey(1), r.shape)) % cfg.box_length
    from ljmd_tpu.ops.cell_list import bin_to_slots

    slot, ovf = bin_to_slots(r, grid)
    assert not bool(ovf), "capacity overflow in setup"
    ns = grid.n_slots
    rows = jnp.zeros((8, ns), jnp.float32)
    rows = rows.at[0:3, :].set(
        jnp.zeros((3, ns), jnp.float32).at[:, slot].set(r.T)
    )
    rows = rows.at[3, slot].set(1.0)
    return rows


def time_variant(label, fn, rows, grid, reps_short, reps_long):
    def make_run(reps):
        @jax.jit
        def run(rows0):
            def body(rr, _):
                slot, ovf = fn(rr, rr[3], grid)
                rr = rr.at[0, 0].add(0.0 * slot[0].astype(jnp.float32))
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
    print(f"  {label:34s}: {ms:8.3f} ms/rebin", flush=True)
    return ms


def main():
    print("devices:", jax.devices(), flush=True)
    for cells in (32, 40):
        cfg = config_from_density(num_cells=cells, density=0.8442, dt=0.005,
                                  dtype="float32", neighbor_skin=0.49)
        grid = make_pencil_grid(cfg.n, cfg.box_length, cfg.rc + cfg.neighbor_skin,
                                cfg.density)
        rows = slot_layout(cfg, grid)
        ns = grid.n_slots
        print(f"N={cfg.n} n_pencils={grid.n_pencils} cap={grid.capacity} "
              f"ns={ns}", flush=True)

        # parity first (on-device compare)
        ref_slot, ref_ovf = rebin_slots(rows, rows[3], grid, z_order=False)
        for name, fn in (("packed", rebin_packed), ("unstable2", rebin_unstable2)):
            s, o = fn(rows, rows[3], grid)
            # unstable variants may order within-pencil differently; check
            # the PENCIL assignment (slot // capacity) matches and slots are
            # a permutation (valid slots all distinct, in-range).
            valid = rows[3] > 0.5
            same_pencil = jnp.all(
                jnp.where(valid, s // grid.capacity == ref_slot // grid.capacity, True)
            )
            vs = jnp.sort(jnp.where(valid, s, ns))
            nv = int(jnp.sum(valid))
            distinct = jnp.all(vs[1:nv] != vs[: nv - 1])
            print(f"  parity {name}: pencil={bool(same_pencil)} "
                  f"distinct={bool(distinct)} ovf={bool(o)}=={bool(ref_ovf)}",
                  flush=True)

        reps = (4, 16) if cells == 40 else (8, 32)
        time_variant("A argsort stable (current)",
                     lambda rr, v, g: rebin_slots(rr, v, g, z_order=False),
                     rows, grid, *reps)
        time_variant("B packed 1-op unstable", rebin_packed, rows, grid, *reps)
        time_variant("C 2-op unstable", rebin_unstable2, rows, grid, *reps)


if __name__ == "__main__":
    main()
