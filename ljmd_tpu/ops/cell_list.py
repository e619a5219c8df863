"""Pencil (cell-column) spatial binning for the structured large-N kernel.

The reference has no spatial data structures at all (pure O(N^2) loop,
SURVEY §5.7). TPU-native scaling choice: random-access neighbor gathers are
slow on TPU (measured ~5x slower than the dense sweep at N=4000), so instead
of a gather-based neighbor list the large-N path re-ARRANGES particles into
fixed-capacity "pencils" — z-columns of cross-section >= rc + skin — and the
Pallas kernel sweeps each pencil only against its 9 xy-neighbor pencils with
STATIC block indices (scalar-prefetched table). All hot-loop memory access is
dense block reads; the only dynamic permutation happens at rebuild time.

Geometry: Mxy = floor(L / (rc + skin)) pencils per side (must be >= 3, else
fall back to the dense kernel); pencil id p = ix * Mxy + iy; each pencil owns
``capacity`` slots (multiple of 128 for lane alignment). A particle in
pencil p with rank k occupies global slot p * capacity + k. Interactions
beyond the 9-pencil xy-neighborhood are geometrically impossible within
rc + skin; z stays unrestricted (the MIC cutoff mask handles it), which
costs extra masked lanes but keeps every memory access block-structured.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "PencilGrid",
    "make_pencil_grid",
    "pencil_capacity",
    "bin_to_slots",
    "rebin_slots",
]


@dataclasses.dataclass(frozen=True)
class PencilGrid:
    """Static pencil geometry + neighbor tables (host-side constants)."""

    m_xy: int           # pencils per box side
    capacity: int       # slots per pencil (multiple of 128)
    box_length: float

    @property
    def n_pencils(self) -> int:
        return self.m_xy * self.m_xy

    @property
    def n_slots(self) -> int:
        return self.n_pencils * self.capacity

    @property
    def pencil_width(self) -> float:
        return self.box_length / self.m_xy

    def neighbor_table(self) -> np.ndarray:
        """(n_pencils, 9) int32: the xy-neighbor pencil ids (incl. self),
        PBC-wrapped. Static geometry."""
        m = self.m_xy
        tbl = np.empty((m * m, 9), dtype=np.int32)
        for ix in range(m):
            for iy in range(m):
                p = ix * m + iy
                k = 0
                for dx in (-1, 0, 1):
                    for dy in (-1, 0, 1):
                        tbl[p, k] = ((ix + dx) % m) * m + (iy + dy) % m
                        k += 1
        return tbl


def pencil_capacity(n: int, density: float, box_length: float, m_xy: int,
                    safety: float = 1.4) -> int:
    """Static per-pencil slot capacity: mean occupancy x safety, rounded up
    to a multiple of 128 (lane alignment)."""
    mean = n / (m_xy * m_xy)
    cap = int(mean * safety) + 16
    return ((cap + 127) // 128) * 128


def make_pencil_grid(n: int, box_length: float, r_list: float,
                     density: float, capacity: int = 0) -> PencilGrid:
    m_xy = int(np.floor(box_length / r_list))
    if m_xy < 3:
        raise ValueError(
            f"box holds only {m_xy} pencils of width >= {r_list}; "
            "use the dense kernel for small boxes"
        )
    cap = capacity or pencil_capacity(n, density, box_length, m_xy)
    return PencilGrid(m_xy=m_xy, capacity=cap, box_length=box_length)


def _pencil_ids(x: jax.Array, y: jax.Array, grid: PencilGrid) -> jax.Array:
    inv_w = grid.m_xy / grid.box_length
    ix = jnp.clip((x * inv_w).astype(jnp.int32), 0, grid.m_xy - 1)
    iy = jnp.clip((y * inv_w).astype(jnp.int32), 0, grid.m_xy - 1)
    return ix * grid.m_xy + iy


@partial(jax.jit, static_argnames=("grid",))
def bin_to_slots(r: jax.Array, grid: PencilGrid):
    """Bin (N, 3) wrapped positions into pencil slots.

    Returns (slot_of_particle (N,), overflow flag). Deterministic: particles
    are ranked within a pencil by ascending particle index.
    """
    n = r.shape[0]
    pid = _pencil_ids(r[:, 0], r[:, 1], grid)
    order = jnp.argsort(pid, stable=True)          # particles grouped by pencil
    sorted_pid = pid[order]
    # rank within pencil: position in the sorted run
    first_of_run = jnp.searchsorted(sorted_pid, sorted_pid, side="left")
    ranks_sorted = jnp.arange(n) - first_of_run
    ranks = jnp.zeros((n,), jnp.int32).at[order].set(ranks_sorted.astype(jnp.int32))
    overflow = jnp.any(ranks >= grid.capacity)
    slot = pid * grid.capacity + jnp.minimum(ranks, grid.capacity - 1)
    return slot, overflow


@partial(jax.jit, static_argnames=("grid",))
def rebin_slots(rows_r: jax.Array, valid: jax.Array, grid: PencilGrid):
    """Recompute the slot assignment FROM slot-layout data (used by the
    engine at rebuild time).

    rows_r: (8, n_slots) slot-layout positions (rows 0..2 = x,y,z);
    valid: (n_slots,) 1.0/0.0 slot validity.
    Returns (new_slot_for_old_slot (n_slots,), overflow): invalid old slots
    map to the sentinel n_slots (dropped by the scatter).
    """
    ns = grid.n_slots
    x, y = rows_r[0], rows_r[1]
    pid = _pencil_ids(x, y, grid)
    is_valid = valid > 0.5
    # Sort: valid particles grouped by pencil; invalid slots pushed to the end.
    key = jnp.where(is_valid, pid, grid.n_pencils)
    order = jnp.argsort(key, stable=True)
    sorted_key = key[order]
    first_of_run = jnp.searchsorted(sorted_key, sorted_key, side="left")
    ranks_sorted = (jnp.arange(ns) - first_of_run).astype(jnp.int32)
    ranks = jnp.zeros((ns,), jnp.int32).at[order].set(ranks_sorted)
    overflow = jnp.any(is_valid & (ranks >= grid.capacity))
    new_slot = jnp.where(
        is_valid,
        pid * grid.capacity + jnp.minimum(ranks, grid.capacity - 1),
        ns,  # sentinel: dropped
    )
    return new_slot, overflow
