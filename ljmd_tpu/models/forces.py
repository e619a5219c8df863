"""Force-backend dispatch.

The framework has multiple implementations of the same LJ force/energy/virial
contract (reference kernel ``lj_potential_energy.f90:46``):

- ``dense``    : all-pairs jnp sweep (``ops/lj.py``) — correctness oracle,
                 CPU/small-N path.
- ``pallas``   : tiled Pallas TPU kernel (``ops/pallas_lj.py``) — the
                 performance path for mid-size N.
- ``neighbor`` : cell-list / neighbor-tile kernel (``ops/neighbor.py``) for
                 large N with short cutoffs.
- ``auto``     : pick per platform and N.

Every backend returns an ``LJResult`` with identical semantics (including
tail corrections), so integrators, drivers, and tests are backend-agnostic.
"""

from __future__ import annotations

from typing import Callable

import jax

from ljmd_tpu.config import SimConfig
from ljmd_tpu.ops.lj import LJResult, lj_force_energy_dense

__all__ = ["make_force_fn", "FORCE_BACKENDS"]

FORCE_BACKENDS = ("auto", "dense", "pallas", "neighbor")


def _dense_fn(cfg: SimConfig) -> Callable[[jax.Array], LJResult]:
    def force(r: jax.Array) -> LJResult:
        return lj_force_energy_dense(
            r,
            box_length=cfg.box_length,
            rc_square=cfg.rc_square,
            use_tail_corrections=cfg.use_tail_corrections,
            volume=cfg.volume,
            rc=cfg.rc,
        )

    return force


def make_force_fn(cfg: SimConfig, backend: str = "auto") -> Callable[[jax.Array], LJResult]:
    if backend not in FORCE_BACKENDS:
        raise ValueError(f"unknown force backend {backend!r}; expected one of {FORCE_BACKENDS}")

    if backend == "dense":
        return _dense_fn(cfg)

    if backend == "pallas":
        from ljmd_tpu.ops.pallas_lj import make_pallas_force_fn

        return make_pallas_force_fn(cfg)

    if backend == "neighbor":
        # Build-per-call neighbor force: correct but wasteful (the production
        # path amortizes builds via the engine carry — models/engine.py).
        from ljmd_tpu.ops.neighbor import (
            build_neighbor_list_dense,
            estimate_capacity,
            lj_force_energy_neighbor,
        )

        r_list = cfg.rc + cfg.neighbor_skin
        capacity = cfg.neighbor_capacity or estimate_capacity(cfg.density, r_list)

        def neighbor_force(r: jax.Array) -> LJResult:
            nbrs = build_neighbor_list_dense(r, cfg.box_length, r_list * r_list, capacity)
            return lj_force_energy_neighbor(
                r,
                nbrs.idx,
                box_length=cfg.box_length,
                rc_square=cfg.rc_square,
                use_tail_corrections=cfg.use_tail_corrections,
                volume=cfg.volume,
                rc=cfg.rc,
            )

        return neighbor_force

    # auto: Pallas on TPU when N is big enough to tile; otherwise dense.
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover - no backend at all
        platform = "cpu"
    if platform == "tpu" and cfg.n >= 512:
        from ljmd_tpu.ops.pallas_lj import make_pallas_force_fn

        return make_pallas_force_fn(cfg)
    return _dense_fn(cfg)
