"""Fortran unformatted sequential-record codec + the reference's binary file
formats (compat layer for parity testing against Fortran-produced artifacts).

Formats (documented in the reference):

- Record framing: each record is [marker][payload][marker] where the marker
  is the payload byte length as int32 (gfortran default) or int64; the
  reference's reader auto-detects (``md_one_run_analysis.py:262-289``) and
  validates header/footer match (:291-310). We do both.
- ``rv_init.dat``: record 1 = rx(1:N), ry, rz; record 2 = vx, vy, vz — all
  float64 (``md_initial_config_program.f90:275-290`` writer /
  ``md_simulation_program.f90:573-588`` reader).
- ``rva.dat``: header record (n:int32, L:f64, dt:f64, out_interval:int32,
  n_snap:int32), then per snapshot 4 records of 3N float64 each: wrapped r,
  unwrapped ru, v, a (``md_simulation_program.f90:248-257,384-387``;
  contract restated at ``md_one_run_analysis.py:345-397``).
"""

from __future__ import annotations

import dataclasses
import struct
from typing import BinaryIO, List

import numpy as np

__all__ = [
    "read_records",
    "write_record",
    "read_rv_init",
    "write_rv_init",
    "RVAData",
    "read_rva",
    "write_rva",
]


def write_record(f: BinaryIO, payload: bytes, marker_bytes: int = 4) -> None:
    fmt = "<i" if marker_bytes == 4 else "<q"
    m = struct.pack(fmt, len(payload))
    f.write(m)
    f.write(payload)
    f.write(m)


def _detect_marker_bytes(f: BinaryIO) -> int:
    """Auto-detect 4- vs 8-byte record markers by validating the first
    record's framing (same approach as md_one_run_analysis.py:262-289)."""
    start = f.tell()
    data = f.read(16)
    f.seek(start)
    for mb, fmt in ((4, "<i"), (8, "<q")):
        if len(data) < mb:
            continue
        (length,) = struct.unpack(fmt, data[:mb])
        if length <= 0 or length > 1 << 40:
            continue
        f.seek(start + mb + length)
        tail = f.read(mb)
        f.seek(start)
        if len(tail) == mb and struct.unpack(fmt, tail)[0] == length:
            return mb
    raise ValueError("cannot detect Fortran record marker size (corrupt file?)")


def read_records(path: str) -> List[bytes]:
    """All records of an unformatted sequential file, as raw bytes."""
    records = []
    with open(path, "rb") as f:
        mb = _detect_marker_bytes(f)
        fmt = "<i" if mb == 4 else "<q"
        while True:
            head = f.read(mb)
            if not head:
                break
            if len(head) < mb:
                raise ValueError("truncated record header")
            (length,) = struct.unpack(fmt, head)
            payload = f.read(length)
            tail = f.read(mb)
            if len(payload) < length or len(tail) < mb:
                raise ValueError("truncated record payload")
            if struct.unpack(fmt, tail)[0] != length:
                raise ValueError("record header/footer length mismatch")
            records.append(payload)
    return records


def _xyz_from_record(payload: bytes, n: int) -> np.ndarray:
    arr = np.frombuffer(payload, dtype="<f8")
    if arr.size != 3 * n:
        raise ValueError(f"expected 3N={3*n} float64 values, got {arr.size}")
    # Fortran writes rx(1:N), ry(1:N), rz(1:N) consecutively -> (3, N) -> (N, 3)
    return arr.reshape(3, n).T.copy()


def _xyz_to_record(a: np.ndarray) -> bytes:
    a = np.asarray(a, dtype="<f8")
    return np.ascontiguousarray(a.T).tobytes()  # rx..., ry..., rz...


def read_rv_init(path: str, n: int):
    """(positions (N,3), velocities (N,3)) from a Fortran rv_init.dat."""
    recs = read_records(path)
    if len(recs) < 2:
        raise ValueError("rv_init file must contain 2 records (positions, velocities)")
    return _xyz_from_record(recs[0], n), _xyz_from_record(recs[1], n)


def write_rv_init(path: str, r: np.ndarray, v: np.ndarray, marker_bytes: int = 4) -> None:
    with open(path, "wb") as f:
        write_record(f, _xyz_to_record(r), marker_bytes)
        write_record(f, _xyz_to_record(v), marker_bytes)


@dataclasses.dataclass
class RVAData:
    n: int
    box_length: float
    dt: float
    output_interval: int
    n_snapshots: int
    r: np.ndarray   # (n_snap, N, 3) wrapped
    ru: np.ndarray  # (n_snap, N, 3) unwrapped
    v: np.ndarray   # (n_snap, N, 3)
    a: np.ndarray   # (n_snap, N, 3)


_HEADER_FMT = "<i d d i i"  # n, L, dt, out_interval, n_snap (packed, no padding)


def read_rva(path: str) -> RVAData:
    recs = read_records(path)
    if not recs:
        raise ValueError("empty rva file")
    header = recs[0]
    n, L, dt, out_interval, n_snap_expected = struct.unpack(_HEADER_FMT, header)
    body = recs[1:]
    n_snap = len(body) // 4
    frames = {k: np.empty((n_snap, n, 3)) for k in ("r", "ru", "v", "a")}
    keys = ("r", "ru", "v", "a")
    for s in range(n_snap):
        for k in range(4):
            frames[keys[k]][s] = _xyz_from_record(body[4 * s + k], n)
    return RVAData(
        n=n,
        box_length=L,
        dt=dt,
        output_interval=out_interval,
        n_snapshots=n_snap,
        **frames,
    )


def write_rva(
    path: str,
    box_length: float,
    dt: float,
    output_interval: int,
    r: np.ndarray,
    ru: np.ndarray,
    v: np.ndarray,
    a: np.ndarray,
    marker_bytes: int = 4,
) -> None:
    """Write frames (n_snap, N, 3) in the reference rva.dat format."""
    n_snap, n = r.shape[0], r.shape[1]
    with open(path, "wb") as f:
        write_record(
            f,
            struct.pack(_HEADER_FMT, n, float(box_length), float(dt), output_interval, n_snap),
            marker_bytes,
        )
        for s in range(n_snap):
            for frames in (r, ru, v, a):
                write_record(f, _xyz_to_record(frames[s]), marker_bytes)
