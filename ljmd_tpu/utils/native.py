"""ctypes loader for the native C++ runtime library (native/ljmd_native.cpp).

Provides bulk ran3 generation and fast rva.dat trajectory IO. Every entry
point has a pure-Python fallback (``utils/ran3.py``, ``io/fortran_records.py``)
so the framework works without the compiled library; ``ensure_built`` can
compile it on demand with the in-image g++ toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

__all__ = ["load", "ensure_built", "available", "ran3_fill", "write_rva_native", "read_rva_native"]

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libljmd_native.so")
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def ensure_built(quiet: bool = True) -> bool:
    """Compile the library if missing or stale (source newer than the .so —
    otherwise an edited ljmd_native.cpp would keep serving the old binary,
    and newly added symbols would be absent). Returns True when the .so
    exists."""
    src = os.path.join(_NATIVE_DIR, "ljmd_native.cpp")
    if os.path.exists(_LIB_PATH) and (
        not os.path.exists(src)
        or os.path.getmtime(_LIB_PATH) >= os.path.getmtime(src)
    ):
        return True
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=quiet,
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    return os.path.exists(_LIB_PATH)


def load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not ensure_built():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _load_failed = True
        return None

    lib.ljmd_ran3_fill.argtypes = [
        ctypes.c_int64,
        np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int64,
    ]
    lib.ljmd_ran3_fill.restype = ctypes.c_int

    dbl_arr = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
    lib.ljmd_write_rva.argtypes = [
        ctypes.c_char_p, ctypes.c_int32, ctypes.c_double, ctypes.c_double,
        ctypes.c_int32, ctypes.c_int32, dbl_arr, dbl_arr, dbl_arr, dbl_arr,
    ]
    lib.ljmd_write_rva.restype = ctypes.c_int

    lib.ljmd_read_rva_header.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.ljmd_read_rva_header.restype = ctypes.c_int

    lib.ljmd_read_rva_frames.argtypes = [
        ctypes.c_char_p, ctypes.c_int32, ctypes.c_int64,
        dbl_arr, dbl_arr, dbl_arr, dbl_arr,
    ]
    lib.ljmd_read_rva_frames.restype = ctypes.c_int

    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def ran3_fill(seed: int, n: int) -> np.ndarray:
    """Bulk uniform stream; bit-identical to utils.ran3.Ran3(seed)."""
    lib = load()
    out = np.empty(n, dtype=np.float64)
    if lib is None:
        from ljmd_tpu.utils.ran3 import Ran3

        return Ran3(seed).uniform(n)
    rc = lib.ljmd_ran3_fill(seed, out, n)
    if rc != 0:
        raise RuntimeError(f"ljmd_ran3_fill failed: {rc}")
    return out


def write_rva_native(path, box_length, dt, output_interval, r, ru, v, a) -> None:
    """Native rva.dat writer; falls back to the Python codec."""
    lib = load()
    arrs = [np.ascontiguousarray(x, dtype=np.float64) for x in (r, ru, v, a)]
    if lib is None:
        from ljmd_tpu.io.fortran_records import write_rva

        write_rva(path, box_length, dt, output_interval, *arrs)
        return
    n_frames, n = arrs[0].shape[0], arrs[0].shape[1]
    rc = lib.ljmd_write_rva(
        path.encode(), n, float(box_length), float(dt),
        int(output_interval), n_frames, *arrs,
    )
    if rc != 0:
        raise RuntimeError(f"ljmd_write_rva failed: {rc}")


def read_rva_native(path: str):
    """Native rva.dat reader; falls back to the Python codec. Returns the
    same RVAData structure."""
    from ljmd_tpu.io.fortran_records import RVAData, read_rva

    lib = load()
    if lib is None:
        return read_rva(path)
    n = ctypes.c_int32()
    L = ctypes.c_double()
    dt = ctypes.c_double()
    interval = ctypes.c_int32()
    n_hdr = ctypes.c_int32()
    n_actual = ctypes.c_int64()
    rc = lib.ljmd_read_rva_header(
        path.encode(), ctypes.byref(n), ctypes.byref(L), ctypes.byref(dt),
        ctypes.byref(interval), ctypes.byref(n_hdr), ctypes.byref(n_actual),
    )
    if rc != 0:
        # mixed/8-byte markers etc.: let the Python codec handle it
        return read_rva(path)
    n_frames = int(n_actual.value)
    shape = (n_frames, int(n.value), 3)
    r = np.empty(shape)
    ru = np.empty(shape)
    v = np.empty(shape)
    a = np.empty(shape)
    rc = lib.ljmd_read_rva_frames(path.encode(), n.value, n_frames, r, ru, v, a)
    if rc != 0:
        return read_rva(path)
    return RVAData(
        n=int(n.value), box_length=L.value, dt=dt.value,
        output_interval=int(interval.value), n_snapshots=n_frames,
        r=r, ru=ru, v=v, a=a,
    )


def async_writer_open(path: str, n: int, box_length: float, dt: float,
                      output_interval: int, n_expected: int,
                      append: bool = False, frames_present: int = 0):
    """Open the native ASYNC rva.dat appender (worker thread drains a frame
    queue so trajectory IO overlaps compute). Returns an opaque handle or
    None when the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    if not hasattr(lib, "_async_configured"):
        dbl_arr = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
        lib.ljmd_rva_async_open.argtypes = [
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_double, ctypes.c_double,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int64,
        ]
        lib.ljmd_rva_async_open.restype = ctypes.c_void_p
        lib.ljmd_rva_async_append.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, dbl_arr, dbl_arr, dbl_arr, dbl_arr,
        ]
        lib.ljmd_rva_async_append.restype = ctypes.c_int
        lib.ljmd_rva_async_close.argtypes = [ctypes.c_void_p]
        lib.ljmd_rva_async_close.restype = ctypes.c_int
        lib.ljmd_rva_async_frames.argtypes = [ctypes.c_void_p]
        lib.ljmd_rva_async_frames.restype = ctypes.c_int64
        if hasattr(lib, "ljmd_rva_async_sync"):  # absent in pre-round-5 .so
            lib.ljmd_rva_async_sync.argtypes = [ctypes.c_void_p]
            lib.ljmd_rva_async_sync.restype = ctypes.c_int
        lib._async_configured = True
    handle = lib.ljmd_rva_async_open(
        path.encode(), n, float(box_length), float(dt), int(output_interval),
        int(n_expected), 1 if append else 0, int(frames_present),
    )
    return handle or None


def async_writer_append(handle, r, ru, v, a) -> None:
    lib = load()
    arrs = [np.ascontiguousarray(x, dtype=np.float64) for x in (r, ru, v, a)]
    if arrs[0].ndim == 2:
        arrs = [x[None] for x in arrs]
    rc = lib.ljmd_rva_async_append(handle, arrs[0].shape[0], *arrs)
    if rc != 0:
        raise RuntimeError(f"ljmd_rva_async_append failed: {rc}")


def async_writer_sync(handle) -> None:
    """Crash-consistency fence: block until every enqueued frame is on disk
    (drain + fflush + fsync). The streaming driver calls this BEFORE writing
    each checkpoint so the checkpoint can never claim more frames than
    rva.dat holds."""
    lib = load()
    if not hasattr(lib, "ljmd_rva_async_sync"):  # pre-round-5 .so
        raise RuntimeError("native library lacks ljmd_rva_async_sync")
    rc = lib.ljmd_rva_async_sync(handle)
    if rc != 0:
        raise RuntimeError(f"ljmd_rva_async_sync failed: {rc}")


def async_writer_close(handle) -> None:
    lib = load()
    rc = lib.ljmd_rva_async_close(handle)
    if rc != 0:
        raise RuntimeError(f"ljmd_rva_async_close failed: {rc}")
