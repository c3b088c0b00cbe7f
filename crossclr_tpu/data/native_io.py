"""ctypes bindings for the native host-IO kernels (native/crossclr_io.cc).

Batch assembly for contrastive training is host-bound: gathering shuffled
rows from a memory-mapped feature store and optionally down-converting
fp32→bf16 before the H2D copy.  The C++ library does both with a thread
pool; this module loads it lazily, builds it on first use if a compiler
is available, and falls back to numpy transparently otherwise — every
caller works without the native library, just slower.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

__all__ = ["gather_rows", "f32_to_bf16", "native_available"]

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libcrossclr_io.so"
# must match crossclr_io_version() in crossclr_io.cc: a stale build would
# silently miss semantic fixes (e.g. NaN-preserving bf16)
_EXPECTED_VERSION = 5
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False
_DEFAULT_THREADS = min(os.cpu_count() or 1, 16)


def _make() -> bool:
    """Build the library under an exclusive file lock (multiple processes
    on one VM may race the rebuild) — the Makefile links to a temp name
    and atomically renames, so a stale mapped library is never truncated
    in place and re-dlopen sees a fresh inode."""
    try:
        import fcntl

        with open(_NATIVE_DIR / ".build.lock", "w") as lockf:
            fcntl.flock(lockf, fcntl.LOCK_EX)
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        return True
    except Exception:
        return False


def _open_lib() -> ctypes.CDLL | None:
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.crossclr_io_version.restype = ctypes.c_int
        return lib
    except (OSError, AttributeError):
        return None


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not _LIB_PATH.exists() and not _make():
            return None
        lib = _open_lib()
        if lib is None or lib.crossclr_io_version() != _EXPECTED_VERSION:
            # stale build: rebuild (make keys on source mtime) and re-dlopen;
            # the replaced inode yields a fresh handle
            if not _make():
                return None
            lib = _open_lib()
            if lib is None or lib.crossclr_io_version() != _EXPECTED_VERSION:
                return None
        lib.crossclr_gather_rows.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int,
        ]
        lib.crossclr_f32_to_bf16.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def gather_rows(
    src: np.ndarray,
    idx: np.ndarray,
    *,
    threads: int = _DEFAULT_THREADS,
    out: np.ndarray | None = None,
) -> np.ndarray:
    """``src[idx]`` as a contiguous array, multithreaded when native.

    ``src`` may be a np.memmap; rows are copied directly out of the mapped
    pages.  Works for any 2-D dtype.

    ``out``: optional preallocated destination of the exact result shape/
    dtype (contiguous).  Reusing destinations matters on hosts where the
    allocator returns big buffers to the OS between batches: a fresh
    chunk-sized allocation first-touch-faults every page (~25× slower
    than the copy itself — see scripts/bench_input_pipeline.py), and
    glibc re-triggers that intermittently even at steady state.
    """
    lib = _load()
    if out is not None:
        want = (idx.shape[0], *src.shape[1:])
        if (
            out.shape != want
            or out.dtype != src.dtype
            or not out.flags.c_contiguous
        ):
            raise ValueError(
                f"out must be C-contiguous {want} {src.dtype}, got "
                f"{out.shape} {out.dtype} contiguous={out.flags.c_contiguous}"
            )
    # each row (all trailing dims) must be one contiguous block; the ROW
    # STRIDE may differ from the row size (e.g. HostShard's [p::P] views).
    # Works for [N, D] features and [N, S, D] sequences alike.
    row_elems = int(np.prod(src.shape[1:])) if src.ndim > 1 else 0
    inner_contiguous = (
        src.ndim >= 2
        and src.strides[-1] == src.dtype.itemsize
        and all(
            src.strides[k] == src.strides[k + 1] * src.shape[k + 1]
            for k in range(1, src.ndim - 1)
        )
    )
    if lib is None or not inner_contiguous or row_elems == 0:
        if out is None:
            return np.ascontiguousarray(src[idx])
        out[...] = src[idx]
        return out
    idx64 = np.ascontiguousarray(idx, dtype=np.int64)
    if out is None:
        out = np.empty((idx64.shape[0], *src.shape[1:]), dtype=src.dtype)
    row_bytes = row_elems * src.dtype.itemsize
    lib.crossclr_gather_rows(
        src.ctypes.data,
        out.ctypes.data,
        idx64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        idx64.shape[0],
        row_bytes,
        src.strides[0],
        threads,
    )
    return out


def f32_to_bf16(x: np.ndarray, *, threads: int = _DEFAULT_THREADS) -> np.ndarray:
    """fp32 → bf16 (round-to-nearest-even, matching XLA) as uint16 payload
    viewed through ml_dtypes.bfloat16."""
    import ml_dtypes

    x = np.ascontiguousarray(x, dtype=np.float32)
    lib = _load()
    if lib is None:
        return x.astype(ml_dtypes.bfloat16)
    out = np.empty(x.shape, dtype=np.uint16)
    lib.crossclr_f32_to_bf16(x.ctypes.data, out.ctypes.data, x.size, threads)
    return out.view(ml_dtypes.bfloat16)
