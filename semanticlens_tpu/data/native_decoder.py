"""ctypes bridge to the native batch JPEG decoder (native/decoder.cpp).

The host side of the input pipeline: a C++ thread pool decodes JPEGs with
libjpeg DCT-prescaling straight into one contiguous uint8 batch buffer — the
exact array the engine uploads. Replaces per-sample PIL decode
(the reference's DataLoader-worker strategy, activation_based.py:344-349)
on hosts where decode, not the device, bounds the sweep.

No pybind11 in this image, so the ABI is plain C via ctypes. The shared
object builds on first use (``g++ -O3 -shared -fPIC … -ljpeg``) and every
entry point degrades gracefully: ``is_available()`` is False when there is
no compiler or no libjpeg, and per-file decode failures are re-decoded by
the caller's PIL fallback.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_SRC = Path(__file__).resolve().parent.parent.parent / "native" / "decoder.cpp"
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_FAILED = False


def _so_path() -> Path:
    return _SRC.parent / "build" / "libsldecode.so"


def _build() -> Path | None:
    so = _so_path()
    if so.exists() and so.stat().st_mtime >= _SRC.stat().st_mtime:
        return so
    if not _SRC.exists():
        return so if so.exists() else None
    so.parent.mkdir(parents=True, exist_ok=True)
    # Compile to a per-process temp name and rename atomically: concurrent
    # processes (multi-host on one machine) must never dlopen a half-written
    # file, and rename makes last-writer-wins safe.
    tmp = so.with_name(f".{so.name}.{os.getpid()}.tmp")
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-o",
        str(tmp),
        str(_SRC),
        "-ljpeg",
        "-lpthread",
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired) as e:
        logger.info("native decoder build skipped: %s", e)
        return None
    if proc.returncode != 0:
        logger.info("native decoder build failed:\n%s", proc.stderr[-2000:])
        tmp.unlink(missing_ok=True)
        return None
    os.replace(tmp, so)
    return so


def _load() -> ctypes.CDLL | None:
    global _LIB, _FAILED
    if _LIB is not None or _FAILED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _FAILED:
            return _LIB
        so = _build()
        if so is None or not so.exists():
            _FAILED = True
            return None
        try:
            lib = ctypes.CDLL(str(so))
        except OSError as e:
            logger.info("native decoder load failed: %s", e)
            _FAILED = True
            return None
        lib.sl_decode_batch.restype = ctypes.c_int
        lib.sl_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.sl_version.restype = ctypes.c_int
        _LIB = lib
        logger.info("native decoder ready (v%d, %s)", lib.sl_version(), so)
        return _LIB


def is_available() -> bool:
    return _load() is not None


def decode_batch(paths, image_size: int, *, threads: int | None = None):
    """Decode JPEG ``paths`` → ((N, S, S, 3) uint8, failed_indices list).

    Failed files (corrupt, non-JPEG, missing) come back as indices for the
    caller to decode through its fallback; their rows are zeros.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder unavailable — check is_available() first")
    n = len(paths)
    out = np.zeros((n, image_size, image_size, 3), np.uint8)
    if n == 0:
        return out, []
    flags = np.zeros(n, np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[os.fsencode(str(p)) for p in paths])
    threads = threads if threads is not None else min(n, os.cpu_count() or 1)
    lib.sl_decode_batch(
        c_paths,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        image_size,
        threads,
        flags.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out, np.nonzero(flags)[0].tolist()
