"""ctypes binding for the native JPEG decode+resize library (native/).

Builds ``libticjpeg.so`` with g++ on first use (cached) and exposes:
- :func:`decode_file` — one JPEG -> (h, w, 3) uint8 canvas,
- :func:`decode_batch` — n files -> (n, h, w, 3) uint8 in a C thread pool
  (bypasses the GIL entirely — the whole batch is one C call).

Falls back cleanly: :func:`available` gates usage and the HostImageLoader
keeps its PIL path when the toolchain or libjpeg is missing.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libticjpeg.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "ticjpeg.cpp")
    if not os.path.exists(src):
        return False
    # build to a per-pid temp then rename: concurrent processes (test
    # children, multi-host ranks) may all notice a stale .so at once, and a
    # reader must never dlopen a half-written file
    tmp = f"{_LIB_PATH}.build.{os.getpid()}"
    cmd = ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
           "-o", tmp, src, "-ljpeg", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB_PATH)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        print(f"native loader build failed ({e}); falling back to PIL")
        if os.path.exists(tmp):
            os.remove(tmp)
        return False


def _load():
    global _lib, _build_failed
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) or (
            os.path.exists(os.path.join(_NATIVE_DIR, "ticjpeg.cpp"))
            and os.path.getmtime(_LIB_PATH)
            < os.path.getmtime(os.path.join(_NATIVE_DIR, "ticjpeg.cpp"))
        ):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            # symbol binding INSIDE the try: a stale prebuilt .so missing a
            # newer symbol (tic_decode_batch2) must fall back to PIL, not
            # crash every caller of available() with AttributeError
            lib.tic_decode_file.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.tic_decode_file.restype = ctypes.c_int
            lib.tic_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ]
            lib.tic_decode_batch.restype = ctypes.c_int
            lib.tic_decode_batch2.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.tic_decode_batch2.restype = ctypes.c_int
        except (OSError, AttributeError) as e:
            print(f"native loader unavailable: {e}")
            _build_failed = True
            return None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_file(path: str, canvas: tuple[int, int]):
    import numpy as np

    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    out = np.empty((canvas[0], canvas[1], 3), np.uint8)
    rc = lib.tic_decode_file(
        path.encode(), canvas[0], canvas[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise ValueError(f"native decode failed (rc={rc}) for {path}")
    return out


def decode_batch(paths: list[str], canvas: tuple[int, int], out=None,
                 nthreads: int | None = None, failed=None):
    """Returns ((n, h, w, 3) uint8 array, failure_count). Failed slots are
    zeroed (same contract as the PIL path raising per-file — callers that
    need hard failures check the count). Pass ``failed`` — an (n,) uint8
    array — to learn WHICH slots failed (corrupt-file retry/skip needs slot
    identity; all-zero pixels also describe a legitimately black image)."""
    import numpy as np

    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    if out is None:
        out = np.empty((n, canvas[0], canvas[1], 3), np.uint8)
    else:
        # the C side writes n*h*w*3 bytes (and failed[0:n]) with no length
        # information of its own — an undersized or wrong-dtype buffer is
        # silent heap corruption, not an exception
        if (out.dtype != np.uint8 or not out.flags.c_contiguous
                or out.shape[:1] != (n,) or out.shape[1:] != (*canvas, 3)):
            raise ValueError(
                f"out must be a C-contiguous ({n}, {canvas[0]}, {canvas[1]}, "
                f"3) uint8 array, got {out.dtype} {out.shape}")
    if failed is not None and (
            failed.dtype != np.uint8 or not failed.flags.c_contiguous
            or failed.shape != (n,)):
        raise ValueError(
            f"failed must be a C-contiguous ({n},) uint8 array, got "
            f"{failed.dtype} {failed.shape}")
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failed_ptr = (
        failed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        if failed is not None else None
    )
    failures = lib.tic_decode_batch2(
        arr, n, canvas[0], canvas[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        nthreads or min(16, os.cpu_count() or 8),
        failed_ptr,
    )
    return out, failures
