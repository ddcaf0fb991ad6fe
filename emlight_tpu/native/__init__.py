"""ctypes bindings for the native data-loading runtime (exr_native.cpp).

Auto-builds libemlight_native.so with g++ on first import (cached next to the
source); every entry point has a pure-Python fallback (core/exr.py,
core/hdr.py), so the framework works without a compiler — the native path is
the fast lane for input pipelines.

API:
  available() -> bool
  read_exr(path) -> (H, W, 3) float32
  write_exr(path, arr, half=False)
  load_batch(paths, out_hw, tonemap=None, n_threads=0)
      -> (N, H, W, 3) float32, alphas (N,) — threaded decode + area resize +
         optional TonemapHDR (gamma, percentile, max_mapping) per sample
  tonemap_alpha(img, gamma, percentile, max_mapping, apply=False)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "exr_native.cpp")
_SO = os.path.join(_DIR, "libemlight_native.so")

_lib = None
_lock = threading.Lock()
_build_error: str | None = None


def _build() -> str | None:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _SO, "-lz", "-pthread",
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired) as e:  # no compiler / hang
        return str(e)
    return None if r.returncode == 0 else r.stderr[-2000:]


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            err = _build()
            if err is not None:
                _build_error = err
                return None
        lib = ctypes.CDLL(_SO)
        lib.emlight_last_error.restype = ctypes.c_char_p
        lib.emlight_exr_dims.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                                         ctypes.POINTER(ctypes.c_int)]
        lib.emlight_read_exr.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                                         ctypes.c_int, ctypes.c_int]
        lib.emlight_write_exr.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                                          ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.emlight_tonemap_alpha.restype = ctypes.c_float
        lib.emlight_tonemap_alpha.argtypes = [ctypes.POINTER(ctypes.c_float),
                                              ctypes.c_longlong, ctypes.c_float,
                                              ctypes.c_float, ctypes.c_float, ctypes.c_int]
        lib.emlight_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_error() -> str | None:
    _load()
    return _build_error


def _check(rc: int, ctx: str):
    if rc != 0:
        raise IOError(f"{ctx}: {_lib.emlight_last_error().decode()}")


def read_exr(path: str) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_build_error}")
    h = ctypes.c_int()
    w = ctypes.c_int()
    _check(lib.emlight_exr_dims(path.encode(), ctypes.byref(h), ctypes.byref(w)),
           f"dims {path}")
    out = np.empty((h.value, w.value, 3), dtype=np.float32)
    _check(lib.emlight_read_exr(path.encode(),
                                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                                h.value, w.value), f"read {path}")
    return out


def write_exr(path: str, arr: np.ndarray, half: bool = False) -> None:
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_build_error}")
    arr = np.ascontiguousarray(arr, dtype=np.float32)
    h, w, c = arr.shape
    assert c == 3, "native writer is RGB-only"
    _check(lib.emlight_write_exr(path.encode(),
                                 arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                                 h, w, int(half)), f"write {path}")


def tonemap_alpha(img: np.ndarray, gamma: float = 2.4, percentile: float = 50.0,
                  max_mapping: float = 0.5, apply: bool = False):
    """TonemapHDR alpha (and optionally the tonemapped image, in place)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_build_error}")
    img = np.ascontiguousarray(img, dtype=np.float32)
    alpha = lib.emlight_tonemap_alpha(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), img.size,
        gamma, percentile, max_mapping, int(apply),
    )
    return (img, float(alpha)) if apply else float(alpha)


def load_batch(paths: list[str], out_hw: tuple[int, int],
               tonemap: tuple[float, float, float] | None = None,
               n_threads: int = 0):
    """Threaded decode + area-resize (+ TonemapHDR when `tonemap` is given).

    Returns (imgs (N, H, W, 3) float32, alphas (N,) or None).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_build_error}")
    n = len(paths)
    h, w = out_hw
    out = np.empty((n, h, w, 3), dtype=np.float32)
    alphas = np.empty(n, dtype=np.float32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    gamma, pct, mm = tonemap if tonemap else (2.4, 50.0, 0.5)
    rc = lib.emlight_load_batch(
        c_paths, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w,
        int(tonemap is not None), gamma, pct, mm,
        alphas.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads,
    )
    _check(rc, "load_batch")
    return out, (alphas if tonemap is not None else None)
