"""ctypes loader for the native C++ host preprocessing
(pynngp_tpu/cpp/nngp_native.cpp) — the framework's native runtime components
(reference analog: the C++ ``utils.cpp`` tree builder / reverse index,
SURVEY.md section 2).

The shared library is built on demand with g++ (no pybind11 in this image;
plain C ABI + ctypes keeps the binding layer dependency-free).  The source
ships as package data, so the lazy build works from an installed wheel too;
the build artifact goes to a user-writable cache directory (site-packages
may be read-only).  Every entry point has a pure-Python fallback in
:mod:`pynngp_tpu.neighbors`, selected automatically if the toolchain is
unavailable.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import tempfile
import threading

import numpy as np

__all__ = ["get_lib", "native_available", "neighbor_table", "children_table",
           "color_moral", "order_maxmin"]

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "cpp", "nngp_native.cpp")
_lock = threading.Lock()
_lib = None
_failed = False


def _lib_path() -> str:
    """Cache path keyed by the source hash: a new package version rebuilds,
    and concurrent versions never collide."""
    with open(_SRC, "rb") as fh:
        digest = hashlib.sha256(fh.read()).hexdigest()[:16]
    cache_root = os.environ.get("PYNNGP_NATIVE_CACHE") or os.path.join(
        os.environ.get("XDG_CACHE_HOME")
        or os.path.join(os.path.expanduser("~"), ".cache"),
        "pynngp_tpu",
    )
    try:
        os.makedirs(cache_root, exist_ok=True)
        probe = os.path.join(cache_root, ".w")
        with open(probe, "w"):
            pass
        os.unlink(probe)
    except OSError:  # pragma: no cover - fall back to tmp
        cache_root = os.path.join(tempfile.gettempdir(), "pynngp_tpu")
        os.makedirs(cache_root, exist_ok=True)
    return os.path.join(cache_root, f"libnngp_native-{digest}.so")


def _build(lib_path: str) -> bool:
    import shutil

    if shutil.which("g++") is None:  # fast-fail: no 2x compile-timeout stall
        print("pynngp_tpu: g++ not found; using python fallbacks",
              file=sys.stderr)
        return False
    tmp = lib_path + f".tmp{os.getpid()}"
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-o", tmp, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=60)
        os.replace(tmp, lib_path)
        return True
    except Exception:
        # retry without -march=native / openmp (portability)
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, _SRC],
                check=True, capture_output=True, timeout=60,
            )
            os.replace(tmp, lib_path)
            return True
        except Exception as e:  # pragma: no cover
            print(f"pynngp_tpu: native build failed ({e}); using python "
                  "fallbacks", file=sys.stderr)
            return False


def get_lib():
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        _LIB = _lib_path()
        if not os.path.exists(_LIB):
            if not _build(_LIB):
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:  # pragma: no cover
            _failed = True
            return None
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.nngp_neighbor_table.argtypes = [
            f64p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, i32p, u8p,
        ]
        lib.nngp_neighbor_table.restype = None
        lib.nngp_children_table.argtypes = [
            i32p, u8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.nngp_children_table.restype = ctypes.c_int32
        lib.nngp_color_moral.argtypes = [
            i32p, u8p, i32p, i32p, u8p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, i32p,
        ]
        lib.nngp_color_moral.restype = ctypes.c_int32
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.nngp_order_maxmin.argtypes = [
            f64p, ctypes.c_int32, ctypes.c_int32, i64p,
        ]
        lib.nngp_order_maxmin.restype = ctypes.c_int32
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def neighbor_table(pts_ordered: np.ndarray, m: int):
    """(nn_idx, nn_mask) of m nearest preceding neighbors (ordered space)."""
    lib = get_lib()
    assert lib is not None
    pts = np.ascontiguousarray(pts_ordered, np.float64)
    n, d = pts.shape
    nn_idx = np.zeros((n, m), np.int32)
    nn_mask = np.zeros((n, m), np.uint8)
    lib.nngp_neighbor_table(pts, n, d, m, nn_idx, nn_mask)
    return nn_idx, nn_mask.astype(bool)


def children_table(nn_idx: np.ndarray, nn_mask: np.ndarray):
    lib = get_lib()
    assert lib is not None
    nn_idx = np.ascontiguousarray(nn_idx, np.int32)
    mask_u8 = np.ascontiguousarray(nn_mask, np.uint8)
    n, m = nn_idx.shape
    max_c = int(lib.nngp_children_table(nn_idx, mask_u8, n, m, 0, None, None, None))
    child_idx = np.zeros((n, max_c), np.int32)
    child_slot = np.zeros((n, max_c), np.int32)
    child_mask = np.zeros((n, max_c), np.uint8)
    lib.nngp_children_table(
        nn_idx, mask_u8, n, m, max_c,
        child_idx.ctypes.data_as(ctypes.c_void_p),
        child_slot.ctypes.data_as(ctypes.c_void_p),
        child_mask.ctypes.data_as(ctypes.c_void_p),
    )
    return child_idx, child_slot, child_mask.astype(bool)


def order_maxmin(coords: np.ndarray):
    """Exact max-min ordering (d <= 3), or None when unsupported — caller
    falls back to the python lazy-kd-tree path (neighbors.order_maxmin)."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(coords, np.float64)
    n, d = pts.shape
    if d > 3:
        return None
    order = np.zeros(n, np.int64)
    rc = lib.nngp_order_maxmin(pts, n, d, order)
    return order if rc == 0 else None


def color_moral(nn_idx, nn_mask, child_idx, child_slot, child_mask):
    lib = get_lib()
    assert lib is not None
    n, m = nn_idx.shape
    max_c = child_idx.shape[1]
    colors = np.zeros(n, np.int32)
    lib.nngp_color_moral(
        np.ascontiguousarray(nn_idx, np.int32),
        np.ascontiguousarray(nn_mask, np.uint8),
        np.ascontiguousarray(child_idx, np.int32),
        np.ascontiguousarray(child_slot, np.int32),
        np.ascontiguousarray(child_mask, np.uint8),
        n, m, max_c, colors,
    )
    return colors
