"""ctypes bindings for the native (C++) accel packer.

The reference's acceleration-structure build is native C++
(``BVH::build``, reference src/bvh.h); ours is too on the host tier —
``native/accel_pack.cpp`` — with the numpy implementations in
``scene/accel.py`` / ``ops/intersect.py`` as the always-available fallback
and correctness reference (the test suite asserts they agree).  The library
is built on demand (g++ is a framework dependency, like the reference's).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_library(build_if_missing: bool = True) -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so_path = os.path.join(_repo_root(), "native", "libaccel_pack.so")
    src = os.path.join(_repo_root(), "native", "accel_pack.cpp")
    stale = (
        os.path.exists(so_path)
        and os.path.exists(src)
        and os.path.getmtime(so_path) < os.path.getmtime(src)
    )
    if (not os.path.exists(so_path) or stale) and build_if_missing:
        if os.path.exists(src):
            try:
                subprocess.check_call(
                    ["g++", "-O3", "-std=c++20", "-shared", "-fPIC",
                     "-o", so_path, src],
                    stderr=subprocess.DEVNULL,
                )
            except Exception:
                if stale:
                    pass  # keep using the existing (older) library
                else:
                    return None
    if not os.path.exists(so_path):
        return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    i64 = ctypes.c_int64
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.morton_argsort.argtypes = [f64p, u8p, i64, i64p]
    lib.build_woop.argtypes = [f64p, u8p, i64, f32p]
    lib.build_leaf_aabbs.argtypes = [f64p, u8p, i64, i64, f32p, f32p]
    # f32 entry points (templated twins; bit-identical to convert-then-pack).
    # getattr-guarded so a pre-built older .so still loads.
    if hasattr(lib, "build_woop_f32"):
        lib.morton_argsort_f32.argtypes = [f32p, u8p, i64, i64p]
        lib.build_woop_f32.argtypes = [f32p, u8p, i64, f32p]
        lib.build_leaf_aabbs_f32.argtypes = [f32p, u8p, i64, i64, f32p, f32p]
    if hasattr(lib, "sah_chunk_order"):
        lib.sah_chunk_order.argtypes = [f64p, u8p, i64, i64, i64p]
        lib.sah_chunk_order_f32.argtypes = [f32p, u8p, i64, i64, i64p]
    _LIB = lib
    return _LIB


def _verts_arg(lib, verts: np.ndarray, fn_name: str):
    """Pick the f32 or f64 entry point for ``verts``'s dtype, avoiding the
    60 MB-scale f32 -> f64 conversion the fixed-f64 ABI used to force."""
    if verts.dtype == np.float32 and hasattr(lib, fn_name + "_f32"):
        return getattr(lib, fn_name + "_f32"), np.ascontiguousarray(
            verts, dtype=np.float32
        )
    return getattr(lib, fn_name), np.ascontiguousarray(verts, dtype=np.float64)


def morton_argsort(verts: np.ndarray, valid: np.ndarray) -> Optional[np.ndarray]:
    lib = load_library()
    if lib is None:
        return None
    n = verts.shape[0]
    fn, v = _verts_arg(lib, verts, "morton_argsort")
    ok = np.ascontiguousarray(valid, dtype=np.uint8)
    perm = np.empty(n, dtype=np.int64)
    fn(v, ok, n, perm)
    return perm


def sah_chunk_order(
    verts: np.ndarray, valid: np.ndarray, chunk: int
) -> Optional[np.ndarray]:
    """Native chunk-aligned sweep-SAH ordering (see accel.sah_chunk_order).

    Tie order inside a sort differs from numpy's introsort, so the
    permutation is not bit-equal to the numpy build — both are valid builds
    of equal split quality (asserted by test_native_sah_quality)."""
    lib = load_library()
    if lib is None or not hasattr(lib, "sah_chunk_order"):
        return None
    n = verts.shape[0]
    fn, v = _verts_arg(lib, verts, "sah_chunk_order")
    ok = np.ascontiguousarray(valid, dtype=np.uint8)
    perm = np.empty(n, dtype=np.int64)
    fn(v, ok, n, chunk, perm)
    return perm


def build_woop(verts: np.ndarray, valid: np.ndarray) -> Optional[np.ndarray]:
    lib = load_library()
    if lib is None:
        return None
    n = verts.shape[0]
    fn, v = _verts_arg(lib, verts, "build_woop")
    ok = np.ascontiguousarray(valid, dtype=np.uint8)
    out = np.empty((4, 3 * n), dtype=np.float32)
    fn(v, ok, n, out)
    return out


def build_leaf_aabbs(
    verts: np.ndarray, valid: np.ndarray, leaf_size: int
):
    lib = load_library()
    if lib is None:
        return None
    n = verts.shape[0]
    fn, v = _verts_arg(lib, verts, "build_leaf_aabbs")
    ok = np.ascontiguousarray(valid, dtype=np.uint8)
    l = n // leaf_size
    out_min = np.empty((l, 3), dtype=np.float32)
    out_max = np.empty((l, 3), dtype=np.float32)
    fn(v, ok, n, leaf_size, out_min, out_max)
    return out_min, out_max
