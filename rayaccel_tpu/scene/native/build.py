"""Compile-on-demand + ctypes bindings for the native scene compiler."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "scene_compiler.cpp")
_SO = os.path.join(_DIR, "_scene_compiler.so")

_lock = threading.Lock()
_lib = None
_failed = False


def _compile() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           "-pthread", _SRC, "-o", _SO + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        os.replace(_SO + ".tmp", _SO)
        return True
    except (subprocess.SubprocessError, OSError):
        return False


def get_library():
    """Load (building if needed) the native library, or None."""
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if os.environ.get("RACC_NO_NATIVE") == "1":
            _failed = True
            return None
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _compile():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _failed = True
            return None

        i64 = ctypes.c_int64
        lib.racc_build_bvh.restype = i64
        lib.racc_build_bvh.argtypes = [
            ctypes.c_void_p, i64, ctypes.c_void_p, i64, ctypes.c_int]
        lib.racc_fetch_bvh.restype = None
        lib.racc_fetch_bvh.argtypes = [ctypes.c_void_p] * 7
        lib.racc_release.restype = None
        lib.racc_release.argtypes = []
        lib.racc_pair_leaf.restype = i64
        lib.racc_pair_leaf.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, i64,
            ctypes.c_void_p, ctypes.c_void_p]
        lib.racc_pair_all.restype = i64
        lib.racc_pair_all.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, i64, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_library() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def build_bvh_native(vertices: np.ndarray, indices: np.ndarray,
                     max_leaf: int):
    """Native full-sweep SAH build. Returns the same tuple of arrays the
    NumPy builder produces (see scene/bvh.py Bvh2), or None."""
    lib = get_library()
    if lib is None:
        return None
    verts = np.ascontiguousarray(vertices, np.float32)
    idx = np.ascontiguousarray(indices, np.uint32)
    T = idx.shape[0]
    n = lib.racc_build_bvh(_ptr(verts), verts.shape[0], _ptr(idx), T,
                           int(max_leaf))
    if n < 0:
        return None
    kind = np.empty(n, np.uint8)
    first = np.empty(n, np.int64)
    last = np.empty(n, np.int64)
    parent = np.empty(n, np.int64)
    bbmin = np.empty((n, 3), np.float32)
    bbmax = np.empty((n, 3), np.float32)
    prim_order = np.empty(T, np.int64)
    lib.racc_fetch_bvh(_ptr(kind), _ptr(first), _ptr(last), _ptr(parent),
                       _ptr(bbmin), _ptr(bbmax), _ptr(prim_order))
    lib.racc_release()
    return kind, first, last, parent, bbmin, bbmax, prim_order


def pair_all_native(vertices: np.ndarray, indices: np.ndarray, bvh):
    """Pair every leaf in one native call. Returns
    (pair_rows, remap, leaf_first, leaf_last) or None."""
    lib = get_library()
    if lib is None:
        return None
    verts = np.ascontiguousarray(vertices, np.float32)
    idx = np.ascontiguousarray(indices, np.uint32)
    kind = np.ascontiguousarray(bvh.kind, np.uint8)
    first = np.ascontiguousarray(bvh.first, np.int64)
    last = np.ascontiguousarray(bvh.last, np.int64)
    prim = np.ascontiguousarray(bvh.prim_order, np.int64)
    T = idx.shape[0]
    n_nodes = len(kind)
    rows = np.empty((T, 12), np.float32)
    remap = np.empty(2 * T, np.uint32)
    leaf_first = np.empty(n_nodes, np.int64)
    leaf_last = np.empty(n_nodes, np.int64)
    n = lib.racc_pair_all(_ptr(verts), _ptr(idx), _ptr(kind), _ptr(first),
                          _ptr(last), n_nodes, _ptr(prim), _ptr(rows),
                          _ptr(remap), _ptr(leaf_first), _ptr(leaf_last))
    return rows[:n].copy(), remap[:2 * n].copy(), leaf_first, leaf_last


def pair_leaves_native(vertices: np.ndarray, indices: np.ndarray,
                       tri_ids: np.ndarray):
    """Pair one leaf's triangles natively. Returns (pair_rows, remap)."""
    lib = get_library()
    if lib is None:
        return None
    verts = np.ascontiguousarray(vertices, np.float32)
    idx = np.ascontiguousarray(indices, np.uint32)
    ids = np.ascontiguousarray(tri_ids, np.int64)
    count = len(ids)
    rows = np.empty((count, 12), np.float32)
    remap = np.empty(2 * count, np.uint32)
    n = lib.racc_pair_leaf(_ptr(verts), _ptr(idx), _ptr(ids), count,
                           _ptr(rows), _ptr(remap))
    return rows[:n], remap[:2 * n]
