"""Host-side Delaunay triangulation: native C++ core with ctypes binding.

The one pipeline stage that stays on the host (irregular, data-dependent —
the same conclusion the reference reached by vendoring Shewchuk's Triangle,
/root/reference/src/flame/utils/delaunay.cc:67). The native core
(flame_tpu/native/delaunay.cpp) implements incremental Bowyer-Watson and is
compiled on demand with g++; scipy.spatial.Delaunay is the fallback when no
compiler is available. Both produce the reference wrapper's output
contract: 0-indexed triangles (T, 3), unique undirected edges (E, 2), and
per-triangle neighbors (T, 3) with -1 on the hull
(reference utils/delaunay.cc:99-134).
"""

import ctypes
import os
import subprocess
import threading
from typing import NamedTuple, Optional

import numpy as np

_NATIVE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_NATIVE_DIR, "native", "delaunay.cpp")
_LIB = os.path.join(_NATIVE_DIR, "native", "_delaunay.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_native_failed = False


class Triangulation(NamedTuple):
    triangles: np.ndarray  # (T, 3) int32, positive signed area in y-down
    edges: np.ndarray  # (E, 2) int32, unique undirected
    neighbors: np.ndarray  # (T, 3) int32, -1 where none


def _build_native() -> bool:
    # Compile to a private temp path and rename atomically: two processes
    # rebuilding concurrently (pytest workers + bench) must never dlopen a
    # half-written .so.
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", tmp,
             _SRC],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _native_failed
    with _lock:
        if _lib is not None or _native_failed:
            return _lib
        if not os.path.exists(_LIB) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
            if not _build_native():
                _native_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
            lib.delaunay_triangulate.restype = ctypes.c_int
            lib.delaunay_triangulate.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            _lib = lib
        except Exception:
            _native_failed = True
        return _lib


def native_available() -> bool:
    return _load() is not None


def _triangulate_native(points: np.ndarray) -> Optional[Triangulation]:
    lib = _load()
    if lib is None:
        return None
    n = points.shape[0]
    pts = np.ascontiguousarray(points, dtype=np.float32)
    tri_cap = 2 * n + 8
    edge_cap = 3 * n + 8
    tri_out = np.empty((tri_cap, 3), np.int32)
    neigh_out = np.empty((tri_cap, 3), np.int32)
    edge_out = np.empty((edge_cap, 2), np.int32)
    n_tri = ctypes.c_int(0)
    n_edge = ctypes.c_int(0)

    ip = ctypes.POINTER(ctypes.c_int)
    rc = lib.delaunay_triangulate(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        tri_out.ctypes.data_as(ip), ctypes.byref(n_tri),
        edge_out.ctypes.data_as(ip), ctypes.byref(n_edge),
        neigh_out.ctypes.data_as(ip))
    if rc != 0:
        return None
    T, E = n_tri.value, n_edge.value
    # Canonicalize edges to sorted (lo, hi) rows lexicographically, the
    # SAME format the scipy fallback returns — consumers must not see a
    # different edge layout depending on which backend silently won.
    e = np.sort(edge_out[:E], axis=1)
    if E:
        e = e[np.lexsort((e[:, 1], e[:, 0]))]
    return Triangulation(triangles=tri_out[:T].copy(),
                         edges=np.ascontiguousarray(e),
                         neighbors=neigh_out[:T].copy())


def _triangulate_scipy(points: np.ndarray) -> Triangulation:
    from scipy.spatial import Delaunay as SDelaunay
    dt = SDelaunay(points.astype(np.float64), qhull_options="QJ")
    tris = dt.simplices.astype(np.int32)
    # scipy neighbors[i] is opposite vertex i — same slot convention.
    neigh = dt.neighbors.astype(np.int32)

    # Canonical winding: positive signed area (y-down visual CW).
    p = points[tris]
    area2 = ((p[:, 1, 0] - p[:, 0, 0]) * (p[:, 2, 1] - p[:, 0, 1])
             - (p[:, 1, 1] - p[:, 0, 1]) * (p[:, 2, 0] - p[:, 0, 0]))
    flip = area2 < 0
    # Swapping v1<->v2 also swaps neighbor slots 1<->2.
    tris[flip] = tris[flip][:, [0, 2, 1]]
    neigh[flip] = neigh[flip][:, [0, 2, 1]]
    # Drop zero-area slivers (QJ joggling triangulates exactly-collinear
    # runs into degenerate triangles the native backend never emits;
    # the docstring contract is positive signed area). Remap neighbors.
    keep = area2 != 0
    if not keep.all():
        remap = np.full(tris.shape[0], -1, np.int32)
        remap[keep] = np.arange(int(keep.sum()), dtype=np.int32)
        tris = tris[keep]
        neigh = neigh[keep]
        neigh = np.where(neigh >= 0, remap[np.maximum(neigh, 0)], -1)

    edges = set()
    for t in tris:
        for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            edges.add((min(a, b), max(a, b)))
    edges = np.array(sorted(edges), np.int32) if edges else \
        np.zeros((0, 2), np.int32)
    return Triangulation(triangles=tris, edges=edges, neighbors=neigh)


def triangulate(points: np.ndarray) -> Triangulation:
    """Delaunay-triangulate (N, 2) float points. N >= 3 required."""
    points = np.asarray(points, dtype=np.float32)
    if points.ndim != 2 or points.shape[1] != 2 or points.shape[0] < 3:
        raise ValueError("need (N>=3, 2) points")
    result = _triangulate_native(points)
    if result is None:
        result = _triangulate_scipy(points)
    return result
