"""Spatial-neighbor queries backed by the native grid-hash engine.

The reference's host-side coordinate analytics all funnel into scipy's
cKDTree / sklearn's DBSCAN (`atomai/utils/coords.py:86-149,304-400`,
`atomai/utils/graphx.py:60-127`). Atom coordinates are near-uniform
lattices — the best case for uniform-grid bucketing — so the native
engine (`neighbors.cpp`) hashes points into an eps/auto-sized grid and
answers k-NN, ball, pair and DBSCAN queries from the 3^d cell
neighborhood. Every function here transparently falls back to the
scipy/sklearn oracle when the toolchain is unavailable or
``ATOMAI_TPU_NATIVE=0``.

Conventions match the scipy originals exactly (they are oracle-tested in
``tests/native/test_neighbors.py``): k-NN misses report ``dist=inf,
idx=n``; ball queries return ascending neighbor ids; DBSCAN labels noise
as ``-1`` with clusters numbered by first-discovered core point.
"""

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

from . import _BUILD_DIR, _DIR, compile_lib

_LIB_PATH = os.path.join(_BUILD_DIR, "libneighbors.so")
_SRC_PATH = os.path.join(_DIR, "neighbors.cpp")
_lib = None
_build_failed = False

_F64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_I32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_I64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    try:
        lib = compile_lib(_SRC_PATH, _LIB_PATH)
        lib.nn_knn.argtypes = [
            ctypes.c_int, ctypes.c_int, _F64, ctypes.c_int, _F64,
            ctypes.c_int, ctypes.c_double, _F64, _I32]
        lib.nn_ball_csr.argtypes = [
            ctypes.c_int, ctypes.c_int, _F64, ctypes.c_int, _F64,
            ctypes.c_double, _I64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32))]
        lib.nn_pairs.restype = ctypes.c_int64
        lib.nn_pairs.argtypes = [
            ctypes.c_int, ctypes.c_int, _F64, ctypes.c_double,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32))]
        lib.nn_dbscan.argtypes = [
            ctypes.c_int, ctypes.c_int, _F64, ctypes.c_double,
            ctypes.c_int, _I32]
        lib.nn_free.argtypes = [ctypes.POINTER(ctypes.c_int32)]
        return lib
    except Exception:
        _build_failed = True
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    if os.environ.get("ATOMAI_TPU_NATIVE", "1") in ("0", "false", "off"):
        return None
    global _lib
    if _lib is None and not _build_failed:
        _lib = _build()
    return _lib


def _as_pts(a: np.ndarray) -> np.ndarray:
    a = np.ascontiguousarray(a, np.float64)
    if a.ndim == 1:
        a = a[None, :]
    return a


def knn(points: np.ndarray, queries: np.ndarray, k: int,
        upper_bound: Optional[float] = None
        ) -> Tuple[np.ndarray, np.ndarray]:
    """k nearest data points for each query — ``cKDTree.query`` semantics
    (misses beyond ``upper_bound``: dist=inf, idx=len(points))."""
    points, queries = _as_pts(points), _as_pts(queries)
    n, dim = points.shape
    nq = len(queries)
    ub = np.inf if upper_bound is None else float(upper_bound)
    lib = get_lib()
    if lib is not None and n > 0 and dim in (2, 3):
        d = np.empty((nq, k), np.float64)
        i = np.empty((nq, k), np.int32)
        lib.nn_knn(n, dim, points, nq, queries, int(k), ub, d, i)
        return d, i.astype(np.int64)
    from scipy import spatial
    d, i = spatial.cKDTree(points).query(queries, k=k,
                                         distance_upper_bound=ub)
    return d.reshape(nq, k), i.reshape(nq, k)


def ball_query(points: np.ndarray, queries: np.ndarray, r: float
               ) -> List[np.ndarray]:
    """Ascending ids of all data points within ``r`` of each query —
    ``cKDTree.query_ball_point`` semantics."""
    points, queries = _as_pts(points), _as_pts(queries)
    n, dim = points.shape
    nq = len(queries)
    lib = get_lib()
    if lib is not None and n > 0 and dim in (2, 3):
        indptr = np.empty(nq + 1, np.int64)
        idx_p = ctypes.POINTER(ctypes.c_int32)()
        lib.nn_ball_csr(n, dim, points, nq, queries, float(r), indptr,
                        ctypes.byref(idx_p))
        total = int(indptr[-1])
        flat = np.ctypeslib.as_array(idx_p, (max(total, 1),))[
            :total].astype(np.int64)
        lib.nn_free(idx_p)
        return [flat[indptr[i]:indptr[i + 1]] for i in range(nq)]
    from scipy import spatial
    out = spatial.cKDTree(points).query_ball_point(queries, r=float(r))
    return [np.sort(np.asarray(o, np.int64)) for o in out]


def query_pairs(points: np.ndarray, r: float) -> np.ndarray:
    """All unique index pairs (i < j) within ``r`` — ``cKDTree.query_pairs``
    (row order unspecified; callers needing determinism sort)."""
    points = _as_pts(points)
    n, dim = points.shape
    lib = get_lib()
    if lib is not None and n > 0 and dim in (2, 3):
        pairs_p = ctypes.POINTER(ctypes.c_int32)()
        m = int(lib.nn_pairs(n, dim, points, float(r),
                             ctypes.byref(pairs_p)))
        pairs = np.ctypeslib.as_array(pairs_p, (max(2 * m, 1),))[
            :2 * m].astype(np.int64).reshape(m, 2)
        lib.nn_free(pairs_p)
        return pairs
    from scipy import spatial
    return spatial.cKDTree(points).query_pairs(
        float(r), output_type="ndarray").astype(np.int64).reshape(-1, 2)


def dbscan(points: np.ndarray, eps: float, min_samples: int) -> np.ndarray:
    """DBSCAN cluster labels (noise = -1) — sklearn semantics."""
    points = _as_pts(points)
    n, dim = points.shape
    lib = get_lib()
    if lib is not None and n > 0 and dim in (2, 3):
        labels = np.empty(n, np.int32)
        lib.nn_dbscan(n, dim, points, float(eps), int(min_samples), labels)
        return labels.astype(np.int64)
    from sklearn import cluster as _cluster
    return _cluster.DBSCAN(eps=float(eps),
                           min_samples=int(min_samples)
                           ).fit(points).labels_.astype(np.int64)
