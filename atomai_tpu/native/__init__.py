"""Native (C++) runtime components, loaded via ctypes.

Built on demand with g++ (cached next to the sources); every consumer has
a pure-Python fallback, so missing toolchains degrade gracefully.
"""

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
# built artifacts live under .cache/ — not a valid module name, so package
# walkers never mistake the ctypes libraries for CPython extension modules
_BUILD_DIR = os.path.join(_DIR, ".cache")
_LIB_PATH = os.path.join(_BUILD_DIR, "libgraph_rings.so")
_SRC_PATH = os.path.join(_DIR, "graph_rings.cpp")
_lib = None
_build_failed = False


def compile_lib(src_path: str, lib_path: str) -> ctypes.CDLL:
    """g++-compiles ``src_path`` into a shared object (skipped when the
    cached .so is newer than the source) and dlopens it.

    Compiles to a per-PID temp file and atomically renames into place:
    concurrent processes (pytest workers) racing `g++ -o` on the same
    path could dlopen a partially written .so."""
    if (not os.path.exists(lib_path) or
            os.path.getmtime(lib_path) < os.path.getmtime(src_path)):
        os.makedirs(os.path.dirname(lib_path), exist_ok=True)
        tmp_path = f"{lib_path}.{os.getpid()}.tmp"
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 src_path, "-o", tmp_path],
                check=True, capture_output=True)
            os.replace(tmp_path, lib_path)
        finally:
            if os.path.exists(tmp_path):
                os.unlink(tmp_path)
    return ctypes.CDLL(lib_path)


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    try:
        lib = compile_lib(_SRC_PATH, _LIB_PATH)
        lib.find_rings_native.restype = ctypes.c_int
        lib.find_rings_native.argtypes = [
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ]
        lib.free_buffer.argtypes = [ctypes.POINTER(ctypes.c_int32)]
        return lib
    except Exception:
        _build_failed = True
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    # same kill-switch neighbors.get_lib honors: the Python fallback must
    # be reachable for EVERY native component, not just the neighbor lib
    if os.environ.get("ATOMAI_TPU_NATIVE", "1") in ("0", "false", "off"):
        return None
    global _lib
    if _lib is None and not _build_failed:
        _lib = _build()
    return _lib


def find_rings_native(adjacency: List[List[int]], max_depth: int,
                      filter_filled: bool = True
                      ) -> Optional[List[List[int]]]:
    """Ring search on a CSR-ified adjacency; returns None if the native
    library is unavailable (callers fall back to Python)."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(adjacency)
    indptr = np.zeros(n + 1, np.int64)
    for i, nb in enumerate(adjacency):
        indptr[i + 1] = indptr[i] + len(nb)
    indices = np.zeros(max(int(indptr[-1]), 1), np.int32)
    off = 0
    for nb in adjacency:
        for v in nb:
            indices[off] = v
            off += 1
    flat_p = ctypes.POINTER(ctypes.c_int32)()
    sizes_p = ctypes.POINTER(ctypes.c_int32)()
    n_rings = lib.find_rings_native(
        n, indptr, indices, int(max_depth), int(filter_filled),
        ctypes.byref(flat_p), ctypes.byref(sizes_p))
    sizes = np.ctypeslib.as_array(sizes_p, (max(n_rings, 1),))[
        :n_rings].copy()
    total = int(sizes.sum())
    flat = np.ctypeslib.as_array(flat_p, (max(total, 1),))[:total].copy()
    lib.free_buffer(flat_p)
    lib.free_buffer(sizes_p)
    rings, off = [], 0
    for s in sizes:
        rings.append(flat[off:off + s].tolist())
        off += s
    return rings
