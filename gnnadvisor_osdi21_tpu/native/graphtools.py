"""ctypes bindings for the native graph-preprocessing library.

The reference binds its C++ through pybind11 (GNNAdvisor.cpp:253-263,
reorder.cpp:293-295); pybind11 isn't available in this environment, so we
use a plain C ABI + ctypes.  The library auto-builds on first use (g++
-O3 -fopenmp) and callers fall back to the NumPy implementations when the
toolchain is unavailable (see graphs/reorder.py, graphs/loader.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "graphtools.cpp")
_SO = os.path.join(_HERE, "libgraphtools.so")
_lock = threading.Lock()
_lib = None


def _build() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        _SRC, "-o", _SO,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.gt_parse_edge_list.restype = ctypes.c_int64
        lib.gt_parse_edge_list.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
        ]
        lib.gt_rabbit_permutation.restype = ctypes.c_int
        lib.gt_rabbit_permutation.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.gt_build_parts.restype = ctypes.c_int64
        lib.gt_build_parts.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def parse_edge_list(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Parse 'src dst' lines (# comments) → (src, dst) int64 arrays."""
    lib = get_lib()
    n = lib.gt_parse_edge_list(path.encode(), None, None, 0)
    if n < 0:
        raise IOError(f"cannot parse {path}")
    src = np.empty(n, dtype=np.int64)
    dst = np.empty(n, dtype=np.int64)
    n2 = lib.gt_parse_edge_list(
        path.encode(), _ptr(src, ctypes.c_int64), _ptr(dst, ctypes.c_int64), n
    )
    assert n2 == n
    return src, dst


def rabbit_permutation(edge_index: np.ndarray, num_nodes: int) -> np.ndarray:
    """Community-reordering permutation (old id → new id)."""
    lib = get_lib()
    src = np.ascontiguousarray(edge_index[0], dtype=np.int64)
    dst = np.ascontiguousarray(edge_index[1], dtype=np.int64)
    perm = np.empty(num_nodes, dtype=np.int64)
    rc = lib.gt_rabbit_permutation(
        _ptr(src, ctypes.c_int64), _ptr(dst, ctypes.c_int64),
        len(src), num_nodes, _ptr(perm, ctypes.c_int64),
    )
    if rc != 0:
        raise ValueError("rabbit_permutation failed (bad edge ids?)")
    return perm


def build_parts(
    row_pointers: np.ndarray, part_size: int
) -> tuple[np.ndarray, np.ndarray]:
    """Ragged (partPtr, part2Node) descriptors (GNNAdvisor.cpp:210-251)."""
    lib = get_lib()
    rp = np.ascontiguousarray(row_pointers, dtype=np.int32)
    n = len(rp) - 1
    count = lib.gt_build_parts(_ptr(rp, ctypes.c_int32), n, part_size, None, None, 0)
    part_ptr = np.empty(count + 1, dtype=np.int32)
    part2node = np.empty(count, dtype=np.int32)
    lib.gt_build_parts(
        _ptr(rp, ctypes.c_int32), n, part_size,
        _ptr(part_ptr, ctypes.c_int32), _ptr(part2node, ctypes.c_int32), count,
    )
    return part_ptr, part2node
