"""ctypes binding for the native graph walker (m2h_native.cc).

Builds lazily with make on first use if the .so is missing; every entry point
has a pure-python fallback in env/scene.py, so the framework degrades
gracefully when no C++ toolchain is present."""

import ctypes
import os
import subprocess
from typing import Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libm2h_native.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        subprocess.run(
            ["make", "-C", _HERE], check=True, capture_output=True
        )
    lib = ctypes.CDLL(_SO)
    lib.m2h_graph_create.restype = ctypes.c_void_p
    lib.m2h_graph_create.argtypes = [
        ctypes.c_int32,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    ]
    lib.m2h_graph_destroy.argtypes = [ctypes.c_void_p]
    lib.m2h_shortest_path_steps.restype = ctypes.c_int32
    lib.m2h_shortest_path_steps.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32
    ]
    lib.m2h_forward_neighbor.restype = ctypes.c_int32
    lib.m2h_forward_neighbor.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32
    ]
    lib.m2h_geodesic_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int32,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    ]
    _lib = lib
    return lib


class NativeGraph:
    def __init__(self, positions: np.ndarray, neighbors: Sequence[Sequence[int]]):
        lib = _load()
        n = len(positions)
        adj_off = np.zeros(n + 1, np.int32)
        flat = []
        for i, ns in enumerate(neighbors):
            flat.extend(int(x) for x in ns)
            adj_off[i + 1] = len(flat)
        adj = np.asarray(flat, np.int32)
        pos = np.ascontiguousarray(positions, np.float64)
        self._lib = lib
        self._handle = lib.m2h_graph_create(n, pos, adj, adj_off)

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.m2h_graph_destroy(self._handle)
            self._handle = None

    def shortest_path_steps(self, a: int, b: int) -> int:
        return int(self._lib.m2h_shortest_path_steps(self._handle, a, b))

    def forward_neighbor(self, node: int, orientation: int) -> int:
        return int(self._lib.m2h_forward_neighbor(self._handle, node, orientation))

    def geodesic_batch(self, a, b) -> np.ndarray:
        a = np.ascontiguousarray(a, np.int32)
        b = np.ascontiguousarray(b, np.int32)
        out = np.zeros(len(a), np.int32)
        self._lib.m2h_geodesic_batch(self._handle, len(a), a, b, out)
        return out
