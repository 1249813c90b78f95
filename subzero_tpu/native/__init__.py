"""ctypes binding for the native polygon-boolean engine.

Builds ``polyboolean.cpp`` into a shared library on first use (g++ -O2; no
pybind11 in this environment) and exposes:

    poly_boolean(p, q, op) -> list of contour arrays [k, 2]

where p/q are single contours ``[n, 2]`` or lists of contours (outer CCW,
holes CW) and op is one of "int", "uni", "dif", "xor" — the same op names
the reference's MEX wrapper takes (``polyclip.m:24-36``).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "polyboolean.cpp"
_LIB = _HERE / "libpolyboolean.so"

_OPS = {"int": 0, "uni": 1, "dif": 2, "xor": 3}

_lib = None


def _build() -> None:
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-o", str(_LIB),
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        _build()
    lib = ctypes.CDLL(str(_LIB))
    lib.subzero_poly_boolean.restype = ctypes.c_int
    lib.subzero_poly_boolean.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32, ctypes.c_int32,
    ]
    lib.subzero_poly_area.restype = ctypes.c_double
    lib.subzero_poly_area.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
    ]
    _lib = lib
    return lib


def _flatten(poly) -> tuple[np.ndarray, np.ndarray]:
    if isinstance(poly, np.ndarray) and poly.ndim == 2:
        poly = [poly]
    pts = np.concatenate([np.asarray(c, dtype=np.float64) for c in poly])
    sizes = np.array([len(c) for c in poly], dtype=np.int32)
    return np.ascontiguousarray(pts), sizes


def poly_boolean(p, q, op: str, max_pts: int = 65536,
                 max_contours: int = 1024) -> list[np.ndarray]:
    """Boolean of two polygons; returns result contours (CCW outer, CW hole).

    The native engine signals -1 only when the *output* exceeds the caller's
    buffers (polyboolean.cpp:309) — the result itself is fine — so the
    wrapper retries with 4x buffers (dense packs at 10k+ floes produce
    channel-network differences with very many contours)."""
    lib = _load()
    p_pts, p_sizes = _flatten(p)
    q_pts, q_sizes = _flatten(q)
    n = -1
    for _ in range(5):
        out_pts = np.empty((max_pts, 2), dtype=np.float64)
        out_sizes = np.empty((max_contours,), dtype=np.int32)
        n = lib.subzero_poly_boolean(
            p_pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            p_sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(p_sizes),
            q_pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            q_sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(q_sizes),
            _OPS[op],
            out_pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            out_sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            max_pts, max_contours,
        )
        if n >= 0:
            break
        max_pts *= 4
        max_contours *= 4
    if n < 0:
        raise RuntimeError("poly_boolean: result buffer overflow")
    res = []
    off = 0
    for i in range(n):
        res.append(out_pts[off:off + out_sizes[i]].copy())
        off += out_sizes[i]
    return res


def poly_area(p: np.ndarray) -> float:
    lib = _load()
    p = np.ascontiguousarray(np.asarray(p, dtype=np.float64))
    return float(lib.subzero_poly_area(
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(p)))


def union_all(polys: list) -> list[np.ndarray]:
    """Union of many polygons (left fold)."""
    if not polys:
        return []
    acc = [np.asarray(polys[0], dtype=np.float64)]
    for p in polys[1:]:
        acc = poly_boolean(acc, p, "uni")
    return acc
