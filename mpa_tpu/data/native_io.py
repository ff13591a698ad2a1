"""ctypes bindings for the native point-cloud text parser (native/pointio.cpp).

Compiled on first use with g++ -O3 into native/build/ and cached; every entry
point falls back to numpy when the toolchain or .so is unavailable, so the
framework never hard-depends on the native path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "pointio.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_SO = os.path.join(_BUILD_DIR, "libpointio.so")

_lib = None
_lock = threading.Lock()


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        stale = os.path.exists(_SO) and os.path.exists(_SRC) and (
            os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        )
        if not os.path.exists(_SO) or stale:
            if not os.path.exists(_SRC):
                return None
            os.makedirs(_BUILD_DIR, exist_ok=True)
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC, "-lpthread"],
                    check=True,
                    capture_output=True,
                )
            except (subprocess.CalledProcessError, FileNotFoundError):
                return None
        lib = ctypes.CDLL(_SO)
        lib.pointio_parse_file.restype = ctypes.c_long
        lib.pointio_parse_file.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.c_int,
        ]
        lib.pointio_parse_many.restype = None
        lib.pointio_parse_many.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_long),
            ctypes.c_long,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.pointio_fps.restype = None
        lib.pointio_fps.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.c_int,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_long),
        ]
        lib.pointio_fps_many.restype = None
        lib.pointio_fps_many.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_long),
            ctypes.c_long,
            ctypes.c_long,
            ctypes.c_int,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_long),
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def loadtxt(path: str, n_cols: int, max_rows: int = 1 << 18) -> np.ndarray:
    """Drop-in for np.loadtxt on numeric point files (whitespace/comma)."""
    lib = _load()
    if lib is None:
        with open(path) as f:
            delim = None if " " in f.readline() else ","
        return np.loadtxt(path, delimiter=delim).astype(np.float32)
    out = np.empty((max_rows, n_cols), np.float32)
    rows = lib.pointio_parse_file(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_rows, n_cols,
    )
    if rows < 0:
        raise FileNotFoundError(path)
    if rows >= max_rows:
        raise ValueError(
            f"{path}: file has >= max_rows={max_rows} rows; raise max_rows "
            "(refusing to silently truncate)"
        )
    return out[:rows].copy()


def _fps_numpy(points: np.ndarray, n: int) -> np.ndarray:
    """Reference offline FPS (dataset/ModelNetDataLoader.py:20-41 semantics):
    start at row 0, float32 min-distance table, first-occurrence argmax."""
    N = points.shape[0]
    out = np.zeros((n,), dtype=np.int64)
    dist = np.full((N,), np.inf)
    far = 0
    for i in range(n):
        out[i] = far
        d = np.sum((points[:, :3] - points[far, :3]) ** 2, axis=-1)
        dist = np.minimum(dist, d)
        far = int(np.argmax(dist))
    return out


def fps_indices(points: np.ndarray, n: int) -> np.ndarray:
    """Exact host-side FPS indices for one cloud ``[N, C>=3]`` (native C++
    when available, numpy fallback; identical picks either way)."""
    lib = _load()
    if lib is None:
        return _fps_numpy(np.asarray(points, np.float32), n)
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty((n,), np.int64)
    lib.pointio_fps(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pts.shape[0], pts.shape[1], n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
    )
    return out


def fps_indices_many(
    points: np.ndarray, counts: np.ndarray, n: int, n_threads: int = 16
) -> np.ndarray:
    """Threaded FPS over a padded batch ``[M, max_pts, C]`` with per-cloud row
    counts ``[M]`` (padding rows ignored). Returns indices ``[M, n]``."""
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32)
    cnt = np.ascontiguousarray(counts, np.int64)
    if lib is None:
        return np.stack(
            [_fps_numpy(pts[i, : cnt[i]], n) for i in range(pts.shape[0])]
        )
    out = np.empty((pts.shape[0], n), np.int64)
    lib.pointio_fps_many(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cnt.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        pts.shape[0], pts.shape[1], pts.shape[2], n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        n_threads,
    )
    return out


def loadtxt_many(
    paths: List[str], n_cols: int, max_rows: int = 1 << 15, n_threads: int = 16
) -> Tuple[np.ndarray, np.ndarray]:
    """Threaded whole-split load: returns (data ``[F, max_rows, n_cols]``,
    row_counts ``[F]``). Falls back to a sequential numpy loop."""
    lib = _load()
    n = len(paths)
    if lib is None:
        data = np.zeros((n, max_rows, n_cols), np.float32)
        counts = np.zeros((n,), np.int64)
        for i, p in enumerate(paths):
            arr = np.loadtxt(p).astype(np.float32)[:max_rows]
            data[i, : len(arr)] = arr[:, :n_cols]
            counts[i] = len(arr)
        return data, counts
    data = np.empty((n, max_rows, n_cols), np.float32)
    counts = np.empty((n,), np.int64)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.pointio_parse_many(
        c_paths, n,
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        max_rows, n_cols, n_threads,
    )
    return data, counts
