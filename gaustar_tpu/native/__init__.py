"""ctypes bindings for the native mesh kernels (libmeshops.so).

Auto-builds via `make` on first import if the shared library is missing and a
toolchain is available; falls back to pure-python implementations otherwise
(`HAVE_NATIVE` tells you which path is active).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libmeshops.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _DIR], check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.decimate_quadric.restype = ctypes.c_int
    lib.decimate_quadric.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.laplacian_smooth.restype = ctypes.c_int
    lib.laplacian_smooth.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.c_int, ctypes.c_double,
    ]
    lib.knn3_mean_sq_dist.restype = ctypes.c_int
    lib.knn3_mean_sq_dist.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.POINTER(ctypes.c_float)
    ]
    lib.face_connected_components.restype = ctypes.c_int
    lib.face_connected_components.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return lib


HAVE_NATIVE = _load() is not None


def _ptr(a, t):
    return a.ctypes.data_as(ctypes.POINTER(t))


def decimate(verts: np.ndarray, faces: np.ndarray, target_faces: int, aggressiveness: float = 7.0):
    """Quadric edge-collapse decimation (pyfqmr / o3d simplify_quadric_decimation
    equivalent). Falls back to vertex clustering without the native lib."""
    lib = _load()
    verts = np.ascontiguousarray(verts, np.float64)
    faces = np.ascontiguousarray(faces, np.int32)
    if lib is not None:
        out_v = np.empty_like(verts)
        out_f = np.empty_like(faces)
        nv = ctypes.c_int64()
        nf = ctypes.c_int64()
        lib.decimate_quadric(
            _ptr(verts, ctypes.c_double), len(verts),
            _ptr(faces, ctypes.c_int32), len(faces),
            int(target_faces), float(aggressiveness),
            _ptr(out_v, ctypes.c_double), _ptr(out_f, ctypes.c_int32),
            ctypes.byref(nv), ctypes.byref(nf),
        )
        return out_v[: nv.value].copy(), out_f[: nf.value].copy()
    return _decimate_cluster_fallback(verts, faces, target_faces)


def _decimate_cluster_fallback(verts, faces, target_faces):
    """Crude vertex-clustering decimation (quality far below quadric; only used
    when the native toolchain is unavailable)."""
    ratio = max(len(faces) / max(target_faces, 1), 1.0)
    lo = verts.min(axis=0)
    extent = np.maximum(verts.max(axis=0) - lo, 1e-9)
    n_cells = max(int((len(verts) / ratio) ** (1 / 3) * 2), 2)
    cell = extent.max() / n_cells
    idx = np.floor((verts - lo) / cell).astype(np.int64)
    lin = (idx[:, 0] * (n_cells + 2) + idx[:, 1]) * (n_cells + 2) + idx[:, 2]
    uniq, inv = np.unique(lin, return_inverse=True)
    new_verts = np.zeros((len(uniq), 3))
    cnt = np.zeros(len(uniq))
    np.add.at(new_verts, inv, verts)
    np.add.at(cnt, inv, 1)
    new_verts /= cnt[:, None]
    nf = inv[faces]
    good = (nf[:, 0] != nf[:, 1]) & (nf[:, 1] != nf[:, 2]) & (nf[:, 0] != nf[:, 2])
    return new_verts, np.asarray(nf[good], np.int32)


def laplacian_smooth(verts: np.ndarray, faces: np.ndarray, iterations: int = 10, lam: float = 0.5):
    lib = _load()
    out = np.ascontiguousarray(verts, np.float64).copy()
    faces = np.ascontiguousarray(faces, np.int32)
    if lib is not None:
        lib.laplacian_smooth(
            _ptr(out, ctypes.c_double), len(out), _ptr(faces, ctypes.c_int32), len(faces),
            int(iterations), float(lam),
        )
        return out
    # numpy fallback
    from gaustar_tpu.mesh.topology import build_topology
    from gaustar_tpu.tools.geometry import mesh_value_smoothing

    topo = build_topology(faces, len(out))
    for _ in range(iterations):
        mean = mesh_value_smoothing(topo.vert_adj, topo.vert_adj_count, out, ite_num=1)
        out = out + lam * (mean - out)
    return out


def knn3_mean_sq_dist(points: np.ndarray, prefer_native: bool = False) -> np.ndarray:
    """simple-knn distCUDA2 equivalent on host. scipy's cKDTree wins on large
    clustered clouds (~3x), so it is the default; the native grid version covers
    scipy-free environments (or pass prefer_native=True)."""
    pts = np.ascontiguousarray(points, np.float32)
    if not prefer_native:
        try:
            from scipy.spatial import cKDTree

            d, _ = cKDTree(pts).query(pts, k=4)
            return (d[:, 1:] ** 2).mean(axis=1).astype(np.float32)
        except ImportError:
            pass
    lib = _load()
    if lib is not None:
        out = np.empty(len(pts), np.float32)
        lib.knn3_mean_sq_dist(_ptr(pts, ctypes.c_float), len(pts), _ptr(out, ctypes.c_float))
        return out
    raise RuntimeError("neither scipy nor libmeshops available for knn")


def face_components(faces: np.ndarray, n_verts: int) -> np.ndarray:
    lib = _load()
    faces = np.ascontiguousarray(faces, np.int32)
    if lib is not None:
        labels = np.empty(len(faces), np.int32)
        lib.face_connected_components(
            _ptr(faces, ctypes.c_int32), len(faces), int(n_verts), _ptr(labels, ctypes.c_int32)
        )
        return labels
    from gaustar_tpu.mesh.topology import face_connected_components

    return face_connected_components(faces)
