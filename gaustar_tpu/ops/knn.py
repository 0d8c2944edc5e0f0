"""K-nearest-neighbor distances on TPU.

Replaces simple-knn's `distCUDA2` (simple_knn.cu:45-221: Morton sort + box
rejection): mean squared distance to the 3 nearest neighbors, used only to
initialize unbound-Gaussian scales (gaussian_model.py:134). The TPU formulation
is chunked brute force — [chunk, N] distance tiles are MXU/VPU-friendly and for
N <= ~300k this is faster than building spatial structures.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def knn_sq_dists(points: jnp.ndarray, k: int = 3, chunk: int = 1024) -> jnp.ndarray:
    """[N, k] squared distances to the k nearest OTHER points."""
    n = points.shape[0]
    n_pad = ((n + chunk - 1) // chunk) * chunk
    pts_pad = jnp.pad(points, ((0, n_pad - n), (0, 0)), constant_values=jnp.inf)
    sq = (points**2).sum(-1)  # [N]

    def one_chunk(q):  # [chunk, 3]
        d = (q**2).sum(-1, keepdims=True) - 2.0 * q @ points.T + sq[None, :]  # [chunk, N]
        # exclude self (distance ~0 handled by taking k+1 smallest then dropping min)
        neg_top, _ = jax.lax.top_k(-d, k + 1)
        top = -neg_top  # ascending k+1 smallest
        return top[:, 1:]

    chunks = pts_pad.reshape(-1, chunk, 3)
    out = jax.lax.map(one_chunk, chunks).reshape(n_pad, k)
    return jnp.maximum(out[:n], 0.0)


def dist2_avg3(points: jnp.ndarray) -> jnp.ndarray:
    """distCUDA2 equivalent: mean squared distance to the 3 nearest neighbors."""
    return knn_sq_dists(points, k=3).mean(axis=-1)


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def knn_points(query: jnp.ndarray, ref: jnp.ndarray, k: int, chunk: int = 1024):
    """pytorch3d.ops.knn_points equivalent: (sq_dists [Q, k], idx [Q, k])."""
    q_n = query.shape[0]
    n_pad = ((q_n + chunk - 1) // chunk) * chunk
    q_pad = jnp.pad(query, ((0, n_pad - q_n), (0, 0)))
    sq = (ref**2).sum(-1)

    def one_chunk(q):
        d = (q**2).sum(-1, keepdims=True) - 2.0 * q @ ref.T + sq[None, :]
        neg_top, idx = jax.lax.top_k(-d, k)
        return -neg_top, idx

    dists, idx = jax.lax.map(one_chunk, q_pad.reshape(-1, chunk, query.shape[-1]))
    return jnp.maximum(dists.reshape(n_pad, k)[:q_n], 0.0), idx.reshape(n_pad, k)[:q_n]
