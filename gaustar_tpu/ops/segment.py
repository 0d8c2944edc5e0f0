"""Static-topology row gather with a precomputed segment-sum backward.

The hot mesh gathers of the refine step — `verts[faces]` (SuGaR primitives +
all three mesh losses, refine.py:678-718 semantics) and `normals[adj_faces]`
(normal consistency) — have STATIC index arrays: mesh topology only changes at
re-mesh events, never inside a frame's 2000-iteration loop. XLA's default VJP
for a row gather is a row scatter-add, which runs at the TPU's element/row
descriptor rate (~15-25 ns/row, ROOFLINE.md) — ~7 ms per 300k-row scatter at
reference scale, twice per step (round-3 xplane trace: "per-vert scatter
fusions" were the mesh losses' dominant cost).

With the index array known on the host we can precompute, once per topology:
  order   = argsort(idx)        — groups cotangent slots by destination row
  offsets = segment bounds      — offsets[v] .. offsets[v+1] = v's slots

and the backward becomes  gather(ct, order) -> cumsum -> boundary diff:
one ~8 ns/row gather + a lanes-major scan instead of the scatter — the same
sort-free segment-sum trick the pair path uses (binning._gather_rows_soa),
minus even the sort, because the permutation is static.

Numerics: the segment sum adds cotangents in `order` (ascending destination,
stable within a segment) vs the scatter's unspecified order — both are f32
reassociations of the same sum; tests assert allclose at 1e-6.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def gather_tables(idx, n_src: int):
    """Host-side backward tables for `gather_rows`: (order [M] i32,
    offsets [n_src+1] i32). `idx` is the flat gather index array."""
    idx = np.asarray(idx).reshape(-1)
    order = np.argsort(idx, kind="stable").astype(np.int32)
    offsets = np.searchsorted(idx[order], np.arange(n_src + 1)).astype(np.int32)
    return jnp.asarray(order), jnp.asarray(offsets)


@jax.custom_vjp
def _gather_rows_static(src, idx, order, offsets):
    return src[idx]


def _gather_fwd(src, idx, order, offsets):
    return src[idx], (idx, order, offsets)


def _gather_bwd(res, ct):
    idx, order, offsets = res
    # Group cotangent rows by destination via the static permutation, then
    # segment-sum by prefix scan + boundary diff. Layout: fields on sublanes,
    # M on lanes ([C, M]) — the [M, C] cumsum pads C -> 128 lanes (ROOFLINE.md).
    csum = jnp.cumsum(ct[order].T, axis=1)  # [C, M]
    rows = csum.T[jnp.maximum(offsets - 1, 0)]  # [n_src+1, C]
    rows = jnp.where((offsets > 0)[:, None], rows, 0.0)
    d_src = rows[1:] - rows[:-1]
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return d_src, f0(idx), f0(order), f0(offsets)


_gather_rows_static.defvjp(_gather_fwd, _gather_bwd)


def gather_rows(src, idx, tables=None):
    """`src[idx]` ([M, C] rows). With `tables` from `gather_tables` the VJP is
    the static segment-sum above; without, XLA's default scatter-add VJP."""
    if tables is None:
        return src[idx]
    order, offsets = tables
    return _gather_rows_static(src, idx, order, offsets)
