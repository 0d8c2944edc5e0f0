"""Face-count bucketing: ONE compiled refine program across topology events.

The reference pays zero per-frame kernel compiles (CUDA is built at install
time); on TPU every distinct array shape is a distinct XLA program, so a mesh
update that changes the face count (train_seq.py:184-213 re-refine) used to
recompile the whole training step (~170 s over the axon tunnel, VERDICT r4
item 2). Bucketing pads the face count up to a bucket multiple with DEGENERATE
faces — all three corners = vertex 0 — whose gaussians carry ~0 opacity:

  - the rasterizer preprocess culls opacity < 1/255 EXACTLY (every blend pair
    of such a gaussian is skipped in forward and backward anyway —
    ops/projection.py), so padding never touches the pair buffers;
  - mesh losses mask padded faces/adjacency rows and normalize by the REAL
    counts (losses.mesh_regularizers face_mask/adj_mask), so loss values and
    gradients equal the unpadded model's exactly;
  - degenerate-face geometry is already NaN-safe throughout (eps inside every
    sqrt: losses._area_normal_from_comps, sugar._normalize3).

Combined with the traced refine gates (refine.TracedGates) and traced
learning rates, every frame and every post-update re-refine whose face count
lands in the same bucket reuses one compiled program.

Vertices are NOT padded: the vertex count only feeds segment-sum tables whose
shapes depend on faces/edges, and `points` itself — whose shape [V, 3] varies
per mesh. V changes with topology updates, so [V]-shaped leaves DO recompile
on a V change; pad_vertices() extends V to a bucket too (padding vertices are
unreferenced by real faces and receive zero gradients).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from gaustar_tpu.models import sugar
from gaustar_tpu.ops import segment
from gaustar_tpu.utils.general import inverse_sigmoid


def bucket_size(n: int, bucket: int) -> int:
    return ((n + bucket - 1) // bucket) * bucket


# Opacity of padding gaussians: far below the 1/255 preprocess cull.
_PAD_OPACITY = 1e-5


def pad_vertices(params: sugar.SuGaRParams, bucket: int) -> sugar.SuGaRParams:
    """Pad the vertex array to a bucket multiple. Padding vertices sit at the
    first real vertex (any finite value works — no face references them, so no
    loss term or gradient ever touches them; Adam keeps them fixed)."""
    v = np.asarray(params.points)
    vp = bucket_size(len(v), bucket)
    if vp == len(v):
        return params
    pad = np.broadcast_to(v[:1], (vp - len(v), 3))
    return dataclasses.replace(
        params, points=jnp.asarray(np.concatenate([v, pad], axis=0))
    )


def pad_sugar(
    params: sugar.SuGaRParams,
    config: sugar.SuGaRConfig,
    face_bucket: int,
    vert_bucket: int | None = None,
) -> tuple[sugar.SuGaRParams, sugar.SuGaRConfig]:
    """Pad a bound SuGaR model to the face bucket. Idempotent in shape: a model
    whose face count is already a bucket multiple still gets a face_mask (all
    ones) so the compiled program structure is identical across frames."""
    faces = np.asarray(config.faces)
    f = len(faces)
    fp = bucket_size(f, face_bucket)
    ng = config.n_gaussians_per_face
    n_pad = (fp - f) * ng

    if vert_bucket:
        params = pad_vertices(params, vert_bucket)

    faces_p = np.concatenate(
        [faces, np.zeros((fp - f, 3), faces.dtype)], axis=0
    )
    face_mask = np.zeros((fp,), np.float32)
    face_mask[:f] = 1.0

    def pad_g(x, fill):
        x = np.asarray(x)
        pad = np.empty((n_pad,) + x.shape[1:], x.dtype)
        pad[...] = fill
        return jnp.asarray(np.concatenate([x, pad], axis=0))

    dr_fill = np.zeros((4,), np.float32)
    dr_fill[0] = 1.0
    new_params = dataclasses.replace(
        params,
        scales=pad_g(params.scales, 0.0),
        complex2d=pad_g(params.complex2d, np.array([1.0, 0.0], np.float32)),
        densities=pad_g(params.densities, float(inverse_sigmoid(_PAD_OPACITY))),
        sh_dc=pad_g(params.sh_dc, 0.0),
        sh_rest=pad_g(params.sh_rest, 0.0),
        delta_t=pad_g(params.delta_t, 0.0),
        delta_r=pad_g(params.delta_r, dr_fill),
    )
    new_config = dataclasses.replace(
        config,
        faces=jnp.asarray(faces_p),
        face_mask=jnp.asarray(face_mask),
        face_gather=segment.gather_tables(faces_p, int(new_params.points.shape[0])),
    )
    return new_params, new_config


def unpad_sugar(
    params: sugar.SuGaRParams, config: sugar.SuGaRConfig, n_verts: int | None = None
) -> tuple[sugar.SuGaRParams, sugar.SuGaRConfig]:
    """Strip bucketing padding (real faces occupy the prefix). No-op when the
    config carries no face_mask. `n_verts` restores the original vertex count
    when pad_vertices was used."""
    if config.face_mask is None:
        return params, config
    mask = np.asarray(config.face_mask)
    f = int(mask.sum())
    ng = config.n_gaussians_per_face
    n = f * ng
    faces = np.asarray(config.faces)[:f]
    pts = np.asarray(params.points)
    if n_verts is not None:
        pts = pts[:n_verts]
    new_params = dataclasses.replace(
        params,
        points=jnp.asarray(pts),
        scales=params.scales[:n],
        complex2d=params.complex2d[:n],
        densities=params.densities[:n],
        sh_dc=params.sh_dc[:n],
        sh_rest=params.sh_rest[:n],
        delta_t=params.delta_t[:n],
        delta_r=params.delta_r[:n],
    )
    new_config = dataclasses.replace(
        config,
        faces=jnp.asarray(faces),
        face_mask=None,
        face_gather=segment.gather_tables(faces, len(pts)),
    )
    return new_params, new_config


def pad_frame_tables(
    data,
    faces_real: np.ndarray,
    fp: int,
    edge_bucket: int,
):
    """Pad a refine.FrameData's topology-shaped leaves to the face bucket:
    ref_area/face-edge tables to [fp] (zeros: padded faces have area 0 and
    edge-iso weight 0), edges/adj_faces to the edge bucket ([0,0] rows;
    adjacency rows masked via adj_mask so normal-consistency ignores them).
    The face-edge tables MUST be built on the real mesh first (they assert
    every face edge exists in the edge list)."""
    from gaustar_tpu.train import refine as _refine

    f = len(faces_real)
    ref_area = np.asarray(data.ref_area)
    ref_area_p = np.concatenate([ref_area, np.zeros((fp - f,), ref_area.dtype)])

    fe_ref = np.asarray(data.face_edge_ref)
    fe_w = np.asarray(data.face_edge_w)
    fe_ref_p = np.concatenate([fe_ref, np.zeros((fp - f, 3), fe_ref.dtype)])
    fe_w_p = np.concatenate([fe_w, np.zeros((fp - f, 3), fe_w.dtype)])

    edges = np.asarray(data.edges)
    ep = bucket_size(len(edges), edge_bucket)
    edges_p = np.concatenate([edges, np.zeros((ep - len(edges), 2), edges.dtype)])

    adj = np.asarray(data.adj_faces)
    ap = bucket_size(len(adj), edge_bucket)
    adj_p = np.concatenate([adj, np.zeros((ap - len(adj), 2), adj.dtype)])
    adj_mask = np.zeros((ap,), np.float32)
    adj_mask[: len(adj)] = 1.0

    ref_edge = np.asarray(data.ref_edge_len)
    ref_edge_p = np.concatenate([ref_edge, np.zeros((ep - len(ref_edge),), ref_edge.dtype)])

    return data._replace(
        ref_area=jnp.asarray(ref_area_p),
        ref_edge_len=jnp.asarray(ref_edge_p),
        edges=jnp.asarray(edges_p),
        adj_faces=jnp.asarray(adj_p),
        face_edge_ref=jnp.asarray(fe_ref_p),
        face_edge_w=jnp.asarray(fe_w_p),
        adj_gather=segment.gather_tables(adj_p, fp),
        adj_mask=jnp.asarray(adj_mask),
    )
