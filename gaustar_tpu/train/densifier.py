"""Adaptive density control — gaustar_scene/sugar_densifier.py:10-273 and the
classic 3DGS densifier it derives from.

Two usage modes, mirroring the reference:
  - GauSTAR main path: DETECTION ONLY (refine.py:125 sets use_densifier=False and
    re-enables it purely to visualize positional gradients pre-unbind) — the
    jittable stats accumulation + threshold mask below;
  - vanilla 3DGS training: full clone/split/prune. Changing the gaussian count
    under jit would retrace every densify step, so arrays grow in CAPACITY
    BUCKETS: counts round up to a bucket multiple and dead slots carry opacity
    logit -30 (strength ~ 0 -> no contribution, no gradients); retraces happen
    only when a bucket boundary is crossed (a handful per training run).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from gaustar_tpu.models.gaussians import GaussianParams
from gaustar_tpu.utils.general import inverse_sigmoid, quaternion_to_matrix, normalize, l2norm

DEAD_OPACITY_LOGIT = -30.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DensifierState:
    grad_accum: Any  # [N] accumulated ||d mean2d_ndc||
    denom: Any  # [N] observation counts
    max_radii2d: Any  # [N]


def init_state(n: int) -> DensifierState:
    return DensifierState(
        grad_accum=jnp.zeros((n,), jnp.float32),
        denom=jnp.zeros((n,), jnp.float32),
        max_radii2d=jnp.zeros((n,), jnp.float32),
    )


def update_stats(state: DensifierState, means2d_grad: jnp.ndarray, radii: jnp.ndarray) -> DensifierState:
    """Accumulate per-gaussian screen-space gradient norms for visible gaussians
    (sugar_densifier.py:156-164). means2d_grad is the NDC-space gradient (the
    rasterizer's means2d_dummy cotangent)."""
    vis = radii > 0
    g = l2norm(means2d_grad[:, :2], keepdims=False)
    return DensifierState(
        grad_accum=state.grad_accum + jnp.where(vis, g, 0.0),
        denom=state.denom + vis.astype(jnp.float32),
        max_radii2d=jnp.maximum(state.max_radii2d, jnp.where(vis, radii, 0.0)),
    )


def average_grads(state: DensifierState) -> jnp.ndarray:
    g = state.grad_accum / jnp.maximum(state.denom, 1.0)
    return jnp.where(state.denom > 0, g, 0.0)


def densify_detection(state: DensifierState, max_grad: float):
    """Mask of gaussians whose positional gradient exceeds the threshold —
    GauSTAR's repurposing for topology-change visualization
    (sugar_densifier.py:235-249)."""
    grads = average_grads(state)
    return grads >= max_grad, grads


# ---------------------------------------------------------------------------
# Full clone/split/prune for vanilla 3DGS (host-side, bucket-padded)
# ---------------------------------------------------------------------------


def _bucket(n: int, bucket: int) -> int:
    return max(((n + bucket - 1) // bucket) * bucket, bucket)


def active_mask(params: GaussianParams) -> np.ndarray:
    return np.asarray(params.opacity)[:, 0] > DEAD_OPACITY_LOGIT + 1.0


def _pad_params(arrays: dict, n_target: int) -> dict:
    n = len(arrays["xyz"])
    pad = n_target - n
    if pad <= 0:
        return arrays
    out = {}
    for k, v in arrays.items():
        pads = [(0, pad)] + [(0, 0)] * (v.ndim - 1)
        fill = np.zeros((pad, *v.shape[1:]), v.dtype)
        if k == "opacity":
            fill[:] = DEAD_OPACITY_LOGIT
        if k == "scaling":
            fill[:] = -15.0  # tiny
        if k == "rotation":
            fill[:, 0] = 1.0
        out[k] = np.concatenate([v, fill])
    return out


def densify_and_prune(
    params: GaussianParams,
    state: DensifierState,
    max_grad: float = 0.0002,
    min_opacity: float = 0.005,
    extent: float = 1.0,
    max_screen_size: float | None = None,
    percent_dense: float = 0.01,
    n_split: int = 2,
    bucket: int = 4096,
    seed: int = 0,
):
    """Clone small high-gradient gaussians, split large ones (shrunk /1.6),
    prune transparent/huge ones (sugar_densifier.py:173-268). Host-side; returns
    (new_params, new_state) with bucket-padded arrays."""
    rng = np.random.default_rng(seed)
    arr = {k: np.asarray(getattr(params, k)) for k in
           ["xyz", "features_dc", "features_rest", "scaling", "rotation", "opacity"]}
    alive = active_mask(params)
    grads = np.asarray(average_grads(state))
    scaling = np.exp(arr["scaling"])
    max_scale = scaling.max(axis=1)

    hot = (grads >= max_grad) & alive
    clone_mask = hot & (max_scale <= percent_dense * extent)
    split_mask = hot & (max_scale > percent_dense * extent)

    # Clones: exact copies.
    clones = {k: v[clone_mask] for k, v in arr.items()}

    # Splits: N samples from N(0, scaling) rotated to world, scales / (0.8 * N).
    sel = {k: v[split_mask] for k, v in arr.items()}
    n_sel = split_mask.sum()
    splits = {k: np.repeat(v, n_split, axis=0) for k, v in sel.items()}
    if n_sel:
        stds = np.repeat(scaling[split_mask], n_split, axis=0)
        samples = rng.normal(size=stds.shape).astype(np.float32) * stds
        rots = np.asarray(quaternion_to_matrix(normalize(jnp.asarray(splits["rotation"]))))
        splits["xyz"] = (rots @ samples[..., None])[..., 0] + splits["xyz"]
        splits["scaling"] = np.log(stds / (0.8 * n_split)).astype(np.float32)

    # Prune: split originals + transparent + (optionally) huge.
    strengths = 1.0 / (1.0 + np.exp(-arr["opacity"][:, 0]))
    prune = split_mask | (strengths < min_opacity) | ~alive
    if max_screen_size:
        big_vs = np.asarray(state.max_radii2d) > max_screen_size
        big_ws = max_scale > 0.1 * extent
        prune |= big_vs | big_ws

    keep_mask = ~prune
    keep = {k: v[keep_mask] for k, v in arr.items()}
    merged = {k: np.concatenate([keep[k], clones[k], splits[k]]) for k in arr}
    n_new = len(merged["xyz"])
    merged = _pad_params(merged, _bucket(n_new, bucket))

    new_params = GaussianParams(**{k: jnp.asarray(v) for k, v in merged.items()})
    info = {"keep_mask": keep_mask, "n_active": n_new, "n_clone": int(clone_mask.sum()),
            "n_split": int(n_sel)}
    return new_params, init_state(len(merged["xyz"])), info


def reset_opacity(params: GaussianParams) -> GaussianParams:
    """Clamp opacity to <= 0.01 (sugar_densifier.py:270-273), keeping dead slots dead."""
    op = jnp.asarray(params.opacity)
    strengths = jax.nn.sigmoid(op)
    new = inverse_sigmoid(jnp.minimum(strengths, 0.01))
    new = jnp.where(op <= DEAD_OPACITY_LOGIT + 1.0, op, new)
    return dataclasses.replace(params, opacity=new)
