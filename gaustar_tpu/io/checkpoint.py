"""Checkpoints: SuGaR frame checkpoints (.npz, the reference's .pt equivalent) and
3DGS .ply export (convert_refined_sugar_into_gaussians, sugar_model.py:1416-1437).

Reference format (sugar_model.py:1313-1318): {state_dict, train_losses, epoch,
iteration, optimizer_state_dict}. We persist the same information as an npz of
arrays plus a json sidecar of model hyperparameters, loadable without pickle.
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax.numpy as jnp
import numpy as np

from gaustar_tpu.models import gaussians, sugar

_PARAM_FIELDS = [f.name for f in dataclasses.fields(sugar.SuGaRParams)]


def save_sugar(path: str, params: sugar.SuGaRParams, config: sugar.SuGaRConfig, iteration: int = 0, train_losses=None):
    arrays = {name: np.asarray(getattr(params, name)) for name in _PARAM_FIELDS}
    arrays["faces"] = np.asarray(config.faces)
    arrays["bary"] = np.asarray(config.bary)
    arrays["thickness"] = np.asarray(config.thickness)
    arrays["iteration"] = np.asarray(iteration)
    if train_losses is not None:
        arrays["train_losses"] = np.asarray(train_losses)
    np.savez_compressed(path, **arrays)
    meta = {
        "n_gaussians_per_face": config.n_gaussians_per_face,
        "sh_levels": config.sh_levels,
        "min_scale": config.min_scale,
        "max_scale": config.max_scale,
        "loose_bind": config.loose_bind,
    }
    with open(os.path.splitext(path)[0] + ".json", "w") as f:
        json.dump(meta, f, indent=2)


def load_sugar(path: str):
    data = dict(np.load(path))
    with open(os.path.splitext(path)[0] + ".json") as f:
        meta = json.load(f)
    params = sugar.SuGaRParams(**{n: jnp.asarray(data[n]) for n in _PARAM_FIELDS})
    config = sugar.SuGaRConfig(
        faces=jnp.asarray(data["faces"]),
        bary=jnp.asarray(data["bary"]),
        thickness=jnp.asarray(data["thickness"]),
        n_gaussians_per_face=int(meta["n_gaussians_per_face"]),
        sh_levels=int(meta["sh_levels"]),
        min_scale=meta["min_scale"],
        max_scale=meta["max_scale"],
        loose_bind=bool(meta["loose_bind"]),
    )
    config = sugar.with_gather_tables(params, config)
    return params, config, int(data.get("iteration", 0))


def save_refine_state(path: str, params: sugar.SuGaRParams, opt_state,
                      iteration: int, unbind_weight=None, loose_bind: bool = False):
    """MID-FRAME refine checkpoint (beyond the reference: refined_training can
    only restart a frame from the mesh, SURVEY §5). Pickle-free: the optimizer
    state is stored as ordered tree leaves; load_refine_state restores them
    into a treedef rebuilt by the caller's `optimizer.init(params)`."""
    import jax

    arrays = {name: np.asarray(getattr(params, name)) for name in _PARAM_FIELDS}
    for i, leaf in enumerate(jax.tree_util.tree_leaves(opt_state)):
        arrays[f"opt_{i:04d}"] = np.asarray(leaf)
    arrays["iteration"] = np.asarray(iteration)
    arrays["loose_bind"] = np.asarray(int(loose_bind))
    if unbind_weight is not None:
        arrays["unbind_weight"] = np.asarray(unbind_weight)
    np.savez_compressed(path, **arrays)


def load_refine_state(path: str, opt_state_template):
    """Returns (params, opt_state, iteration, unbind_weight|None, loose_bind).

    `opt_state_template` supplies the treedef (call `optimizer.init(params)`
    with the SAME optimizer construction); leaf count/shape mismatches raise."""
    import jax

    data = dict(np.load(path))
    params = sugar.SuGaRParams(**{n: jnp.asarray(data[n]) for n in _PARAM_FIELDS})
    leaves, treedef = jax.tree_util.tree_flatten(opt_state_template)
    keys = sorted(k for k in data if k.startswith("opt_"))
    if len(keys) != len(leaves):
        raise ValueError(
            f"optimizer state mismatch: checkpoint has {len(keys)} leaves, "
            f"template has {len(leaves)} — was the optimizer built identically?"
        )
    new_leaves = []
    for k, tpl in zip(keys, leaves):
        arr = data[k]
        if np.shape(tpl) != arr.shape:
            raise ValueError(f"optimizer leaf {k} shape {arr.shape} != template {np.shape(tpl)}")
        new_leaves.append(jnp.asarray(arr).astype(jnp.asarray(tpl).dtype))
    opt_state = jax.tree_util.tree_unflatten(treedef, new_leaves)
    uw = jnp.asarray(data["unbind_weight"]) if "unbind_weight" in data else None
    return params, opt_state, int(data["iteration"]), uw, bool(int(data["loose_bind"]))


def sugar_to_gaussians(params: sugar.SuGaRParams, config: sugar.SuGaRConfig) -> gaussians.GaussianParams:
    """Vanilla 3DGS export (sugar_model.py:1416-1437): positions, opacity logits,
    SH, log of the CLAMPED 3-axis scaling, normalized quaternions."""
    xyz = sugar.gaussian_centers(params, config)
    scales = jnp.log(sugar.scaling(params, config))
    rots = sugar.quaternions(params, config)
    return gaussians.GaussianParams(
        xyz=xyz,
        features_dc=params.sh_dc,
        features_rest=params.sh_rest,
        scaling=scales,
        rotation=rots,
        opacity=params.densities,
    )


def export_refined_ply(path: str, params: sugar.SuGaRParams, config: sugar.SuGaRConfig):
    """The per-frame NNNN.ply export (refine.py:855-864)."""
    gaussians.save_ply(sugar_to_gaussians(params, config), path)
