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
    return params, config, int(data.get("iteration", 0))


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
