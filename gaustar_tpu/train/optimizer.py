"""SuGaR optimizer: Adam (eps 1e-15) with named-group learning rates and the
exponential position schedule — gaustar_scene/sugar_optimizer.py:7-123.

Group lrs (OptimizationParams, sugar_optimizer.py:7-43 + group wiring :67-87):
  points           position_lr_init * spatial_lr_scale, exp-decayed to
                   position_lr_final * spatial_lr_scale over 30k steps
  sh_dc            feature_lr (2.5e-3)
  sh_rest          feature_lr / 20
  densities        opacity_lr (0.05)
  scales           scaling_lr (5e-3)
  complex2d        rotation_lr (1e-3)   [the reference's `quaternions` group]
  delta_t          position_lr_init * spatial_lr_scale (NOT scheduled — the
                   reference only schedules the "points" group, :110-114)
  delta_r          rotation_lr

Implemented as a per-leaf optax.adam dict keyed by SuGaRParams field name.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import optax

from gaustar_tpu.models.sugar import SuGaRParams
from gaustar_tpu.utils.general import get_expon_lr_func


@dataclasses.dataclass(frozen=True)
class OptimizationParams:
    iterations: int = 30_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001


def spatial_lr_scale_from_cameras(camera_centers) -> float:
    """Camera spatial extent — the 3DGS `spatial_lr_scale` = 1.1 * max distance of
    any camera from the rig centroid (scene/dataset_readers.py getNerfppNorm)."""
    import numpy as np

    centers = np.asarray(camera_centers)
    avg = centers.mean(axis=0, keepdims=True)
    return float(1.1 * np.linalg.norm(centers - avg, axis=-1).max())


def make_sugar_optimizer(
    opt: OptimizationParams, spatial_lr_scale: float
) -> optax.GradientTransformation:
    pos_schedule = get_expon_lr_func(
        lr_init=opt.position_lr_init * spatial_lr_scale,
        lr_final=opt.position_lr_final * spatial_lr_scale,
        lr_delay_mult=opt.position_lr_delay_mult,
        max_steps=opt.position_lr_max_steps,
    )

    def adam(lr):
        return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-15)

    transforms = {
        "points": adam(pos_schedule),
        "sh_dc": adam(opt.feature_lr),
        "sh_rest": adam(opt.feature_lr / 20.0),
        "densities": adam(opt.opacity_lr),
        "scales": adam(opt.scaling_lr),
        "complex2d": adam(opt.rotation_lr),
        "delta_t": adam(opt.position_lr_init * spatial_lr_scale),
        "delta_r": adam(opt.rotation_lr),
    }
    labels = SuGaRParams(
        points="points",
        scales="scales",
        complex2d="complex2d",
        densities="densities",
        sh_dc="sh_dc",
        sh_rest="sh_rest",
        delta_t="delta_t",
        delta_r="delta_r",
    )
    return optax.multi_transform(transforms, labels)


def make_adam_direction() -> optax.GradientTransformation:
    """The Adam DIRECTION transform (scale_by_adam, eps 1e-15) shared by every
    param group: optax.adam(lr) == chain(scale_by_adam, scale(-lr)), and the
    named groups differ ONLY in lr, so the compile-reuse step
    (refine.RefineConfig.traced_hparams) runs one scale_by_adam over the whole
    pytree and applies the per-group lrs as traced scalars (make_lr_fn) —
    numerically identical to make_sugar_optimizer, with no per-frame constants
    in the program."""
    return optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-15)


def make_lr_fn(opt: OptimizationParams, spatial_lr_scale: float):
    """fn(iteration) -> SuGaRParams of python-float per-group learning rates at
    that iteration (the exp position schedule evaluated on HOST; the reference
    updates the points lr per iteration the same way, sugar_optimizer.py:106-114
    via refine.py:542)."""
    pos_schedule = get_expon_lr_func(
        lr_init=opt.position_lr_init * spatial_lr_scale,
        lr_final=opt.position_lr_final * spatial_lr_scale,
        lr_delay_mult=opt.position_lr_delay_mult,
        max_steps=opt.position_lr_max_steps,
    )

    def fn(iteration: int) -> SuGaRParams:
        return SuGaRParams(
            points=float(pos_schedule(iteration)),
            scales=opt.scaling_lr,
            complex2d=opt.rotation_lr,
            densities=opt.opacity_lr,
            sh_dc=opt.feature_lr,
            sh_rest=opt.feature_lr / 20.0,
            delta_t=opt.position_lr_init * spatial_lr_scale,
            delta_r=opt.rotation_lr,
        )

    return fn


def make_simple_adam_optimizer(lr_map: dict[str, Any], template) -> optax.GradientTransformation:
    """Generic named-group Adam for other pytrees (e.g. vanilla GaussianParams)."""

    def adam(lr):
        return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-15)

    transforms = {k: adam(v) for k, v in lr_map.items()}
    labels = jax.tree_util.tree_map(lambda _: None, template)
    labels = type(template)(**{f.name: f.name for f in dataclasses.fields(template)})
    return optax.multi_transform(transforms, labels)
