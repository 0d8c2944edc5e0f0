"""Multi-chip execution: camera-sharded training over a jax.sharding.Mesh.

The reference has NO distributed backend at all (SURVEY section 2.1/5) — its
camera loop is strictly sequential on one GPU. This module is the new design:
data parallelism over VIEWS. Each device renders + differentiates one (or more)
camera(s) of the multiview rig per step against replicated model parameters;
per-parameter gradients are `psum`-averaged over the ICI mesh axis ("cam") inside
`shard_map`, then a replicated Adam update is applied. This is the moral
equivalent of DP with densely shared parameters (SURVEY section 5).

Scaling axes (BASELINE north star): 1 chip -> 1 host -> N hosts via
jax.distributed; the mesh axis spans all devices, gradients ride ICI within a
slice and DCN across hosts. Gaussian/tile sharding (model parallelism for >10M
gaussian scenes) is layered on the same mesh as a second axis later.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from gaustar_tpu.models import sugar
from gaustar_tpu.ops.rasterizer import RasterConfig
from gaustar_tpu.train.refine import (
    FrameData,
    RefineConfig,
    compute_losses,
    compute_losses_multi,
)


def make_camera_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("cam",))


def _frame_data_specs(data: FrameData) -> FrameData:
    """Per-leaf PartitionSpecs: camera-indexed arrays shard on 'cam', mesh
    reference data replicates."""
    cam_sharded = type(data.cameras)(
        R=P("cam"), T=P("cam"), fx=P("cam"), fy=P("cam"), cx=P("cam"), cy=P("cam"),
        width=data.cameras.width, height=data.cameras.height,
        znear=data.cameras.znear, zfar=data.cameras.zfar,
    )
    opt = lambda x: P() if x is not None else None
    return FrameData(
        cameras=cam_sharded,
        gt_images=P("cam"),
        gt_depths=P("cam"),
        margins=P("cam"),
        ref_edge_len=P(),
        ref_area=P(),
        edges=P(),
        adj_faces=P(),
        face_edge_ref=opt(data.face_edge_ref),
        face_edge_w=opt(data.face_edge_w),
        adj_gather=(P(), P()) if data.adj_gather is not None else None,
    )


def make_sharded_train_step(
    model_config: sugar.SuGaRConfig,
    data: FrameData,
    cfg: RefineConfig,
    raster_cfg: RasterConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
):
    """Jitted multi-device step: each device renders its local camera shard
    (B = C / n_devices cameras, statically unrolled with CSE amortization),
    gradients pmean'd over the mesh.

    step(params, opt_state, local_cam_idx [D, B], iteration, sh_deg, ...) where
    local_cam_idx[d] are LOCAL indices into device d's camera shard.
    """
    data_specs = _frame_data_specs(data)

    def local_loss(params, local_data, cam_idx_vec, iteration, sh_deg, unbind_weight, pre_sh_dc):
        # Unrolled static-B batch (compute_losses_multi): unlike a lax.scan,
        # the camera-independent subgraphs (SuGaR primitives, mesh losses)
        # CSE into ONE copy per device instead of recomputing per camera.
        loss, loss_dict = compute_losses_multi(
            params, model_config, local_data, cam_idx_vec, iteration, cfg,
            raster_cfg, sh_deg, unbind_weight, pre_sh_dc,
        )
        # Capacity telemetry rides out as aux so the host driver can apply the
        # same overflow auto-retry as refine_frame (pair-buffer truncation on
        # ANY device would otherwise go undetected in the sharded path).
        caps = (loss_dict["num_pairs"], loss_dict["num_padded"])
        return loss, caps

    def make_step(sh_deg: int):
        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(), data_specs, P("cam"), P(), P(), P()),
            out_specs=(P(), P(), P()),
            # The Pallas blend's pallas_call cannot declare varying-axes (vma)
            # metadata on its outputs, so the vma type check is off; collective
            # placement (pmean of loss+grads) is explicit below.
            check_vma=False,
        )
        def grad_shard(params, local_data, cam_idx, iteration, unbind_weight, pre_sh_dc):
            (loss, caps), grads = jax.value_and_grad(local_loss, has_aux=True)(
                params, local_data, cam_idx[0], iteration, sh_deg, unbind_weight, pre_sh_dc
            )
            grads = jax.lax.pmean(grads, "cam")
            loss = jax.lax.pmean(loss, "cam")
            # Worst camera over the WHOLE mesh: overflow anywhere must trigger
            # the host retry.
            caps = jax.lax.pmax(caps, "cam")
            return loss, grads, caps

        # `data` rides as a jit ARGUMENT (closure arrays bake into the remote
        # compile payload — HTTP 413 at reference scale, see train/refine.py).
        @jax.jit
        def _step(params, opt_state, fdata, cam_idx, iteration, unbind_weight, pre_sh_dc):
            loss, grads, caps = grad_shard(
                params, fdata, cam_idx, iteration, unbind_weight, pre_sh_dc
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            caps_dict = {"num_pairs": caps[0], "num_padded": caps[1]}
            return params, opt_state, loss, caps_dict

        def step(params, opt_state, cam_idx, iteration, unbind_weight, pre_sh_dc):
            return _step(params, opt_state, data, cam_idx, iteration, unbind_weight, pre_sh_dc)

        return step

    return make_step
