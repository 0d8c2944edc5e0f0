"""Initial-mesh reconstruction — the HumanRF run_mesh_extract_GauSTAR.py path.

Train the hash-grid neural field on the multiview frame (photometric + mask
losses over random ray batches, humanrf/trainer.py:118-209's dynamic batching
simplified to fixed batches), then extract the iso-surface exactly as
trainer.py:630-752: dense density grid -> surface at iso threshold -> drop
outlier connected components -> 10x Laplacian smoothing -> quadric decimation to
the 100k-face target -> init_mesh_100k.obj.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gaustar_tpu.cameras import Camera
from gaustar_tpu.mesh import tsdf as tsdf_mod
from gaustar_tpu.mesh.surgery import Mesh, get_outlier_cc_mask
from gaustar_tpu.models import neural_field as nf

from gaustar_tpu.utils.general import l2norm


@dataclasses.dataclass(frozen=True)
class InitMeshConfig:
    iterations: int = 2000
    rays_per_batch: int = 8192
    lr: float = 1e-2
    mask_loss_weight: float = 0.1
    iso_level: float = 100.0  # trainer.py:703 mcubes iso
    grid_res: int = 256
    target_faces: int = 100_000  # trainer.py:661
    smooth_iters: int = 10  # trainer.py:744
    outlier_face_threshold: int = 1000
    # Occupancy guidance (HumanRF ray_sampler.cu / occupancy_grid_generation.cu):
    # carve a visual-hull grid from the masks, tighten every training ray's
    # sample slab to it, and mask the extraction density grid with it.
    use_occupancy: bool = True
    occupancy_res: int = 64
    occupancy_dilate: int = 1


def rays_for_pixels(camera: Camera, px, py):
    """World-space rays through pixel centers (px, py) [N]."""
    fx = camera.width / (2.0 * camera.tanfovx)
    fy = camera.height / (2.0 * camera.tanfovy)
    x = (px - np.asarray(camera.cx)) / fx
    y = (py - np.asarray(camera.cy)) / fy
    d_local = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    view = camera.view
    R = view[:3, :3]
    d_world = d_local @ R  # R^T applied to rows
    d_world = d_world / l2norm(d_world)
    o = jnp.broadcast_to(camera.camera_center, d_world.shape)
    return o, d_world


def train_field(
    cameras: list[Camera],
    images: np.ndarray,  # [C, H, W, 3]
    masks: np.ndarray,  # [C, H, W] in [0, 1]
    cfg: InitMeshConfig = InitMeshConfig(),
    field_cfg: nf.FieldConfig | None = None,
    seed: int = 0,
    log_fn=None,
):
    """Optimize the neural field on a multiview frame.

    Returns (params, field_cfg, occupancy). With cfg.use_occupancy the
    visual-hull grid both tightens every ray's sample slab (ray_sampler.cu) and
    MUST mask the extraction grid (pass it to extract_init_mesh): space outside
    the hull is never sampled during training, so the field keeps its init
    density there — exactly why HumanRF's extraction is occupancy-masked
    (trainer.py:676-700)."""
    if field_cfg is None:
        field_cfg = nf.FieldConfig()
    params = nf.init_field(field_cfg, seed)
    opt = optax.adam(cfg.lr, b1=0.9, b2=0.99, eps=1e-15)
    opt_state = opt.init(params)

    occ = None
    if cfg.use_occupancy:
        occ = nf.occupancy_from_masks(
            cameras, masks, field_cfg, res=cfg.occupancy_res,
            dilate=cfg.occupancy_dilate,
        )

    c, h, w = images.shape[:3]
    images_j = jnp.asarray(images)
    masks_j = jnp.asarray(masks)
    # Precompute per-camera ray grids lazily per batch instead: sample pixels.
    cam_batch = [
        (jnp.asarray(np.asarray(cam.view)), cam) for cam in cameras
    ]

    @jax.jit
    def step(params, opt_state, key, origins, dirs, gt_rgb, gt_mask):
        def loss_fn(p):
            rgb, alpha, _ = nf.render_rays(p, origins, dirs, field_cfg, key,
                                           occupancy=occ)
            photo = ((rgb - gt_rgb) ** 2 * gt_mask[:, None]).mean()
            mask_l = ((alpha - gt_mask) ** 2).mean()
            return photo + cfg.mask_loss_weight * mask_l

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    for it in range(cfg.iterations):
        ci = int(rng.integers(c))
        # Half the rays inside the mask, half uniform (foreground focus).
        n = cfg.rays_per_batch
        px = rng.integers(0, w, n)
        py = rng.integers(0, h, n)
        fg = np.argwhere(masks[ci] > 0.5)
        if len(fg):
            pick = fg[rng.integers(0, len(fg), n // 2)]
            py[: n // 2] = pick[:, 0]
            px[: n // 2] = pick[:, 1]
        o, d = rays_for_pixels(cameras[ci], jnp.asarray(px, jnp.float32) + 0.5, jnp.asarray(py, jnp.float32) + 0.5)
        gt_rgb = images_j[ci, py, px]
        gt_mask = masks_j[ci, py, px]
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub, o, d, gt_rgb, gt_mask)
        if log_fn and (it + 1) % 200 == 0:
            log_fn({"iteration": it + 1, "loss": float(loss)})
    return params, field_cfg, occ


def extract_init_mesh(params, field_cfg: nf.FieldConfig, cfg: InitMeshConfig = InitMeshConfig(),
                      occupancy=None):
    """Density grid -> iso surface -> CC filter -> smooth -> decimate
    (humanrf trainer.py:630-752). `occupancy` ([G,G,G] from
    nf.occupancy_from_masks) masks the density grid before extraction, like the
    reference's occupancy-masked 512^3 grid (trainer.py:676-700)."""
    import dataclasses as dc

    from gaustar_tpu import native

    grid = nf.density_grid(params, field_cfg, res=cfg.grid_res)
    if occupancy is not None:
        occ = np.asarray(occupancy)
        g = occ.shape[0]
        # nearest-upsample the occupancy to the extraction grid
        scale = cfg.grid_res / g
        ix = np.minimum((np.arange(cfg.grid_res) / scale).astype(np.int64), g - 1)
        grid = grid * occ[np.ix_(ix, ix, ix)].astype(grid.dtype)
    # Signed field: positive outside (density below iso), negative inside —
    # reuse the marching-tets extractor by packaging as a pseudo-TSDF volume.
    lo = np.asarray(field_cfg.aabb_min)
    hi = np.asarray(field_cfg.aabb_max)
    voxel = float((hi - lo).max() / (cfg.grid_res - 1))
    field = np.clip((cfg.iso_level - grid) / max(cfg.iso_level, 1e-6), -1.0, 1.0)
    vol = tsdf_mod.make_volume(lo, grid.shape, voxel, 1.0)
    vol = dc.replace(
        vol,
        tsdf=jnp.asarray(field.astype(np.float32)),
        weight=jnp.ones(grid.shape, jnp.float32),
    )
    verts, faces, _ = tsdf_mod.extract_mesh(vol, with_color=False)
    if len(faces) == 0:
        return Mesh(verts.astype(np.float64), faces.astype(np.int64))

    keep = get_outlier_cc_mask(faces, cfg.outlier_face_threshold)
    mesh = Mesh(verts.astype(np.float64), faces.astype(np.int64))
    mesh.update_faces(keep)
    mesh.remove_unreferenced_vertices()

    if cfg.smooth_iters:
        mesh.verts = native.laplacian_smooth(mesh.verts, mesh.faces, iterations=cfg.smooth_iters)
    if len(mesh.faces) > cfg.target_faces:
        v, f = native.decimate(mesh.verts, mesh.faces, cfg.target_faces)
        mesh = Mesh(v, f.astype(np.int64))
    return mesh
