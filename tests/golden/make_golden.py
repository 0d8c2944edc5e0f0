"""Generate the golden rasterizer fixtures in tests/golden/*.npz.

Run ONCE (CPU) and commit the files; test_golden.py then asserts the production
paths against the FILES, so a behavior change in any rasterizer stage — or a
shared bug later introduced into both the oracle and the tiled paths — fails
against frozen bytes instead of a co-evolving oracle.

Each scene is adversarial for one CUDA numeric quirk (SURVEY §7 hard part ⑤,
cuda_rasterizer/forward.cu:261-374, backward.cu:400-557):
  alpha_clamp        opacity*exp(power) > 0.99 -> min(0.99, .) clamp active
  cutoff_straddle    alphas densely straddling the 1/255 skip threshold
  sticky_stop        opaque wall of gaussians -> T crosses 1e-4 mid-list;
                     later gaussians must contribute NOTHING
  tile_border        means/radii exactly on 16px tile boundaries
  unnormalized_quat  quats far from unit norm (used raw, forward.cu:127)
  principal_shift    cx/cy far off-center (SuGaR's extra proj terms,
                     sugar_model.py:1160-1161)

Format (npz): means3d, scales, quats, opacities, colors, w2c, fx, fy, cx, cy,
width, height, bg, probe, image, final_T, n_contrib, g_means3d, g_scales,
g_quats, g_opacities, g_colors.

Gradients are of loss = sum(image * probe) + sum(final_T * probe_t).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

from gaustar_tpu.cameras import Camera
from gaustar_tpu.ops.projection import quat_scale_to_cov3d
from gaustar_tpu.ops.rasterizer import RasterConfig, rasterize

OUT_DIR = os.path.dirname(os.path.abspath(__file__))
CFG = RasterConfig(impl="dense")  # the dense oracle renders the goldens


def base_scene(n, seed, spread=0.4, z0=4.0):
    rng = np.random.default_rng(seed)
    means = np.concatenate(
        [rng.normal(scale=spread, size=(n, 2)), z0 + rng.uniform(0, 2, size=(n, 1))], axis=1
    ).astype(np.float32)
    scales = np.exp(rng.normal(loc=-2.2, scale=0.4, size=(n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = (1.0 / (1.0 + np.exp(-rng.normal(size=(n,))))).astype(np.float32)
    colors = rng.uniform(size=(n, 3)).astype(np.float32)
    return means, scales, quats, opac, colors


def scene_alpha_clamp():
    m, s, q, o, c = base_scene(24, seed=10, spread=0.25)
    o[:12] = 0.9999  # with exp(power) ~ 1 near centers -> 0.99 clamp active
    s[:12] *= 2.0
    return m, s, q, o, c, {}


def scene_cutoff_straddle():
    m, s, q, o, c = base_scene(48, seed=11, spread=0.3)
    # alpha at pixel centers ~= opacity * exp(-eps): put opacity in a tight band
    # around 1/255 so per-pixel alphas land on both sides of the skip threshold.
    o[:] = (1.0 / 255.0) * np.linspace(0.8, 1.25, len(o))
    return m, s, q, o, c, {}


def scene_sticky_stop():
    m, s, q, o, c = base_scene(64, seed=12, spread=0.15)
    o[:32] = 0.99  # front wall: T hits the 1e-4 sticky stop mid-list
    m[:32, 2] = 3.0 + 0.01 * np.arange(32)
    m[32:, 2] = 5.0  # behind the wall: must not contribute
    c[32:] = 7.0  # poison value -> any leak is visible
    return m, s, q, o, c, {}


def scene_tile_border():
    m, s, q, o, c = base_scene(40, seed=13, spread=0.3)
    # Means projecting exactly onto 16-px tile boundaries: with f=60, z=4,
    # pixel x = 24 + 15*u -> world x = (px - 24) * z / f at the border px=16,32.
    for i, px in enumerate([15.5, 16.0, 16.5, 31.5, 32.0, 32.5] * 3):
        m[i, 0] = (px - 24.0) * m[i, 2] / 60.0
        m[i, 1] = ((i * 7) % 32 - 16.0) * m[i, 2] / 60.0
    return m, s, q, o, c, {}


def scene_unnormalized_quat():
    m, s, q, o, c = base_scene(32, seed=14, spread=0.3)
    rng = np.random.default_rng(140)
    q *= rng.uniform(0.2, 3.0, size=(len(q), 1)).astype(np.float32)  # raw, not unit
    return m, s, q, o, c, {}


def scene_principal_shift():
    m, s, q, o, c = base_scene(40, seed=15, spread=0.35)
    return m, s, q, o, c, {"cx": 13.0, "cy": 41.0}


SCENES = {
    "alpha_clamp": scene_alpha_clamp,
    "cutoff_straddle": scene_cutoff_straddle,
    "sticky_stop": scene_sticky_stop,
    "tile_border": scene_tile_border,
    "unnormalized_quat": scene_unnormalized_quat,
    "principal_shift": scene_principal_shift,
}

W, H = 48, 64
BG = np.array([0.1, 0.2, 0.3], np.float32)


def record(name, fn):
    means, scales, quats, opac, colors, cam_kw = fn()
    cx = cam_kw.get("cx", W / 2.0)
    cy = cam_kw.get("cy", H / 2.0)
    cam = Camera.from_w2c(np.eye(4), 60.0, 60.0, cx, cy, W, H)

    import zlib

    rng = np.random.default_rng(zlib.crc32(name.encode()))
    probe = rng.normal(size=(H, W, 3)).astype(np.float32)
    probe_t = rng.normal(size=(H, W)).astype(np.float32)

    def loss(m, s, q, o, c):
        cov3d = quat_scale_to_cov3d(s, q)
        img, aux = rasterize(m, cov3d, o, c, cam, bg=BG, config=CFG)
        return (img * probe).sum() + (aux.final_T * probe_t).sum(), (img, aux)

    args = tuple(jnp.asarray(a) for a in (means, scales, quats, opac, colors))
    (_, (img, aux)), grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4), has_aux=True)(*args)

    np.savez_compressed(
        os.path.join(OUT_DIR, f"{name}.npz"),
        means3d=means, scales=scales, quats=quats, opacities=opac, colors=colors,
        w2c=np.eye(4, dtype=np.float32), fx=60.0, fy=60.0, cx=cx, cy=cy,
        width=W, height=H, bg=BG, probe=probe, probe_t=probe_t,
        image=np.asarray(img), final_T=np.asarray(aux.final_T),
        n_contrib=np.asarray(aux.n_contrib),
        g_means3d=np.asarray(grads[0]), g_scales=np.asarray(grads[1]),
        g_quats=np.asarray(grads[2]), g_opacities=np.asarray(grads[3]),
        g_colors=np.asarray(grads[4]),
    )
    print(f"{name}: image mean {float(np.asarray(img).mean()):.4f}, "
          f"max n_contrib {int(np.asarray(aux.n_contrib).max())}")


if __name__ == "__main__":
    for name, fn in SCENES.items():
        record(name, fn)
