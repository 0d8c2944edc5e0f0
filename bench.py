"""Benchmark: Mpix/s forward+backward per chip on a 1.6 MP multiview render.

The north-star metric of BASELINE.json. Runs the FULL differentiable pipeline
(SuGaR mesh-bound model -> preprocess -> binning -> Pallas blend -> rgb loss ->
analytic backward through all of it -> per-parameter grads) K times inside one
jitted fori_loop on the real TPU and reports Mpix/s of fwd+bwd.

vs_baseline compares against a 7.5 Mpix/s fwd+bwd estimate for the reference
CUDA pipeline (2000-iteration refine of a ~1.5 MP frame in a few minutes on one
GPU; the repo publishes no numbers — BASELINE.md).

NOTE (axon tunnel): jax.block_until_ready does not synchronize; timing forces a
host fetch of a scalar and amortizes the RPC floor over K on-device iterations.
"""

import json
import sys
import time

import numpy as np

REFERENCE_MPIX_S = 7.5


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from gaustar_tpu.cameras import Camera
    from gaustar_tpu.mesh.primitives import icosphere
    from gaustar_tpu.models import sugar
    from gaustar_tpu.ops.rasterizer import RasterConfig
    from gaustar_tpu.utils.synthetic import ring_cameras

    W, H = 1600, 1024  # 1.6 MP
    SUBDIV = 5  # 20480 faces -> 122,880 gaussians at 6/face
    K = 8

    verts, faces = icosphere(SUBDIV, radius=0.6, center=(0.0, 0.0, 4.0))
    rng = np.random.default_rng(0)
    colors = rng.uniform(0.2, 0.9, size=(len(verts), 3)).astype(np.float32)
    params, config = sugar.init_sugar(verts, faces, vertex_colors=colors)
    cameras = ring_cameras(4, w=W, h=H, focal=1600.0)
    raster_cfg = RasterConfig(
        max_pairs=1 << 19, max_padded=1 << 20, chunk=256, impl="pallas"
    )

    target = jnp.zeros((H, W, 3)) + 0.5

    def loss_fn(params, camera, eps):
        img, _ = sugar.render(
            params, config, camera, bg=(0.0, 1.0, 0.0), sh_deg=2, raster_config=raster_cfg
        )
        return ((img - target) ** 2).mean() + eps

    def step_loss(params, camera, eps):
        l, g = jax.value_and_grad(loss_fn)(params, camera, eps)
        return l + sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))

    camera = cameras[0]

    @jax.jit
    def run(params):
        def body(i, acc):
            return acc + step_loss(params, camera, i * 1e-12)

        return lax.fori_loop(0, K, body, jnp.float32(0.0))

    # Compile + warm up (host fetch forces sync through the tunnel).
    t0 = time.time()
    _ = float(run(params))
    compile_s = time.time() - t0

    t0 = time.time()
    _ = float(run(params))
    dt = (time.time() - t0) / K
    mpix_s = W * H / dt / 1e6

    result = {
        "metric": "Mpix/s fwd+bwd per chip (1.6MP SuGaR render, 123k gaussians)",
        "value": round(mpix_s, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / REFERENCE_MPIX_S, 3),
    }
    print(json.dumps(result))
    print(
        f"# step {dt*1e3:.1f} ms, compile {compile_s:.0f}s, backend={jax.default_backend()}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
