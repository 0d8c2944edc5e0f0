"""Neural-field training throughput vs ray-batch size (feature-major tables).

Measures rays/s of the init-mesh field training step (render_rays + photo/mask
losses + Adam, gaustar_tpu/train/init_mesh.py train_field) at the refscale
field-initializer's 512^3-scale FieldConfig, sweeping rays_per_batch. Before
the feature-major table relayout (models/neural_field.py HashGridParams), the
hash-encode's interleaved [N, F=2] per-level temps tiled to (8, 128) — a 64x
padding expansion — and the training step OOM'd above ~2k rays at this scale
(examples/refscale_field_init.py pinned rays_per_batch=2048 for that reason);
this probe records the post-relayout ceiling and throughput curve.

Writes FIELD_BATCH.json. Run: timeout 900 python examples/profile_field_batch.py
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from bench import _enable_jit_cache  # persistent jit cache (env-overridable)

import jax
import jax.numpy as jnp
import optax
from jax import lax

from gaustar_tpu.models import neural_field as nf

BATCHES = [2048, 8192, 16384, 32768]
K = 20  # timed steps per batch size (one fori dispatch, single scalar fetch)


def main():
    field_cfg = nf.FieldConfig(aabb_min=(-0.8, -0.8, 3.2), aabb_max=(0.8, 0.8, 4.8))
    params = nf.init_field(field_cfg, 0)
    opt = optax.adam(1e-2, b1=0.9, b2=0.99, eps=1e-15)
    opt_state = opt.init(params)

    rng = np.random.default_rng(0)
    report = {"config": "refscale field-init (512^3-scale FieldConfig)",
              "n_samples_per_ray": field_cfg.n_samples, "results": []}
    for n in BATCHES:
        # Synthetic rays through the aabb (throughput probe — the sampling
        # math, hash encode, MLPs, compositing and Adam are what cost).
        o = np.tile(np.array([0.0, 0.0, 0.0], np.float32), (n, 1))
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d[:, 2] = np.abs(d[:, 2]) + 1.0
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        gt_rgb = rng.uniform(size=(n, 3)).astype(np.float32)
        gt_mask = (rng.uniform(size=(n,)) > 0.5).astype(np.float32)

        @jax.jit
        def run(params, opt_state, key, o, d, gt_rgb, gt_mask):
            def body(_, carry):
                p, s, k = carry
                k, sub = jax.random.split(k)

                def loss_fn(pp):
                    rgb, alpha, _ = nf.render_rays(pp, o, d, field_cfg, sub)
                    photo = ((rgb - gt_rgb) ** 2 * gt_mask[:, None]).mean()
                    return photo + 0.1 * ((alpha - gt_mask) ** 2).mean()

                loss, grads = jax.value_and_grad(loss_fn)(p)
                up, s = opt.update(grads, s)
                return optax.apply_updates(p, up), s, k

            p, s, _ = lax.fori_loop(0, K, body, (params, opt_state, key))
            return p, s

        args = (params, opt_state, jax.random.PRNGKey(0),
                jnp.asarray(o), jnp.asarray(d), jnp.asarray(gt_rgb), jnp.asarray(gt_mask))
        # Only a genuine RESOURCE_EXHAUSTED is the memory ceiling the probe
        # exists to find; remote-compile-helper HTTP flakes etc. are transient
        # infra errors and get retried (ADVICE r4: the r4 run mistook an HTTP
        # 500 for the ceiling and never attempted 16384/32768).
        last_err = None
        for attempt in range(3):
            try:
                t0 = time.time()
                p1, s1 = run(*args)
                float(jnp.sum(p1.tables))  # host fetch = sync
                compile_s = time.time() - t0
                t0 = time.time()
                p1, s1 = run(*args)
                float(jnp.sum(p1.tables))
                dt = time.time() - t0
                rays_s = n * K / dt
                report["results"].append(
                    {"rays_per_batch": n, "ms_per_step": round(dt / K * 1e3, 2),
                     "rays_per_s": round(rays_s), "compile_s": round(compile_s, 1)}
                )
                print(f"batch {n}: {dt / K * 1e3:.1f} ms/step = {rays_s / 1e6:.2f} Mrays/s "
                      f"(compile {compile_s:.1f}s)", flush=True)
                last_err = None
                break
            except Exception as e:  # noqa: BLE001
                last_err = e
                if "RESOURCE_EXHAUSTED" in repr(e) or isinstance(e, MemoryError):
                    break  # the real memory ceiling — record and stop the sweep
                print(f"batch {n}: transient failure (attempt {attempt + 1}/3) "
                      f"{type(e).__name__}", flush=True)
                time.sleep(5.0)
        if last_err is not None:
            oom = "RESOURCE_EXHAUSTED" in repr(last_err) or isinstance(last_err, MemoryError)
            report["results"].append(
                {"rays_per_batch": n, "error": repr(last_err)[:300],
                 "oom": oom}
            )
            print(f"batch {n}: FAILED ({'OOM' if oom else 'infra'}) "
                  f"{type(last_err).__name__}", flush=True)
            if oom:
                break  # larger batches can only OOM harder
            # infra flake persisted through retries: keep sweeping (a larger
            # batch may still succeed; do not report a fake ceiling)

    report["backend"] = jax.default_backend()
    with open("FIELD_BATCH.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report["results"]))


if __name__ == "__main__":
    main()
