"""Refine loop: losses finite, training improves rgb, unbind hook, schedules."""

import numpy as np
import jax.numpy as jnp

from gaustar_tpu.models import sugar
from gaustar_tpu.train import refine
from gaustar_tpu.train.refine import RefineConfig

from helpers import synthetic_frame


def test_refine_improves():
    params, config, data, target, rcfg = synthetic_frame()
    cfg = RefineConfig(
        num_iterations=30, loose_bind_from=10_000, use_margin=True, do_sh_warmup=True
    )

    loss0, d0 = refine.compute_losses(
        params, config, data, jnp.int32(0), jnp.int32(1), cfg, rcfg, sh_deg=0
    )
    assert np.isfinite(float(loss0))

    out_params, out_config, history = refine.refine_frame(
        params, config, data, cfg, rcfg, log_every=10
    )
    lossN, dN = refine.compute_losses(
        out_params, out_config, data, jnp.int32(0), jnp.int32(1), cfg, rcfg, sh_deg=0
    )
    assert float(dN["rgb_loss"]) < float(d0["rgb_loss"])
    assert len(history) == 3


def test_sh_warmup_schedule():
    cfg = RefineConfig(num_iterations=2000, sh_levels=3)
    assert refine.sh_deg_at(1, cfg) == 0
    assert refine.sh_deg_at(499, cfg) == 0
    assert refine.sh_deg_at(500, cfg) == 1
    assert refine.sh_deg_at(1000, cfg) == 2
    assert refine.sh_deg_at(1999, cfg) == 2  # capped at sh_levels-1


def test_unbind_hook_triggers():
    params, config, data, target, rcfg = synthetic_frame()
    calls = []

    def detect(p, c):
        calls.append(1)
        # flag every face as topology-changed -> weight 1 -> unbind weight 0
        return np.ones(c.faces.shape[0], np.float32)

    cfg = RefineConfig(num_iterations=8, loose_bind_from=4)
    out_params, out_config, _ = refine.refine_frame(
        params, config, data, cfg, rcfg, detect_topo_fn=detect, log_every=0
    )
    assert len(calls) == 1
    assert out_config.loose_bind


def test_unbind_skipped_when_few_faces():
    params, config, data, target, rcfg = synthetic_frame()

    def detect(p, c):
        w = np.zeros(c.faces.shape[0], np.float32)
        w[:2] = 1.0  # only 2 faces flagged * 6 gaussians = 12 < 100
        return w

    cfg = RefineConfig(num_iterations=6, loose_bind_from=3)
    _, out_config, _ = refine.refine_frame(
        params, config, data, cfg, rcfg, detect_topo_fn=detect, log_every=0
    )
    assert not out_config.loose_bind


def test_margins():
    m = refine.compute_margins(np.asarray([20.0]), np.asarray([26.0]), 48, 48)
    np.testing.assert_array_equal(m[0], [5, 1, 1, 3])
    mask = np.asarray(refine.margin_mask(jnp.asarray(m[0]), 48, 48))
    assert mask[0, 0] == 0 and mask[24, 24] == 1
    assert mask[:, :5].sum() == 0 and mask[:, -1].sum() == 0


def test_midframe_checkpoint_resume_matches_uninterrupted(tmp_path):
    """Mid-frame resume (beyond the reference): interrupt at iteration 6 of 12,
    resume from the checkpoint, final params match the uninterrupted run."""
    params, config, data, target, rcfg = synthetic_frame()
    cfg = RefineConfig(num_iterations=12, loose_bind_from=10_000, do_sh_warmup=False)
    ck = str(tmp_path / "mid.npz")

    # Uninterrupted run (also writes checkpoints, which must not perturb it).
    p_full, _, _ = refine.refine_frame(
        params, config, data, cfg, rcfg, log_every=0,
        checkpoint_every=6, checkpoint_path=str(tmp_path / "other.npz"),
    )

    # Interrupted: run only 6 iterations by checkpointing at 6 then resuming.
    cfg6 = RefineConfig(num_iterations=6, loose_bind_from=10_000, do_sh_warmup=False)
    refine.refine_frame(
        params, config, data, cfg6, rcfg, log_every=0,
        checkpoint_every=6, checkpoint_path=ck,
    )
    p_res, _, _ = refine.refine_frame(
        params, config, data, cfg, rcfg, log_every=0,
        checkpoint_path=ck, resume=True,
    )

    for name in ("points", "sh_dc", "scales", "densities"):
        np.testing.assert_allclose(
            np.asarray(getattr(p_res, name)), np.asarray(getattr(p_full, name)),
            rtol=1e-6, atol=1e-7, err_msg=name,
        )
