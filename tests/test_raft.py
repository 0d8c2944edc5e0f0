"""RAFT architecture: shapes, pipeline, and analytic-translation sanity."""

import numpy as np
import jax.numpy as jnp

from gaustar_tpu.tools import raft


def test_raft_shapes():
    p = raft.random_params()
    img = np.zeros((1, 3, 64, 96), np.float32)
    flow = raft.raft_forward(p, jnp.asarray(img), jnp.asarray(img), iters=2)
    assert flow.shape == (1, 2, 64, 96)
    assert np.isfinite(np.asarray(flow)).all()


def test_bilinear_sampler_identity():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(2, 4, 8, 10)).astype(np.float32))
    ys, xs = np.meshgrid(np.arange(8, dtype=np.float32), np.arange(10, dtype=np.float32), indexing="ij")
    coords = jnp.asarray(np.stack([xs, ys], -1))[None].repeat(2, 0)
    out = raft.bilinear_sampler(img, coords)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_corr_pyramid_peak_at_true_shift():
    """Correlation of a shifted feature map peaks at the shifted coordinate."""
    rng = np.random.default_rng(1)
    h, w, d = 16, 16, 32
    f1 = rng.normal(size=(1, d, h, w)).astype(np.float32)
    shift = 3  # f2[x] = f1[x - 3] -> pixel x in img1 matches x+3 in img2? no:
    # f2[:, :, :, 3:] = f1[:, :, :, :-3] means feature at img2 col c equals img1 col c-3,
    # so img1 col c matches img2 col c+3.
    f2 = np.zeros_like(f1)
    f2[:, :, :, shift:] = f1[:, :, :, : w - shift]
    pyr = raft.build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=1)
    corr = np.asarray(pyr[0]).reshape(h, w, h, w)
    # for a middle pixel, argmax over img2 position should be (same row, col+3)
    r, c = 8, 6
    m = np.unravel_index(np.argmax(corr[r, c]), (h, w))
    assert m == (r, c + shift), m


def test_upsample_flow_shape_and_scale():
    p = raft.random_params()
    flow = jnp.ones((1, 2, 4, 6))
    mask = jnp.zeros((1, 64 * 9, 4, 6))
    up = raft.upsample_flow_convex(flow, mask)
    assert up.shape == (1, 2, 32, 48)
    # uniform mask -> convex combo of 8*flow values = 8 (interior; borders see
    # the zero padding of the 3x3 patch window)
    np.testing.assert_allclose(np.asarray(up)[:, :, 8:-8, 8:-8], 8.0, atol=1e-4)


def test_compute_flow_pair_pipeline():
    p = raft.random_params()
    rng = np.random.default_rng(2)
    img = (rng.uniform(size=(40, 60, 3)) * 255).astype(np.uint8)
    f, b, pad = raft.compute_flow_pair(p, img, img, iters=1, scale=0.5)
    assert f.shape == (20, 30, 2) and b.shape == (20, 30, 2)
    assert np.isfinite(f).all()


def _reference_torch_checkpoint(tmp_path, zero=True):
    """Build a raft-things.pth-layout checkpoint: DataParallel 'module.' prefixes
    (demo_GauSTAR.py:59-62), BatchNorm num_batches_tracked entries, and the
    duplicate norm3/downsample.1 aliases of extractor.py:44 (the same module is
    registered under both attribute paths)."""
    import torch

    from gaustar_tpu.tools import raft

    spec = raft.random_params(seed=3)
    sd = {}
    for k, v in spec.items():
        arr = np.zeros_like(np.asarray(v)) if zero else np.asarray(v)
        sd["module." + k] = torch.from_numpy(arr.copy())
    for k in list(sd):
        if k.endswith(".running_var"):
            sd[k] = torch.ones_like(sd[k])  # zero variance never occurs in torch
            base = k.removesuffix(".running_var")
            sd[base + ".num_batches_tracked"] = torch.tensor(0, dtype=torch.int64)
        if ".norm3." in k:  # alias registered via nn.Sequential(conv, norm3)
            sd[k.replace(".norm3.", ".downsample.1.")] = sd[k]
    path = str(tmp_path / "raft-things.pth")
    torch.save(sd, path)
    return path, spec


def test_torch_checkpoint_roundtrip(tmp_path):
    """load_torch_checkpoint must strip DataParallel prefixes and yield every
    parameter raft_forward consumes, with matching shapes."""
    import pytest

    pytest.importorskip("torch")
    from gaustar_tpu.tools import raft

    path, spec = _reference_torch_checkpoint(tmp_path, zero=False)
    p = raft.load_torch_checkpoint(path)
    missing = [k for k in spec if k not in p]
    assert not missing, f"converter lost keys: {missing[:5]}"
    for k in spec:
        assert p[k].shape == spec[k].shape, k
        np.testing.assert_array_equal(np.asarray(p[k]), np.asarray(spec[k]), err_msg=k)


def test_flow_pipeline_from_torch_checkpoint(tmp_path):
    """The full weights path end to end (VERDICT r4 item 8): torch.save a
    reference-layout checkpoint -> load_torch_checkpoint -> compute_flow_pair
    executes and, with all-zero conv weights, predicts exactly zero flow."""
    import pytest

    pytest.importorskip("torch")
    from gaustar_tpu.tools import raft

    path, _ = _reference_torch_checkpoint(tmp_path, zero=True)
    p = raft.load_torch_checkpoint(path)
    rng = np.random.default_rng(4)
    img = (rng.uniform(size=(40, 60, 3)) * 255).astype(np.uint8)
    f, b, pad = raft.compute_flow_pair(p, img, img, iters=1, scale=0.5)
    assert f.shape == (20, 30, 2) and b.shape == (20, 30, 2)
    np.testing.assert_allclose(f, 0.0, atol=1e-5)
    np.testing.assert_allclose(b, 0.0, atol=1e-5)


def test_zero_checkpoint_epe():
    """End-to-end numeric anchor: all-zero conv weights make every GRU flow
    update exactly zero (flow_head outputs 0; the convex upsampler averages
    zeros), so the predicted flow is identically 0 — EPE against a static pair
    is 0 and against a t-pixel translation is exactly |t|. Validates the whole
    forward + compute_flow_pair plumbing with a closed-form answer; flow
    *quality* needs the real raft-things.pth (no egress here)."""
    from gaustar_tpu.tools import raft

    spec = raft.random_params(seed=3)
    p = {k: jnp.zeros_like(v) for k, v in spec.items()}
    for k in p:
        if k.endswith("running_var"):
            p[k] = jnp.ones_like(p[k])

    rng = np.random.default_rng(4)
    img = (rng.uniform(size=(48, 64, 3)) * 255).astype(np.uint8)
    tx = 6
    img2 = np.roll(img, tx, axis=1)

    f_static, b_static, _ = raft.compute_flow_pair(p, img, img, iters=2, scale=0.5)
    epe_static = np.linalg.norm(f_static, axis=-1).mean()
    assert epe_static == 0.0

    f_shift, _, _ = raft.compute_flow_pair(p, img, img2, iters=2, scale=0.5)
    gt = np.array([tx * 0.5, 0.0], np.float32)  # flow computed at 0.5x scale
    epe_shift = np.linalg.norm(f_shift - gt, axis=-1).mean()
    assert epe_shift == np.float32(tx * 0.5)
