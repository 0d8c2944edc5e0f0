"""LPIPS(vgg) path: converter + scorer executable end-to-end on synthetic weights.

The reference scores with the lpips pip package (gaussian_splatting/
metrics.py:36-95); real pretrained weights cannot be downloaded here, so these
tests build a correctly-shaped synthetic checkpoint pair (torchvision vgg16
layout + lpips 'lin{i}.model.1.weight' layout), run the converter, and assert
the scorer's metric properties. With real weights dropped in, the same code
path produces reference LPIPS numbers.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from gaustar_tpu.eval.lpips_convert import LIN_CHANNELS, convert
from gaustar_tpu.eval.metrics import LPIPSVgg, evaluate_pairs

VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"]


def _synthetic_checkpoints(tmp_path):
    g = torch.Generator().manual_seed(0)
    state = {}
    in_ch, idx = 3, 0
    for v in VGG_CFG:
        if v == "M":
            idx += 1  # MaxPool2d slot
            continue
        state[f"features.{idx}.weight"] = torch.randn(v, in_ch, 3, 3, generator=g) * 0.05
        state[f"features.{idx}.bias"] = torch.zeros(v)
        in_ch = v
        idx += 2  # Conv2d + ReLU slots
    # torchvision checkpoints also carry the classifier head; must be ignored.
    state["classifier.0.weight"] = torch.zeros(1, 1)
    vgg_path = str(tmp_path / "vgg16.pth")
    torch.save(state, vgg_path)

    lp = {
        f"lin{i}.model.1.weight": torch.rand(1, c, 1, 1, generator=g) + 0.01
        for i, c in enumerate(LIN_CHANNELS)
    }
    lpips_path = str(tmp_path / "lpips_vgg.pth")
    torch.save(lp, lpips_path)
    return vgg_path, lpips_path


def test_convert_and_score(tmp_path):
    vgg_path, lpips_path = _synthetic_checkpoints(tmp_path)
    out = str(tmp_path / "lpips_packed.pt")
    blob = convert(vgg_path, lpips_path, out)
    assert len(blob["lins"]) == 5
    assert [w.numel() for w in blob["lins"]] == LIN_CHANNELS
    assert "classifier.0.weight" not in blob

    scorer = LPIPSVgg(out)
    rng = np.random.default_rng(1)
    a = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(scale=0.3, size=a.shape).astype(np.float32), 0, 1)

    d_same = scorer(a, a)
    d_diff = scorer(a, b)
    assert d_same == pytest.approx(0.0, abs=1e-6)
    assert d_diff > 1e-4

    # Symmetric (the metric is a distance on normalized features).
    assert scorer(b, a) == pytest.approx(d_diff, rel=1e-5)


def test_convert_bare_features_trunk(tmp_path):
    vgg_path, lpips_path = _synthetic_checkpoints(tmp_path)
    full = torch.load(vgg_path)
    bare = {k.removeprefix("features."): v for k, v in full.items() if k.startswith("features.")}
    bare_path = str(tmp_path / "vgg16_features.pth")
    torch.save(bare, bare_path)
    out = str(tmp_path / "packed.pt")
    convert(bare_path, lpips_path, out)
    LPIPSVgg(out)  # loads without error


def test_evaluate_pairs_with_lpips(tmp_path):
    vgg_path, lpips_path = _synthetic_checkpoints(tmp_path)
    out = str(tmp_path / "packed.pt")
    convert(vgg_path, lpips_path, out)
    scorer = LPIPSVgg(out)
    rng = np.random.default_rng(2)
    renders = [rng.uniform(size=(48, 48, 3)).astype(np.float32) for _ in range(2)]
    gts = [np.clip(r + 0.05, 0, 1) for r in renders]
    res = evaluate_pairs(renders, gts, lpips_fn=scorer)
    assert set(res) == {"PSNR", "SSIM", "LPIPS"}
    assert res["LPIPS"] >= 0.0


def test_missing_weights_raises():
    with pytest.raises(FileNotFoundError):
        LPIPSVgg(None)
