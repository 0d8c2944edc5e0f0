"""Offline quality metrics — gaussian_splatting/metrics.py:36-95 equivalent.

PSNR and SSIM run in JAX. LPIPS follows the reference's lpips(vgg) definition:
VGG16 features, unit-normalized per channel, squared differences, learned linear
weights, spatially averaged and summed over layers. Since this environment has
no network egress for pretrained weights, `lpips_vgg` accepts a weights file
(torchvision VGG16 state dict + lpips linear weights); without one it raises a
clear error rather than silently scoring with random features.

`evaluate_dirs` mirrors metrics.py's renders/gt directory walk and emits the
same per-scene dict {SSIM, PSNR, LPIPS}.
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax.numpy as jnp

from gaustar_tpu.ops.losses import psnr as _psnr, ssim as _ssim

# VGG16 conv layers used by LPIPS and their channel counts.
_LPIPS_LAYERS = [(1, 64), (2, 128), (3, 256), (4, 512), (5, 512)]


def psnr(pred, gt) -> float:
    return float(_psnr(jnp.asarray(pred), jnp.asarray(gt)))


def ssim(pred, gt) -> float:
    return float(_ssim(jnp.asarray(pred), jnp.asarray(gt)))


def margin_psnr(pred, gt, margin: int = 50) -> float:
    """Train-time PSNR with a 50 px margin crop (gaussian_splatting/train.py:198-199)."""
    p = jnp.asarray(pred)[margin:-margin, margin:-margin]
    g = jnp.asarray(gt)[margin:-margin, margin:-margin]
    return float(_psnr(p, g))


class LPIPSVgg:
    """LPIPS(vgg) scorer backed by torch (CPU). Requires a weights file because
    the environment cannot download pretrained VGG16."""

    def __init__(self, weights_path: str | None = None):
        if weights_path is None or not os.path.exists(weights_path):
            raise FileNotFoundError(
                "LPIPS needs pretrained VGG16 weights; pass weights_path to a file "
                "containing {'features.N.weight'/... : vgg16-features state dict, "
                "'lins': [w0..w4]} (no network egress to download them here)."
            )
        import torch
        from torch import nn

        self.torch = torch
        # VGG16 'features' trunk built directly (torchvision-free): the standard
        # 13-conv configuration D with maxpools after blocks.
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"]
        layers = []
        in_ch = 3
        for v in cfg:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers += [nn.Conv2d(in_ch, v, 3, padding=1), nn.ReLU(inplace=True)]
                in_ch = v
        features = nn.Sequential(*layers)
        blob = torch.load(weights_path, map_location="cpu")
        state = {k.removeprefix("features."): v for k, v in blob.items() if k.startswith("features.")}
        if state:
            features.load_state_dict(state)
        elif "vgg16" in blob:
            features.load_state_dict(
                {k.removeprefix("features."): v for k, v in blob["vgg16"].items() if k.startswith("features.")}
            )
        self.lin_weights = [torch.as_tensor(w) for w in blob["lins"]]
        features.eval()
        self.slices = []
        cuts = [4, 9, 16, 23, 30]
        prev = 0
        for c in cuts:
            self.slices.append(nn.Sequential(*list(features.children())[prev:c]))
            prev = c
        self.shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        self.scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def __call__(self, pred, gt) -> float:
        torch = self.torch
        with torch.no_grad():
            def prep(x):
                t = torch.from_numpy(np.asarray(x, np.float32)).permute(2, 0, 1)[None]
                t = t * 2.0 - 1.0
                return (t - self.shift) / self.scale

            xa, xb = prep(pred), prep(gt)
            total = 0.0
            for sl, w in zip(self.slices, self.lin_weights):
                xa, xb = sl(xa), sl(xb)
                na = xa / (xa.square().sum(1, keepdim=True).sqrt() + 1e-10)
                nb = xb / (xb.square().sum(1, keepdim=True).sqrt() + 1e-10)
                d = (na - nb).square()
                total += (d * w.view(1, -1, 1, 1)).sum(1).mean()
            return float(total)


def evaluate_pairs(renders, gts, lpips_fn=None) -> dict:
    """Mean metrics over lists of [H, W, 3] float arrays (metrics.py:36-62)."""
    out = {
        "PSNR": float(np.mean([psnr(r, g) for r, g in zip(renders, gts)])),
        "SSIM": float(np.mean([ssim(r, g) for r, g in zip(renders, gts)])),
    }
    if lpips_fn is not None:
        out["LPIPS"] = float(np.mean([lpips_fn(r, g) for r, g in zip(renders, gts)]))
    return out


def evaluate_dirs(renders_dir: str, gt_dir: str, lpips_weights: str | None = None, out_json: str | None = None) -> dict:
    """Walk matching image filenames in two dirs (metrics.py:36-95)."""
    from PIL import Image

    names = sorted(os.listdir(renders_dir))
    renders, gts = [], []
    for n in names:
        gp = os.path.join(gt_dir, n)
        if not os.path.exists(gp):
            continue
        renders.append(np.asarray(Image.open(os.path.join(renders_dir, n)), np.float32) / 255.0)
        gts.append(np.asarray(Image.open(gp), np.float32) / 255.0)
    lpips_fn = None
    if lpips_weights:
        lpips_fn = LPIPSVgg(lpips_weights)
    result = evaluate_pairs(renders, gts, lpips_fn)
    if out_json:
        with open(out_json, "w") as f:
            json.dump(result, f, indent=2)
    return result
