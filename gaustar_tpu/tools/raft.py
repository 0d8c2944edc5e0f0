"""RAFT optical flow in JAX — data_process/RAFT/core/{raft,extractor,corr,update}.py.

Faithful re-implementation of the "basic" RAFT (hidden 128, context 128, 4
correlation levels, radius 4) used by demo_GauSTAR.py to produce the
bidirectional `flow_bi` inputs. Parameters are a flat dict keyed by the TORCH
state-dict names (e.g. 'fnet.conv1.weight'), so loading the published
raft-things.pth is a one-liner (`load_torch_checkpoint`); there is no egress in
this environment to fetch the weights, so random init is also provided for
shape/pipeline tests.

All convs run in NCHW with OIHW kernels (torch layout, native to XLA). The
reference's default pure-PyTorch CorrBlock (core/corr.py) is used — the
alt_cuda_corr extension is an optional memory optimization, not needed here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------


def conv2d(x, w, b=None, stride=1, padding="SAME", dilation=1):
    s = (stride, stride) if isinstance(stride, int) else stride
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=s, padding=padding,
        rhs_dilation=(dilation, dilation) if isinstance(dilation, int) else dilation,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if b is not None:
        y = y + b[None, :, None, None]
    return y


def instance_norm(x, eps=1e-5):
    mean = x.mean(axis=(2, 3), keepdims=True)
    var = x.var(axis=(2, 3), keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


def batch_norm_inf(x, p, name, eps=1e-5):
    mean = p[f"{name}.running_mean"][None, :, None, None]
    var = p[f"{name}.running_var"][None, :, None, None]
    w = p[f"{name}.weight"][None, :, None, None]
    b = p[f"{name}.bias"][None, :, None, None]
    return (x - mean) / jnp.sqrt(var + eps) * w + b


def _norm(x, p, name, kind):
    if kind == "instance":
        return instance_norm(x)
    if kind == "batch":
        return batch_norm_inf(x, p, name)
    return x  # 'none'


# ---------------------------------------------------------------------------
# Encoder (extractor.py BasicEncoder: conv7 s2 -> res layers 64/96/128 -> conv1)
# ---------------------------------------------------------------------------


def _residual_block(x, p, pre, kind, stride):
    y = jax.nn.relu(_norm(conv2d(x, p[f"{pre}.conv1.weight"], p[f"{pre}.conv1.bias"], stride, 1), p, f"{pre}.norm1", kind))
    y = jax.nn.relu(_norm(conv2d(y, p[f"{pre}.conv2.weight"], p[f"{pre}.conv2.bias"], 1, 1), p, f"{pre}.norm2", kind))
    if stride == 1 and f"{pre}.downsample.0.weight" not in p:
        sc = x
    else:
        sc = _norm(conv2d(x, p[f"{pre}.downsample.0.weight"], p[f"{pre}.downsample.0.bias"], stride, 0), p, f"{pre}.norm3", kind)
    return jax.nn.relu(y + sc)


def basic_encoder(x, p, prefix, kind):
    y = jax.nn.relu(_norm(conv2d(x, p[f"{prefix}.conv1.weight"], p[f"{prefix}.conv1.bias"], 2, 3), p, f"{prefix}.norm1", kind))
    for li, stride in [(1, 1), (2, 2), (3, 2)]:
        y = _residual_block(y, p, f"{prefix}.layer{li}.0", kind, stride)
        y = _residual_block(y, p, f"{prefix}.layer{li}.1", kind, 1)
    return conv2d(y, p[f"{prefix}.conv2.weight"], p[f"{prefix}.conv2.bias"], 1, 0)


# ---------------------------------------------------------------------------
# Correlation pyramid (corr.py CorrBlock)
# ---------------------------------------------------------------------------


def build_corr_pyramid(fmap1, fmap2, num_levels=4):
    b, d, h, w = fmap1.shape
    f1 = fmap1.reshape(b, d, h * w)
    f2 = fmap2.reshape(b, d, h * w)
    corr = jnp.einsum("bdn,bdm->bnm", f1, f2) / jnp.sqrt(jnp.float32(d))
    corr = corr.reshape(b * h * w, 1, h, w)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        corr = jax.lax.reduce_window(
            corr, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
        ) / 4.0
        pyramid.append(corr)
    return pyramid


def bilinear_sampler(img, coords):
    """img [N, C, H, W], coords [N, Hc, Wc, 2] (x, y pixel coords) -> sampled
    [N, C, Hc, Wc] with zero padding (utils.bilinear_sampler semantics)."""
    n, c, h, w = img.shape
    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0

    def gather(xi, yi):
        xi_c = jnp.clip(xi.astype(jnp.int32), 0, w - 1)
        yi_c = jnp.clip(yi.astype(jnp.int32), 0, h - 1)
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        flat = img.reshape(n, c, h * w)
        idx = (yi_c * w + xi_c).reshape(n, -1)
        out = jnp.take_along_axis(flat, idx[:, None, :], axis=2)
        out = out.reshape(n, c, *xi.shape[1:])
        return out * valid[:, None].astype(img.dtype)

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    wx = dx[:, None]
    wy = dy[:, None]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def corr_lookup(pyramid, coords, radius=4):
    """coords [B, 2, H, W] -> correlation features [B, levels*(2r+1)^2, H, W]."""
    b, _, h, w = coords.shape
    coords_t = coords.transpose(0, 2, 3, 1)  # [B, H, W, 2]
    r = radius
    delta = jnp.stack(
        jnp.meshgrid(jnp.arange(-r, r + 1), jnp.arange(-r, r + 1), indexing="ij")[::-1],
        axis=-1,
    ).astype(jnp.float32)  # [2r+1, 2r+1, 2] (dx, dy)
    out = []
    for lvl, corr in enumerate(pyramid):
        centroid = coords_t.reshape(b * h * w, 1, 1, 2) / (2**lvl)
        pts = centroid + delta[None]  # [BHW, 2r+1, 2r+1, 2]
        sampled = bilinear_sampler(corr, pts)  # [BHW, 1, 2r+1, 2r+1]
        out.append(sampled.reshape(b, h, w, -1))
    feat = jnp.concatenate(out, axis=-1)
    return feat.transpose(0, 3, 1, 2)


# ---------------------------------------------------------------------------
# Update block (update.py BasicUpdateBlock / SepConvGRU / BasicMotionEncoder)
# ---------------------------------------------------------------------------


def basic_motion_encoder(flow, corr, p):
    pre = "update_block.encoder"
    co = jax.nn.relu(conv2d(corr, p[f"{pre}.convc1.weight"], p[f"{pre}.convc1.bias"], 1, 0))
    co = jax.nn.relu(conv2d(co, p[f"{pre}.convc2.weight"], p[f"{pre}.convc2.bias"], 1, 1))
    fl = jax.nn.relu(conv2d(flow, p[f"{pre}.convf1.weight"], p[f"{pre}.convf1.bias"], 1, 3))
    fl = jax.nn.relu(conv2d(fl, p[f"{pre}.convf2.weight"], p[f"{pre}.convf2.bias"], 1, 1))
    out = jax.nn.relu(
        conv2d(jnp.concatenate([co, fl], 1), p[f"{pre}.conv.weight"], p[f"{pre}.conv.bias"], 1, 1)
    )
    return jnp.concatenate([out, flow], axis=1)


def sep_conv_gru(h, x, p):
    pre = "update_block.gru"
    hx = jnp.concatenate([h, x], axis=1)
    z = jax.nn.sigmoid(conv2d(hx, p[f"{pre}.convz1.weight"], p[f"{pre}.convz1.bias"], 1, [(0, 0), (2, 2)]))
    r = jax.nn.sigmoid(conv2d(hx, p[f"{pre}.convr1.weight"], p[f"{pre}.convr1.bias"], 1, [(0, 0), (2, 2)]))
    q = jnp.tanh(
        conv2d(jnp.concatenate([r * h, x], 1), p[f"{pre}.convq1.weight"], p[f"{pre}.convq1.bias"], 1, [(0, 0), (2, 2)])
    )
    h = (1 - z) * h + z * q
    hx = jnp.concatenate([h, x], axis=1)
    z = jax.nn.sigmoid(conv2d(hx, p[f"{pre}.convz2.weight"], p[f"{pre}.convz2.bias"], 1, [(2, 2), (0, 0)]))
    r = jax.nn.sigmoid(conv2d(hx, p[f"{pre}.convr2.weight"], p[f"{pre}.convr2.bias"], 1, [(2, 2), (0, 0)]))
    q = jnp.tanh(
        conv2d(jnp.concatenate([r * h, x], 1), p[f"{pre}.convq2.weight"], p[f"{pre}.convq2.bias"], 1, [(2, 2), (0, 0)])
    )
    return (1 - z) * h + z * q


def flow_head(h, p):
    pre = "update_block.flow_head"
    y = jax.nn.relu(conv2d(h, p[f"{pre}.conv1.weight"], p[f"{pre}.conv1.bias"], 1, 1))
    return conv2d(y, p[f"{pre}.conv2.weight"], p[f"{pre}.conv2.bias"], 1, 1)


def update_block(net, inp, corr, flow, p):
    motion = basic_motion_encoder(flow, corr, p)
    net = sep_conv_gru(net, jnp.concatenate([inp, motion], axis=1), p)
    delta = flow_head(net, p)
    m = jax.nn.relu(conv2d(net, p["update_block.mask.0.weight"], p["update_block.mask.0.bias"], 1, 1))
    mask = 0.25 * conv2d(m, p["update_block.mask.2.weight"], p["update_block.mask.2.bias"], 1, 0)
    return net, mask, delta


# ---------------------------------------------------------------------------
# RAFT forward
# ---------------------------------------------------------------------------


def coords_grid(b, h, w):
    y, x = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij")
    return jnp.broadcast_to(jnp.stack([x, y])[None], (b, 2, h, w))


def upsample_flow_convex(flow, mask):
    """8x convex upsampling (raft.py upsample_flow): mask [B, 64*9, H, W]."""
    b, _, h, w = flow.shape
    mask = mask.reshape(b, 1, 9, 8, 8, h, w)
    mask = jax.nn.softmax(mask, axis=2)
    # 3x3 neighborhood of 8*flow via patch extraction
    pad = jnp.pad(8.0 * flow, ((0, 0), (0, 0), (1, 1), (1, 1)))
    patches = jnp.stack(
        [pad[:, :, dy : dy + h, dx : dx + w] for dy in range(3) for dx in range(3)], axis=2
    )  # [B, 2, 9, H, W]
    up = (mask * patches[:, :, :, None, None]).sum(axis=2)  # [B, 2, 8, 8, H, W]
    up = up.transpose(0, 1, 4, 2, 5, 3)  # [B, 2, H, 8, W, 8]
    return up.reshape(b, 2, 8 * h, 8 * w)


@functools.partial(jax.jit, static_argnames=("iters",))
def raft_forward(p, image1, image2, iters: int = 20):
    """image1/2 [B, 3, H, W] in [0, 255]; H, W divisible by 8.
    Returns full-resolution flow [B, 2, H, W] (x, y displacement)."""
    img1 = 2.0 * (image1 / 255.0) - 1.0
    img2 = 2.0 * (image2 / 255.0) - 1.0

    fmap1 = basic_encoder(img1, p, "fnet", "instance")
    fmap2 = basic_encoder(img2, p, "fnet", "instance")
    pyramid = build_corr_pyramid(fmap1, fmap2)

    cnet = basic_encoder(img1, p, "cnet", "batch")
    net, inp = jnp.split(cnet, 2, axis=1)
    net = jnp.tanh(net)
    inp = jax.nn.relu(inp)

    b, _, h, w = fmap1.shape
    coords0 = coords_grid(b, h, w)
    coords1 = coords_grid(b, h, w)

    flow_up = None
    for _ in range(iters):
        corr = corr_lookup(pyramid, coords1)
        flow = coords1 - coords0
        net, mask, delta = update_block(net, inp, corr, flow, p)
        coords1 = coords1 + delta
        flow_up = upsample_flow_convex(coords1 - coords0, mask)
    return flow_up


# ---------------------------------------------------------------------------
# Parameter init / torch checkpoint loading
# ---------------------------------------------------------------------------


def load_torch_checkpoint(path: str) -> dict:
    """Load a torch RAFT checkpoint (raft-things.pth style, possibly wrapped in
    DataParallel 'module.' prefixes — demo_GauSTAR.py:59-62)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k.removeprefix("module."): jnp.asarray(v.numpy()) for k, v in sd.items()}


def random_params(seed: int = 0) -> dict:
    """Random-initialized parameter dict (architecture tests; NOT trained)."""
    rng = np.random.default_rng(seed)
    p = {}

    def conv(name, o, i, kh, kw):
        p[f"{name}.weight"] = jnp.asarray(
            rng.normal(0, 0.05, size=(o, i, kh, kw)).astype(np.float32)
        )
        p[f"{name}.bias"] = jnp.zeros((o,), jnp.float32)

    def bn(name, c):
        p[f"{name}.weight"] = jnp.ones((c,), jnp.float32)
        p[f"{name}.bias"] = jnp.zeros((c,), jnp.float32)
        p[f"{name}.running_mean"] = jnp.zeros((c,), jnp.float32)
        p[f"{name}.running_var"] = jnp.ones((c,), jnp.float32)

    for prefix, kind, out_dim in [("fnet", "instance", 256), ("cnet", "batch", 256)]:
        conv(f"{prefix}.conv1", 64, 3, 7, 7)
        if kind == "batch":
            bn(f"{prefix}.norm1", 64)
        chans = [(64, 64, 1), (64, 96, 2), (96, 128, 2)]
        for li, (cin, cout, stride) in enumerate(chans, start=1):
            for bi in range(2):
                cin_b = cin if bi == 0 else cout
                st = stride if bi == 0 else 1
                pre = f"{prefix}.layer{li}.{bi}"
                conv(f"{pre}.conv1", cout, cin_b, 3, 3)
                conv(f"{pre}.conv2", cout, cout, 3, 3)
                if kind == "batch":
                    bn(f"{pre}.norm1", cout)
                    bn(f"{pre}.norm2", cout)
                if st != 1 or cin_b != cout:
                    conv(f"{pre}.downsample.0", cout, cin_b, 1, 1)
                    if kind == "batch":
                        bn(f"{pre}.norm3", cout)
        conv(f"{prefix}.conv2", out_dim, 128, 1, 1)

    cor_planes = 4 * (2 * 4 + 1) ** 2  # 324
    conv("update_block.encoder.convc1", 256, cor_planes, 1, 1)
    conv("update_block.encoder.convc2", 192, 256, 3, 3)
    conv("update_block.encoder.convf1", 128, 2, 7, 7)
    conv("update_block.encoder.convf2", 64, 128, 3, 3)
    conv("update_block.encoder.conv", 126, 256, 3, 3)
    for g in ["z", "r", "q"]:
        conv(f"update_block.gru.conv{g}1", 128, 128 + 256, 1, 5)
        conv(f"update_block.gru.conv{g}2", 128, 128 + 256, 5, 1)
    conv("update_block.flow_head.conv1", 256, 128, 3, 3)
    conv("update_block.flow_head.conv2", 2, 256, 3, 3)
    conv("update_block.mask.0", 256, 128, 3, 3)
    conv("update_block.mask.2", 64 * 9, 256, 1, 1)
    return p


def compute_flow_pair(p, img1: np.ndarray, img2: np.ndarray, iters=20, scale=0.5):
    """Bidirectional flow at `scale` resolution with /8 padding — the
    demo_GauSTAR.py pipeline (:24, :88-107). Returns (flow_f, flow_b, pad)
    with flows [h, w, 2] in (x, y) order at the scaled resolution."""
    import cv2

    h0, w0 = img1.shape[:2]
    hs, ws = int(h0 * scale), int(w0 * scale)
    a = cv2.resize(img1, (ws, hs))
    b = cv2.resize(img2, (ws, hs))
    ph = (8 - hs % 8) % 8
    pw = (8 - ws % 8) % 8
    pad = [ph // 2, ph - ph // 2, pw // 2, pw - pw // 2]
    a = np.pad(a, ((pad[0], pad[1]), (pad[2], pad[3]), (0, 0)))
    b = np.pad(b, ((pad[0], pad[1]), (pad[2], pad[3]), (0, 0)))
    t1 = jnp.asarray(a, jnp.float32).transpose(2, 0, 1)[None]
    t2 = jnp.asarray(b, jnp.float32).transpose(2, 0, 1)[None]
    fwd = np.asarray(raft_forward(p, t1, t2, iters=iters))[0].transpose(1, 2, 0)
    bwd = np.asarray(raft_forward(p, t2, t1, iters=iters))[0].transpose(1, 2, 0)
    # crop padding back off
    fwd = fwd[pad[0] : fwd.shape[0] - pad[1], pad[2] : fwd.shape[1] - pad[3]]
    bwd = bwd[pad[0] : bwd.shape[0] - pad[1], pad[2] : bwd.shape[1] - pad[3]]
    return fwd, bwd, pad
