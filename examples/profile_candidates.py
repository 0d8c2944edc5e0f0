"""Measure candidate perf rewrites on the real chip BEFORE landing them.

Candidates (from examples/profile_step.py hot spots):
  1. gather backward: current cumsum-over-[P,16] VJP vs transpose+scatter-add.
  2. sugar primitives: current [F,6,3,3]-broadcast math vs component-major SoA.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from gaustar_tpu.utils.profiling import loop_bench

N = 600_000
CAP = 1 << 21  # padded pair capacity (right-sized bench)
MAXP = 1 << 21
F16 = 16
FACES = 100_000
VERTS = 50_452

rng = np.random.default_rng(0)


def main():
    sel = sys.argv[1] if len(sys.argv) > 1 else ""

    def stage(name, fn, *args):
        if sel and sel not in name:
            return
        t = loop_bench(fn, *args, iters=8)
        print(f"{name:44s} {t*1e3:9.2f} ms", flush=True)

    # ---- gather backward candidates ----
    ct = jnp.asarray(rng.standard_normal((F16, CAP)), jnp.float32)
    gauss_idx = jnp.asarray(rng.integers(0, N + 1, CAP), jnp.int32)  # N = padding
    dest = jnp.asarray(rng.permutation(CAP)[:MAXP], jnp.int32)
    pair_offsets = jnp.asarray(
        np.sort(rng.integers(0, MAXP, N + 1)).astype(np.int32)
    )

    def bwd_current(i, ct):
        ct = ct + i * 0.0
        dest_c = jnp.minimum(dest, CAP - 1)
        g_e = jnp.where((dest < CAP)[:, None], ct.T[dest_c], 0.0)
        csum = jnp.cumsum(g_e, axis=0)
        lo = pair_offsets[:-1]
        hi = pair_offsets[1:]
        top = jnp.where((hi > 0)[:, None], csum[jnp.maximum(hi - 1, 0)], 0.0)
        bot = jnp.where((lo > 0)[:, None], csum[jnp.maximum(lo - 1, 0)], 0.0)
        return (top - bot).sum()

    stage("bwd_current (gather+cumsum[P,16])", bwd_current, ct)

    def bwd_scatter_add(i, ct):
        ct = ct + i * 0.0
        idx_c = jnp.minimum(gauss_idx, N - 1)
        w = (gauss_idx < N).astype(jnp.float32)
        d_src = jnp.zeros((N, F16), jnp.float32).at[idx_c].add(
            ct.T * w[:, None], mode="drop"
        )
        return d_src.sum()

    stage("bwd_scatter_add rows [CAP,16]->[N,16]", bwd_scatter_add, ct)

    def bwd_scatter_add_T(i, ct):
        # SoA variant: per-field 1D scatter-adds (no transpose of ct).
        ct = ct + i * 0.0
        idx_c = jnp.minimum(gauss_idx, N - 1)
        w = (gauss_idx < N).astype(jnp.float32)
        outs = [
            jnp.zeros((N,), jnp.float32).at[idx_c].add(ct[f] * w, mode="drop")
            for f in range(F16)
        ]
        return sum(o.sum() for o in outs)

    stage("bwd_scatter_add 16x 1D", bwd_scatter_add_T, ct)

    def bwd_cumsum_soa(i, ct):
        # keep cumsum formulation but in [16, P] layout (lane-major scan).
        ct = ct + i * 0.0
        dest_c = jnp.minimum(dest, CAP - 1)
        g_e = jnp.where((dest < CAP)[None, :], ct[:, dest_c], 0.0)  # [16, P]
        csum = jnp.cumsum(g_e, axis=1)
        lo = pair_offsets[:-1]
        hi = pair_offsets[1:]
        top = jnp.where((hi > 0)[None, :], csum[:, jnp.maximum(hi - 1, 0)], 0.0)
        bot = jnp.where((lo > 0)[None, :], csum[:, jnp.maximum(lo - 1, 0)], 0.0)
        return (top - bot).sum()

    stage("bwd_cumsum SoA [16,P]", bwd_cumsum_soa, ct)

    # ---- transpose cost in isolation ----
    stage("transpose [16,CAP]->[CAP,16]", lambda i, x: (x + i * 0.0).T.sum() * 1.0, ct)

    # ---- sugar primitives candidates ----
    verts = jnp.asarray(rng.standard_normal((VERTS, 3)), jnp.float32)
    faces = jnp.asarray(rng.integers(0, VERTS, (FACES, 3)), jnp.int32)
    bary = jnp.asarray(rng.uniform(0, 1, (6, 3)), jnp.float32)
    scales = jnp.asarray(rng.standard_normal((FACES * 6, 2)) * 0.1 - 5, jnp.float32)
    complex2d = jnp.asarray(rng.standard_normal((FACES * 6, 2)), jnp.float32)

    def prim_current(i, pts):
        pts = pts + i * 0.0
        faces_verts = pts[faces]  # [F, 3, 3]
        centers = (faces_verts[:, None] * bary[None, :, :, None]).sum(axis=2).reshape(-1, 3)
        e1 = faces_verts[:, 1] - faces_verts[:, 0]
        e2 = faces_verts[:, 2] - faces_verts[:, 0]
        r0 = _normalize(jnp.cross(e1, e2))
        b1 = _normalize(faces_verts[:, 0] - faces_verts[:, 1])
        b2 = _normalize(jnp.cross(r0, b1))
        c = _normalize(complex2d).reshape(-1, 6, 2)
        r1 = c[..., 0:1] * b1[:, None] + c[..., 1:2] * b2[:, None]
        r2 = -c[..., 1:2] * b1[:, None] + c[..., 0:1] * b2[:, None]
        r0b = jnp.broadcast_to(r0[:, None], r1.shape)
        R = jnp.stack([r0b, r1, r2], axis=-1).reshape(-1, 3, 3)
        s2 = jnp.concatenate(
            [jnp.full((FACES * 6, 1), 1e-6), jnp.exp(scales)], axis=-1
        ) ** 2
        M = R * s2[:, None, :]
        S = M @ R.transpose(0, 2, 1)
        cov = jnp.stack(
            [S[:, 0, 0], S[:, 0, 1], S[:, 0, 2], S[:, 1, 1], S[:, 1, 2], S[:, 2, 2]],
            axis=-1,
        )
        return centers.sum() + cov.sum()

    stage("prim_current ([F,6,3,3] broadcast)", prim_current, verts)

    def prim_soa(i, pts):
        pts = pts + i * 0.0
        fv = pts[faces.reshape(-1)]  # ONE row gather [3F, 3]
        fv = fv.reshape(FACES, 3, 3)
        # component-major: 9 arrays of [F]
        v = [[fv[:, k, d] for d in range(3)] for k in range(3)]
        # centers[j] = sum_k bary[j,k] * v[k]  -> [6, F] per component
        cen = [
            sum(bary[j, k] * v[k][d] for k in range(3))
            for j in range(6)
            for d in range(3)
        ]  # 18 arrays [F]
        e1 = [v[1][d] - v[0][d] for d in range(3)]
        e2 = [v[2][d] - v[0][d] for d in range(3)]
        r0 = _cross_soa(e1, e2)
        r0 = _norm_soa(r0)
        b1 = _norm_soa([v[0][d] - v[1][d] for d in range(3)])
        b2 = _norm_soa(_cross_soa(r0, b1))
        cn = _norm_soa([complex2d[:, 0], complex2d[:, 1], None], two=True)
        ca = cn[0].reshape(FACES, 6)
        cb = cn[1].reshape(FACES, 6)
        tot = sum(c.sum() for c in cen)
        s2a = jnp.exp(scales[:, 0].reshape(FACES, 6)) ** 2
        s2b = jnp.exp(scales[:, 1].reshape(FACES, 6)) ** 2
        s2n = 1e-12
        # cov columns: U = [r0 | r1 | r2], r1/r2 in-plane rotated by (ca, cb)
        cov_sum = 0.0
        for d in range(3):
            for e in range(d, 3):
                # Sigma_de = s2n r0d r0e + s2a r1d r1e + s2b r2d r2e
                r1d = ca * b1[d][:, None] + cb * b2[d][:, None]
                r1e = ca * b1[e][:, None] + cb * b2[e][:, None]
                r2d = -cb * b1[d][:, None] + ca * b2[d][:, None]
                r2e = -cb * b1[e][:, None] + ca * b2[e][:, None]
                sig = (
                    s2n * (r0[d] * r0[e])[:, None] + s2a * r1d * r1e + s2b * r2d * r2e
                )
                cov_sum = cov_sum + sig.sum()
        return tot + cov_sum

    stage("prim_soa (component-major)", prim_soa, verts)

    def prim_soa_bwd(i, pts):
        l, g = jax.value_and_grad(lambda p: prim_soa(i, p))(pts)
        return l + g.sum()

    def prim_current_bwd(i, pts):
        l, g = jax.value_and_grad(lambda p: prim_current(i, p))(pts)
        return l + g.sum()

    stage("prim_current fwd+bwd", prim_current_bwd, verts)
    stage("prim_soa fwd+bwd", prim_soa_bwd, verts)

    # row gather alone
    stage("row gather [3F,3] <- [V,3]", lambda i, p: (p + i * 0.0)[faces.reshape(-1)].sum(), verts)


def _normalize(x):
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(1e-12)


def _cross_soa(a, b):
    return [
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ]


def _norm_soa(v, two=False):
    if two:
        n = jax.lax.rsqrt((v[0] * v[0] + v[1] * v[1]).clip(1e-24))
        return [v[0] * n, v[1] * n]
    n = jax.lax.rsqrt((v[0] * v[0] + v[1] * v[1] + v[2] * v[2]).clip(1e-24))
    return [x * n for x in v]


if __name__ == "__main__":
    main()
