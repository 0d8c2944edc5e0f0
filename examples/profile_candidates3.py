"""Round-3 step-trace candidates: binning forward-fills, SH layout, gauss_idx.

The xplane trace of the 163 ms step (ROOFLINE.md) attributes ~21 ms to the four
[max_pairs] forward-fills in bin_gaussians, ~7 ms to the gauss_idx scatter, and
~12.7 ms f+b to SH eval. Candidates measured here on the real chip:

  fill4-cur    four scalar [MAXP] scatter-max seeds + four cummax (current)
  fill4-col    ONE [4, MAXP] columnar scatter-max (fields on the SUBLANE axis,
               lanes stay the pair axis — unlike the r3 negative result that
               put 4 on the LANE axis) + ONE cummax(axis=1)
  sh-cur       sh_to_rgb (transpose [N,K,C]->[K,C,N] inside, f+b)
  sh-pre       eval_sh_soa on a PRE-transposed [K,C,N] basis (f+b) — isolates
               the per-step transpose cost; if dominant, the fix is storing SH
               component-major in SuGaRParams.

Run on the real chip: python examples/profile_candidates3.py [filter]
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from gaustar_tpu.utils.profiling import loop_bench

N = 600_000
MAXP = 1_536_000
K, C = 9, 3  # sh deg 2

rng = np.random.default_rng(0)


def main():
    sel = sys.argv[1] if len(sys.argv) > 1 else ""

    def stage(name, fn, *args):
        if sel and sel not in name:
            return
        t = loop_bench(fn, *args, iters=8)
        print(f"{name:44s} {t*1e3:9.2f} ms", flush=True)

    # --- binning forward-fills -------------------------------------------
    touched = rng.integers(0, 4, N).astype(np.int32)
    offsets = (np.cumsum(touched) - touched).astype(np.int32)
    offsets = jnp.asarray(np.minimum(offsets, MAXP - 1))
    rank = jnp.arange(N, dtype=jnp.int32)
    rect_code = jnp.asarray(rng.integers(0, 1 << 30, N), jnp.int32)

    vals4 = jnp.stack(
        [
            offsets,
            (rank << 10) | (rect_code & 0x3FF),
            (rank << 10) | ((rect_code >> 10) & 0x3FF),
            (rank << 10) | (rect_code >> 20),
        ]
    )  # [4, N]

    def fill4_cur(i, vals4):
        vals4 = vals4 + i * 0
        acc = jnp.int32(0)
        for r in range(4):
            seed = jnp.zeros((MAXP,), jnp.int32).at[offsets].max(vals4[r], mode="drop")
            acc = acc + jax.lax.cummax(seed)[-1]
        return acc.astype(jnp.float32) * 1e-9

    stage("fill4-cur  4x(scatter+cummax) [MAXP]", fill4_cur, vals4)

    def fill4_col(i, vals4):
        vals4 = vals4 + i * 0
        seed = jnp.zeros((4, MAXP), jnp.int32).at[:, offsets].max(vals4, mode="drop")
        filled = jax.lax.cummax(seed, axis=1)
        return filled[:, -1].sum().astype(jnp.float32) * 1e-9

    stage("fill4-col  1x(scatter+cummax) [4,MAXP]", fill4_col, vals4)

    def fill1(i, vals4):
        vals4 = vals4 + i * 0
        seed = jnp.zeros((MAXP,), jnp.int32).at[offsets].max(vals4[0], mode="drop")
        return jax.lax.cummax(seed)[-1].astype(jnp.float32) * 1e-9

    stage("fill1      1x(scatter+cummax) [MAXP]", fill1, vals4)

    def scatter_only(i, vals4):
        vals4 = vals4 + i * 0
        seed = jnp.zeros((MAXP,), jnp.int32).at[offsets].max(vals4[0], mode="drop")
        return seed[-1].astype(jnp.float32)

    stage("piece      scatter-max only [MAXP]", scatter_only, vals4)

    def cummax_only(i, vals4):
        x = vals4[0] + i * 0
        big = jnp.zeros((MAXP,), jnp.int32).at[: x.shape[0]].set(x)
        return jax.lax.cummax(big)[-1].astype(jnp.float32) * 1e-9

    stage("piece      cummax only [MAXP]", cummax_only, vals4)

    # --- gauss_idx placement scatter -------------------------------------
    gi_s = jnp.asarray(rng.integers(0, N, MAXP), jnp.int32)
    dest = jnp.asarray(np.sort(rng.permutation(MAXP + 60_000)[:MAXP]).astype(np.int32))
    cap = MAXP + 64_000

    def gidx_scatter(i, gi_s):
        gi_s = gi_s + i * 0
        out = jnp.full((cap,), N, jnp.int32).at[dest].set(gi_s, mode="drop")
        return out[-1].astype(jnp.float32)

    stage("gauss_idx  monotone scatter [MAXP->cap]", gidx_scatter, gi_s)

    # --- SH eval layout ---------------------------------------------------
    from gaustar_tpu.ops import sh as _sh

    shp = jnp.asarray(rng.standard_normal((N, K, C)) * 0.1, jnp.float32)
    sh_t = jnp.asarray(np.transpose(np.asarray(shp), (1, 2, 0)))
    pos = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)
    campos = jnp.zeros((3,), jnp.float32)

    def sh_cur(i, shp):
        val, grad = jax.value_and_grad(
            lambda s: _sh.sh_to_rgb(2, s + i * 0.0, pos, campos).sum()
        )(shp)
        return val + grad.sum()

    stage("sh-cur     sh_to_rgb [N,K,C] f+b", sh_cur, shp)

    def sh_pre(i, sh_t):
        d = pos - campos
        inv = 1.0 / jnp.sqrt(jnp.maximum((d * d).sum(-1), 1e-24))
        x, y, z = d[:, 0] * inv, d[:, 1] * inv, d[:, 2] * inv

        def f(s):
            return jnp.maximum(_sh.eval_sh_soa(2, s + i * 0.0, x, y, z) + 0.5, 0.0).sum()

        val, grad = jax.value_and_grad(f)(sh_t)
        return val + grad.sum()

    stage("sh-pre     eval_soa pre-T [K,C,N] f+b", sh_pre, sh_t)

    def transpose_only(i, shp):
        val, grad = jax.value_and_grad(
            lambda s: (s + i * 0.0).transpose(1, 2, 0).sum() * 1e-6
        )(shp)
        return val + grad.sum() * 1e-9

    stage("piece      transpose [N,K,C]->[K,C,N] f+b", transpose_only, shp)


if __name__ == "__main__":
    main()
