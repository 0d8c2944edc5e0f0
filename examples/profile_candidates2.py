"""Breakdown of the gather-VJP cost + more candidates (see profile_candidates.py)."""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from gaustar_tpu.utils.profiling import loop_bench

N = 600_000
CAP = 1 << 21
MAXP = 1 << 21
F16 = 16

rng = np.random.default_rng(0)


def main():
    sel = sys.argv[1] if len(sys.argv) > 1 else ""

    def stage(name, fn, *args):
        if sel and sel not in name:
            return
        t = loop_bench(fn, *args, iters=8)
        print(f"{name:44s} {t*1e3:9.2f} ms", flush=True)

    ct = jnp.asarray(rng.standard_normal((F16, CAP)), jnp.float32)
    ct10 = ct[:10]
    gauss_idx = jnp.asarray(rng.integers(0, N + 1, CAP), jnp.int32)
    dest = jnp.asarray(rng.permutation(CAP)[:MAXP], jnp.int32)
    pair_offsets = jnp.asarray(np.sort(rng.integers(0, MAXP, N + 1)).astype(np.int32))

    # pieces of bwd_current
    def piece_rowgather(i, ct):
        ct = ct + i * 0.0
        return ct.T[jnp.minimum(dest, CAP - 1)].sum()

    stage("piece: row gather [MAXP,16]", piece_rowgather, ct)

    g_e = jnp.asarray(rng.standard_normal((MAXP, F16)), jnp.float32)

    def piece_cumsum(i, x):
        return jnp.cumsum(x + i * 0.0, axis=0).sum() * 1e-6

    stage("piece: cumsum [MAXP,16] axis0", piece_cumsum, g_e)

    csum = g_e

    def piece_boundary(i, x):
        x = x + i * 0.0
        hi = pair_offsets[1:]
        lo = pair_offsets[:-1]
        top = jnp.where((hi > 0)[:, None], x[jnp.maximum(hi - 1, 0)], 0.0)
        bot = jnp.where((lo > 0)[:, None], x[jnp.maximum(lo - 1, 0)], 0.0)
        return (top - bot).sum()

    stage("piece: 2x boundary row gather [N,16]", piece_boundary, csum)

    # sort-based reorder: key=gauss_idx carrying payload columns, then cumsum.
    def sort_payload(i, ct, k):
        ct = ct + i * 0.0
        ops = (gauss_idx,) + tuple(ct[f] for f in range(k))
        out = jax.lax.sort(ops, num_keys=1, is_stable=False)
        return sum(o.sum() for o in out[1:])

    stage("sort 2M key+10 f32 payloads", lambda i, c: sort_payload(i, c, 10), ct10)
    stage("sort 2M key+16 f32 payloads", lambda i, c: sort_payload(i, c, 16), ct)

    # narrower current bwd: 10 fields instead of 16
    def bwd_current_k(i, ct):
        ct = ct + i * 0.0
        dest_c = jnp.minimum(dest, CAP - 1)
        g_e = jnp.where((dest < CAP)[:, None], ct.T[dest_c], 0.0)
        csum = jnp.cumsum(g_e, axis=0)
        lo = pair_offsets[:-1]
        hi = pair_offsets[1:]
        top = jnp.where((hi > 0)[:, None], csum[jnp.maximum(hi - 1, 0)], 0.0)
        bot = jnp.where((lo > 0)[:, None], csum[jnp.maximum(lo - 1, 0)], 0.0)
        return (top - bot).sum()

    stage("bwd_current 10 fields", bwd_current_k, ct10)

    # two-level blocked segment-sum: block partial sums then small fix-up.
    # d_src[n] = csum[hi-1] - csum[lo-1]; compute csum hierarchically:
    # cumsum within 512-blocks + cumsum of block totals (avoids the 21-pass scan).
    def bwd_blocked(i, ct):
        ct = ct + i * 0.0
        dest_c = jnp.minimum(dest, CAP - 1)
        g_e = jnp.where((dest < CAP)[:, None], ct.T[dest_c], 0.0)  # [MAXP,16]
        B = 512
        nb = MAXP // B
        blk = g_e.reshape(nb, B, F16)
        blk_c = jnp.cumsum(blk, axis=1)  # short scan
        tot = blk_c[:, -1, :]
        tot_c = jnp.cumsum(tot, axis=0)  # [nb,16] scan
        base = jnp.concatenate([jnp.zeros((1, F16)), tot_c[:-1]], axis=0)
        csum = (blk_c + base[:, None, :]).reshape(MAXP, F16)
        lo = pair_offsets[:-1]
        hi = pair_offsets[1:]
        top = jnp.where((hi > 0)[:, None], csum[jnp.maximum(hi - 1, 0)], 0.0)
        bot = jnp.where((lo > 0)[:, None], csum[jnp.maximum(lo - 1, 0)], 0.0)
        return (top - bot).sum()

    stage("bwd blocked-cumsum 16", bwd_blocked, ct)


if __name__ == "__main__":
    main()
