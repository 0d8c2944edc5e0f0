"""Pallas TPU blend kernels — the hot path of the rasterizer.

TPU re-architecture of renderCUDA forward (cuda_rasterizer/forward.cu:261-374) and
backward (backward.cu:400-557). Key design mapping:

  CUDA                                  TPU (this file)
  ----------------------------------    ------------------------------------------
  one 16x16 thread block per tile       one grid step per tile (sequential grid,
                                        DMA-pipelined by Mosaic)
  shared-memory batch of 256 pairs      VMEM chunk of `chunk` pairs DMA'd from the
                                        G-aligned segment produced by binning.py
  per-pixel sequential blend loop       closed-form chunk blend on the VPU:
                                        [PIX=256 pixels (sublanes), chunk pairs
                                        (lanes)] alphas; transmittance via a
                                        Hillis-Steele cumulative product along the
                                        pair (lane) axis (log2(chunk) roll+mul
                                        steps); sticky 1e-4 early-stop via a
                                        cumulative max of stop flags
  __syncthreads_count(done) early out   `while_loop` over chunks, exits when every
                                        pixel's transmittance is done
  atomicAdd per-gaussian gradients      per-PAIR gradients (each sorted pair slot is
                                        unique -> no atomics); the jnp gather that
                                        built pair_data scatter-adds them back to
                                        gaussians deterministically in its VJP
  back-to-front re-walk with T/(1-a)    reverse chunk loop; in-chunk suffix
                                        products/sums give T_i and the accumulated
                                        color behind each pair in closed form

The backward walks only `ceil(max n_contrib / chunk)` chunks per tile (the CUDA
backward's `contributor >= last_contributor` skip, lifted to whole chunks).

Memory layout: pair data is SoA [NFIELDS, cap] so HBM DMA slices are [16, chunk]
with the sliced (lane) dimension 128-aligned — Mosaic's HBM tiling constraint.
Fields (see binning.gather_pair_data):
  0 x, 1 y, 2 A, 3 B, 4 C, 5 opacity, 6..8 rgb features, 9..15 zero.
`chunk` must be a multiple of 128 for compiled TPU execution (any multiple of 8
works in interpret mode, which the CPU tests use).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaustar_tpu.ops.projection import TILE

PIX = TILE * TILE  # 256 pixels per tile = 2 x 128 lanes
NFIELDS = 16


def _roll(x, shift, axis):
    try:
        return pltpu.roll(x, shift, axis)
    except Exception:
        return jnp.roll(x, shift, axis)


def _scan_mul_incl(x):
    """Inclusive cumulative product along axis 1 (Hillis-Steele, log2 n steps)."""
    n = x.shape[1]
    idx = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    k = 1
    while k < n:
        x = x * jnp.where(idx >= k, _roll(x, k, 1), 1.0)
        k <<= 1
    return x


def _pixel_coords(t, grid_x):
    """Tile pixel coordinate COLUMNS [PIX, 1] (row-major within the tile)."""
    flat = lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    tx = t % grid_x
    ty = t // grid_x
    px = (tx * TILE + flat % TILE).astype(jnp.float32)
    py = (ty * TILE + flat // TILE).astype(jnp.float32)
    return px, py


def _chunk_alphas(d, px, py):
    """Per-(pixel, pair) raw alphas and masks for one chunk (forward.cu:328-345).

    d: [NFIELDS, chunk]; px/py: [PIX, 1]. Returns [PIX, chunk] arrays.
    """
    x, y = d[0:1, :], d[1:2, :]
    A, B, C = d[2:3, :], d[3:4, :], d[4:5, :]
    op = d[5:6, :]
    dx = x - px
    dy = y - py
    power = -0.5 * (A * dx * dx + C * dy * dy) - B * dx * dy
    g_exp = jnp.exp(power)
    araw = jnp.minimum(0.99, op * g_exp)
    contrib = (power <= 0.0) & (araw >= 1.0 / 255.0)
    a0 = jnp.where(contrib, araw, 0.0)
    return a0, contrib, g_exp, dx, dy


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


# Output/state column layout: cols 0-2 rgb, 3 T, 4 n_contrib, 5 done flag,
# 6 channel-3 accumulator (fused depth), 7 zero. _state_col maps blend channel
# -> state column.
def _state_col(ch: int) -> int:
    return ch if ch < 3 else 6


def _fwd_kernel(
    start_ref, nchunks_ref, base_ref, ids_ref, pair_hbm, out_ref, buf, state, sem, *,
    grid_x, width, height, chunk, channels
):
    t = pl.program_id(0)
    start = start_ref[t]
    nch = nchunks_ref[t]
    # Global tile id: ids_ref maps the grid step to its tile (identity for the
    # dense grid; the ACTIVE-tile list under compaction; the strip offset rides
    # base_ref for the gaussian-sharded path).
    tg = ids_ref[t] + base_ref[0]

    # Empty tiles (most of a typical grid) get a constant background block:
    # color 0, T = 1, n_contrib 0 — no state init, no transpose.
    @pl.when(nch == 0)
    def _empty():
        row = lax.broadcasted_iota(jnp.int32, (8, PIX), 0)
        out_ref[0] = jnp.where(row == 3, 1.0, 0.0)

    @pl.when(nch > 0)
    def _nonempty():
        _fwd_tile(tg, start, nch, pair_hbm, out_ref, buf, state, sem,
                  grid_x=grid_x, width=width, height=height, chunk=chunk,
                  channels=channels)


def _fwd_tile(t, start, nch, pair_hbm, out_ref, buf, state, sem, *,
              grid_x, width, height, chunk, channels):
    px, py = _pixel_coords(t, grid_x)
    outside = (px >= width) | (py >= height)

    # Per-pixel state lives in a VMEM scratch buffer (not loop carries) so every
    # iteration sees canonical vector layouts (see _state_col).
    state[:, 0:3] = jnp.zeros((PIX, 3), jnp.float32)
    state[:, 3:4] = jnp.ones((PIX, 1), jnp.float32)
    state[:, 4:5] = jnp.zeros((PIX, 1), jnp.float32)
    state[:, 5:6] = outside.astype(jnp.float32)
    state[:, 6:8] = jnp.zeros((PIX, 2), jnp.float32)

    # Double-buffered chunk reads: the DMA for chunk i+1 is issued before chunk
    # i's compute, hiding HBM latency. The early-exit path can leave ONE
    # outstanding prefetch (for chunk i_final), drained after the loop.
    def read_dma(i, slot):
        off = pl.multiple_of(start + i * chunk, chunk)
        return pltpu.make_async_copy(
            pair_hbm.at[:, pl.ds(off, chunk)], buf.at[slot], sem.at[slot]
        )

    read_dma(0, 0).start()

    def cond(c):
        i, alldone = c
        return (i < nch) & jnp.logical_not(alldone)

    def body(c):
        i, _ = c
        slot = lax.rem(i, 2)

        @pl.when(i + 1 < nch)
        def _prefetch():
            read_dma(i + 1, 1 - slot).start()

        read_dma(i, slot).wait()
        d = buf[slot, :, :]
        T = state[:, 3:4]
        done = state[:, 5:6] > 0.0
        a0, contrib, _, _, _ = _chunk_alphas(d, px, py)
        notdone = jnp.logical_not(done)

        # ONE cumulative scan per chunk (was three, then two): E = prefix prod
        # of (1-a0). t_incl = T*E is NON-INCREASING along the chunk (each factor
        # <= 1), so the sticky-stop set needs no cummax scan: every pair at or
        # after the first crossing already has t_incl < 1e-4, hence
        # included = contrib & (t_incl >= 1e-4) — identical to walking the
        # CUDA loop's break (forward.cu:335-351, crossing pair excluded). The
        # held T is t_incl/om0 at the FIRST flag = the max over flagged
        # positions (t_before is non-increasing too). t_before = T*E/om0 is
        # valid wherever a0 > 0 since om0 >= 0.01 there.
        om0 = 1.0 - a0
        E = _scan_mul_incl(om0)
        t_incl = T * E  # T after i assuming all contribute
        flag = contrib & (t_incl < 1e-4) & notdone
        included = contrib & (t_incl >= 1e-4) & notdone
        t_before = T * E / om0
        w = jnp.where(included, a0 * t_before, 0.0)  # [PIX, chunk]
        # Channel accumulation as ONE MXU contraction (sums[p, ch] =
        # sum_j w[p, j] * feat[ch, j]) instead of `channels` cross-lane
        # reductions — the MXU is otherwise idle in this kernel and lane-axis
        # reductions are the VPU's most expensive shape (ROOFLINE.md).
        feats = d[6 : 6 + channels, :]  # [C, chunk]
        sums = lax.dot_general(
            w, feats, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [PIX, C]
        state[:, 0 : min(channels, 3)] += sums[:, 0 : min(channels, 3)]
        if channels == 4:
            state[:, 6:7] += sums[:, 3:4]
        pos = (i * chunk + 1 + lax.broadcasted_iota(jnp.int32, a0.shape, 1)).astype(jnp.float32)
        state[:, 4:5] = jnp.maximum(
            state[:, 4:5], jnp.max(jnp.where(included, pos, 0.0), axis=1, keepdims=True)
        )
        # t_held > 0 <=> any pair flagged: the first flagged position has
        # t_incl/om0 = t_before >= 1e-4 * 0.01 (one factor past the crossing,
        # om0 >= 0.01 where contrib) — far above f32 underflow. Later flagged
        # positions may underflow to 0 but only feed the max. Saves the
        # separate any-flag lane reduction.
        t_held = jnp.max(jnp.where(flag, t_incl / om0, 0.0), axis=1, keepdims=True)
        any_flag = t_held > 0.0
        t_all = T * E[:, chunk - 1 : chunk]
        t_new = jnp.where(any_flag, t_held, t_all)
        state[:, 3:4] = jnp.where(done, T, t_new)
        done_new = jnp.maximum(state[:, 5:6], any_flag.astype(jnp.float32))
        state[:, 5:6] = done_new
        return (i + 1, jnp.all(done_new > 0.0))

    i_final, _ = lax.while_loop(cond, body, (jnp.int32(0), jnp.all(outside)))

    # Early exit (or the all-outside degenerate) leaves the prefetch for chunk
    # i_final un-waited; drain it before the next grid step reuses the buffers.
    @pl.when(i_final < nch)
    def _drain():
        read_dma(i_final, lax.rem(i_final, 2)).wait()

    out_ref[0] = state[:, :].T  # [8, PIX]


def _blend_fwd_raw(
    pair_data, tile_start, tile_nchunks, grid_x, grid_y, width, height, chunk,
    channels, interpret, tile_base=None, tile_ids=None
):
    # n_tiles = this call's STRIP length (the full grid unless tile_base is
    # given; the gaussian-axis sharded path blends ceil(T/D) tiles per device)
    # or the ACTIVE-tile capacity under compaction (tile_ids given).
    n_tiles = tile_start.shape[0]
    if tile_base is None:
        tile_base = jnp.zeros((1,), jnp.int32)
    if tile_ids is None:
        tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    kernel = functools.partial(
        _fwd_kernel, grid_x=grid_x, width=width, height=height, chunk=chunk,
        channels=channels,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, 8, PIX), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, NFIELDS, chunk), jnp.float32),
                pltpu.VMEM((PIX, 8), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 8, PIX), jnp.float32),
        interpret=interpret,
    )(tile_start, tile_nchunks, tile_base.reshape(1).astype(jnp.int32),
      tile_ids.astype(jnp.int32), pair_data)
    return out


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _bwd_kernel(
    start_ref,
    used_ref,
    base_ref,
    ids_ref,
    pair_hbm,
    fwd_ref,
    dout_ref,
    grads_hbm,
    buf,
    gbuf,
    acc,
    sem_in,
    sem_out,
    *,
    grid_x,
    chunk,
    channels,
):
    t = pl.program_id(0)
    start = start_ref[t]
    used = used_ref[t]
    tg = ids_ref[t] + base_ref[0]  # global tile id (strips/compaction: see fwd)

    # Most tiles of a typical capture have no contributors (empty background or
    # padding) — skip ALL work for them, including the input transposes. Their
    # grad slots are zeroed by the jnp wrapper's `written` mask.
    @pl.when(used > 0)
    def _tile_body():
        _bwd_tile(
            tg, start, used, pair_hbm, fwd_ref, dout_ref, grads_hbm, buf, gbuf, acc,
            sem_in, sem_out, grid_x=grid_x, chunk=chunk, channels=channels,
        )


def _bwd_tile(
    t, start, used, pair_hbm, fwd_ref, dout_ref, grads_hbm, buf, gbuf, acc,
    sem_in, sem_out, *, grid_x, chunk, channels
):
    px, py = _pixel_coords(t, grid_x)

    fstate = fwd_ref[0].T  # [PIX, 8]
    dstate = dout_ref[0].T  # [PIX, 8]
    t_final = fstate[:, 3:4]
    n_c = fstate[:, 4:5]
    dT = dstate[:, 3:4]

    # Channel collapse: dL/da_i sums (c_ch,i * t_i - s_gt_ch,i / om_i) * dC_ch
    # over channels, but dC is constant per PIXEL across the chunk walk — so
    # contracting features with dC first (u_i = sum_ch c_ch,i * dC_ch) turns
    # the C per-channel suffix sums into ONE suffix sum of w*u. backward.cu
    # pays the same C-fold cost per thread (accum_rec per channel); the
    # contraction is the closed-form equivalent.
    dC_pix = jnp.concatenate(
        [dstate[:, _state_col(ch) : _state_col(ch) + 1] for ch in range(channels)],
        axis=1,
    )  # [PIX, C]

    # MXU offloads, hoisted per tile (the MXU is idle in this kernel and
    # lane-axis reductions/scans are the VPU's most expensive shapes):
    #   sfx   — suffix-sum matrix: s_ge = wu @ sfx, sfx[j, i] = (j >= i);
    #   Bmat  — pixel-polynomial basis {1, px, py, px^2, px*py, py^2} in
    #           TILE-CENTERED coordinates. Every per-pair gradient reduction
    #           is a polynomial moment of q = g_exp * dL/da against this basis
    #           because dx = x - px is separable:
    #             sum_p q*dx   = xc*S1 - Sx
    #             sum_p q*dx^2 = xc^2*S1 - 2*xc*Sx + Sxx   (etc.)
    #           so ONE [6, PIX] @ [PIX, chunk] matmul replaces ten sublane
    #           reductions + their [PIX, chunk] summand builds. Recentering
    #           bounds |xc| by (radius + TILE), keeping the f32 expansion's
    #           cancellation error ~1e-6 relative (vs ~1e-3 uncentered at
    #           x ~ 1600 px).
    iota_j = lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    iota_i = lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    sfx = (iota_j >= iota_i).astype(jnp.float32)
    cx0 = ((t % grid_x) * TILE + TILE // 2).astype(jnp.float32)
    cy0 = ((t // grid_x) * TILE + TILE // 2).astype(jnp.float32)
    pxc = px - cx0  # [PIX, 1]
    pyc = py - cy0
    Bmat = jnp.concatenate(
        [jnp.ones_like(pxc), pxc, pyc, pxc * pxc, pxc * pyc, pyc * pyc], axis=1
    ).T  # [6, PIX]

    # Reverse-walk accumulators in VMEM scratch (canonical layouts across the
    # loop): col 0 = P_after (product of (1-a) behind the cursor), col 1 =
    # S_after_u (dC-contracted weighted features behind the cursor).
    acc[:, 0:1] = jnp.ones((PIX, 1), jnp.float32)
    acc[:, 1:2] = jnp.zeros((PIX, 1), jnp.float32)

    # Double-buffered chunk reads (walk is back-to-front: chunk used-1-j) and
    # deferred grad writes: the write for iteration j is waited at j+2 (before
    # its gbuf slot is reused) and drained after the loop — DMA latency hides
    # behind the chunk compute. The reverse walk has no early exit, so the
    # start/wait counts are statically balanced.
    def read_dma(j, slot):
        off = pl.multiple_of(start + (used - 1 - j) * chunk, chunk)
        return pltpu.make_async_copy(
            pair_hbm.at[:, pl.ds(off, chunk)], buf.at[slot], sem_in.at[slot]
        )

    def write_dma(j, slot):
        off = pl.multiple_of(start + (used - 1 - j) * chunk, chunk)
        return pltpu.make_async_copy(
            gbuf.at[slot], grads_hbm.at[:, pl.ds(off, chunk)], sem_out.at[slot]
        )

    read_dma(0, 0).start()

    def body(j, _):
        i = used - 1 - j
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < used)
        def _prefetch():
            read_dma(j + 1, 1 - slot).start()

        read_dma(j, slot).wait()
        d = buf[slot, :, :]
        p_after = acc[:, 0:1]
        a0, contrib, g_exp, _dx, _dy = _chunk_alphas(d, px, py)
        pos = (i * chunk + 1 + lax.broadcasted_iota(jnp.int32, a0.shape, 1)).astype(jnp.float32)
        included = contrib & (pos <= n_c)  # CUDA: contributor >= last_contributor -> skip
        a = jnp.where(included, a0, 0.0)
        om = 1.0 - a

        # Suffix product in LOG space on the MXU (reusing sfx): sp feeds only
        # gradient VALUES — the backward's inclusion mask is pos <= n_c (saved
        # by the forward), so the ~1e-6-relative log/exp reassociation cannot
        # flip any discrete decision (unlike the forward's E, which must stay
        # a real product scan for exact n_contrib). Range-safe: sp * p_after =
        # t_final / t_i is bounded to [t_final, 1]; om >= 0.01 where a > 0 and
        # exactly 1 (log = 0) where excluded.
        sp = jnp.exp(
            lax.dot_general(
                jnp.log(om), sfx, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
        t_i = t_final / (sp * p_after)  # transmittance before pair i
        w = a * t_i

        # u = sum_ch c_ch * dC_ch per (pixel, pair) — one [PIX, C] @ [C, chunk]
        # MXU contraction; one suffix sum then serves every channel (see the
        # channel-collapse note above), itself an MXU matmul against sfx whose
        # i=0 column doubles as the full-chunk sum for the acc carry.
        u = lax.dot_general(
            dC_pix, d[6 : 6 + channels, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        wu = w * u
        s_ge = lax.dot_general(
            wu, sfx, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        s_gt_u = s_ge - wu + acc[:, 1:2]
        dL_da = -(t_final / om) * dT + (u * t_i - s_gt_u / om)
        acc[:, 1:2] += s_ge[:, 0:1]
        dL_da = jnp.where(included, dL_da, 0.0)

        # Per-pair gradients as polynomial moments (see the Bmat note above):
        # q = g_exp * dL/da; S* = [6, chunk] basis moments; dx = xc - pxc.
        q = g_exp * dL_da
        S = lax.dot_general(
            Bmat, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # rows: S1, Sx, Sy, Sxx, Sxy, Syy
        S1, Sx, Sy = S[0:1, :], S[1:2, :], S[2:3, :]
        Sxx, Sxy, Syy = S[3:4, :], S[4:5, :], S[5:6, :]
        xc = d[0:1, :] - cx0
        yc = d[1:2, :] - cy0
        m_x = xc * S1 - Sx
        m_y = yc * S1 - Sy
        m_xx = xc * xc * S1 - 2.0 * xc * Sx + Sxx
        m_xy = xc * yc * S1 - xc * Sy - yc * Sx + Sxy
        m_yy = yc * yc * S1 - 2.0 * yc * Sy + Syy
        A, B, C_ = d[2:3, :], d[3:4, :], d[4:5, :]
        op = d[5:6, :]  # d alpha / d G ignores the 0.99 clamp, like backward.cu:503
        g_x = -op * (A * m_x + B * m_y)
        g_y = -op * (C_ * m_y + B * m_x)
        g_A = -0.5 * op * m_xx
        g_B = -op * m_xy
        g_C = -0.5 * op * m_yy
        g_op = S1
        # g_rgb[ch] = sum_p w * dC_ch — one more PIX-contraction on the MXU.
        g_feat = lax.dot_general(
            dC_pix, w, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [C, chunk]

        # Wait the write issued two iterations ago before reusing its slot.
        @pl.when(j >= 2)
        def _wait_prev_write():
            write_dma(j - 2, slot).wait()

        zeros = jnp.zeros((1, chunk), jnp.float32)
        gbuf[slot, :, :] = jnp.concatenate(
            [g_x, g_y, g_A, g_B, g_C, g_op, g_feat]
            + [zeros] * (NFIELDS - 6 - channels),
            axis=0,
        )
        write_dma(j, slot).start()

        acc[:, 0:1] = p_after * sp[:, 0:1]  # full-chunk product
        return 0

    lax.fori_loop(0, used, body, 0)

    # Drain outstanding writes (last one or two iterations).
    @pl.when(used >= 2)
    def _drain2():
        write_dma(used - 2, jax.lax.rem(used - 2, 2)).wait()

    write_dma(used - 1, jax.lax.rem(used - 1, 2)).wait()


def _blend_bwd_raw(
    pair_data, tile_start, tile_used, fwd_out, dout, grid_x, grid_y, chunk,
    channels, interpret, tile_base=None, tile_ids=None
):
    n_tiles = tile_start.shape[0]
    cap = pair_data.shape[1]
    if tile_base is None:
        tile_base = jnp.zeros((1,), jnp.int32)
    if tile_ids is None:
        tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    kernel = functools.partial(_bwd_kernel, grid_x=grid_x, chunk=chunk, channels=channels)
    grads = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, 8, PIX), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, PIX), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, NFIELDS, chunk), jnp.float32),
                pltpu.VMEM((2, NFIELDS, chunk), jnp.float32),
                pltpu.VMEM((PIX, 8), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((NFIELDS, cap), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_start, tile_used, tile_base.reshape(1).astype(jnp.int32),
      tile_ids.astype(jnp.int32), pair_data, fwd_out, dout)
    return grads


# ---------------------------------------------------------------------------
# custom VJP wrapper
# ---------------------------------------------------------------------------


def _auto_interpret(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def blend_tiles_pallas_raw(
    pair_data,
    tile_start,
    tile_nchunks,
    tile_base,
    tile_ids,
    grid_x: int,
    grid_y: int,
    width: int,
    height: int,
    chunk: int = 256,
    channels: int = 3,
    interpret: bool | None = None,
):
    """Blend binned pairs (pair_data [NFIELDS, cap]). Returns the RAW kernel
    state [T, 8, PIX]: cols 0-2 rgb, 3 final_T, 4 n_contrib (as f32), 5 done,
    6 fused channel 3, 7 zero (see _state_col). Differentiable in pair_data
    only — the custom VJP passes the raw cotangent straight to the backward
    kernel (it reads only cols 0-3 and 6), so callers may slice/assemble the
    raw block in ONE relayout instead of one per map (ROOFLINE: the 3-map
    assemble + [T,C,P] transpose cost ~15 ms f+b of the 163 ms step).

    `tile_base` ([1] i32, traced) offsets tile ids for pixel-coordinate
    purposes: the gaussian-axis sharded path blends a STRIP of ceil(T/D) tiles
    per device (tile_start/tile_nchunks are the strip's slices; segment offsets
    still index the full pair_data). `tile_ids` ([n] i32, traced, or None =
    arange) maps grid steps to tile ids — the ACTIVE-tile compaction passes the
    non-empty tiles' ids (binning.compact_active_tiles)."""
    return _blend_fwd_raw(
        pair_data,
        tile_start.astype(jnp.int32),
        tile_nchunks.astype(jnp.int32),
        grid_x,
        grid_y,
        width,
        height,
        chunk,
        channels,
        _auto_interpret(interpret),
        tile_base=tile_base,
        tile_ids=tile_ids,
    )


def _raw_fwd_rule(pair_data, tile_start, tile_nchunks, tile_base, tile_ids, grid_x, grid_y, width, height, chunk, channels, interpret):
    raw = blend_tiles_pallas_raw(
        pair_data, tile_start, tile_nchunks, tile_base, tile_ids, grid_x, grid_y, width, height, chunk, channels, interpret
    )
    return raw, (pair_data, tile_start, tile_nchunks, tile_base, tile_ids, raw)


def _raw_bwd_rule(grid_x, grid_y, width, height, chunk, channels, interpret, res, ct):
    pair_data, tile_start, tile_nchunks, tile_base, tile_ids, raw = res
    # The backward kernel reads only dstate cols 0-3 and 6 (dC_cols + dT); the
    # raw cotangent already has that exact layout. Cols 4/5/7 (n_contrib, done,
    # zero) are integral bookkeeping — their cotangents are structurally zero.
    max_nc = jnp.max(raw[:, 4, :], axis=1)
    tile_used = jnp.minimum(
        jnp.ceil(max_nc / chunk).astype(jnp.int32), tile_nchunks.astype(jnp.int32)
    )
    grads = _blend_bwd_raw(
        pair_data,
        tile_start.astype(jnp.int32),
        tile_used,
        raw,
        ct,
        grid_x,
        grid_y,
        chunk,
        channels,
        _auto_interpret(interpret),
        tile_base=tile_base,
        tile_ids=tile_ids,
    )
    # Zero the slots the kernel never wrote (tiles' unused chunks + padding).
    # Written slots form disjoint intervals [start_t, start_t + used_t*chunk) in
    # segment order -> O(T) difference-array scatter + one cumsum, instead of a
    # [cap]-sized searchsorted (which costs tens of ms at multi-million caps).
    cap = pair_data.shape[1]
    delta = jnp.zeros((cap + 1,), jnp.int32)
    starts = tile_start.astype(jnp.int32)
    ends = starts + tile_used * chunk
    delta = delta.at[jnp.minimum(starts, cap)].add(1, mode="drop")
    delta = delta.at[jnp.minimum(ends, cap)].add(-1, mode="drop")
    written = jnp.cumsum(delta[:-1]) > 0
    grads = jnp.where(written[None, :], grads, 0.0)
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return grads, f0(tile_start), f0(tile_nchunks), f0(tile_base), f0(tile_ids)


blend_tiles_pallas_raw.defvjp(_raw_fwd_rule, _raw_bwd_rule)


def blend_tiles_pallas_base(
    pair_data,
    tile_start,
    tile_nchunks,
    tile_base,
    grid_x: int,
    grid_y: int,
    width: int,
    height: int,
    chunk: int = 256,
    channels: int = 3,
    interpret: bool | None = None,
    tile_ids=None,
):
    """Blend binned pairs (pair_data [NFIELDS, cap]). Returns (color [T, C, PIX],
    final_T [T, PIX], n_contrib [T, PIX] int32), T = len(tile_start).
    Differentiable in pair_data only. Sliced view of blend_tiles_pallas_raw —
    hot callers (ops/rasterizer.py) consume the raw block directly.

    channels=3 is the reference layout (config.h:15); channels=4 fuses a second
    feature (view-space depth) into the same pass — the training step's RGB and
    depth renders share identical blend weights, so one pass is exact."""
    assert channels in (3, 4), "pallas blend supports 3 (reference) or 4 (fused depth) channels"
    if tile_ids is None:
        tile_ids = jnp.arange(tile_start.shape[0], dtype=jnp.int32)
    raw = blend_tiles_pallas_raw(
        pair_data, tile_start, tile_nchunks, tile_base, tile_ids, grid_x, grid_y, width, height, chunk, channels, interpret
    )
    if channels == 3:
        color = raw[:, 0:3, :]
    else:
        color = jnp.concatenate([raw[:, 0:3, :], raw[:, 6:7, :]], axis=1)
    final_t = raw[:, 3, :]
    ncontrib = raw[:, 4, :].astype(jnp.int32)
    return color, final_t, ncontrib


def blend_tiles_pallas(
    pair_data,
    tile_start,
    tile_nchunks,
    grid_x: int,
    grid_y: int,
    width: int,
    height: int,
    chunk: int = 256,
    channels: int = 3,
    interpret: bool | None = None,
):
    """Full-grid blend (tile_base = 0); see blend_tiles_pallas_base."""
    return blend_tiles_pallas_base(
        pair_data, tile_start, tile_nchunks, jnp.zeros((1,), jnp.int32),
        grid_x, grid_y, width, height, chunk, channels, interpret,
    )


