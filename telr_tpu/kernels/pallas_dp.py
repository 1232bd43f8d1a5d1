"""Pallas TPU kernel for the banded affine-gap DP.

The XLA lax.scan formulation (dp.py) is numerically exact but lowers to a
sequential per-row loop with per-step overhead — measured ~0.1 Gcells/s on a
v5e, no better than CPU.  This kernel runs the whole row loop inside one
program with the DP carries (H, I band vectors) living in VMEM scratch, so
each row update is a handful of VPU ops.

Mosaic constraints shape the implementation:
  * vector loads need 128-aligned dynamic starts -> the target band is read
    with an aligned `pl.ds` plus a dynamic `pltpu.roll` for the remainder;
  * the carry shift by d = off[i]-off[i-1] is a dynamic roll of a
    sentinel-padded double-width buffer (index m holds band value m-1, the
    tail is -inf, so no circular wrap can reach the live window);
  * per-row scalars (query base, band offset) are DMA'd chunk-wise from HBM
    into SMEM scratch, where dynamic scalar indexing is unrestricted.

Numerics are identical to dp._banded_dp_scores_single (same recurrence; the
one-pass max-plus scan is exact for affine gaps).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from telr_tpu.kernels.dp import GLOBAL, EXTEND, LOCAL, NEG_INF

CHUNK = 1024  # rows per SMEM scalar DMA (1D DMA tile size)


def _shift_right_fill(x, k, fill):
    """x shifted right by k lanes (static k) along axis 1, filling."""
    rolled = pltpu.roll(x, k, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    return jnp.where(lane < k, fill, rolled)


def _roll_left(x, k):
    """Circular left roll by (dynamic) k lanes along axis 1.

    Compiled Mosaic mishandles negative dynamic shifts (measured: off by a
    constant on multi-tile arrays), so express as a right roll by L-k."""
    L = x.shape[1]
    return pltpu.roll(x, (jnp.int32(L) - k) % jnp.int32(L), axis=1)


def _scores_kernel(q_hbm, off_hbm, t_ref, qlen_ref, tlen_ref, off0_ref,
                   gout_ref, bout_ref,
                   h_s, i_s, q_sm, off_sm, sems,
                   *, width, lq, mode, ma, mi, go, ge, amb):
    b = pl.program_id(0)
    neg = jnp.int32(NEG_INF)
    tlen = tlen_ref[0, 0, 0]
    qlen = qlen_ref[0, 0, 0]
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
    bufw = h_s.shape[1]
    n_chunks = (lq + CHUNK - 1) // CHUNK

    # prime chunk 0 of scalars (flat 1D layouts; off is stored shifted by
    # one — off_sm[r] == off[c*CHUNK + r + 1] — so chunks never overlap)
    qstride = lq
    ostride = lq
    cp0 = pltpu.make_async_copy(
        q_hbm.at[pl.ds(b * qstride, CHUNK)], q_sm, sems.at[0])
    cp1 = pltpu.make_async_copy(
        off_hbm.at[pl.ds(b * ostride, CHUNK)], off_sm, sems.at[1])
    cp0.start()
    cp1.start()
    cp0.wait()
    cp1.wait()

    # carry buffers: index m holds row value at band position m-1; m=0 and
    # the tail are permanent -inf sentinels.
    h_s[:, :] = jnp.full((1, bufw), neg, jnp.int32)
    i_s[:, :] = jnp.full((1, bufw), neg, jnp.int32)
    off0 = off0_ref[0, 0, 0]
    j0 = off0 + p_idx
    if mode == LOCAL:
        h0 = jnp.zeros((1, width), jnp.int32)
    else:
        h0 = jnp.where(j0 == 0, 0, -(go + ge * j0))
    h_s[0:1, 1:1 + width] = jnp.where(j0 <= tlen, h0, neg)

    init_best = jnp.int32(0) if mode != GLOBAL else neg

    def chunk_body(c, carry):
        best, off_prev = carry

        @pl.when(c > 0)
        def _load():
            cpq = pltpu.make_async_copy(
                q_hbm.at[pl.ds(b * qstride + c * CHUNK, CHUNK)], q_sm,
                sems.at[0])
            cpo = pltpu.make_async_copy(
                off_hbm.at[pl.ds(b * ostride + c * CHUNK, CHUNK)],
                off_sm, sems.at[1])
            cpq.start()
            cpo.start()
            cpq.wait()
            cpo.wait()

        def row_body(r, rcarry):
            best, off_prev = rcarry
            row_i = c * CHUNK + r + 1
            qi = q_sm[r]
            off_i = off_sm[r]
            d_i = off_i - off_prev

            # target band: aligned load + dynamic roll for the remainder
            base = pl.multiple_of((off_i // 128) * 128, 128)
            rem = off_i - base
            t_wide = t_ref[0, 0:1, pl.ds(base, width + 128)]
            t_band = _roll_left(t_wide, rem)[0:1, 0:width]

            j_col = off_i + p_idx
            in_t = (j_col >= 1) & (j_col <= tlen)
            at_zero = j_col == 0

            hbuf = h_s[0:1, :]
            ibuf = i_s[0:1, :]
            h_diag = _roll_left(hbuf, d_i)[0:1, 0:width]
            h_up = _roll_left(hbuf, d_i + 1)[0:1, 0:width]
            i_up = _roll_left(ibuf, d_i + 1)[0:1, 0:width]

            i_open = jnp.where(h_up > neg // 2, h_up - go - ge, neg)
            i_ext = jnp.where(i_up > neg // 2, i_up - ge, neg)
            i_cur = jnp.maximum(i_open, i_ext)

            s = jnp.where((qi == 4) | (t_band >= 4), jnp.int32(amb),
                          jnp.where(t_band == qi, jnp.int32(ma),
                                    jnp.int32(-mi)))
            diag = jnp.where(h_diag > neg // 2, h_diag + s, neg)
            h_nod = jnp.maximum(diag, i_cur)
            if mode == LOCAL:
                h_nod = jnp.maximum(h_nod, 0)
            h_zero = jnp.maximum(i_cur, 0) if mode == LOCAL else i_cur
            h_nod = jnp.where(at_zero, h_zero,
                              jnp.where(in_t, h_nod, neg))

            # exclusive max-plus scan via log2(width) shift-max steps
            g = jnp.where(h_nod > neg // 2,
                          h_nod + ge * p_idx - go - ge, neg)
            m = _shift_right_fill(g, 1, neg)
            k = 1
            while k < width:
                m = jnp.maximum(m, _shift_right_fill(m, k, neg))
                k *= 2
            d_cur = jnp.where(m > neg // 2, m - ge * (p_idx - 1), neg)
            d_cur = jnp.where(at_zero | ~in_t, neg, d_cur)
            h_cur = jnp.maximum(h_nod, d_cur)

            valid_row = row_i <= qlen
            h_prev_win = h_s[0:1, 1:1 + width]
            h_s[0:1, 1:1 + width] = jnp.where(valid_row, h_cur, h_prev_win)
            i_s[0:1, 1:1 + width] = jnp.where(
                valid_row, i_cur, jnp.full_like(i_cur, neg))

            masked = jnp.where((in_t | at_zero) & valid_row, h_cur, neg)
            best = jnp.maximum(best, jnp.max(masked))
            return best, off_i

        return jax.lax.fori_loop(0, CHUNK, row_body, (best, off_prev))

    best, off_last = jax.lax.fori_loop(0, n_chunks, chunk_body,
                                       (init_best, off0))

    p_end = tlen - off_last
    p_end_c = jnp.clip(p_end, 0, width - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
    gval = jnp.max(jnp.where(lane == p_end_c, h_s[0:1, 1:1 + width], neg))
    gout_ref[0, 0, 0] = jnp.where((p_end >= 0) & (p_end < width), gval, neg)
    bout_ref[0, 0, 0] = best


@functools.partial(jax.jit,
                   static_argnames=("width", "mode", "params_tuple",
                                    "interpret"))
def pallas_dp_scores(q, t, off, qlen, tlen, *, width, mode, params_tuple,
                     interpret=False):
    """Pallas banded DP scores.

    q: (B, Lq) int8/int32, t: (B, Lt) int8, off: (B, Lq+1) int32 monotone
    band offsets, qlen/tlen: (B,) int32.  Returns (gscore (B,), best (B,)).
    """
    ma, mi, go, ge, amb = params_tuple
    B, Lq = q.shape
    lq_pad = -(-Lq // CHUNK) * CHUNK  # multiple of CHUNK

    # t padding: one leading sentinel column (index p maps to j-1); tail
    # sentinels sized so the aligned wide load never reads out of bounds
    # int32 in VMEM: pltpu.roll only supports 32-bit data
    sentinel = jnp.full((B, 1), 5, jnp.int32)
    t_pad = jnp.concatenate(
        [sentinel, t.astype(jnp.int32),
         jnp.full((B, width + 256), 5, jnp.int32)], axis=1)
    idx = jnp.arange(t_pad.shape[1], dtype=jnp.int32)[None, :] - 1
    t_pad = jnp.where((idx >= 0) & (idx < tlen[:, None]), t_pad,
                      jnp.int32(5))
    ltp = -(-t_pad.shape[1] // 128) * 128
    t_pad = jnp.pad(t_pad, ((0, 0), (0, ltp - t_pad.shape[1])),
                    constant_values=5)

    q32 = jnp.pad(q.astype(jnp.int32), ((0, 0), (0, lq_pad - Lq)),
                  constant_values=4)
    # offs = off[:, 1:] (shifted layout), edge-padded so rows beyond Lq
    # repeat the final offset; stride lq_pad keeps chunk DMAs tile-aligned
    off_p = jnp.pad(off[:, 1:], ((0, 0), (0, lq_pad - Lq)), mode="edge")
    off0_in = off[:, 0].astype(jnp.int32).reshape(B, 1, 1)

    kernel = functools.partial(
        _scores_kernel, width=width, lq=lq_pad, mode=mode, ma=ma, mi=mi,
        go=go, ge=ge, amb=amb)

    gout, bout = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # q32 (B,1,lq_pad) HBM
            pl.BlockSpec(memory_space=pltpu.ANY),   # off (B,1,lq_pad+1) HBM
            pl.BlockSpec((1, 1, ltp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),  # t
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),  # qlen
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),  # tlen
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),  # off0
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, 2 * width + 128), jnp.int32),  # H carry (+pad)
            pltpu.VMEM((1, 2 * width + 128), jnp.int32),  # I carry (+pad)
            pltpu.SMEM((CHUNK,), jnp.int32),              # q chunk
            pltpu.SMEM((CHUNK,), jnp.int32),              # off chunk
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(q32.reshape(B * lq_pad), off_p.reshape(B * lq_pad),
      t_pad.reshape(B, 1, ltp),
      qlen.reshape(B, 1, 1), tlen.reshape(B, 1, 1), off0_in)
    return gout[:, 0, 0], bout[:, 0, 0]
