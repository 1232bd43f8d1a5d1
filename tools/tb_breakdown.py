"""Breakdown timing of the full-alignment (traceback) path on TPU.

Splits wavefront_align's cost into: host batch prep, kernel issue+sync,
fused device traceback issue+sync, result pull, host RLE.  Run on live
hardware to decide which lever to pull next.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    from telr_tpu.kernels import dp
    from telr_tpu.kernels.pallas_wavefront import (
        STEP_TILE, _call_kernel, _device_traceback_from_best, _rle,
        _unpack_ops, prepare_wavefront_batch, wavefront_align)

    dev = jax.devices()[0]
    print("device:", dev, file=sys.stderr)
    B, LQ, LT = 64, 2048, 3072
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    rng = np.random.default_rng(0)
    pairs = []
    for _ in range(B):
        t = rng.integers(0, 4, LT).astype(np.int8)
        q = t[:LQ].copy()
        idx = rng.integers(0, LQ, 200)
        q[idx] = rng.integers(0, 4, 200)
        pairs.append((q, t))
    aq = np.arange(256, LQ - 256, 512, dtype=np.int64)
    guides = [(aq, aq) for _ in range(B)]
    params = dp.DPParams()

    # warm everything
    wavefront_align(pairs, W, dp.EXTEND, params, guides=guides)

    for it in range(3):
        t0 = time.time()
        batch = prepare_wavefront_batch(pairs, W, guides)
        meta, init, scal, n_tiles, n, scheds, gmeta = batch
        S_pad = n_tiles * STEP_TILE
        t1 = time.time()
        meta_d = jax.device_put(meta)
        scal_d = jax.device_put(scal)
        outs = _call_kernel(meta_d, init, scal_d, gmeta, width=W,
                            mode=dp.EXTEND, params_tuple=params.tuple(),
                            n_tiles=n_tiles, tb=True)
        jax.block_until_ready(outs)
        t2 = time.time()
        gout, bout, bs_d, bp_d, dirs = outs
        packed, small = _device_traceback_from_best(
            dirs, meta_d, scal_d, gout, bout, bs_d, bp_d, mode=dp.EXTEND,
            S_max=S_pad, NB=S_pad // 8, W=W)
        jax.block_until_ready((packed, small))
        t3 = time.time()
        packed_h = np.asarray(packed)
        small_h = np.asarray(small)
        t4 = time.time()
        ops = _unpack_ops(packed_h)
        cigars = [_rle(ops[:, k]) for k in range(n)]
        t5 = time.time()
        print(f"iter{it}: prep {t1-t0:.3f}s  kernel {t2-t1:.3f}s  "
              f"walk {t3-t2:.3f}s  pull {t4-t3:.3f}s  rle {t5-t4:.3f}s  "
              f"total {t5-t0:.3f}s  (S_pad={S_pad}, W={W}, n={n})",
              file=sys.stderr)
    assert all(len(c) >= 1 for c in cigars)


if __name__ == "__main__":
    main()
