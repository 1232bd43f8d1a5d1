"""Prewarm the wavefront kernel compile cache for genome-scale runs.

Through the axon tunnel every distinct kernel grid costs a ~4-minute
remote compile, and a wedged compile RPC can stall a multi-hour eval.
This tool compiles each (mode, width, step-bucket) key the stage-1
mapper emits — with the chunker's fixed-G padding, these are exactly the
keys a full genome run reuses — so the eval itself runs entirely warm.
Safe to re-run: completed compiles persist in the cache, so repeated
attempts after a wedge converge.

Usage: JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
           python tools/prewarm_wavefront.py [--quick]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pair_of_steps(rng, s_target: int):
    """A (q, t) pair whose lq+lt lands in the step bucket of s_target."""
    lq = max(64, s_target // 2 - 200)
    t = rng.integers(0, 4, lq + 150).astype(np.int8)
    q = t[:lq].copy()
    m = rng.random(lq) < 0.08
    q[m] = (q[m] + 1 + rng.integers(0, 3, int(m.sum()))) % 4
    return q, t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="only the two hottest stage-1 keys")
    ap.add_argument("--export", action="store_true",
                    help="also write jax.export AOT artifacts (skips "
                         "per-process tracing+Mosaic lowering, ~8.5s/key "
                         "at S=32768)")
    args = ap.parse_args()

    import jax
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    print("device:", jax.devices()[0], flush=True)

    from telr_tpu.kernels import dp
    from telr_tpu.kernels.pallas_wavefront import (STAGE1_KEYS, aot_save,
                                                   wavefront_align)

    from telr_tpu.config import LIB_TO_SEQ

    keys = STAGE1_KEYS[:2] if args.quick else list(STAGE1_KEYS)
    rng = np.random.default_rng(0)
    param_sets = [("map", dp.DPParams())]
    if not args.quick:
        # library-homology stages (te_filter / repeatmask) score with the
        # LIB_TO_SEQ preset — a distinct compile-key family
        param_sets.append(("lib", dp.DPParams(
            match=LIB_TO_SEQ.match, mismatch=LIB_TO_SEQ.mismatch,
            gap_open=LIB_TO_SEQ.gap_open,
            gap_extend=LIB_TO_SEQ.gap_extend)))
    for pname, params in param_sets:
        for mode, width, s in keys:
            if args.export:
                t0 = time.time()
                path = aot_save(mode, width, s, params)
                print(f"export {pname} mode={mode} W={width} S={s}: "
                      f"{time.time()-t0:.1f}s -> {path}", flush=True)
            q, t = pair_of_steps(rng, s)
            t0 = time.time()
            res = wavefront_align([(q, t)], width, mode, params)
            ok = res and res[0]["score"] > dp.NEG_INF // 2
            print(f"{pname} mode={mode} W={width} S={s}: "
                  f"{time.time()-t0:.1f}s ({'ok' if ok else 'FAILED'})",
                  flush=True)


if __name__ == "__main__":
    main()
