"""telr_tpu benchmark driver.

Measures the hot kernel of the pipeline — the batched banded affine-gap DP
(the inner loop of every aligner role, see SURVEY.md §3 "hot loops") — in
DP cells/second on the available accelerator, and prints ONE JSON line.

Baseline note: the reference pipeline's compute lives in minimap2/NGMLR/
wtdbg2, whose SIMD DP inner loops sustain on the order of 1 Gcell/s per CPU
core (minimap2's SSE2 ksw2 kernel class; BASELINE.md — the repo itself
publishes no numbers).  vs_baseline is therefore reported against a
1 Gcell/s single-core reference-class baseline.
"""

import functools
import json
import sys
import time

import numpy as np


def main():
    import jax
    from telr_tpu.kernels import dp

    B, LQ, LT, W = 64, 2048, 3072, 512
    rng = np.random.default_rng(0)
    q = rng.integers(0, 4, size=(B, LQ)).astype(np.int8)
    t = rng.integers(0, 4, size=(B, LT)).astype(np.int8)
    off = np.broadcast_to(dp.make_band_offsets(LQ, LT, W),
                          (B, LQ + 1)).copy()
    qlen = np.full((B,), LQ, dtype=np.int32)
    tlen = np.full((B,), LT, dtype=np.int32)
    params = dp.DPParams().tuple()

    dev = jax.devices()[0]
    qd = jax.device_put(q, dev)
    td = jax.device_put(t, dev)
    offd = jax.device_put(off, dev)
    qld = jax.device_put(qlen, dev)
    tld = jax.device_put(tlen, dev)

    on_tpu = dev.platform != "cpu"
    if on_tpu:
        from telr_tpu.kernels.pallas_dp import pallas_dp_scores as dp_fn
    else:
        dp_fn = functools.partial(dp.banded_dp_scores)

    def run():
        g, b = dp_fn(qd, td, offd, qld, tld, width=W,
                     mode=dp.GLOBAL, params_tuple=params)
        # force full sync through the host (block_until_ready alone returns
        # early through the axon tunnel)
        return np.asarray(g)

    print(f"device: {dev}", file=sys.stderr)
    t0 = time.time()
    run()  # compile + first run
    print(f"compile+first: {time.time()-t0:.1f}s", file=sys.stderr)

    iters = 8
    t0 = time.time()
    for _ in range(iters):
        run()
    dt = time.time() - t0

    cells = B * LQ * W * iters
    gcps = cells / dt / 1e9
    baseline_gcps = 1.0  # SIMD CPU aligner class, single core
    print(json.dumps({
        "metric": "banded alignment DP throughput",
        "value": round(gcps, 3),
        "unit": "Gcells/s",
        "vs_baseline": round(gcps / baseline_gcps, 3),
    }))


if __name__ == "__main__":
    main()
