"""Probe: how much of bench.py's per-iteration time is tunnel/dispatch
latency vs device compute?  Compares (a) sync-every-iteration (what
bench.py measures today) against (b) pipelined dispatch — issue all
iterations, block once — which is how the pipeline actually drives the
kernel (wavefront_align issues every chunk before collecting).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from telr_tpu.kernels import dp
from telr_tpu.kernels.pallas_wavefront import (prepare_wavefront_batch,
                                               _call_kernel)

B, LQ, LT = 64, 2048, 3072
W = 2048
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
meta, init, scal, n_tiles, n, scheds, gmeta = \
    prepare_wavefront_batch(pairs, W, guides)
params = dp.DPParams().tuple()
meta_d = jax.device_put(meta)
init_d = jax.device_put(init)
scal_d = jax.device_put(scal)
gmeta_d = jax.device_put(gmeta)

useful = B * LQ * (2 * W)


def call():
    return _call_kernel(meta_d, init_d, scal_d, gmeta_d, width=W,
                        mode=dp.EXTEND, params_tuple=params,
                        n_tiles=n_tiles)


t0 = time.time()
g, b = call()
jax.block_until_ready(g)
print(f"compile+first: {time.time()-t0:.1f}s")

iters = 8
# (a) sync every iteration
t0 = time.time()
for _ in range(iters):
    g, b = call()
    np.asarray(g)
dt_sync = time.time() - t0
print(f"sync/iter:      {dt_sync/iters*1e3:7.1f} ms/iter "
      f"{useful*iters/dt_sync/1e9:6.2f} Gcells/s")

# (b) pipelined: issue all, block once
t0 = time.time()
outs = [call()[0] for _ in range(iters)]
jax.block_until_ready(outs)
dt_pipe = time.time() - t0
print(f"pipelined:      {dt_pipe/iters*1e3:7.1f} ms/iter "
      f"{useful*iters/dt_pipe/1e9:6.2f} Gcells/s")

# (c) single round-trip cost: tiny no-op transfer
x = jax.device_put(np.zeros(8, np.int32))
f = jax.jit(lambda a: a + 1)
np.asarray(f(x))
t0 = time.time()
for _ in range(20):
    np.asarray(f(x))
print(f"rt latency:     {(time.time()-t0)/20*1e3:7.1f} ms/round-trip")
