#!/bin/bash
# One-shot TPU measurement roundup (run when the axon tunnel is alive):
#   1. kernel bench (static-drift bodies) -> BENCH preview
#   2. bundled-test pipeline on the TPU wavefront path + jax.profiler
#      trace -> PROFILE_STAGES.json
#   3. TPU parity spot-check of the current kernel
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

echo "== tunnel probe =="
curl -s -o /dev/null -w "compile-svc: %{http_code}\n" \
    --max-time 5 http://127.0.0.1:8093/remote_compile || true

echo "== 1. kernel bench =="
timeout 3000 python bench.py

echo "== 2. bundled pipeline on TPU + profile =="
rm -rf /tmp/telr_tpu_run /tmp/telr_tpu_trace
timeout 3000 python -m telr_tpu.cli \
    -i /root/reference/test/reads.fasta \
    -r /root/reference/test/ref_38kb.fasta \
    -l /root/reference/test/library.fasta \
    -o /tmp/telr_tpu_run --wavefront on \
    --profile_dir /tmp/telr_tpu_trace \
    && cat /tmp/telr_tpu_run/reads.telr.bed
timeout 600 python tools/profile_report.py /tmp/telr_tpu_trace \
    --out PROFILE_STAGES.json || true

echo "== 3. TPU kernel parity =="
timeout 1200 python - <<'EOF'
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
from telr_tpu.kernels import dp
from telr_tpu.kernels.pallas_wavefront import (prepare_wavefront_batch,
                                               run_wavefront_batch,
                                               wavefront_align)
from telr_tpu.kernels.wavefront import numpy_wavefront, build_schedule
print("device:", jax.devices()[0])
rng = np.random.default_rng(5)
W = 128
pairs = []
for k in range(8):
    LT = 1500 + 64 * k
    t = rng.integers(0, 4, LT).astype(np.int8)
    q = t[: LT - 100].copy()
    idx = rng.integers(0, LT - 100, 60)
    q[idx] = rng.integers(0, 4, 60)
    pairs.append((q, t))
batch = prepare_wavefront_batch(pairs, W, None)
scheds = [build_schedule(q, t, W) for q, t in pairs]
params = dp.DPParams()
for mode in (dp.GLOBAL, dp.EXTEND, dp.LOCAL):
    g, b = run_wavefront_batch(batch, W, mode, params)
    for i, (q, t) in enumerate(pairs):
        gs, bs = numpy_wavefront(q, t, scheds[i], W, mode, params)
        want, got = (gs, g[i]) if mode == dp.GLOBAL else (bs, b[i])
        assert got == want, (mode, i, got, want)
    print(f"mode {mode}: TPU parity ok")
out = wavefront_align(pairs, W, dp.EXTEND, params)
for i, (q, t) in enumerate(pairs):
    gs, bs = numpy_wavefront(q, t, scheds[i], W, dp.EXTEND, params)
    assert out[i]["score"] == bs
print("TPU tb path ok")
EOF
echo "== done =="
