#!/bin/bash
# Round-5 artifact roundup — run steps individually; each appends to
# /tmp/r05_roundup.log.  Assumes AOT artifacts exported
# (tools/prewarm_wavefront.py --export) and an idle host.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

case "$1" in
  tpu10)   # headline: 10Mb TPU eval, auto routing (alignment+assembly on device)
    timeout 4000 python tools/genome_eval.py --size 10000000 --coverage 30 \
      --n-ins 30 --seed 3 --threads 4 \
      --wavefront-stages alignment,assembly \
      --workdir /root/evals/r05_tpu10mb --out GENOME_EVAL_r05_tpu10mb.json ;;
  host10)  # host baseline, same workload
    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= timeout 4000 \
      python tools/genome_eval.py --size 10000000 --coverage 30 \
      --n-ins 30 --seed 3 --threads 4 \
      --workdir /root/evals/r05_host10mb --out GENOME_EVAL_r05_host10mb.json ;;
  hard)    # hard-library eval (host path; quality artifact)
    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= timeout 6000 \
      python tools/genome_eval.py --size 10000000 --coverage 30 \
      --n-ins 30 --seed 7 --threads 4 --hard-library \
      --workdir /root/evals/r05_hard --out GENOME_EVAL_r05_hard.json ;;
  scale2)
    timeout 6000 python tools/two_process_pipeline.py --procs 2 \
      --out SCALING_r05.json ;;
  scale4)
    timeout 7000 python tools/two_process_pipeline.py --procs 4 \
      --out SCALING_r05_4p.json ;;
  coldbundled)  # cold TPU end-to-end on the bundled dataset (<60s target)
    rm -rf /tmp/telr_cold_bundled
    time timeout 1200 python -m telr_tpu.cli \
      -i /root/reference/test/reads.fasta \
      -r /root/reference/test/ref_38kb.fasta \
      -l /root/reference/test/library.fasta \
      -o /tmp/telr_cold_bundled --wavefront auto -t 4 ;;
  profile)  # fresh PROFILE_STAGES.json from a profiled bundled TPU run
    rm -rf /tmp/telr_prof_run /tmp/telr_prof_trace
    timeout 1800 python -m telr_tpu.cli \
      -i /root/reference/test/reads.fasta \
      -r /root/reference/test/ref_38kb.fasta \
      -l /root/reference/test/library.fasta \
      -o /tmp/telr_prof_run --wavefront auto -t 4 \
      --profile_dir /tmp/telr_prof_trace
    python tools/profile_report.py /tmp/telr_prof_trace \
      --out PROFILE_STAGES.json ;;
  s1cold)  # clean cold stage-1 bench
    TELR_WAVE_COLD_MIN_CELLS=1 timeout 2400 python tools/stage1_bench.py \
      --size 3000000 --coverage 30 --threads 4 --wavefront --repeat 1 ;;
  *) echo "usage: $0 {tpu10|host10|hard|scale2|scale4|coldbundled|profile|s1cold}" ;;
esac
