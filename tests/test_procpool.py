"""Forkserver worker-pool parity: map_batch_parallel must equal map_batch
on both the CPU fan-out path and the wavefront plan-fanout path.

The pool exists because plain fork() deadlocks under threaded runtimes
(axon tunnel, gloo) — see utils/procpool.py.  These tests pin the
contract that the fan-out changes throughput only, never results."""

import numpy as np
import pytest

from telr_tpu.config import MAP_PB
from telr_tpu.io.seqs import SeqDict, Sequence, revcomp_codes
from telr_tpu.kernels.mapper import Aligner


def _dataset(n_reads=24, ref_len=120_000, read_len=4000, err=0.05):
    rng = np.random.default_rng(7)
    ref = rng.integers(0, 4, ref_len).astype(np.int8)
    targets = SeqDict([Sequence("chr", ref)])
    reads = {}
    for i in range(n_reads):
        s = int(rng.integers(0, ref_len - read_len - 100))
        seg = ref[s:s + read_len].copy()
        m = rng.random(len(seg)) < err
        seg[m] = (seg[m] + 1 + rng.integers(0, 3, int(m.sum()))) % 4
        if i % 2:
            seg = revcomp_codes(seg)
        reads[f"r{i}"] = seg
    return targets, reads


def _sig(res):
    return {n: [(a.tname, a.tstart, a.tend, a.qstart, a.qend, a.strand,
                 a.primary, a.score) for a in v]
            for n, v in res.items()}


def test_cpu_pool_parity():
    targets, reads = _dataset()
    al = Aligner(targets, MAP_PB)
    assert _sig(al.map_batch_parallel(reads, 3)) == \
        _sig(al.map_batch(reads))


def test_plan_pool_parity_wavefront():
    targets, reads = _dataset(n_reads=16)
    al = Aligner(targets, MAP_PB, use_wavefront=True)
    al._wave_interpret = True   # CPU test env: interpret-mode kernel
    assert _sig(al.map_batch_parallel(reads, 3)) == \
        _sig(al.map_batch(reads))


def test_small_batch_stays_serial():
    targets, reads = _dataset(n_reads=6)
    al = Aligner(targets, MAP_PB)
    # below the fan-out threshold no pool is created
    assert _sig(al.map_batch_parallel(reads, 3)) == \
        _sig(al.map_batch(reads))
    assert getattr(al, "_pool", None) is None
