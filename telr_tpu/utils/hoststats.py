"""Lightweight wall-clock attribution counters for the host-side hot path.

The mapper/wavefront dispatch spends its time in four places that are
invisible to stage-level timers: host planning, piece/schedule prep,
device wait (tunnel round-trips), and result decode (unpack + RLE).
These counters let the pipeline log a per-stage breakdown so perf work
targets the real bottleneck instead of a guess (the 505s stage-1 wall of
GENOME_EVAL_wf3mb attributed ~70% to untracked host+tunnel time).

Usage: with timer("wave_prep"): ...;  snapshot() -> dict, reset() zeroes.
Thread-unsafe by design (single host dispatch thread owns the hot path).
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager

_C: dict = defaultdict(float)
_N: dict = defaultdict(int)


@contextmanager
def timer(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _C[name] += time.perf_counter() - t0
        _N[name] += 1


def add(name: str, seconds: float, n: int = 1) -> None:
    _C[name] += seconds
    _N[name] += n


def snapshot() -> dict:
    return {k: {"s": round(v, 2), "n": _N[k]} for k, v in sorted(_C.items())}


def reset() -> None:
    _C.clear()
    _N.clear()
