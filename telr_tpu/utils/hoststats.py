"""Lightweight wall-clock attribution counters for the host-side hot path.

The mapper/wavefront dispatch spends its time in four places that are
invisible to stage-level timers: host planning, piece/schedule prep,
device wait (tunnel round-trips), and result decode (unpack + RLE).
These counters let the pipeline log a per-stage breakdown so perf work
targets the real bottleneck instead of a guess (the 505s stage-1 wall of
GENOME_EVAL_wf3mb attributed ~70% to untracked host+tunnel time).

Usage: with timer("wave_prep"): ...;  snapshot() -> dict, reset() zeroes.
Counters are per-thread (threading.local): the async kernel-prewarm
threads also run wavefront_align, and global counters double-counted
their compile waits into the main dispatch thread's numbers.
"""

from __future__ import annotations

import threading
import time
from collections import defaultdict
from contextlib import contextmanager

_TL = threading.local()


def _c():
    if not hasattr(_TL, "c"):
        _TL.c = defaultdict(float)
        _TL.n = defaultdict(int)
    return _TL.c, _TL.n


@contextmanager
def timer(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        c, n = _c()
        c[name] += time.perf_counter() - t0
        n[name] += 1


def add(name: str, seconds: float, n: int = 1) -> None:
    c, cn = _c()
    c[name] += seconds
    cn[name] += n


def snapshot() -> dict:
    c, n = _c()
    return {k: {"s": round(v, 2), "n": n[k]} for k, v in sorted(c.items())}


def reset() -> None:
    c, n = _c()
    c.clear()
    n.clear()
