"""Wavefront traceback kernel: CIGAR validity + oracle-exact path scores."""

import numpy as np
import pytest

from telr_tpu.kernels import dp
from telr_tpu.kernels.pallas_wavefront import wavefront_align

PAR = dp.DPParams()


def _pairs(n=4, seed=3):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        lt = int(rng.integers(40, 80))
        t = rng.integers(0, 4, lt).astype(np.int8)
        q = t[rng.integers(0, 5):].copy()
        for _ in range(5):
            k = rng.integers(0, len(q))
            q[k] = rng.integers(0, 4)
        out.append((q, t))
    return out


def _rescore(q, t, cigar, qi, tj):
    score = 0
    for op, ln in cigar:
        if op == "M":
            for _ in range(ln):
                score += PAR.match if q[qi] == t[tj] else -PAR.mismatch
                qi += 1
                tj += 1
        else:
            score -= PAR.gap_open + PAR.gap_extend * ln
            if op == "I":
                qi += ln
            else:
                tj += ln
    return score


@pytest.mark.parametrize("mode", [dp.GLOBAL, dp.EXTEND, dp.LOCAL])
def test_traceback_paths_are_oracle_optimal(mode):
    pairs = _pairs()
    res = wavefront_align(pairs, 128, mode, PAR, interpret=True)
    for (q, t), r in zip(pairs, res):
        want, _ = dp.numpy_affine_dp(q, t, mode, PAR)
        got = _rescore(q, t, r["cigar"], r["qstart"], r["tstart"])
        assert got == want == r["score"]
        if mode == dp.GLOBAL:
            nm = sum(l for op, l in r["cigar"] if op == "M")
            ni = sum(l for op, l in r["cigar"] if op == "I")
            nd = sum(l for op, l in r["cigar"] if op == "D")
            assert nm + ni == len(q) and nm + nd == len(t)
        if mode == dp.EXTEND:
            assert r["qstart"] == 0 and r["tstart"] == 0


def test_traceback_big_insertion_guided():
    rng = np.random.default_rng(9)
    left = rng.integers(0, 4, 150).astype(np.int8)
    right = rng.integers(0, 4, 150).astype(np.int8)
    ins = rng.integers(0, 4, 120).astype(np.int8)
    t = np.concatenate([left, right])
    q = np.concatenate([left, ins, right])
    res = wavefront_align([(q, t)], 256, dp.GLOBAL, PAR,
                          interpret=True)[0]
    big_i = [ln for op, ln in res["cigar"] if op == "I" and ln > 100]
    assert big_i, res["cigar"]
    got = _rescore(q, t, res["cigar"], 0, 0)
    assert got == res["score"]


_EXTRACT_BASE = {}


@pytest.mark.parametrize("extract", ["gather", "window"])
@pytest.mark.parametrize("mode", [dp.GLOBAL, dp.EXTEND])
def test_walk_extract_strategies_parity(monkeypatch, extract, mode):
    """All three device-walk byte-extract strategies produce identical
    alignments (ADVICE r4: only 'select' was exercised before).  The
    strategy is read per traceback call and passed to the jitted walk as
    a static argument, so monkeypatching the module attribute re-traces
    without any cache clearing.  (The 'select' baseline per mode is
    computed once — interpret-mode traces are expensive.)"""
    from telr_tpu.kernels import pallas_wavefront as pw
    pairs = _pairs(n=4, seed=17)
    if mode not in _EXTRACT_BASE:
        monkeypatch.setattr(pw, "_WALK_EXTRACT", "select")
        _EXTRACT_BASE[mode] = wavefront_align(pairs, 128, mode, PAR,
                                              interpret=True)
    monkeypatch.setattr(pw, "_WALK_EXTRACT", extract)
    got = wavefront_align(pairs, 128, mode, PAR, interpret=True)
    for w, g in zip(_EXTRACT_BASE[mode], got):
        assert w == g
