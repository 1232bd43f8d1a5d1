"""Pallas DP kernel parity vs the XLA scan implementation (interpret mode on
CPU; the same kernel is verified compiled on real TPU in bench runs)."""

import numpy as np
import pytest

from telr_tpu.kernels import dp
from telr_tpu.kernels.pallas_dp import pallas_dp_scores


@pytest.mark.parametrize("mode", [dp.GLOBAL, dp.EXTEND, dp.LOCAL])
def test_pallas_matches_scan(mode):
    rng = np.random.default_rng(1)
    params = dp.DPParams().tuple()
    B, LQ, LT, W = 3, 700, 900, 128
    q = rng.integers(0, 5, size=(B, LQ)).astype(np.int8)
    t = rng.integers(0, 5, size=(B, LT)).astype(np.int8)
    qlen = np.array([700, 512, 300], np.int32)
    tlen = np.array([900, 750, 420], np.int32)
    off = np.stack([dp.make_band_offsets(LQ, int(tl), W) for tl in tlen])
    g1, b1 = dp.banded_dp_scores(q, t, off, qlen, tlen, width=W, mode=mode,
                                 params_tuple=params)
    g2, b2 = pallas_dp_scores(q, t, off, qlen, tlen, width=W, mode=mode,
                              params_tuple=params, interpret=True)
    assert np.array_equal(np.asarray(g1), np.asarray(g2))
    assert np.array_equal(np.asarray(b1), np.asarray(b2))


def test_pallas_guided_band_big_insertion():
    """Offsets following a guide path with a large query insertion."""
    rng = np.random.default_rng(2)
    params = dp.DPParams().tuple()
    left = rng.integers(0, 4, 300).astype(np.int8)
    right = rng.integers(0, 4, 300).astype(np.int8)
    ins = rng.integers(0, 4, 400).astype(np.int8)
    t = np.concatenate([left, right])
    q = np.concatenate([left, ins, right])
    off = dp.offsets_from_path(len(q), len(t), 256,
                               np.array([150, 300, 700, 850]),
                               np.array([150, 300, 300, 450]))
    g1, _ = dp.banded_dp_scores(q[None], t[None], off[None],
                                np.array([len(q)], np.int32),
                                np.array([len(t)], np.int32),
                                width=256, mode=dp.GLOBAL,
                                params_tuple=params)
    g2, _ = pallas_dp_scores(q[None], t[None], off[None],
                             np.array([len(q)], np.int32),
                             np.array([len(t)], np.int32),
                             width=256, mode=dp.GLOBAL,
                             params_tuple=params, interpret=True)
    assert int(g1[0]) == int(g2[0])
    assert int(g1[0]) > 0
