"""Distributed mesh tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax


def _n_dev():
    return len(jax.devices())


@pytest.mark.skipif(_n_dev() < 8, reason="needs 8 virtual devices")
def test_make_mesh_axes():
    from telr_tpu.dist.mesh import make_mesh, READS_AXIS, LOCI_AXIS
    mesh = make_mesh(8, loci_parallel=2)
    assert mesh.axis_names == (READS_AXIS, LOCI_AXIS)
    assert mesh.devices.shape == (4, 2)


@pytest.mark.skipif(_n_dev() < 8, reason="needs 8 virtual devices")
def test_sharded_align_step_matches_single_device():
    from telr_tpu.dist.mesh import make_mesh
    from telr_tpu.dist.pipeline import make_sharded_align_step
    from telr_tpu.kernels import dp

    rng = np.random.default_rng(0)
    B, LQ, LT, W = 16, 128, 256, 128
    q = rng.integers(0, 4, size=(B, LQ)).astype(np.int8)
    t = rng.integers(0, 4, size=(LT,)).astype(np.int8)
    off = np.broadcast_to(dp.make_band_offsets(LQ, LT, W),
                          (B, LQ + 1)).copy()
    qlen = np.full((B,), LQ, np.int32)
    tlen = np.asarray(LT, np.int32)
    params = dp.DPParams().tuple()

    mesh = make_mesh(8, loci_parallel=1)
    step = make_sharded_align_step(mesh, width=W, mode=dp.GLOBAL,
                                   params_tuple=params, cov_bins=LT)
    g_sh, b_sh, cov = step(q, t, off, qlen, tlen)

    tb = np.broadcast_to(t, (B, LT))
    tl = np.full((B,), LT, np.int32)
    g_ref, b_ref = dp.banded_dp_scores(q, tb, off, qlen, tl, width=W,
                                       mode=dp.GLOBAL, params_tuple=params)
    assert np.array_equal(np.asarray(g_sh), np.asarray(g_ref))
    assert np.array_equal(np.asarray(b_sh), np.asarray(b_ref))
    assert np.asarray(cov).shape == (LT,)
    # every read aligned => coverage covers band windows
    assert np.asarray(cov).max() > 0


@pytest.mark.skipif(_n_dev() < 8, reason="needs 8 virtual devices")
def test_graft_dryrun():
    import __graft_entry__ as g
    g.dryrun_multichip(8)
