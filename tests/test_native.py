"""Native C++ module parity with the numpy reference implementations."""

import numpy as np
import pytest

from telr_tpu.io import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_encode_parity():
    from telr_tpu.io.seqs import encode as np_encode
    s = b"ACGTNacgtnXYZ-\n" * 50
    assert np.array_equal(native.encode(s), np_encode(s))


def test_fasta_scan_parity():
    from telr_tpu.io.fasta import read_fasta
    recs = native.scan_fasta("/root/reference/test/reads.fasta")
    ref = read_fasta("/root/reference/test/reads.fasta")
    assert len(recs) == len(ref)
    for name, desc, codes in recs:
        assert np.array_equal(codes, ref[name].codes)


@pytest.mark.parametrize("n", [200, 5000, 50_000])
def test_minimizer_parity(n):
    from telr_tpu.kernels.minimizer import (pack_kmers, _sliding_argmin,
                                            _splitmix64)
    # compare against the pure-numpy implementation (bypass the native
    # dispatch inside minimizers())
    import telr_tpu.kernels.minimizer as mz
    rng = np.random.default_rng(n)
    codes = rng.integers(0, 4, n).astype(np.int8)
    codes[rng.integers(0, n, max(1, n // 100))] = 4

    fwd, rc, valid = pack_kmers(codes, 15)
    hf = _splitmix64(fwd)
    hr = _splitmix64(rc)
    strand = (hr < hf).astype(np.int64)
    hcan = np.minimum(hf, hr)
    invalid = (~valid) | (hf == hr)
    hcan = np.where(invalid, np.uint64(0xFFFFFFFFFFFFFFFF), hcan)
    sel = np.unique(_sliding_argmin(hcan, 10))
    sel = sel[~invalid[sel]]
    want = (sel, hcan[sel], strand[sel])

    got = native.minimizers(codes, 15, 10)
    assert np.array_equal(got[0], want[0])
    assert np.array_equal(got[1], want[1])
    assert np.array_equal(got[2], want[2])
