"""SAM boundary import/export round-trip tests."""

import numpy as np

from telr_tpu.config import MAP_PB
from telr_tpu.core.alignstore import AlignmentStore
from telr_tpu.io.samio import parse_cigar, read_sam, write_sam
from telr_tpu.io.seqs import SeqDict, Sequence, revcomp_codes
from telr_tpu.kernels.mapper import Aligner


def test_parse_cigar_folding():
    assert parse_cigar("10M2I3M") == [("M", 10), ("I", 2), ("M", 3)]
    assert parse_cigar("5=1X4=") == [("M", 10)]
    assert parse_cigar("10M100N10M") == [("M", 10), ("D", 100), ("M", 10)]
    assert parse_cigar("5S10M3H") == [("M", 10)]


def test_sam_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    ref_codes = rng.integers(0, 4, 5000).astype(np.int8)
    ref = SeqDict([Sequence("chrR", ref_codes)])
    aligner = Aligner(ref, MAP_PB)
    reads = SeqDict()
    alns = []
    for i in range(4):
        s = 500 + i * 800
        codes = ref_codes[s:s + 700].copy()
        if i % 2:
            codes = revcomp_codes(codes)
        reads.add(Sequence(f"r{i}", codes))
        alns.extend(aligner.map_seq(f"r{i}", codes))
    store = AlignmentStore(alns)

    sam = tmp_path / "out.sam"
    write_sam(store, reads, str(sam), tlens={"chrR": 5000})
    back_store, back_reads = read_sam(str(sam))

    a1 = sorted(store.all(), key=lambda a: (a.qname, a.tstart, not a.primary))
    a2 = sorted(back_store.all(),
                key=lambda a: (a.qname, a.tstart, not a.primary))
    assert len(a1) == len(a2)
    for x, y in zip(a1, a2):
        assert (x.qname, x.strand, x.tname, x.tstart, x.tend, x.cigar,
                x.qstart, x.qend, x.qlen, x.primary) == \
               (y.qname, y.strand, y.tname, y.tstart, y.tend, y.cigar,
                y.qstart, y.qend, y.qlen, y.primary)
    # reads reconstructed in original orientation
    for s in reads:
        assert s.name in back_reads
        assert np.array_equal(back_reads[s.name].codes, s.codes)
    # coverage identical
    assert np.array_equal(store.coverage("chrR", 0, 5000),
                          back_store.coverage("chrR", 0, 5000))
