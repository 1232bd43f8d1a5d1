"""Insertion-signature SV detection: the replacement for the Sniffles subset
TELR consumes.

TELR runs `sniffles -n -1 -m bam -v vcf` (reference TELR_sv.py:49-51) and then
keeps ONLY records with SVTYPE=INS and an explicit ALT sequence, reading
CHROM/POS/END/SVLEN/RE/AF/ID/ALT/RNAMES/FILTER/GT/DR/DV
(TELR_sv.py:159-169).  This module produces exactly those fields:

  1. scan every primary/supplementary alignment for intra-read insertion
     evidence: CIGAR I runs >= min_ins_len, plus split-pair signatures (two
     alignments of one read adjacent on the reference with an unaligned query
     middle),
  2. cluster signatures along the reference (single-linkage within
     max_cluster_dist, Sniffles' default neighbourhood),
  3. per cluster emit a SVRecord with position = median breakpoint, ALT seq
     from the read with the median-length insertion, RNAMES = supporting
     reads, genotype from the local alt/ref read counts.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from telr_tpu.config import SVConfig
from telr_tpu.core.alignstore import AlignmentStore
from telr_tpu.io.seqs import SeqDict, decode, revcomp_codes


@dataclasses.dataclass
class InsSignature:
    tname: str
    tpos: int            # reference breakpoint (insertion point)
    length: int
    read: str
    qpos: int            # insertion start on the strand-oriented query
    strand: str
    seq: str             # inserted sequence (reference-forward orientation)


@dataclasses.dataclass
class SVRecord:
    """One TE-candidate insertion locus == one row of TELR's parsed VCF
    (column layout per reference TELR_sv.py:194-208)."""

    chrom: str
    start: int
    end: int
    length: int
    coverage: int        # RE — number of supporting reads
    af: float
    sv_id: str
    seq: str
    reads: List[str]     # RNAMES
    sv_filter: str
    genotype: str
    ref_count: int       # DR
    alt_count: int       # DV
    ins_te_prop: float = 0.0
    ins_te_family: str = ""
    ins_te_strand: str = "."

    @property
    def locus_name(self) -> str:
        # "chr_start_end", the contig name used pipeline-wide
        # (reference TELR_assembly.py:47, TELR_te.py:51)
        return f"{self.chrom}_{self.start}_{self.end}"


def extract_signatures(store: AlignmentStore, reads: SeqDict,
                       cfg: SVConfig) -> List[InsSignature]:
    """Collect insertion signatures from CIGAR I runs and split alignments."""
    sigs: List[InsSignature] = []
    by_read: Dict[str, list] = {}
    for a in store.all():
        by_read.setdefault(a.qname, []).append(a)

    for qname, alns in by_read.items():
        codes = reads[qname].codes if qname in reads else None
        for a in alns:
            if not a.primary:
                continue
            qc = codes
            if qc is not None and a.strand == "-":
                qc = revcomp_codes(qc)
            # strand-oriented query start of the aligned region
            if a.strand == "-":
                q_cursor = a.qlen - a.qend
            else:
                q_cursor = a.qstart
            t_cursor = a.tstart
            for op, ln in a.cigar:
                if op == "M":
                    q_cursor += ln
                    t_cursor += ln
                elif op == "I":
                    if ln >= cfg.min_ins_len and qc is not None:
                        seq = decode(qc[q_cursor:q_cursor + ln])
                        sigs.append(InsSignature(
                            tname=a.tname, tpos=t_cursor, length=ln,
                            read=qname, qpos=q_cursor, strand=a.strand,
                            seq=seq))
                    q_cursor += ln
                elif op == "D":
                    t_cursor += ln

        # split-pair signatures: same read, same target+strand, adjacent
        # on the reference, with an unaligned (or elsewhere-mapped) query
        # middle — the insertion.  ALL ordered pairs are considered, not
        # just consecutive ones: the TE body of a long insertion often
        # maps to a reference TE copy at another locus, so the flank pair
        # is non-adjacent in query order (x..TE-segment..y).
        prim = sorted([a for a in alns if a.primary],
                      key=lambda a: a.qstart)
        for xi in range(len(prim)):
            x = prim[xi]
            for y in prim[xi + 1:]:
                if x.tname != y.tname or x.strand != y.strand:
                    continue
                q_gap = y.qstart - x.qend
                if x.strand == "-":
                    # query coords are strand-independent; target
                    # adjacency order flips for '-' strand
                    t_gap = x.tstart - y.tend
                    t_bp = x.tstart
                else:
                    t_gap = y.tstart - x.tend
                    t_bp = x.tend
                if q_gap >= cfg.min_ins_len and abs(t_gap) <= 100 \
                        and codes is not None:
                    seg = codes[x.qend:y.qstart]
                    if x.strand == "-":
                        seg = revcomp_codes(seg)
                    sigs.append(InsSignature(
                        tname=x.tname, tpos=int(t_bp), length=int(q_gap),
                        read=qname, qpos=int(x.qend), strand=x.strand,
                        seq=decode(seg)))
    return sigs


def cluster_signatures(sigs: List[InsSignature], store: AlignmentStore,
                       cfg: SVConfig, sample_name: str = "sample"
                       ) -> List[SVRecord]:
    """Single-linkage clustering of signatures along the reference, then
    per-cluster record emission with Sniffles-style genotyping."""
    sigs = sorted(sigs, key=lambda s: (s.tname, s.tpos))
    clusters: List[List[InsSignature]] = []
    for s in sigs:
        if (clusters and clusters[-1][-1].tname == s.tname
                and s.tpos - clusters[-1][-1].tpos <= cfg.max_cluster_dist):
            clusters[-1].append(s)
        else:
            clusters.append([s])

    records: List[SVRecord] = []
    k = 0
    for cl in clusters:
        # one signature per read: keep the longest
        per_read: Dict[str, InsSignature] = {}
        for s in cl:
            if s.read not in per_read or s.length > per_read[s.read].length:
                per_read[s.read] = s
        support = list(per_read.values())
        if len(support) < cfg.min_support:
            continue
        lens = np.array([s.length for s in support])
        if np.median(lens) < cfg.min_ins_len:
            continue
        pos = int(np.median([s.tpos for s in support]))
        # representative: the read whose insertion length is closest to median
        rep = min(support, key=lambda s: abs(s.length - float(np.median(lens))))
        tname = support[0].tname
        # DR: reads spanning the breakpoint without a supporting signature
        spanning = set()
        for a in store.fetch(tname, pos - 10, pos + 10):
            if a.primary and a.tstart <= pos - 10 and a.tend >= pos + 10:
                spanning.add(a.qname)
        alt_reads = {s.read for s in support}
        dv = len(alt_reads)
        dr = len(spanning - alt_reads)
        af = dv / (dv + dr) if (dv + dr) else 0.0
        if af < cfg.min_af:
            continue
        if af > cfg.hom_af:
            gt = "1/1"
        elif af >= cfg.het_af:
            gt = "0/1"
        else:
            gt = "0/0"
        records.append(SVRecord(
            chrom=tname, start=pos, end=pos, length=int(np.median(lens)),
            coverage=dv, af=round(af, 6), sv_id=str(k), seq=rep.seq,
            reads=sorted(alt_reads), sv_filter="PASS", genotype=gt,
            ref_count=dr, alt_count=dv))
        k += 1
    return records


def detect_insertions(store: AlignmentStore, reads: SeqDict, cfg: SVConfig,
                      sample_name: str = "sample") -> List[SVRecord]:
    """Full SV stage: signatures -> clusters -> records (replaces
    detect_sv + parse_vcf, reference TELR_sv.py:11-228)."""
    sigs = extract_signatures(store, reads, cfg)
    return cluster_signatures(sigs, store, cfg, sample_name)
