"""SAM import/export at the pipeline boundary.

The reference accepts pre-aligned reads (BAM) and skips stage 1a
(TELR_input.py:299-305) and emits BAM internally; telr_tpu keeps alignments
in memory but supports SAM text at the boundary: import an existing
alignment into an AlignmentStore (skipping the alignment stage) and export
the store for external tools.  BAM's BGZF container is gzip-compatible, so
.bam files produced by standard tools can be converted externally or read
as SAM via any decompressor; the parser here handles the text form.
"""

from __future__ import annotations

import gzip
import io
import re
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from telr_tpu.core.alignstore import AlignmentStore
from telr_tpu.io.seqs import SeqDict, Sequence, encode, revcomp_codes
from telr_tpu.kernels.mapper import Alignment

_CIG_RE = re.compile(r"(\d+)([MIDNSHP=X])")


def parse_cigar(s: str) -> List[Tuple[str, int]]:
    """SAM CIGAR -> internal ops.  =/X fold into M; N folds into D;
    H/P are dropped; S is returned separately by the caller via spans."""
    out: List[Tuple[str, int]] = []

    def push(op, ln):
        if out and out[-1][0] == op:
            out[-1] = (op, out[-1][1] + ln)
        else:
            out.append((op, ln))

    for ln, op in _CIG_RE.findall(s):
        ln = int(ln)
        if op in ("M", "=", "X"):
            push("M", ln)
        elif op == "I":
            push("I", ln)
        elif op in ("D", "N"):
            push("D", ln)
        # S/H/P: not part of the aligned block
    return out


def _clips(s: str) -> Tuple[int, int]:
    """(leading, trailing) soft/hard clip lengths."""
    ops = _CIG_RE.findall(s)
    lead = int(ops[0][0]) if ops and ops[0][1] in "SH" else 0
    tail = int(ops[-1][0]) if ops and ops[-1][1] in "SH" else 0
    return lead, tail


def read_sam(path: str, tlens: Optional[Dict[str, int]] = None
             ) -> Tuple[AlignmentStore, SeqDict]:
    """Parse a SAM file into (AlignmentStore, reads SeqDict).

    Reads are reconstructed from SEQ fields of primary alignments
    (reverse-complemented back to original orientation for flag 0x10), the
    same information `samtools fasta` extracts for the reference's BAM
    input path (TELR_input.py:329-348)."""
    opener = gzip.open if path.endswith(".gz") else open
    alns: List[Alignment] = []
    reads = SeqDict()
    sq_len: Dict[str, int] = dict(tlens or {})
    with opener(path, "rt") as fh:
        for line in fh:
            if line.startswith("@"):
                if line.startswith("@SQ"):
                    fields = dict(f.split(":", 1) for f in
                                  line.rstrip("\n").split("\t")[1:]
                                  if ":" in f)
                    if "SN" in fields and "LN" in fields:
                        sq_len[fields["SN"]] = int(fields["LN"])
                continue
            e = line.rstrip("\n").split("\t")
            if len(e) < 11:
                continue
            qname, flag, rname, pos, mapq, cigar = (
                e[0], int(e[1]), e[2], int(e[3]), int(e[4]), e[5])
            seq = e[9]
            if flag & 4 or rname == "*" or cigar == "*":
                continue
            secondary = bool(flag & 0x100)
            reverse = bool(flag & 0x10)
            ops = parse_cigar(cigar)
            lead, tail = _clips(cigar)
            nm = sum(l for op, l in ops if op == "M")
            ni = sum(l for op, l in ops if op == "I")
            nd = sum(l for op, l in ops if op == "D")
            qlen = lead + nm + ni + tail
            tstart = pos - 1
            tend = tstart + nm + nd
            # strand-oriented aligned region -> original coords
            if reverse:
                qstart, qend = tail, tail + nm + ni
            else:
                qstart, qend = lead, lead + nm + ni
            alns.append(Alignment(
                qname=qname, qlen=qlen, qstart=qstart, qend=qend,
                strand="-" if reverse else "+", tname=rname,
                tlen=sq_len.get(rname, tend), tstart=tstart, tend=tend,
                matches=nm, blocklen=nm + ni + nd, mapq=mapq, score=nm,
                cigar=ops, primary=not secondary))
            if (not secondary and seq != "*" and qname not in reads
                    and len(seq) == qlen):
                codes = encode(seq)
                if reverse:
                    codes = revcomp_codes(codes)
                reads.add(Sequence(qname, codes), dedup=True)
    return AlignmentStore(alns), reads


def write_sam(store: AlignmentStore, reads: SeqDict, path: str,
              tlens: Optional[Dict[str, int]] = None) -> None:
    """Export an AlignmentStore as SAM (header + records)."""
    targets: Dict[str, int] = dict(tlens or {})
    for a in store.all():
        targets.setdefault(a.tname, a.tlen)
    with open(path, "w") as out:
        out.write("@HD\tVN:1.6\tSO:coordinate\n")
        for name, ln in targets.items():
            out.write(f"@SQ\tSN:{name}\tLN:{ln}\n")
        for tname in store.targets():
            for a in store.fetch(tname, 0, targets.get(tname, 1 << 60)):
                flag = 0
                if a.strand == "-":
                    flag |= 0x10
                if not a.primary:
                    flag |= 0x100
                if a.strand == "-":
                    lead = a.qlen - a.qend
                    tail = a.qstart
                else:
                    lead = a.qstart
                    tail = a.qlen - a.qend
                cig = ""
                if lead:
                    cig += f"{lead}S"
                cig += "".join(f"{l}{op}" for op, l in a.cigar)
                if tail:
                    cig += f"{tail}S"
                if a.qname in reads:
                    codes = reads[a.qname].codes
                    if a.strand == "-":
                        codes = revcomp_codes(codes)
                    from telr_tpu.io.seqs import decode
                    seq = decode(codes)
                else:
                    seq = "*"
                out.write("\t".join([
                    a.qname, str(flag), a.tname, str(a.tstart + 1),
                    str(a.mapq), cig, "*", "0", "0", seq, "*"]) + "\n")
