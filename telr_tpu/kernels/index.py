"""Minimizer hash index over a target SeqDict (the reference genome, a contig
set, or a TE library).

Replaces minimap2's .mmi / NGMLR's index.  Host-built (sorted-array layout,
no hash table): query by binary search.  The index is replicated per host in
the distributed design (SURVEY.md §2c); read batches are what gets sharded.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

from telr_tpu.io.seqs import SeqDict
from telr_tpu.kernels.minimizer import minimizers


@dataclasses.dataclass
class MinimizerIndex:
    k: int
    w: int
    seq_names: List[str]
    seq_lens: np.ndarray        # (S,) int64
    seq_starts: np.ndarray      # (S,) int64 — global concat offset per seq
    hashes: np.ndarray          # (N,) uint64, sorted
    gpos: np.ndarray            # (N,) int64 global positions (concat coords)
    strand: np.ndarray          # (N,) int8
    max_occ: int = 512

    @classmethod
    def build(cls, seqs: SeqDict, k: int, w: int, max_occ: int = 512
              ) -> "MinimizerIndex":
        names, lens, starts = [], [], []
        hs, ps, ss = [], [], []
        offset = 0
        for s in seqs:
            names.append(s.name)
            lens.append(len(s))
            starts.append(offset)
            pos, h, st = minimizers(s.codes, k, w)
            hs.append(h)
            ps.append(pos + offset)
            ss.append(st)
            offset += len(s)
        hashes = np.concatenate(hs) if hs else np.zeros(0, np.uint64)
        gpos = np.concatenate(ps) if ps else np.zeros(0, np.int64)
        strand = np.concatenate(ss) if ss else np.zeros(0, np.int64)
        order = np.argsort(hashes, kind="stable")
        return cls(k=k, w=w, seq_names=names,
                   seq_lens=np.array(lens, dtype=np.int64),
                   seq_starts=np.array(starts, dtype=np.int64),
                   hashes=hashes[order], gpos=gpos[order],
                   strand=strand[order].astype(np.int8), max_occ=max_occ)

    def lookup(self, qhashes: np.ndarray
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """For an array of query hashes, return (q_idx, t_gpos, t_strand) of
        all index hits, dropping hashes with more than max_occ occurrences
        (repeat filter, like minimap2 -f)."""
        lo = np.searchsorted(self.hashes, qhashes, side="left")
        hi = np.searchsorted(self.hashes, qhashes, side="right")
        cnt = hi - lo
        keep = (cnt > 0) & (cnt <= self.max_occ)
        q_idx_list, t_pos_list, t_str_list = [], [], []
        for qi in np.nonzero(keep)[0]:
            s, e = int(lo[qi]), int(hi[qi])
            q_idx_list.append(np.full(e - s, qi, dtype=np.int64))
            t_pos_list.append(self.gpos[s:e])
            t_str_list.append(self.strand[s:e])
        if not q_idx_list:
            z = np.zeros(0, dtype=np.int64)
            return z, z.copy(), z.copy()
        return (np.concatenate(q_idx_list), np.concatenate(t_pos_list),
                np.concatenate(t_str_list).astype(np.int64))

    def seq_of_gpos(self, gpos: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Global concat position -> (seq_id, local position)."""
        sid = np.searchsorted(self.seq_starts, gpos, side="right") - 1
        return sid, gpos - self.seq_starts[sid]
