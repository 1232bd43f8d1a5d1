"""Sequence containers and nucleotide <-> integer-code conversion.

All device compute operates on int8 code arrays: A=0 C=1 G=2 T=3, N/other=4.
This replaces the string/Biopython sequence handling scattered through the
reference (e.g. TELR_utility.py:67-73 get_rev_comp_sequence).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

# 256-entry lookup: ASCII byte -> code.  Case-insensitive; anything that is
# not ACGT maps to 4 (ambiguous).
_ENCODE_LUT = np.full(256, 4, dtype=np.int8)
for _i, _base in enumerate("ACGT"):
    _ENCODE_LUT[ord(_base)] = _i
    _ENCODE_LUT[ord(_base.lower())] = _i

_DECODE_LUT = np.frombuffer(b"ACGTN", dtype=np.uint8)

# code -> complement code (N -> N)
_COMP_LUT = np.array([3, 2, 1, 0, 4], dtype=np.int8)


def encode(seq: str | bytes) -> np.ndarray:
    """ASCII sequence -> int8 code array."""
    if isinstance(seq, str):
        seq = seq.encode("ascii")
    raw = np.frombuffer(seq, dtype=np.uint8)
    return _ENCODE_LUT[raw]


def decode(codes: np.ndarray) -> str:
    """int8 code array -> ASCII string."""
    return _DECODE_LUT[np.asarray(codes, dtype=np.int64)].tobytes().decode("ascii")


def revcomp_codes(codes: np.ndarray) -> np.ndarray:
    """Reverse complement of a code array."""
    return _COMP_LUT[np.asarray(codes, dtype=np.int64)][::-1].astype(np.int8)


def revcomp_str(seq: str) -> str:
    return decode(revcomp_codes(encode(seq)))


@dataclasses.dataclass
class Sequence:
    """One named sequence, stored as codes."""

    name: str
    codes: np.ndarray
    description: str = ""

    def __len__(self) -> int:
        return int(self.codes.shape[0])

    @property
    def seq(self) -> str:
        return decode(self.codes)

    @classmethod
    def from_str(cls, name: str, seq: str, description: str = "") -> "Sequence":
        return cls(name=name, codes=encode(seq), description=description)

    def revcomp(self) -> "Sequence":
        return Sequence(self.name, revcomp_codes(self.codes), self.description)

    def slice(self, start: int, end: int) -> np.ndarray:
        """0-based half-open subsequence (bedtools getfasta semantics)."""
        start = max(0, int(start))
        end = min(len(self), int(end))
        if end <= start:
            return np.zeros((0,), dtype=np.int8)
        return self.codes[start:end]


class SeqDict:
    """Ordered mapping name -> Sequence; the in-memory stand-in for a fasta
    file + .fai index (reference TELR_liftover.py:383-390 get_genome_size)."""

    def __init__(self, seqs: Optional[List[Sequence]] = None):
        self._seqs: Dict[str, Sequence] = {}
        for s in seqs or []:
            self.add(s)

    def add(self, seq: Sequence, dedup: bool = False) -> None:
        if seq.name in self._seqs:
            if dedup:
                # keep first occurrence (reference TELR_input.py:351-361)
                return
            raise ValueError(f"duplicate sequence name: {seq.name}")
        self._seqs[seq.name] = seq

    def __getitem__(self, name: str) -> Sequence:
        return self._seqs[name]

    def __contains__(self, name: str) -> bool:
        return name in self._seqs

    def __iter__(self) -> Iterator[Sequence]:
        return iter(self._seqs.values())

    def __len__(self) -> int:
        return len(self._seqs)

    def names(self) -> List[str]:
        return list(self._seqs.keys())

    def sizes(self) -> Dict[str, int]:
        return {name: len(s) for name, s in self._seqs.items()}

    def fetch(self, name: str, start: int, end: int) -> np.ndarray:
        """0-based half-open fetch, clipped to sequence bounds."""
        return self._seqs[name].slice(start, end)

    def fetch_str(self, name: str, start: int, end: int) -> str:
        return decode(self.fetch(name, start, end))

    def total_length(self) -> int:
        return sum(len(s) for s in self)


def pad_batch(code_arrays: List[np.ndarray], pad_to: Optional[int] = None,
              pad_value: int = 4) -> Tuple[np.ndarray, np.ndarray]:
    """Pad a ragged list of code arrays into (B, L) int8 plus (B,) lengths.

    Padding uses code 4 (N) so padded cells can never produce a match bonus in
    the DP kernels.
    """
    lens = np.array([a.shape[0] for a in code_arrays], dtype=np.int32)
    width = int(pad_to) if pad_to is not None else (int(lens.max()) if len(lens) else 0)
    out = np.full((len(code_arrays), width), pad_value, dtype=np.int8)
    for i, a in enumerate(code_arrays):
        out[i, : a.shape[0]] = a[:width]
    return out, np.minimum(lens, width)
