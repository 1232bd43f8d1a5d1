"""Per-locus drop-reason ledger.

Preserves the reference's loci_eval.tsv observability feature
(telr.py:64-66, TELR_sv.py:320-324, TELR_te.py:190-196): every locus that
falls out of the pipeline is recorded with the stage and reason.
"""

from __future__ import annotations

from typing import List, Tuple


class LociEval:
    def __init__(self) -> None:
        self.entries: List[Tuple[str, str]] = []

    def add(self, locus: str, reason: str) -> None:
        self.entries.append((locus, reason))

    def write(self, path: str) -> None:
        with open(path, "w") as out:
            for locus, reason in self.entries:
                out.write(f"{locus}\t{reason}\n")
