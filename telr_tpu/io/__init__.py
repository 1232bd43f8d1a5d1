from telr_tpu.io.seqs import (
    encode, decode, revcomp_codes, revcomp_str, Sequence, SeqDict,
)
from telr_tpu.io.fasta import read_fasta, write_fasta, faidx
