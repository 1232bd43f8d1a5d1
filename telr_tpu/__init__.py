"""telr_tpu — a TPU-native engine for non-reference transposable-element (TE)
insertion detection from long reads.

Re-implements the full capability surface of bergmanlab/TELR (reference:
/root/reference/src/telr/telr.py:22-189) as an in-memory, array-based JAX/XLA
program.  Where TELR shells out to NGMLR/minimap2/Sniffles/wtdbg2/RepeatMasker/
samtools/bedtools with files as the ABI, telr_tpu runs:

  * one batched banded affine-gap alignment core (Pallas DP kernel) serving all
    aligner roles (read->genome, INS-seq->contig, TE-library->anything,
    flank->reference, polish realignment),
  * an insertion-signature SV caller over CIGAR evidence,
  * a batched backbone+pileup consensus assembler for per-locus contigs,
  * a vectorised interval-algebra module replacing bedtools,
  * exact-semantics ports of TELR's liftover decision tree, allele-frequency
    rules and VCF/JSON/BED writers.

Pipeline entry point: telr_tpu.pipeline.run_pipeline / the `telr-tpu` CLI.
"""

__version__ = "0.1.0"
