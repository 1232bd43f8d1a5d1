"""True multi-process pipeline runner (the reference has nothing like it —
SURVEY §2c defines the distributed design this realizes).

Each process owns a READ SHARD: it parses only the reads whose
crc32(name) mod P equals its process id, maps them against the replicated
reference index, and never materializes another shard's read sequences
except through the payload all-to-all.  What crosses process boundaries:

  * alignment RECORDS (positions + CIGARs, no sequences) — all-gathered so
    every process can cluster breakpoints over the full evidence
    (SURVEY §2c "halo exchange of boundary clusters" generalized to a
    gather; records are ~100x smaller than reads),
  * insertion SIGNATURES (clipped segment strings) — all-gathered,
  * read PAYLOADS for candidate loci — the lax.all_to_all payload
    redistribution (dist/redistribute.py), each locus' support + voter
    read codes landing on its owner shard (locus_id mod P),
  * per-locus RESULTS (contigs, TE intervals, AF dicts) — gathered to
    process 0, which runs the replicated tail (reference repeatmask,
    liftover, output) and writes the report files.

Determinism: signatures and alignments are sorted canonically after each
gather, so output is bit-identical to the single-process run of this same
flow (tools/two_process_pipeline.py asserts it)."""

from __future__ import annotations

import dataclasses
import logging
import pickle
import time
import zlib
from typing import Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger("telr_tpu.dist")


def _allgather_obj(obj):
    """All-gather one pickleable object per process; returns the list of
    every process' object, in process order."""
    import jax
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils
    data = pickle.dumps(obj)
    n = np.array([len(data)], dtype=np.int64)
    lens = np.asarray(multihost_utils.process_allgather(n)).reshape(-1)
    m = int(lens.max())
    buf = np.zeros(m, np.uint8)
    buf[:len(data)] = np.frombuffer(data, np.uint8)
    allb = np.asarray(multihost_utils.process_allgather(buf))
    return [pickle.loads(allb[p, :int(lens[p])].tobytes())
            for p in range(len(lens))]


def _aln_key(a):
    return (a.tname, a.tstart, a.tend, a.qname, a.qstart, a.strand,
            not a.primary)


def run_pipeline_multiprocess(
    reads_path: str,
    reference_path: str,
    library_path: str,
    out_dir: str,
    config=None,
    sample_name: Optional[str] = None,
) -> Dict[str, float]:
    """Run the pipeline with the current jax.distributed process topology
    (call jax.distributed.initialize first for P>1).  Every process must
    call this with identical arguments; process 0 writes the output files.
    Returns per-stage wall-clock seconds (all processes)."""
    import os

    import jax
    from jax.sharding import Mesh

    from telr_tpu.af.freq import estimate_af
    from telr_tpu.annotate.contig import (annotate_contigs,
                                          reannotate_families)
    from telr_tpu.annotate.repeatmask import repeatmask_reference
    from telr_tpu.assembly.local import assemble_all
    from telr_tpu.config import default_config
    from telr_tpu.core.alignstore import AlignmentStore
    from telr_tpu.dist.mesh import READS_AXIS
    from telr_tpu.dist.redistribute import redistribute_payloads_mp
    from telr_tpu.io.fasta import read_fasta
    from telr_tpu.io.seqs import SeqDict, Sequence
    from telr_tpu.kernels.mapper import Aligner
    from telr_tpu.liftover.engine import liftover
    from telr_tpu.ops.intervals import Intervals
    from telr_tpu.report.output import generate_output
    from telr_tpu.sv.detect import cluster_signatures, extract_signatures
    from telr_tpu.sv.filter import filter_te_candidates
    from telr_tpu.sv.merge import merge_nearby_records
    from telr_tpu.utils.evallog import LociEval

    config = config or default_config()
    P = jax.process_count()
    pid = jax.process_index()
    devs = jax.devices()
    mesh = Mesh(np.array(devs), (READS_AXIS,))
    if sample_name is None:
        sample_name = os.path.splitext(os.path.basename(reads_path))[0]
    stage_s: Dict[str, float] = {}

    def timed(name):
        class _T:
            def __enter__(self):
                self.t0 = time.time()
                return self

            def __exit__(self, *a):
                stage_s[name] = time.time() - self.t0
        return _T()

    with timed("parse_input"):
        # each process materializes ONLY its read shard
        local_reads = read_fasta(
            reads_path,
            keep=lambda n: zlib.crc32(n.encode()) % P == pid)
        reference = read_fasta(reference_path)
        library = read_fasta(library_path)

    with timed("alignment"):
        stage1_preset = dataclasses.replace(config.read_preset,
                                            chain_prune_frac=0.5)
        aligner = Aligner(reference, stage1_preset,
                          use_wavefront=config.use_wavefront)
        result = aligner.map_batch_parallel(
            {s.name: s.codes for s in local_reads}, config.threads)
        local_alns = [a for hits in result.values() for a in hits]
        local_store = AlignmentStore(local_alns)

    with timed("sv_detection"):
        # signatures come from LOCAL reads (they need sequence access);
        # clustering needs the full evidence, so gather alignment records
        # + signatures, both canonically sorted for determinism
        local_sigs = extract_signatures(local_store, local_reads,
                                        config.sv)
        all_alns = [a for part in _allgather_obj(local_alns) for a in part]
        all_alns.sort(key=_aln_key)
        store = AlignmentStore(all_alns)
        all_sigs = [s for part in _allgather_obj(local_sigs)
                    for s in part]
        # junction-read codes travel with the gather: stitching a junction
        # pair needs the two reads' full codes (sv/detect.py
        # _stitch_junctions); only jr/jl readers qualify, a tiny subset
        jnames = {s.read for s in local_sigs if s.kind != "ins"}
        jlocal = {n: local_reads[n].codes for n in jnames
                  if n in local_reads}
        jreads = SeqDict()
        for part in _allgather_obj(jlocal):
            for n, codes in sorted(part.items()):
                if n not in jreads:
                    jreads.add(Sequence(name=n, codes=codes))
        records = cluster_signatures(all_sigs, store, config.sv,
                                     sample_name, reads=jreads)

    loci_eval = LociEval()
    with timed("te_filter"):
        records = filter_te_candidates(records, library, loci_eval,
                                       use_wavefront=config.use_wavefront)
        records = merge_nearby_records(records, config.sv.merge_window)

    with timed("locus_redistribute"):
        # voters = AF-window reads (superset of the assembly voters: every
        # read with any alignment in the +-window, minus support)
        voter_names: Dict[str, List[str]] = {}
        for rec in records:
            support = set(rec.reads)
            near = store.fetch_read_names(
                rec.chrom, max(0, rec.start - config.assembly.window),
                rec.end + config.assembly.window)
            voter_names[rec.locus_name] = sorted(set(near) - support)
        items = []
        name_of: Dict[tuple, str] = {}
        for li, rec in enumerate(records):
            for kind, names in ((0, rec.reads),
                                (1, voter_names[rec.locus_name])):
                for rank, rn in enumerate(names):
                    name_of[(li, rank, kind)] = rn
                    if rn in local_reads:
                        items.append((li, rank, kind,
                                      local_reads[rn].codes))
        got = redistribute_payloads_mp(mesh, items)
        shard_reads = SeqDict()
        for li, rank, kind, codes in got:
            rn = name_of[(li, rank, kind)]
            if rn not in shard_reads:
                shard_reads.add(Sequence(name=rn, codes=codes))

    owned = [(li, rec) for li, rec in enumerate(records) if li % P == pid]
    own_recs = [rec for _li, rec in owned]

    with timed("assembly"):
        # primary-only voters for the polish vote (collect_extra_voters
        # semantics), names resolved from the gathered store
        extra_voters = {}
        for rec in own_recs:
            support = set(rec.reads)
            near = {a.qname for a in store.fetch(
                rec.chrom, rec.start - config.assembly.window,
                rec.end + config.assembly.window) if a.primary}
            extra_voters[rec.locus_name] = sorted(near - support)
        contigs, passed = assemble_all(
            own_recs, shard_reads, config.read_preset, config.assembly,
            loci_eval, use_wavefront=config.use_wavefront,
            extra_voters=extra_voters)

    with timed("annotate_contig"):
        contig_te, te_seqs = annotate_contigs(
            contigs, passed, library, own_recs, config.read_preset,
            config.annotate, loci_eval,
            use_wavefront=config.use_wavefront)
        if not config.minimap2_family:
            contig_te = reannotate_families(
                contig_te, te_seqs, library,
                use_wavefront=config.use_wavefront)

    with timed("allele_frequency"):
        te_freq = estimate_af(own_recs, contigs, contig_te, shard_reads,
                              store, config.read_preset, config.af,
                              config.assembly,
                              use_wavefront=config.use_wavefront)

    with timed("gather_results"):
        payload = {
            "contigs": [(s.name, s.codes) for s in contigs],
            "passed": sorted(passed),
            "te_rows": [(contig_te.chrom[i], int(contig_te.start[i]),
                         int(contig_te.end[i]),
                         *(contig_te.cols[c][i] for c in contig_te.cols))
                        for i in range(len(contig_te))],
            "te_cols": list(contig_te.cols.keys()),
            "te_seqs": [(s.name, s.codes) for s in te_seqs],
            "te_freq": te_freq,
            "loci_eval": loci_eval.entries,
        }
        parts = _allgather_obj(payload)

    if pid != 0:
        return stage_s

    # ---- process 0: merge per-owner results in canonical records order,
    # then run the replicated tail and write outputs
    by_name: Dict[str, np.ndarray] = {}
    passed_all: set = set()
    te_rows_all: List[tuple] = []
    te_cols = parts[0]["te_cols"]
    te_seq_map: Dict[str, np.ndarray] = {}
    te_freq_all: Dict[str, dict] = {}
    eval_map: Dict[str, List[tuple]] = {}
    for part in parts:
        by_name.update({n: c for n, c in part["contigs"]})
        passed_all.update(part["passed"])
        te_rows_all.extend(tuple(r) for r in part["te_rows"])
        te_seq_map.update({n: c for n, c in part["te_seqs"]})
        te_freq_all.update(part["te_freq"])
        for locus, reason in part["loci_eval"]:
            eval_map.setdefault(locus, []).append((locus, reason))

    order = {rec.locus_name: li for li, rec in enumerate(records)}
    contigs = SeqDict()
    for rec in records:
        if rec.locus_name in by_name:
            contigs.add(Sequence(name=rec.locus_name,
                                 codes=by_name[rec.locus_name]))
    te_rows_all.sort(key=lambda r: (order.get(r[0], 1 << 30), r[1], r[2]))
    contig_te = Intervals.from_rows(te_rows_all, te_cols)
    te_seqs = SeqDict()
    for name in sorted(te_seq_map,
                       key=lambda n: (order.get(n.rpartition(":")[0],
                                                1 << 30), n)):
        te_seqs.add(Sequence(name=name, codes=te_seq_map[name]))
    te_freq = {rec.locus_name: te_freq_all[rec.locus_name]
               for rec in records if rec.locus_name in te_freq_all}
    merged_eval = LociEval()
    for rec in records:
        for e in eval_map.get(rec.locus_name, []):
            merged_eval.entries.append(e)

    with timed("ref_repeatmask"):
        ref_te_bed = repeatmask_reference(
            reference, library, use_wavefront=config.use_wavefront)
        if len(ref_te_bed) == 0:
            ref_te_bed = None

    with timed("liftover"):
        lift_report, _nonref_bed, summary = liftover(
            contigs, reference, contig_te, ref_te_bed, config.liftover,
            different_contig_name=config.different_contig_name,
            telr_mode=True, use_wavefront=config.use_wavefront)
        for item in lift_report:
            info = item.get("report")
            if not info or info.get("type") != "non-reference":
                continue
            ins_name = item["genome1_coord"]
            if ins_name in te_seqs:
                continue
            cname, _, coord = ins_name.rpartition(":")
            if cname in contigs:
                cs, ce = (int(x) for x in coord.split("-"))
                te_seqs.add(Sequence(name=ins_name,
                                     codes=contigs[cname].slice(cs, ce)))

    with timed("output"):
        os.makedirs(out_dir, exist_ok=True)
        generate_output(lift_report, te_freq, te_seqs, records, contig_te,
                        contigs, reference, out_dir, sample_name,
                        ref_path=reference_path)
        merged_eval.write(os.path.join(out_dir,
                                       sample_name + ".loci_eval.tsv"))
    return stage_s
