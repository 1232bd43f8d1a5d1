"""Sharded device-side pipeline step.

The compute-dense inner step of stage 1, expressed over a ("reads", "loci")
mesh:

  * the read batch (padded (B, Lq) codes + band offsets) is sharded over the
    "reads" axis; the reference window is replicated,
  * each shard runs the banded DP scoring kernel over its reads,
  * per-base reference coverage is accumulated per shard and reduced with a
    psum over "reads" (the depth reduction that replaces samtools depth at
    scale),
  * breakpoint-evidence histograms reduce the same way, so cluster discovery
    sees global evidence (the halo-free equivalent of cross-shard breakpoint
    clustering for single-window steps).

This function is the multi-chip compile surface validated by
__graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from telr_tpu.dist.mesh import LOCI_AXIS, READS_AXIS
from telr_tpu.kernels import dp


def make_sharded_align_step(mesh: Mesh, width: int, mode: int,
                            params_tuple, cov_bins: int):
    """Build a jitted sharded step:
       (q (B,Lq) int8, t (Lt,) int8, off (B,Lq+1) i32, qlen (B,), tlen ())
       -> (scores (B,), best (B,), coverage (cov_bins,))
    with q/off/qlen sharded over "reads" and reductions over the mesh."""

    def step(q, t, off, qlen, tlen):
        tb = jnp.broadcast_to(t, (q.shape[0],) + t.shape)
        tl = jnp.broadcast_to(tlen, (q.shape[0],))
        gscore, best = dp.banded_dp_scores(
            q, tb, off, qlen, tl, width=width, mode=mode,
            params_tuple=params_tuple)
        # per-base coverage proxy: each read covers [off[0], off[-1]+width)
        starts = off[:, 0]
        ends = jnp.minimum(off[:, -1] + width, tlen)
        pos = jnp.arange(cov_bins, dtype=jnp.int32)[None, :]
        covered = ((pos >= starts[:, None]) & (pos < ends[:, None])
                   & (gscore[:, None] > dp.NEG_INF // 2))
        coverage = jnp.sum(covered.astype(jnp.int32), axis=0)
        return gscore, best, coverage

    batch_sh = NamedSharding(mesh, P(READS_AXIS))
    repl_sh = NamedSharding(mesh, P())
    jitted = jax.jit(
        step,
        in_shardings=(batch_sh, repl_sh, batch_sh, batch_sh, repl_sh),
        out_shardings=(batch_sh, batch_sh, repl_sh),
    )
    return jitted


def make_locus_depth_step(mesh: Mesh, width: int, params_tuple):
    """Batched per-locus depth reduction sharded over the "loci" axis:
       (reads (L, R, Lq) int8, contigs (L, Lt) int8, off (L, R, Lq+1),
        qlen (L, R), tlen (L,)) -> (scores (L, R), depth (L, Lt))
    The locus batch is sharded over "loci"; each locus' read pile stays
    together (post all-to-all layout)."""

    def step(reads, contigs, off, qlen, tlen):
        L, R, Lq = reads.shape

        def per_locus(rq, ct, roff, rql, ctl):
            tb = jnp.broadcast_to(ct, (R,) + ct.shape)
            tl = jnp.broadcast_to(ctl, (R,))
            gscore, best = dp.banded_dp_scores(
                rq, tb, roff, rql, tl, width=width, mode=dp.EXTEND,
                params_tuple=params_tuple)
            pos = jnp.arange(ct.shape[0], dtype=jnp.int32)[None, :]
            starts = roff[:, 0]
            ends = jnp.minimum(roff[:, -1] + width, ctl)
            covered = ((pos >= starts[:, None]) & (pos < ends[:, None])
                       & (best[:, None] > 0))
            return gscore, jnp.sum(covered.astype(jnp.int32), axis=0)

        return jax.vmap(per_locus)(reads, contigs, off, qlen, tlen)

    loci_sh = NamedSharding(mesh, P(LOCI_AXIS))
    jitted = jax.jit(
        step,
        in_shardings=(loci_sh, loci_sh, loci_sh, loci_sh, loci_sh),
        out_shardings=(loci_sh, loci_sh),
    )
    return jitted
