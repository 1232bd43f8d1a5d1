"""Locus redistribution: the pipeline's all-to-all.

After data-parallel SV detection, candidate loci are discovered on the shards
that hold their supporting reads; batched per-locus work (assembly, AF
realignment) wants each locus' reads co-located.  This module implements the
ragged all-to-all (SURVEY.md §2c): every (locus, read) pair is routed to the
locus' owner shard `locus_id % n_shards`, with bounded padding.

Device path: fixed-capacity send buffers per (src, dst) shard pair moved
with jax.lax.all_to_all under shard_map over the "reads" axis — the
collective rides ICI/DCN.  A numpy reference implementation provides the
test oracle and the single-host fallback.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from telr_tpu.dist.mesh import READS_AXIS


def owner_of(locus_id: int, n_shards: int) -> int:
    return locus_id % n_shards


def redistribute_host(
    pairs_per_shard: Sequence[Sequence[Tuple[int, int]]],
    n_shards: int,
) -> List[List[Tuple[int, int]]]:
    """Reference: route (locus_id, read_id) pairs to owner shards."""
    out: List[List[Tuple[int, int]]] = [[] for _ in range(n_shards)]
    for shard_pairs in pairs_per_shard:
        for locus_id, read_id in shard_pairs:
            out[owner_of(locus_id, n_shards)].append((locus_id, read_id))
    for lst in out:
        lst.sort()
    return out


def make_redistribute_step(mesh: Mesh, capacity: int):
    """Build a jitted all-to-all step over the "reads" axis.

    Input: pairs (S, S, capacity, 2) int32 where pairs[src, dst] holds the
    (locus_id, read_id) rows shard `src` sends to shard `dst`, padded with
    -1.  The array is sharded over dim 0 (each shard holds its send rows).
    Output: same shape sharded over dim 0, where row [dst, src] holds what
    `dst` RECEIVED from `src`.
    """
    n = mesh.shape[READS_AXIS]

    def step(pairs):
        # shard_map over the reads axis: each shard sees (1, S, cap, 2)
        def inner(block):
            # block: (1, S, cap, 2) — this shard's sends to every dst.
            # all_to_all splits dim 1 across shards and concats received
            # pieces on dim 0 -> (S, 1, cap, 2) ordered by source; swap back
            # so dim 1 indexes the source shard.
            recv = jax.lax.all_to_all(block, READS_AXIS, split_axis=1,
                                      concat_axis=0, tiled=False)
            return jnp.swapaxes(recv, 0, 1)
        from jax import shard_map
        return shard_map(
            inner, mesh=mesh,
            in_specs=P(READS_AXIS, None, None, None),
            out_specs=P(READS_AXIS, None, None, None))(pairs)

    batch_sh = NamedSharding(mesh, P(READS_AXIS))
    return jax.jit(step, in_shardings=batch_sh, out_shardings=batch_sh)


def pack_sends(pairs_per_shard: Sequence[Sequence[Tuple[int, int]]],
               n_shards: int, capacity: int) -> np.ndarray:
    """Host packing: (S, S, capacity, 2) send buffers padded with -1.
    Raises if any (src, dst) route exceeds capacity (callers size capacity
    from the max per-route count, or chunk the sends)."""
    out = np.full((n_shards, n_shards, capacity, 2), -1, dtype=np.int32)
    for src, shard_pairs in enumerate(pairs_per_shard):
        counts = np.zeros(n_shards, dtype=np.int64)
        for locus_id, read_id in shard_pairs:
            dst = owner_of(locus_id, n_shards)
            c = counts[dst]
            if c >= capacity:
                raise ValueError(
                    f"route {src}->{dst} exceeds capacity {capacity}")
            out[src, dst, c] = (locus_id, read_id)
            counts[dst] += 1
    return out


def unpack_received(received: np.ndarray) -> List[List[Tuple[int, int]]]:
    """(S, S, cap, 2) received buffers -> per-shard sorted pair lists."""
    n = received.shape[0]
    out: List[List[Tuple[int, int]]] = []
    for dst in range(n):
        rows = received[dst].reshape(-1, 2)
        rows = rows[rows[:, 0] >= 0]
        out.append(sorted(map(tuple, rows.tolist())))
    return out
