"""Graph partitioners for multi-chip execution.

Round-1 tier: contiguous 1D node partition (nodes already carry
community locality in most of these datasets after ingest; CPF graphs
arrive CC-ordered). Edge ownership follows the destination node, so a
shard computes the full aggregation for its node range and only the
*gather* of remote source features crosses shards.

Later tiers: degree-balanced and METIS-lite edge-cut partitioners,
plus the precomputed halo send/recv index sets (SURVEY.md §7.6).
"""

from __future__ import annotations

import numpy as np


def contiguous_partition(n_nodes: int, n_shards: int) -> np.ndarray:
    """Shard boundaries: node v belongs to shard bisect(bounds, v).
    Returns bounds array of length n_shards+1."""
    base = n_nodes // n_shards
    rem = n_nodes % n_shards
    sizes = np.full(n_shards, base, np.int64)
    sizes[:rem] += 1
    bounds = np.zeros(n_shards + 1, np.int64)
    np.cumsum(sizes, out=bounds[1:])
    return bounds


def edge_cut_fraction(src: np.ndarray, dst: np.ndarray,
                      bounds: np.ndarray) -> float:
    """Fraction of edges whose endpoints live on different shards —
    the halo traffic proxy used by the partition benchmarks."""
    shard_of = np.searchsorted(bounds, np.arange(bounds[-1]), side="right") - 1
    return float((shard_of[src] != shard_of[dst]).mean())


def degree_balanced_order(in_degrees: np.ndarray, n_shards: int
                          ) -> np.ndarray:
    """Node relabeling for edge-balanced equal-size shards.

    TPU row sharding splits the (padded) node axis into EQUAL blocks,
    so balancing cannot move the boundaries — instead it permutes node
    ids: greedy LPT assignment (heaviest in-degree first, least-loaded
    shard with free capacity) packs ~E/P dst-edges into each block.

    Returns `order`: old node ids in their new order (shard 0's nodes
    first). Relabel a graph with `new_id = inverse_permutation(order)`;
    `new_id[v]` is v's new id.
    """
    import heapq

    deg = np.asarray(in_degrees, np.int64)
    n = deg.shape[0]
    cap = -(-n // n_shards)
    by_deg = np.argsort(-deg, kind="stable")
    buckets: list[list[int]] = [[] for _ in range(n_shards)]
    heap = [(0, p) for p in range(n_shards)]
    heapq.heapify(heap)
    # total capacity P*cap >= n, so the heap never empties before every
    # node is assigned; full buckets simply stop being pushed back
    for v in by_deg:
        load, p = heapq.heappop(heap)
        buckets[p].append(v)
        if len(buckets[p]) < cap:
            heapq.heappush(heap, (load + int(deg[v]), p))
    return np.concatenate([np.asarray(b, np.int64) for b in buckets])


def inverse_permutation(order: np.ndarray) -> np.ndarray:
    inv = np.empty_like(np.asarray(order, np.int64))
    inv[order] = np.arange(len(order))
    return inv


def chunked_balanced_order(locality_order: np.ndarray,
                           in_degrees: np.ndarray, n_shards: int,
                           chunks_per_shard: int = 64) -> np.ndarray:
    """Compose locality with load balance: keep a locality-preserving
    ordering (RCM / BFS / community) in contiguous CHUNKS and
    LPT-assign whole chunks to shards by in-degree weight.

    A global LPT permutation (`degree_balanced_order`) balances
    per-shard edge load but scatters neighborhoods across shards —
    measured halo fractions 0.50/0.75/0.87 at P=2/4/8 even on
    clustered graphs. Chunk-granular LPT keeps ~`1/chunks_per_shard`
    of the locality order contiguous per move, so edge cut stays near
    the locality ordering's while worst-shard load drops to chunk
    granularity.

    Returns `order`: old node ids in their new id order (shard 0's
    nodes first). Relabel with `inverse_permutation(order)`.
    """
    import heapq

    order = np.asarray(locality_order, np.int64)
    deg = np.asarray(in_degrees, np.int64)
    n = order.shape[0]
    n_chunks = n_shards * chunks_per_shard
    bnd = np.linspace(0, n, n_chunks + 1).astype(np.int64)
    chunks = [order[bnd[i]:bnd[i + 1]] for i in range(n_chunks)]
    weights = np.array([int(deg[c].sum()) for c in chunks], np.int64)

    by_w = np.argsort(-weights, kind="stable")
    buckets: list[list[int]] = [[] for _ in range(n_shards)]
    heap = [(0, p) for p in range(n_shards)]
    heapq.heapify(heap)
    for ci in by_w:
        load, p = heapq.heappop(heap)
        buckets[p].append(int(ci))
        if len(buckets[p]) < chunks_per_shard:
            heapq.heappush(heap, (load + int(weights[ci]), p))
    # keep chunks in locality order inside each shard
    return np.concatenate(
        [np.concatenate([chunks[ci] for ci in sorted(b)]) if b
         else np.empty(0, np.int64) for b in buckets])


def shard_edge_balance(dst: np.ndarray, n_nodes: int,
                       n_shards: int) -> float:
    """max/mean in-edge load across equal node blocks (1.0 = perfect)."""
    rows = -(-n_nodes // n_shards)
    loads = np.bincount(np.asarray(dst, np.int64) // rows,
                        minlength=n_shards)
    return float(loads.max() / max(loads.mean(), 1e-9))
