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
