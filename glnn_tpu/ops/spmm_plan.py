"""Host-side execution plan for the Pallas MXU SpMM kernel.

The kernel (ops/spmm_pallas.py) computes H[v] = sum_{e: dst=v} M[e] by
turning each edge tile's segmented reduction into a dense matmul:
``OneHot(dst_local)^T @ M_tile`` on the MXU — the TPU-native form of
the GSpMM the reference delegates to DGL's CUDA kernels (SURVEY.md
§2.3 row 1). That requires a static tiling where every edge tile
belongs to exactly one destination block of `block_rows` node rows.
This module computes that tiling once per graph on the host (fully
vectorized numpy; the C++ ingest library can take over later):

* edges (already dst-sorted in the Graph container) are grouped by
  dst block b = dst // block_rows;
* each block's edge list is padded to a multiple of the tile size
  (padding slots gather a zero ghost row and map to no one-hot row);
* per-slot gather indices (`src_idx`) point straight into the
  ghost-extended feature matrix, so the caller's message gather is a
  single `jnp.take`.

The same machinery plans the TRANSPOSED graph (edges sorted by src)
for the backward pass dX = A^T dH.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["src_idx", "edge_perm", "rec_local", "block_id"],
    meta_fields=["tile", "block_rows", "num_blocks", "num_tiles", "e_orig"],
)
@dataclasses.dataclass(frozen=True)
class SpmmPlan:
    """Static tiling plan.

    src_idx:   int32[num_tiles*tile]  row of the ghost-extended feature
               matrix to gather per slot (ghost row n_nodes on padding).
    edge_perm: int32[num_tiles*tile]  original (dst-sorted) edge index
               per slot, e_orig on padding — used to gather per-edge
               weights for the weighted SpMM.
    rec_local: int32[num_tiles, tile] dst offset within the tile's
               block, in [0, block_rows); block_rows on padding.
    block_id:  int32[num_tiles]       output block per tile
               (nondecreasing; drives output revisiting/accumulation).
    """

    src_idx: jax.Array
    edge_perm: jax.Array
    rec_local: jax.Array
    block_id: jax.Array
    tile: int
    block_rows: int
    num_blocks: int
    num_tiles: int
    e_orig: int


def build_spmm_plan(receivers: np.ndarray, senders: np.ndarray,
                    n_nodes: int, tile: int = 1024,
                    block_rows: int = 512) -> SpmmPlan:
    """Plan over dst-sorted (receivers, senders) of real edges only.

    Defaults (tile=1024, block_rows=512) won a v5e sweep
    (tools/sweep_spmm.py): the pipeline is gather-bound, so padded
    slots (which inflate gathered bytes) dominate the tradeoff —
    expected pad fraction is ~tile/(2*block_rows*avg_deg) — while
    block_rows only adds MXU flops (2*block_rows*F per slot), cheap
    until ~512. Smaller tiles cut padding but add per-grid-step
    overhead (~1us/step).
    """
    rec = np.asarray(receivers, np.int64)
    snd = np.asarray(senders, np.int64)
    n_edges = rec.shape[0]
    if n_edges > 1 and (np.diff(rec) < 0).any():
        raise ValueError("receivers must be dst-sorted")

    num_blocks = max(1, -(-n_nodes // block_rows))
    starts = np.searchsorted(rec // block_rows, np.arange(num_blocks), "left")
    ends = np.searchsorted(rec // block_rows, np.arange(num_blocks), "right")
    counts = ends - starts
    # every block gets >= 1 tile so its output rows are initialized
    tiles_per_block = np.maximum(-(-counts // tile), 1)
    num_tiles = int(tiles_per_block.sum())

    tile_block = np.repeat(np.arange(num_blocks), tiles_per_block)
    first_tile_of_block = np.zeros(num_tiles, bool)
    first_tile_of_block[np.cumsum(tiles_per_block) - tiles_per_block] = True
    tile_k = np.arange(num_tiles) - np.repeat(
        np.cumsum(tiles_per_block) - tiles_per_block, tiles_per_block
    )

    slot = np.arange(tile)
    edge_idx = (starts[tile_block, None] + tile_k[:, None] * tile + slot[None, :])
    valid = edge_idx < ends[tile_block, None]
    edge_idx_c = np.minimum(edge_idx, n_edges - 1 if n_edges else 0)

    src_idx = np.where(valid, snd[edge_idx_c], n_nodes).astype(np.int32)
    edge_perm = np.where(valid, edge_idx_c, n_edges).astype(np.int32)
    rec_local = np.where(
        valid, rec[edge_idx_c] - tile_block[:, None] * block_rows, block_rows
    ).astype(np.int32)

    # The one-hot reduction is invariant to slot order within a tile,
    # so sort slots by source row: the message gather then touches
    # HBM in (nearly) ascending address order — a large win on graphs
    # with locality-preserving node orderings (padding sorts last).
    order = np.argsort(np.where(valid, src_idx, np.iinfo(np.int32).max),
                       axis=1, kind="stable")
    take = np.take_along_axis
    src_idx = take(src_idx, order, axis=1)
    edge_perm = take(edge_perm, order, axis=1)
    rec_local = take(rec_local, order, axis=1)

    return SpmmPlan(
        src_idx=jnp.asarray(src_idx.reshape(-1)),
        edge_perm=jnp.asarray(edge_perm.reshape(-1)),
        rec_local=jnp.asarray(rec_local),
        block_id=jnp.asarray(tile_block.astype(np.int32)),
        tile=tile,
        block_rows=block_rows,
        num_blocks=int(num_blocks),
        num_tiles=num_tiles,
        e_orig=int(n_edges),
    )


def plan_for_graph(g, tile: int = 1024, block_rows: int = 512):
    """(forward, backward) plans for a Graph container. Forward reduces
    over dst; backward reduces over src (for dX = A^T dH), with
    edge_perm composed back into the original dst-sorted edge order."""
    recv = np.asarray(g.receivers)[: g.n_edges]
    send = np.asarray(g.senders)[: g.n_edges]

    fwd = build_spmm_plan(recv, send, g.n_nodes, tile, block_rows)

    order = np.argsort(send, kind="stable").astype(np.int64)
    bwd = build_spmm_plan(send[order], recv[order], g.n_nodes, tile,
                          block_rows)
    perm = np.asarray(bwd.edge_perm)
    real = perm < g.n_edges
    composed = np.full_like(perm, g.n_edges)
    composed[real] = order[perm[real]]
    bwd = dataclasses.replace(bwd,
                              edge_perm=jnp.asarray(composed.astype(np.int32)))
    return fwd, bwd
