"""Host-side plan for the Pallas segment-softmax (GAT attention).

The GAT attention path (reference: dgl edge_softmax inside GATConv,
/root/reference/models.py:227-266) needs per-destination max and sum
reductions over each node's in-edge segment. The SpMM plan
(ops/spmm_plan.py) sorts slots by SOURCE for gather locality, which
destroys the segment contiguity a scan-based max needs — so the
softmax gets its own plan over the same (tile, block_rows) geometry
with slots in NATURAL dst-sorted edge order:

  edge_perm [T*tile]        score row per slot (ghost -> e_orig)
  rec_lane  [T, tile]       dst offset in block, lane-major layout
                            (feeds the one-hot sum kernel = the
                            existing segment_reduce)
  rec_sub   [T*tile, 1]     same values, sublane-major layout (feeds
                            the in-kernel segmented max scan rolls)
  last_sel  [T, tile]       rec value ONLY on each segment's last slot
                            within the tile, block_rows elsewhere —
                            the extraction one-hot for segment maxes
  block_id  [T]             output block per tile (nondecreasing)
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from glnn_tpu.ops.spmm_plan import SpmmPlan


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["edge_perm", "rec_lane", "rec_sub", "last_sel",
                 "block_id"],
    meta_fields=["tile", "block_rows", "num_blocks", "num_tiles",
                 "e_orig"],
)
@dataclasses.dataclass(frozen=True)
class SoftmaxPlan:
    edge_perm: jax.Array
    rec_lane: jax.Array
    rec_sub: jax.Array
    last_sel: jax.Array
    block_id: jax.Array
    tile: int
    block_rows: int
    num_blocks: int
    num_tiles: int
    e_orig: int

    def as_spmm_plan(self) -> SpmmPlan:
        """View usable by segment_reduce (the exp-sum pass); src_idx
        is never consulted because callers gather messages via
        edge_perm themselves."""
        return SpmmPlan(
            src_idx=self.edge_perm, edge_perm=self.edge_perm,
            rec_local=self.rec_lane, block_id=self.block_id,
            tile=self.tile, block_rows=self.block_rows,
            num_blocks=self.num_blocks, num_tiles=self.num_tiles,
            e_orig=self.e_orig)


SOFTMAX_AUTO_MAX_EDGES = 16_000_000


def softmax_auto(n_edges: int) -> bool:
    """Auto policy for ``with_plans(softmax=None)``: build the
    segment-softmax plan whenever the graph is small enough that the
    plan's ~16E bytes of index arrays are negligible. Every GAT config
    in the reference runs on CPF/arxiv-scale graphs
    (/root/reference/train.conf.yaml GAT rows); products-scale graphs
    skip it unless explicitly requested."""
    return n_edges <= SOFTMAX_AUTO_MAX_EDGES


def build_softmax_plan(receivers: np.ndarray, n_nodes: int,
                       tile: int = 512,
                       block_rows: int = 512,
                       device: bool = True) -> SoftmaxPlan:
    """Plan the dst-sorted edge list for segment softmax. Pure numpy
    (GAT runs on the CPF-scale graphs; no native path needed)."""
    rec = np.asarray(receivers, np.int64)
    n_edges = rec.shape[0]
    if n_edges > 1 and (np.diff(rec) < 0).any():
        raise ValueError("receivers must be dst-sorted")
    num_blocks = max(1, -(-n_nodes // block_rows))

    starts = np.searchsorted(rec // block_rows, np.arange(num_blocks),
                             "left")
    ends = np.searchsorted(rec // block_rows, np.arange(num_blocks),
                           "right")
    counts = ends - starts
    tiles_per_block = np.maximum(-(-counts // tile), 1)
    num_tiles = int(tiles_per_block.sum())

    tile_block = np.repeat(np.arange(num_blocks), tiles_per_block)
    tile_k = np.arange(num_tiles) - np.repeat(
        np.cumsum(tiles_per_block) - tiles_per_block, tiles_per_block)

    slot = np.arange(tile)
    edge_idx = (starts[tile_block, None] + tile_k[:, None] * tile
                + slot[None, :])
    valid = edge_idx < ends[tile_block, None]
    edge_idx_c = np.minimum(edge_idx, n_edges - 1 if n_edges else 0)

    edge_perm = np.where(valid, edge_idx_c, n_edges).astype(np.int32)
    rec_local = np.where(
        valid, rec[edge_idx_c] - tile_block[:, None] * block_rows,
        block_rows).astype(np.int32)

    # segment-last slots within each tile: rec changes at the next
    # slot (or the slot is the tile's last). Ghost runs select the
    # block_rows sentinel, which matches no one-hot output row.
    nxt = np.concatenate(
        [rec_local[:, 1:], np.full((num_tiles, 1), -1, np.int32)], axis=1)
    is_last = rec_local != nxt
    last_sel = np.where(is_last & valid, rec_local,
                        block_rows).astype(np.int32)

    arr = jnp.asarray if device else np.ascontiguousarray
    return SoftmaxPlan(
        edge_perm=arr(edge_perm.reshape(-1)),
        rec_lane=arr(rec_local),
        rec_sub=arr(rec_local.reshape(-1, 1)),
        last_sel=arr(last_sel),
        block_id=arr(tile_block.astype(np.int32)),
        tile=tile,
        block_rows=block_rows,
        num_blocks=int(num_blocks),
        num_tiles=num_tiles,
        e_orig=int(n_edges),
    )
