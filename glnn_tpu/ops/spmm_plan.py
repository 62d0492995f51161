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
    meta_fields=["tile", "block_rows", "num_blocks", "num_tiles", "e_orig",
                 "row0", "tiles_per_block"],
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
    # first output row this plan covers (chunked plans partition the
    # dst-block range; single plans have row0 == 0)
    row0: int = 0
    # block-mode marker: when set, every block owns exactly this many
    # consecutive tiles (ghost-padded), and the kernel runs ONE grid
    # step per (f_block, block) with no output revisiting — measured
    # ~0.55us of fixed per-step cost makes the tiled kernel's ~5000
    # steps the bottleneck (tools/probe_overlap.py r3)
    tiles_per_block: int | None = None


def plan_to_device(plan: SpmmPlan) -> SpmmPlan:
    """Move a host-built plan's arrays onto the device (one shot)."""
    return dataclasses.replace(
        plan, src_idx=jnp.asarray(plan.src_idx),
        edge_perm=jnp.asarray(plan.edge_perm),
        rec_local=jnp.asarray(plan.rec_local),
        block_id=jnp.asarray(plan.block_id))


def build_spmm_plan(receivers: np.ndarray, senders: np.ndarray,
                    n_nodes: int, tile: int = 512,
                    block_rows: int = 512,
                    n_src: int | None = None,
                    device: bool = True) -> SpmmPlan:
    """Plan over dst-sorted (receivers, senders) of real edges only.

    `n_src` (default n_nodes) sets the ghost source-row id for
    rectangular reductions (sharded halo aggregation, where senders
    index a recv buffer and receivers index local rows).

    Defaults (tile=512, block_rows=512) won the round-2 v5e sweep
    (tools/sweep_spmm.py; see PERF.md): the pipeline is bound by the
    HBM random-row gather, which on v5e is ROW-RATE-limited
    (~240M rows/s regardless of row bytes up to ~512B), so padded
    slots (extra gathered rows) dominate the tradeoff — expected pad
    fraction is ~tile/(2*block_rows*avg_deg). block_rows adds MXU
    flops (2*block_rows*F per slot), cheap until ~512; halving the
    tile to 512 cut arxiv-scale padding 6.7%->3.3% and the reduce
    kernel 7.9->6.8 ms with no measurable per-grid-step penalty.
    """
    rec = np.asarray(receivers, np.int64)
    snd = np.asarray(senders, np.int64)
    if n_src is None:
        n_src = n_nodes
    n_edges = rec.shape[0]
    if n_edges > 1 and (np.diff(rec) < 0).any():
        raise ValueError("receivers must be dst-sorted")

    num_blocks = max(1, -(-n_nodes // block_rows))

    # native single-pass builder (native/graphops.cpp) — required at
    # ogbn-products scale; the vectorized numpy path below is the
    # fallback and the parity oracle (tests/test_native.py)
    from glnn_tpu import native

    if native.available():
        arrays = native.spmm_plan_arrays(rec, snd, n_nodes, n_src, tile,
                                         block_rows)
        if arrays is not None:
            src_idx, edge_perm, rec_local, block_id = arrays
            plan = SpmmPlan(
                src_idx=src_idx,
                edge_perm=edge_perm,
                rec_local=rec_local,
                block_id=block_id,
                tile=tile,
                block_rows=block_rows,
                num_blocks=int(num_blocks),
                num_tiles=int(block_id.shape[0]),
                e_orig=int(n_edges),
            )
            return plan_to_device(plan) if device else plan
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

    src_idx = np.where(valid, snd[edge_idx_c], n_src).astype(np.int32)
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

    plan = SpmmPlan(
        src_idx=src_idx.reshape(-1),
        edge_perm=edge_perm.reshape(-1),
        rec_local=rec_local,
        block_id=tile_block.astype(np.int32),
        tile=tile,
        block_rows=block_rows,
        num_blocks=int(num_blocks),
        num_tiles=num_tiles,
        e_orig=int(n_edges),
    )
    return plan_to_device(plan) if device else plan


def build_block_plan(receivers: np.ndarray, senders: np.ndarray,
                     n_nodes: int, tile: int = 256,
                     block_rows: int = 256,
                     n_src: int | None = None,
                     device: bool = True) -> SpmmPlan | None:
    """Uniform tiles-per-block plan for the block-mode kernel: every
    dst block owns exactly T = max(ceil(edges_b / tile), 1) consecutive
    tiles (ghost slots pad the tail), so the kernel runs ONE grid step
    per block — no output revisiting and ~8-15x fewer grid steps than
    the tiled plan (whose ~0.55us/step fixed cost dominates the reduce,
    tools/probe_overlap.py).

    Returns None when block-mode would be wasteful or oversized —
    skewed degree distributions blow T up to the worst block's count:
      * padded slots > 1.3x the tiled plan's (each padded slot costs
        full gather price — measured ghost/real = 0.96), or
      * T*tile > 8192 slots (the ~4MB bf16 message block + double
        buffering must fit VMEM).
    Callers fall back to build_spmm_plan.
    """
    rec = np.asarray(receivers, np.int64)
    snd = np.asarray(senders, np.int64)
    if n_src is None:
        n_src = n_nodes
    n_edges = rec.shape[0]
    if n_edges == 0:
        # the numpy fill below fancy-indexes snd with clamped indices
        # before the valid mask applies — IndexError on an empty edge
        # list. The tiled builder handles E=0 (all-ghost plan); decline.
        return None
    if n_edges > 1 and (np.diff(rec) < 0).any():
        raise ValueError("receivers must be dst-sorted")
    num_blocks = max(1, -(-n_nodes // block_rows))

    starts = np.searchsorted(rec // block_rows, np.arange(num_blocks),
                             "left")
    ends = np.searchsorted(rec // block_rows, np.arange(num_blocks),
                           "right")
    counts = ends - starts
    tiles_b = np.maximum(-(-counts // tile), 1)
    t_max = int(tiles_b.max())
    if t_max * tile > 8192:
        return None
    slots_block = num_blocks * t_max * tile
    slots_tiled = int(tiles_b.sum()) * tile
    if slots_block > 1.3 * slots_tiled:
        return None

    # native single-pass fill (per-block stable sort by src) — the
    # numpy axis-1 argsort below costs ~40s at ogbn-products scale
    from glnn_tpu import native

    if native.available():
        arrays = native.spmm_block_plan_arrays(rec, snd, n_nodes, n_src,
                                               tile, block_rows)
        if arrays is not None:
            s_i, e_p, r_l, t_nat, nb = arrays
            assert t_nat == t_max and nb == num_blocks
            num_tiles = num_blocks * t_max
            plan = SpmmPlan(
                src_idx=s_i,
                edge_perm=e_p,
                rec_local=r_l.reshape(num_tiles, tile),
                block_id=np.repeat(
                    np.arange(num_blocks, dtype=np.int32), t_max),
                tile=tile,
                block_rows=block_rows,
                num_blocks=int(num_blocks),
                num_tiles=num_tiles,
                e_orig=int(n_edges),
                tiles_per_block=int(t_max),
            )
            return plan_to_device(plan) if device else plan

    x = t_max * tile
    slot = np.arange(x)
    edge_idx = starts[:, None] + slot[None, :]             # [B, X]
    valid = edge_idx < ends[:, None]
    edge_idx_c = np.minimum(edge_idx, n_edges - 1 if n_edges else 0)

    src_idx = np.where(valid, snd[edge_idx_c], n_src).astype(np.int32)
    edge_perm = np.where(valid, edge_idx_c, n_edges).astype(np.int32)
    rec_local = np.where(
        valid, rec[edge_idx_c] - np.arange(num_blocks)[:, None] * block_rows,
        block_rows).astype(np.int32)

    # one-hot reduction is slot-order-invariant within a STEP — i.e.
    # the whole block here — so sort the full block's slots by source
    # for gather locality (ghosts last)
    order = np.argsort(np.where(valid, src_idx, np.iinfo(np.int32).max),
                       axis=1, kind="stable")
    take = np.take_along_axis
    src_idx = take(src_idx, order, axis=1)
    edge_perm = take(edge_perm, order, axis=1)
    rec_local = take(rec_local, order, axis=1)

    num_tiles = num_blocks * t_max
    plan = SpmmPlan(
        src_idx=src_idx.reshape(-1),
        edge_perm=edge_perm.reshape(-1),
        rec_local=rec_local.reshape(num_tiles, tile),
        block_id=np.repeat(np.arange(num_blocks, dtype=np.int32), t_max),
        tile=tile,
        block_rows=block_rows,
        num_blocks=int(num_blocks),
        num_tiles=num_tiles,
        e_orig=int(n_edges),
        tiles_per_block=t_max,
    )
    return plan_to_device(plan) if device else plan


# Slot budget per chunk plan: bounds the materialized message tensor
# (slots x F_pad x 2B bf16). 4M slots = 2 GiB at F_pad=256 — safely
# inside v5e HBM next to products-scale features + activations.
MAX_SLOTS_PER_CHUNK = 4 * 1024 * 1024


def build_chunked_plans(receivers: np.ndarray, senders: np.ndarray,
                        n_nodes: int, tile: int = 512,
                        block_rows: int = 512, n_src: int | None = None,
                        max_slots: int = MAX_SLOTS_PER_CHUNK,
                        edge_base: int = 0, e_global: int | None = None,
                        device: bool = True, block_mode: bool = True,
                        block_mode_tile: int = 256,
                        block_mode_rows: int = 256):
    """Plan a dst-sorted edge list as one SpmmPlan, or — when the slot
    count exceeds `max_slots` — a TUPLE of chunk plans cut at dst-BLOCK
    boundaries (SURVEY.md §2.3 row 1 at ogbn-products scale, where the
    materialized E x F message tensor would blow past HBM).

    Chunks own disjoint, contiguous block ranges, so the caller simply
    concatenates chunk outputs — no scatter, no overlap accumulation.
    Each chunk's `rec_local`/`block_id` are chunk-relative and `row0`
    records its first global output row; `edge_perm` stays GLOBAL
    (ghost = e_global) so per-edge weight gathers work unchunked.
    A single block whose edges alone exceed the budget becomes its own
    oversized chunk (blocks are never split)."""
    rec = np.asarray(receivers, np.int64)
    snd = np.asarray(senders, np.int64)
    if e_global is None:
        e_global = int(rec.shape[0]) + edge_base
    counts = np.bincount(rec // block_rows,
                         minlength=-(-n_nodes // block_rows)).astype(np.int64)
    slots_per_block = np.maximum(-(-counts // tile), 1) * tile
    if slots_per_block.sum() <= max_slots:
        plan = None
        if block_mode:
            # prefer the block-mode geometry (one grid step per dst
            # block; (256, 256) won the r3 v5e sweep — 160.6M edges/s
            # bf16 / 192.6M int8 vs 140.9M tiled, tools/
            # probe_blockmode.py); build_block_plan declines on
            # skewed/oversized inputs and we fall back to the tiled
            # plan at the caller's geometry
            plan = build_block_plan(rec, snd, n_nodes,
                                    tile=block_mode_tile,
                                    block_rows=block_mode_rows,
                                    n_src=n_src, device=False)
        if plan is None:
            plan = build_spmm_plan(rec, snd, n_nodes, tile, block_rows,
                                   n_src=n_src, device=False)
        plan = _globalize_edge_perm(plan, edge_base, e_global)
        return plan_to_device(plan) if device else plan

    # greedy block packing into <= max_slots chunks
    chunks = []
    b0 = 0
    acc = 0
    num_blocks = slots_per_block.shape[0]
    block_edge_end = np.cumsum(counts)
    for b in range(num_blocks):
        if acc and acc + slots_per_block[b] > max_slots:
            chunks.append((b0, b))
            b0, acc = b, 0
        acc += slots_per_block[b]
    chunks.append((b0, num_blocks))

    plans = []
    for cb0, cb1 in chunks:
        e0 = int(block_edge_end[cb0 - 1]) if cb0 else 0
        e1 = int(block_edge_end[cb1 - 1])
        rows = (cb1 - cb0) * block_rows
        # ghost source id must stay the GLOBAL ghost row (n_src /
        # n_nodes), not default to the chunk-local row count — a
        # chunk-local default would make padding slots gather an
        # arbitrary real feature row (masked by the zero one-hot, but
        # 0 * non-finite = NaN through the MXU).
        sub = None
        if block_mode and rows % block_mode_rows == 0:
            sub = build_block_plan(rec[e0:e1] - cb0 * block_rows,
                                   snd[e0:e1], rows,
                                   tile=block_mode_tile,
                                   block_rows=block_mode_rows,
                                   n_src=(n_src if n_src is not None
                                          else n_nodes),
                                   device=False)
        if sub is None:
            sub = build_spmm_plan(rec[e0:e1] - cb0 * block_rows,
                                  snd[e0:e1], rows, tile, block_rows,
                                  n_src=(n_src if n_src is not None
                                         else n_nodes),
                                  device=False)
        sub = _globalize_edge_perm(sub, edge_base + e0, e_global)
        sub = dataclasses.replace(sub, row0=cb0 * block_rows)
        plans.append(plan_to_device(sub) if device else sub)
    return tuple(plans)


def _globalize_edge_perm(plan: SpmmPlan, edge_base: int,
                         e_global: int) -> SpmmPlan:
    """Rebase a HOST plan's local edge ids into the global edge space
    (ghost slots -> e_global). numpy in, numpy out — never touch
    device arrays here (a device->host fetch through the relay costs
    minutes at products scale)."""
    if edge_base == 0 and e_global == plan.e_orig:
        return plan
    perm = plan.edge_perm
    out = np.where(perm < plan.e_orig, perm + edge_base,
                   e_global).astype(np.int32)
    return dataclasses.replace(plan, edge_perm=out, e_orig=int(e_global))


def plan_slots(plan) -> int:
    """Total gather slots of a plan or chunk tuple."""
    if isinstance(plan, tuple):
        return sum(p.num_tiles * p.tile for p in plan)
    return plan.num_tiles * plan.tile


def pad_plan_tiles(plan: SpmmPlan, num_tiles: int, n_src: int) -> SpmmPlan:
    """Append ghost tiles so per-shard plans stack uniformly. Ghost
    tiles keep block_id nondecreasing (repeat the last block), match
    no one-hot row (rec_local = block_rows) and gather the ghost
    source row — exact zero contributions."""
    extra = num_tiles - plan.num_tiles
    if extra <= 0:
        return plan
    t = plan.tile
    src_idx = jnp.concatenate(
        [plan.src_idx, jnp.full((extra * t,), n_src, jnp.int32)])
    edge_perm = jnp.concatenate(
        [plan.edge_perm, jnp.full((extra * t,), plan.e_orig, jnp.int32)])
    rec_local = jnp.concatenate(
        [plan.rec_local,
         jnp.full((extra, t), plan.block_rows, jnp.int32)], axis=0)
    last = plan.block_id[-1] if plan.num_tiles else jnp.int32(0)
    block_id = jnp.concatenate(
        [plan.block_id, jnp.full((extra,), last, jnp.int32)])
    return dataclasses.replace(plan, src_idx=src_idx, edge_perm=edge_perm,
                               rec_local=rec_local, block_id=block_id,
                               num_tiles=num_tiles)


def stack_plans(plans: list[SpmmPlan], n_src: int) -> SpmmPlan:
    """Stack per-shard plans on a leading shard axis (data fields get
    shape [P, ...]); tiles are ghost-padded to the max shard count and
    e_orig is unified to the max (only the ghost edge_perm value)."""
    nt = max(p.num_tiles for p in plans)
    eo = max(p.e_orig for p in plans)
    padded = [dataclasses.replace(pad_plan_tiles(p, nt, n_src), e_orig=eo)
              for p in plans]
    return SpmmPlan(
        src_idx=jnp.stack([p.src_idx for p in padded]),
        edge_perm=jnp.stack([p.edge_perm for p in padded]),
        rec_local=jnp.stack([p.rec_local for p in padded]),
        block_id=jnp.stack([p.block_id for p in padded]),
        tile=padded[0].tile,
        block_rows=padded[0].block_rows,
        num_blocks=padded[0].num_blocks,
        num_tiles=nt,
        e_orig=eo,
    )


def shard_slice_plan(plan: SpmmPlan) -> SpmmPlan:
    """Inside shard_map: drop the [1, ...] leading axis a P(axis)
    in_spec leaves on each data field."""
    return dataclasses.replace(
        plan, src_idx=plan.src_idx[0], edge_perm=plan.edge_perm[0],
        rec_local=plan.rec_local[0], block_id=plan.block_id[0])


def plan_pair_for_edges(senders: np.ndarray, receivers: np.ndarray,
                        n_dst: int, n_src: int, n_out: int | None = None,
                        tile: int = 512, block_rows: int = 512):
    """(forward, backward) plans for a rectangular edge set: forward
    reduces over dst (output n_dst rows, sources index an n_src-row
    matrix); backward reduces over src (for d_src = A^T d_out).

    `n_out` is the row count callers slice the forward output to
    (default n_dst); it sets the backward plan's ghost source id so
    ghost slots hit the cotangent's appended zero row exactly."""
    if n_out is None:
        n_out = n_dst
    snd = np.asarray(senders, np.int64)
    rec = np.asarray(receivers, np.int64)
    order_f = np.argsort(rec, kind="stable")
    fwd = build_spmm_plan(rec[order_f], snd[order_f], n_dst, tile,
                          block_rows, n_src=n_src)
    order_b = np.argsort(snd, kind="stable")
    bwd = build_spmm_plan(snd[order_b], rec[order_b], n_src, tile,
                          block_rows, n_src=n_out)
    return fwd, bwd


def plan_for_graph(g, tile: int = 512, block_rows: int = 512,
                   max_slots: int = MAX_SLOTS_PER_CHUNK,
                   device: bool = True):
    """(forward, backward) plans for a Graph container. Forward reduces
    over dst; backward reduces over src (for dX = A^T dH), with
    edge_perm composed back into the original dst-sorted edge order.

    Reads the host edge cache build_graph stashes on the container when
    present — np.asarray on the device arrays would round-trip the
    edge list device->host, which through the axon relay costs minutes
    (the whole of round 1's 356s bench setup)."""
    host = getattr(g, "_host_edges", None)
    if host is not None:
        send, recv = host
    else:
        recv = np.asarray(g.receivers)[: g.n_edges]
        send = np.asarray(g.senders)[: g.n_edges]

    fwd = build_chunked_plans(recv, send, g.n_nodes, tile, block_rows,
                              max_slots=max_slots, device=False)

    order = np.argsort(send, kind="stable").astype(np.int64)
    bwd = build_chunked_plans(send[order], recv[order], g.n_nodes, tile,
                              block_rows, max_slots=max_slots,
                              device=False)

    def compose(p):
        # map bwd slot edge ids (positions in the src-sorted order)
        # back to ORIGINAL dst-sorted edge ids, so per-edge weight
        # gathers share one edge numbering across both directions.
        # Host arrays only (see _globalize_edge_perm).
        perm = p.edge_perm
        real = perm < g.n_edges
        composed = np.full_like(perm, g.n_edges)
        composed[real] = order[perm[real]]
        return dataclasses.replace(p, edge_perm=composed.astype(np.int32))

    def ship(p):
        if not device:
            return p
        return (tuple(plan_to_device(q) for q in p)
                if isinstance(p, tuple) else plan_to_device(p))

    bwd = (tuple(compose(p) for p in bwd) if isinstance(bwd, tuple)
           else compose(bwd))
    return ship(fwd), ship(bwd)
