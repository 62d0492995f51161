"""Halo-exchange sharded SpMM over a device mesh.

The graph analog of tensor/sequence parallelism (SURVEY.md §2.4): nodes
are partitioned into P contiguous shards (row-sharded features), every
edge is OWNED BY ITS DESTINATION's shard, and aggregation runs
shard-locally after exchanging the boundary ("halo") source rows:

    partial_local = segsum(x_local[local_src], local_dst)   # no comm
    recv          = all_to_all(x_local[send_idx])           # ICI
    partial_halo  = segsum(recv[halo_gather], halo_dst)
    out_local     = partial_local + partial_halo

`partial_local` is independent of the collective, so XLA overlaps the
exchange with local compute. Because each destination's in-edges are
all local to its owner, per-dst reductions (including GAT's
edge-softmax, later) never cross shards.

All index sets are precomputed on the host into equal-size per-shard
arrays (ghost padding), stacked on a leading P axis and sharded with
shard_map; the op is differentiable end-to-end (all_to_all and the
segment ops have exact transposes), so a regular jitted training step
can use it as an inner SPMD island.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["local_src", "local_dst", "halo_gather", "halo_dst",
                 "send_idx", "in_degrees", "out_degrees", "plans",
                 "att", "att_maps"],
    meta_fields=["n_nodes", "n_shards", "rows_per_shard", "e_local",
                 "e_halo", "halo_rows", "axis", "mesh"],
)
@dataclasses.dataclass(frozen=True)
class HaloGraph:
    """Sharded graph: per-shard index arrays (leading axis = shard).

    local_src:  int32[P, E_loc]  shard-local src row (ghost = rows).
    local_dst:  int32[P, E_loc]  shard-local dst row (ghost = rows).
    halo_gather:int32[P, E_halo] row into the flattened recv buffer
                                 (ghost = P*H).
    halo_dst:   int32[P, E_halo] shard-local dst row (ghost = rows).
    send_idx:   int32[P, P, H]   rows of MY block to send to shard q
                                 (ghost = rows -> zero row).
    in_degrees / out_degrees: float32[n_pad] flat degree vectors, so
                                 the flax layers' row-aligned math works
                                 unchanged on sharded features.
    """

    local_src: jax.Array
    local_dst: jax.Array
    halo_gather: jax.Array
    halo_dst: jax.Array
    send_idx: jax.Array
    in_degrees: jax.Array
    out_degrees: jax.Array
    # optional Pallas tier: (local_fwd, local_bwd, halo_fwd, halo_bwd)
    # SpmmPlans whose data fields are stacked on a leading shard axis
    # (build_halo_graph(build_plans=True)); None -> XLA segment sums.
    # Also duck-types the single-device Graph surface the layers touch.
    plans: tuple | None
    # optional stacked per-shard AttentionPlan over each shard's
    # COMBINED (local + halo) dst-sorted edges, sources indexing
    # [local rows; recv buffer] — drives the fused slot-space GAT
    # attention per shard (build_halo_graph(attention_plans=True))
    att: object | None
    # with `att`: (slot_edge_sl int32[P, slots], edge_slot_sl
    # int32[P, Et]) mapping each shard's SHARD-LAYOUT per-edge tensors
    # ([local e_local; halo e_halo], ghosts included) to/from the
    # attention plan's slot space (ghost edge -> slots, ghost slot ->
    # Et). Drives the r5 planned tiers of halo_edge_softmax /
    # halo_u_mul_e_sum (which used to drop to XLA segment ops inside
    # shard_map — VERDICT r4 weak #5).
    att_maps: tuple | None
    n_nodes: int
    n_shards: int
    rows_per_shard: int
    e_local: int
    e_halo: int
    halo_rows: int
    axis: str
    mesh: Mesh

    @property
    def n_pad(self) -> int:
        return self.n_shards * self.rows_per_shard

    @property
    def e_pad(self) -> int:
        """Total per-edge slot count in shard layout (local + halo per
        shard, stacked) — the shape contract for per-edge tensors
        (attention scores, APPNP dropout masks)."""
        return self.n_shards * (self.e_local + self.e_halo)


def build_halo_graph(src: np.ndarray, dst: np.ndarray, n_nodes: int,
                     mesh: Mesh, axis: str = "graph",
                     build_plans: bool = False, plan_tile: int = 512,
                     plan_block_rows: int = 512,
                     attention_plans: bool = False) -> HaloGraph:
    """Fully vectorized index-set construction (no O(P^2) Python
    loops / per-pair np.unique — one lexicographic unique over the
    halo edges does all the send-set bookkeeping; ~seconds at
    ogbn-products scale, see bench/scaling.py --time_build)."""
    n_shards = mesh.shape[axis]
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    rows = -(-n_nodes // n_shards)
    shard_src = src // rows
    shard_dst = dst // rows

    is_local = shard_src == shard_dst

    # ---- shard-local edges: bucket by owning (dst) shard ----
    lidx = np.nonzero(is_local)[0]
    lp = shard_dst[lidx]
    lorder = np.argsort(lp, kind="stable")
    lidx, lp = lidx[lorder], lp[lorder]
    loc_counts = np.bincount(lp, minlength=n_shards)
    e_loc = int(max(loc_counts.max(initial=0), 1))
    lstart = np.concatenate([[0], np.cumsum(loc_counts)])
    lpos = np.arange(len(lidx)) - lstart[lp]

    local_src = np.full((n_shards, e_loc), rows, np.int32)
    local_dst = np.full((n_shards, e_loc), rows, np.int32)
    local_src[lp, lpos] = src[lidx] - lp * rows
    local_dst[lp, lpos] = dst[lidx] - lp * rows

    # ---- halo edges: send sets = unique (src_shard q, dst_shard p,
    # src row) triples, encoded into one int64 key so a single sort
    # yields every per-(q,p) sorted-unique send list and each edge's
    # rank within it ----
    hidx = np.nonzero(~is_local)[0]
    hp = shard_dst[hidx]
    hq = shard_src[hidx]
    hs = src[hidx]
    key = (hq * n_shards + hp) * n_nodes + hs
    uk, inv = np.unique(key, return_inverse=True)
    g_of = uk // n_nodes                       # q * P + p per unique row
    counts_g = np.bincount(g_of, minlength=n_shards * n_shards)
    h_max = int(max(counts_g.max(initial=0), 1))
    gstart = np.concatenate([[0], np.cumsum(counts_g)])
    rank_uk = np.arange(len(uk)) - gstart[g_of]
    uk_src = uk % n_nodes

    send_idx = np.full((n_shards, n_shards, h_max), rows, np.int32)
    uq = g_of // n_shards
    send_idx[uq, g_of % n_shards, rank_uk] = uk_src - uq * rows

    # recv buffer layout on shard p: [q*H + rank] = send list entry
    gidx_per_edge = hq * h_max + rank_uk[inv]

    halo_counts = np.bincount(hp, minlength=n_shards)
    e_hal = int(max(halo_counts.max(initial=0), 1))
    horder = np.argsort(hp, kind="stable")
    hp_s = hp[horder]
    hstart = np.concatenate([[0], np.cumsum(halo_counts)])
    hpos = np.arange(len(hidx)) - hstart[hp_s]

    halo_gather = np.full((n_shards, e_hal), n_shards * h_max, np.int32)
    halo_dst = np.full((n_shards, e_hal), rows, np.int32)
    halo_gather[hp_s, hpos] = gidx_per_edge[horder]
    halo_dst[hp_s, hpos] = dst[hidx][horder] - hp_s * rows

    n_pad = n_shards * rows
    # bincount, not np.add.at: the ufunc.at path costs ~12 s per array
    # at 62M edges (measured r5), bincount ~1 s
    ind = np.bincount(dst, minlength=n_pad).astype(np.float32)
    outd = np.bincount(src, minlength=n_pad).astype(np.float32)

    plans = None
    if build_plans:
        from glnn_tpu.ops.spmm_plan import plan_pair_for_edges, stack_plans

        ph = n_shards * h_max
        lf, lb, hf, hb = [], [], [], []
        for p_i in range(n_shards):
            # pad slots (src = dst = rows) are real plan entries that
            # gather each matrix's ghost row -> exact zeros
            f, b = plan_pair_for_edges(local_src[p_i], local_dst[p_i],
                                       n_dst=rows + 1, n_src=rows,
                                       n_out=rows, tile=plan_tile,
                                       block_rows=plan_block_rows)
            lf.append(f)
            lb.append(b)
            f, b = plan_pair_for_edges(halo_gather[p_i], halo_dst[p_i],
                                       n_dst=rows + 1, n_src=ph,
                                       n_out=rows, tile=plan_tile,
                                       block_rows=plan_block_rows)
            hf.append(f)
            hb.append(b)
        plans = (stack_plans(lf, n_src=rows), stack_plans(lb, n_src=rows),
                 stack_plans(hf, n_src=ph), stack_plans(hb, n_src=rows))

    att, att_maps = None, None
    if attention_plans:
        built = _build_attention_plans(
            local_src, local_dst, loc_counts, halo_gather, halo_dst,
            halo_counts, rows, n_shards * h_max, e_loc, e_hal)
        if built is not None:
            att, att_maps = built

    return HaloGraph(
        plans=plans,
        att=att,
        att_maps=att_maps,
        local_src=jnp.asarray(local_src),
        local_dst=jnp.asarray(local_dst),
        halo_gather=jnp.asarray(halo_gather),
        halo_dst=jnp.asarray(halo_dst),
        send_idx=jnp.asarray(send_idx),
        in_degrees=jnp.asarray(ind),
        out_degrees=jnp.asarray(outd),
        n_nodes=int(n_nodes),
        n_shards=int(n_shards),
        rows_per_shard=int(rows),
        e_local=e_loc,
        e_halo=e_hal,
        halo_rows=h_max,
        axis=axis,
        mesh=mesh,
    )


def attach_attention_plans(hg: HaloGraph) -> HaloGraph:
    """Build the per-shard attention plans (+ shard-layout slot maps)
    for an EXISTING HaloGraph — avoids re-running the whole halo index
    construction when the graph was built without attention_plans.
    Returns hg unchanged when a shard declines (mega-hub skew)."""
    rows = hg.rows_per_shard
    local_src = np.asarray(hg.local_src)
    local_dst = np.asarray(hg.local_dst)
    halo_gather = np.asarray(hg.halo_gather)
    halo_dst = np.asarray(hg.halo_dst)
    loc_counts = (local_dst < rows).sum(axis=1)
    halo_counts = (halo_dst < rows).sum(axis=1)
    built = _build_attention_plans(
        local_src, local_dst, loc_counts, halo_gather, halo_dst,
        halo_counts, rows, hg.n_shards * hg.halo_rows, hg.e_local,
        hg.e_halo)
    if built is None:
        return hg
    att, att_maps = built
    return dataclasses.replace(hg, att=att, att_maps=att_maps)


def _shard_kernel(hg: HaloGraph, use_plans: bool):
    rows = hg.rows_per_shard
    ph = hg.n_shards * hg.halo_rows

    def f(x_blk, lsrc, ldst, hgat, hdst, sidx, *plan_args):
        x_blk = x_blk.reshape(rows, -1)
        lsrc, ldst = lsrc[0], ldst[0]
        hgat, hdst = hgat[0], hdst[0]
        sidx = sidx[0]
        fdim = x_blk.shape[1]
        x_ext = jnp.concatenate([x_blk, jnp.zeros((1, fdim), x_blk.dtype)])

        if use_plans:
            from glnn_tpu.ops.spmm_pallas import spmm_rect
            from glnn_tpu.ops.spmm_plan import shard_slice_plan

            lf, lb, hf, hb = [shard_slice_plan(pl) for pl in plan_args]
            # local partial (independent of the collective -> overlap)
            part_l = spmm_rect(lf, lb, x_blk, rows, rows)
        else:
            msgs_l = jnp.take(x_ext, lsrc, axis=0)
            part_l = jax.ops.segment_sum(
                msgs_l, ldst, num_segments=rows + 1,
                indices_are_sorted=False)[:rows]

        # exchange halo rows
        sbuf = jnp.take(x_ext, sidx.reshape(-1), axis=0).reshape(
            hg.n_shards, hg.halo_rows, fdim)
        recv = jax.lax.all_to_all(sbuf, hg.axis, split_axis=0,
                                  concat_axis=0, tiled=True)

        if use_plans:
            part_h = spmm_rect(hf, hb, recv.reshape(ph, fdim), rows, ph)
        else:
            recv_flat = jnp.concatenate(
                [recv.reshape(ph, fdim), jnp.zeros((1, fdim), x_blk.dtype)])
            msgs_h = jnp.take(recv_flat, hgat, axis=0)
            part_h = jax.ops.segment_sum(
                msgs_h, hdst, num_segments=rows + 1,
                indices_are_sorted=False)[:rows]
        return part_l + part_h

    return f


def halo_copy_u_sum(hg: HaloGraph, x: jax.Array) -> jax.Array:
    """x: [n_pad, F] row-sharded over mesh axis -> same shape/sharding.
    Rows >= n_nodes are ghosts and receive zero.

    When the graph carries per-shard plans
    (build_halo_graph(build_plans=True)) and the ops backend is not
    forced to "xla", both shard-local reductions run on the Pallas MXU
    kernel (spmm_rect, differentiable); otherwise XLA segment sums."""
    from glnn_tpu import ops as _ops

    ax = hg.axis
    spec_rows = P(ax, None)
    spec_shard = P(ax)
    use_plans = hg.plans is not None and _ops.get_backend() != "xla"
    f = _shard_kernel(hg, use_plans)
    args = (x, hg.local_src, hg.local_dst, hg.halo_gather, hg.halo_dst,
            hg.send_idx)
    specs = [spec_rows] + [spec_shard] * 5
    if use_plans:
        args = args + hg.plans
        specs = specs + [spec_shard] * 4     # pytree-prefix per SpmmPlan
        # pallas_call's out_shape carries no varying-mesh-axes info, so
        # the vma checker cannot see through it
        return shard_map(
            f, mesh=hg.mesh, in_specs=tuple(specs), out_specs=spec_rows,
            check_vma=False,
        )(*args)
    return shard_map(
        f, mesh=hg.mesh,
        in_specs=tuple(specs),
        out_specs=spec_rows,
    )(*args)


def shard_features(x: np.ndarray, hg: HaloGraph) -> jax.Array:
    """Pad node-feature rows to n_pad and place row-sharded."""
    n_pad = hg.n_pad
    x = np.asarray(x)
    if x.shape[0] < n_pad:
        x = np.concatenate(
            [x, np.zeros((n_pad - x.shape[0],) + x.shape[1:], x.dtype)])
    return jax.device_put(x, NamedSharding(hg.mesh, P(hg.axis, None)))


# --------------------------------------------------------------------
# Per-edge ops (GAT attention / APPNP edge weights) in shard layout
# --------------------------------------------------------------------
# Edge-slot order per shard: [local edges (e_local), halo edges
# (e_halo)]; ghost slots point at the segment `rows` and are dropped.
# Because every destination's in-edges are owned by its shard, the
# edge softmax is a purely shard-local segment softmax.

def _edge_dst(hg: HaloGraph):
    return jnp.concatenate([hg.local_dst, hg.halo_dst], axis=1)  # [P, Et]


def _gather_src_edges(hg: HaloGraph, x: jax.Array) -> jax.Array:
    """Per-edge source values in shard layout: [P*Et, ...]. x is
    row-sharded [n_pad, ...]; remote rows arrive via all_to_all."""
    rows = hg.rows_per_shard
    ph = hg.n_shards * hg.halo_rows

    def f(x_blk, lsrc, hgat, sidx):
        x_blk = x_blk[0]                     # [rows, ...]
        lsrc, hgat, sidx = lsrc[0], hgat[0], sidx[0]
        feat_shape = x_blk.shape[1:]
        zero = jnp.zeros((1,) + feat_shape, x_blk.dtype)
        x_ext = jnp.concatenate([x_blk, zero])
        local_vals = jnp.take(x_ext, lsrc, axis=0)

        sbuf = jnp.take(x_ext, sidx.reshape(-1), axis=0).reshape(
            (hg.n_shards, hg.halo_rows) + feat_shape)
        recv = jax.lax.all_to_all(sbuf, hg.axis, split_axis=0,
                                  concat_axis=0, tiled=True)
        recv_flat = jnp.concatenate(
            [recv.reshape((ph,) + feat_shape), zero])
        halo_vals = jnp.take(recv_flat, hgat, axis=0)
        return jnp.concatenate([local_vals, halo_vals], axis=0)[None]

    out = shard_map(
        f, mesh=hg.mesh,
        in_specs=(P(hg.axis), P(hg.axis), P(hg.axis), P(hg.axis)),
        out_specs=P(hg.axis),
    )(x.reshape((hg.n_shards, rows) + x.shape[1:]),
      hg.local_src, hg.halo_gather, hg.send_idx)
    return out.reshape((-1,) + x.shape[1:])


def halo_u_add_v(hg: HaloGraph, a_u: jax.Array, a_v: jax.Array) -> jax.Array:
    """Per-edge a_u[src] + a_v[dst] in shard layout [P*Et, ...]."""
    rows = hg.rows_per_shard
    src_vals = _gather_src_edges(hg, a_u)

    def f(av_blk, dst):
        av_blk = av_blk[0]
        dst = dst[0]
        zero = jnp.zeros((1,) + av_blk.shape[1:], av_blk.dtype)
        av_ext = jnp.concatenate([av_blk, zero])
        return jnp.take(av_ext, dst, axis=0)[None]

    dst_vals = shard_map(
        f, mesh=hg.mesh, in_specs=(P(hg.axis), P(hg.axis)),
        out_specs=P(hg.axis),
    )(a_v.reshape((hg.n_shards, rows) + a_v.shape[1:]), _edge_dst(hg))
    return src_vals + dst_vals.reshape(src_vals.shape)


def _use_att_plans(hg: HaloGraph) -> bool:
    from glnn_tpu import ops as _ops

    # _tier_selected (not the looser != "xla" that halo_copy_u_sum
    # uses): auto-on-CPU must keep the XLA segment tier — the
    # products-scale CPU-mesh bench would otherwise run 62M-edge
    # attention kernels in interpret mode. Forcing
    # set_backend("pallas") still exercises the planned tier in tests.
    return (hg.att is not None and hg.att_maps is not None
            and _ops._tier_selected())


def _att_view(att) -> "SpmmPlan":
    """SpmmPlan view of a sliced AttentionPlan: one X-wide tile per
    dst block (tiles_per_block=1), so `segment_reduce` runs the
    block-mode kernel straight over the attention slot geometry."""
    import dataclasses as _dc

    from glnn_tpu.ops.spmm_plan import SpmmPlan

    nb, x = att.num_blocks, att.x
    return SpmmPlan(
        src_idx=att.src_idx, edge_perm=att.slot_edge,
        rec_local=att.rec_sub.reshape(nb, x),
        block_id=att.slot_edge[:nb] * 0,          # unused in block mode
        tile=x, block_rows=att.block_rows, num_blocks=nb, num_tiles=nb,
        e_orig=att.e_orig, tiles_per_block=1)


@jax.custom_vjp
def _planned_halo_smx(att, se_sl, es_sl, scores):
    """Per-shard planned edge softmax: scores [Et, H] shard layout ->
    alphas [Et, H] (ghost edges 0)."""
    out, _ = _planned_halo_smx_fwd(att, se_sl, es_sl, scores)
    return out


def _planned_halo_smx_fwd(att, se_sl, es_sl, scores):
    from glnn_tpu.ops.gat_pallas import _smx_call, _smx_fwd_kernel

    s_slots = jnp.take(scores.astype(jnp.float32), se_sl, axis=0,
                       mode="clip")
    a_slots = _smx_call(_smx_fwd_kernel, att, [s_slots],
                        scores.shape[1], None)
    real = (es_sl < att.slots)[:, None]
    alpha = jnp.where(real, jnp.take(a_slots, es_sl, axis=0,
                                     mode="clip"), 0.0)
    return alpha.astype(scores.dtype), (att, se_sl, es_sl, a_slots)


def _planned_halo_smx_bwd(res, dalpha):
    from glnn_tpu.ops.gat_pallas import _smx_bwd_kernel, _smx_call

    att, se_sl, es_sl, a_slots = res
    sdtype = dalpha.dtype
    da_slots = jnp.take(dalpha.astype(jnp.float32), se_sl, axis=0,
                        mode="clip")
    ds_slots = _smx_call(_smx_bwd_kernel, att, [a_slots, da_slots],
                         dalpha.shape[1], None)
    real = (es_sl < att.slots)[:, None]
    ds = jnp.where(real, jnp.take(ds_slots, es_sl, axis=0,
                                  mode="clip"), 0.0)
    return None, None, None, ds.astype(sdtype)


_planned_halo_smx.defvjp(_planned_halo_smx_fwd, _planned_halo_smx_bwd)


def halo_edge_softmax(hg: HaloGraph, scores: jax.Array) -> jax.Array:
    """Per-dst segment softmax over shard-local edges.
    scores: [P*Et, ...] in shard layout. With per-shard attention plans
    (and the Pallas tier selected) the softmax runs the slot-space
    kernel per shard; otherwise XLA segment ops."""
    rows = hg.rows_per_shard
    et = hg.e_local + hg.e_halo

    if _use_att_plans(hg):
        from glnn_tpu.ops.attention_plan import \
            shard_slice_attention_plan

        squeeze = scores.ndim == 1
        s2 = scores[:, None] if squeeze else scores

        def fp(s_blk, plan_blk, se_blk, es_blk):
            att = shard_slice_attention_plan(plan_blk)
            return _planned_halo_smx(att, se_blk[0], es_blk[0],
                                     s_blk[0])[None]

        out = shard_map(
            fp, mesh=hg.mesh,
            in_specs=(P(hg.axis), P(hg.axis), P(hg.axis), P(hg.axis)),
            out_specs=P(hg.axis), check_vma=False,
        )(s2.reshape((hg.n_shards, et) + s2.shape[1:]), hg.att,
          hg.att_maps[0], hg.att_maps[1])
        out = out.reshape(s2.shape)
        return out[:, 0] if squeeze else out

    def f(s_blk, dst):
        s, dst = s_blk[0], dst[0]
        seg_max = jax.ops.segment_max(s, dst, num_segments=rows + 1)
        shifted = s - jnp.take(seg_max, dst, axis=0)
        expv = jnp.exp(shifted)
        seg_sum = jax.ops.segment_sum(expv, dst, num_segments=rows + 1)
        return (expv / jnp.take(seg_sum, dst, axis=0))[None]

    out = shard_map(
        f, mesh=hg.mesh, in_specs=(P(hg.axis), P(hg.axis)),
        out_specs=P(hg.axis),
    )(scores.reshape((hg.n_shards, et) + scores.shape[1:]), _edge_dst(hg))
    return out.reshape(scores.shape)


@jax.custom_vjp
def _planned_halo_wsum(att, se_sl, es_sl, srcbuf, w):
    """Per-shard planned weighted aggregation: srcbuf [rows+ph, ...]
    (local rows then recv buffer), w [Et] or [Et, H] shard layout ->
    [block_rows*num_blocks >= rows, ...] per-dst sums."""
    out, _ = _planned_halo_wsum_fwd(att, se_sl, es_sl, srcbuf, w)
    return out


def _w_slot_messages(att, se_sl, srcbuf, w):
    from glnn_tpu.ops.spmm_pallas import _MESSAGE_DTYPE

    n_in = srcbuf.shape[0]
    x2 = srcbuf.reshape(n_in, -1)
    m = jnp.take(x2, att.src_idx, axis=0, mode="clip")  # [slots, F2]
    ws = jnp.take(w, se_sl, axis=0, mode="clip")   # [slots] or [slots,H]
    if w.ndim == 2:
        h = w.shape[1]
        d = srcbuf.shape[-1]
        m = (m.reshape(-1, h, d) * ws[..., None]).reshape(-1, h * d)
    else:
        m = m * ws[:, None]
    if m.dtype == jnp.float32:
        m = m.astype(_MESSAGE_DTYPE)
    return m


def _planned_halo_wsum_fwd(att, se_sl, es_sl, srcbuf, w):
    from glnn_tpu.ops.spmm_pallas import segment_reduce

    m = _w_slot_messages(att, se_sl, srcbuf, w)
    out = segment_reduce(_att_view(att), m)
    if w.ndim == 2:
        out = out.reshape(out.shape[0], w.shape[1], srcbuf.shape[-1])
    return out.astype(srcbuf.dtype), (att, se_sl, es_sl, srcbuf, w)


def _planned_halo_wsum_bwd(res, dout):
    from glnn_tpu.ops.spmm_pallas import _MESSAGE_DTYPE, segment_reduce

    att, se_sl, es_sl, srcbuf, w = res
    n_in = srcbuf.shape[0]
    nb, d, x = att.num_blocks, att.block_rows, att.x
    hd = int(np.prod(dout.shape[1:]))
    dout2 = dout.reshape(-1, hd).astype(jnp.float32)
    # per-slot dst rows: block*d + rec (ghost rec==d clamps into the
    # next row and is masked by the bwd plan's one-hot)
    blk = jax.lax.broadcasted_iota(jnp.int32, (nb, x), 0).reshape(-1)
    dstrow = blk * d + att.rec_sub.reshape(-1)
    dh_slots = jnp.take(dout2, dstrow, axis=0, mode="clip")  # [slots, hd]
    ws = jnp.take(w, se_sl, axis=0, mode="clip")
    if w.ndim == 2:
        h = w.shape[1]
        dd = srcbuf.shape[-1]
        dmsg = (dh_slots.reshape(-1, h, dd) * ws[..., None]
                ).reshape(-1, hd).astype(_MESSAGE_DTYPE)
    else:
        dmsg = (dh_slots * ws[:, None]).astype(_MESSAGE_DTYPE)
    red = segment_reduce(
        att.bwd, jnp.take(dmsg, att.bwd.src_idx, axis=0, mode="clip"))
    dsrc = red[:n_in].reshape(srcbuf.shape).astype(srcbuf.dtype)

    # dw_e = <src[src_e], dh[dst_e]> per slot, mapped back to edges
    m_src = jnp.take(srcbuf.reshape(n_in, -1).astype(jnp.float32),
                     att.src_idx, axis=0, mode="clip")
    if w.ndim == 2:
        h = w.shape[1]
        dd = srcbuf.shape[-1]
        dw_slots = jnp.sum(m_src.reshape(-1, h, dd)
                           * dh_slots.reshape(-1, h, dd), axis=-1)
        real = (es_sl < att.slots)[:, None]
    else:
        dw_slots = jnp.sum(m_src * dh_slots, axis=-1)
        real = es_sl < att.slots
    dw = jnp.where(real, jnp.take(dw_slots, es_sl, axis=0,
                                  mode="clip"), 0.0)
    return None, None, None, dsrc, dw.astype(w.dtype)


_planned_halo_wsum.defvjp(_planned_halo_wsum_fwd, _planned_halo_wsum_bwd)


def halo_u_mul_e_sum(hg: HaloGraph, x: jax.Array, e: jax.Array) -> jax.Array:
    """Weighted aggregation: sum_e w_e x[src_e] per dst. e in shard
    layout [P*Et] or [P*Et, H] (broadcast over trailing feature dims).
    With per-shard attention plans (and the Pallas tier selected) the
    reduction runs the slot-space MXU kernel per shard over [local
    rows; recv buffer] sources — the r5 fix for sharded APPNP / the
    GAT per-op fallback dropping to XLA segment ops (VERDICT r4
    weak #5); otherwise XLA segment sums."""
    rows = hg.rows_per_shard
    et = hg.e_local + hg.e_halo

    # planned-tier shape contract: scalar per-edge weights (1-D e,
    # any x rank — they multiply the flattened feature row) or
    # per-head weights (2-D e with 3-D x). The (2-D x, 2-D e)
    # elementwise-broadcast combination stays on the XLA tier below —
    # _w_slot_messages would mis-fold it (review r5).
    planned_shapes = (e.ndim == 1
                      or (x.ndim == 3 and e.ndim == 2))
    if _use_att_plans(hg) and planned_shapes:
        from glnn_tpu.ops.attention_plan import \
            shard_slice_attention_plan

        ph = hg.n_shards * hg.halo_rows

        def fp(x_blk, sidx, plan_blk, se_blk, es_blk, e_blk):
            x_loc = x_blk[0]                      # [rows, ...]
            feat_shape = x_loc.shape[1:]
            fdim = int(np.prod(feat_shape))
            x2 = x_loc.reshape(rows, fdim)
            x_ext = jnp.concatenate(
                [x2, jnp.zeros((1, fdim), x2.dtype)])
            sbuf = jnp.take(x_ext, sidx[0].reshape(-1), axis=0).reshape(
                hg.n_shards, hg.halo_rows, fdim)
            recv = jax.lax.all_to_all(sbuf, hg.axis, split_axis=0,
                                      concat_axis=0, tiled=True)
            srcbuf = jnp.concatenate(
                [x2, recv.reshape(ph, fdim)], axis=0
            ).reshape((rows + ph,) + feat_shape)
            att = shard_slice_attention_plan(plan_blk)
            out = _planned_halo_wsum(att, se_blk[0], es_blk[0], srcbuf,
                                     e_blk[0])
            return out[:rows][None]

        out = shard_map(
            fp, mesh=hg.mesh,
            in_specs=(P(hg.axis), P(hg.axis), P(hg.axis), P(hg.axis),
                      P(hg.axis), P(hg.axis)),
            out_specs=P(hg.axis), check_vma=False,
        )(x.reshape((hg.n_shards, rows) + x.shape[1:]), hg.send_idx,
          hg.att, hg.att_maps[0], hg.att_maps[1],
          e.reshape((hg.n_shards, et) + e.shape[1:]))
        return out.reshape((hg.n_pad,) + x.shape[1:])

    msgs = _gather_src_edges(hg, x)                  # [P*Et, ...]
    w = e
    while w.ndim < msgs.ndim:                        # broadcast over
        w = w[..., None]                             # trailing dims
    msgs = msgs * w

    def f(m_blk, dst):
        m, dst = m_blk[0], dst[0]
        out = jax.ops.segment_sum(m, dst, num_segments=rows + 1)
        return out[:rows][None]

    out = shard_map(
        f, mesh=hg.mesh, in_specs=(P(hg.axis), P(hg.axis)),
        out_specs=P(hg.axis),
    )(msgs.reshape((hg.n_shards, et) + msgs.shape[1:]), _edge_dst(hg))
    return out.reshape((hg.n_pad,) + msgs.shape[1:])


# --------------------------------------------------------------------
# fused per-shard GAT attention (VERDICT r3 task 7): the attention ops
# above compose correctly but run XLA segment ops inside shard_map; a
# sharded GAT teacher lost the round-4 fused-kernel win. Every dst's
# in-edges live on its owner shard, so each shard can run the WHOLE
# fused slot-space attention layer (ops/gat_pallas.py) locally over
# its combined (local + halo) edge list, with sources indexing
# [local rows; recv buffer].
# --------------------------------------------------------------------


def _build_attention_plans(local_src, local_dst, loc_counts, halo_gather,
                           halo_dst, halo_counts, rows, ph,
                           e_loc, e_hal):
    """Per-shard AttentionPlans over combined dst-sorted edges, stacked
    on a leading shard axis, PLUS the shard-layout slot maps
    (slot_edge_sl [P, slots], edge_slot_sl [P, Et]) that let per-edge
    tensors in [local e_loc; halo e_hal] layout ride the slot-space
    kernels. Returns (stacked_plans, (slot_edge_sl, edge_slot_sl)) or
    None when any shard declines (mega-hub skew past the kernel's X
    cap, or an empty shard)."""
    from glnn_tpu.ops.attention_plan import (X_MAX, _stable_sort_by,
                                             build_attention_plan,
                                             stack_attention_plans)

    n_shards = local_src.shape[0]
    block_rows = 128
    nb = -(-rows // block_rows)
    combos = []
    x_need = 128
    for p in range(n_shards):
        lc, hc = int(loc_counts[p]), int(halo_counts[p])
        dst_c = np.concatenate([local_dst[p][:lc], halo_dst[p][:hc]]
                               ).astype(np.int64)
        src_c = np.concatenate([local_src[p][:lc],
                                rows + halo_gather[p][:hc]]
                               ).astype(np.int64)
        if dst_c.shape[0] == 0:
            return None
        order = _stable_sort_by(dst_c, rows + 1)
        dst_c, src_c = dst_c[order], src_c[order]
        # sorted position -> shard-layout slot ([0:lc] local real,
        # [e_loc:e_loc+hc] halo real)
        shardpos = np.where(order < lc, order, e_loc + order - lc)
        combos.append((dst_c, src_c, shardpos, lc, hc))
        cnt = np.bincount(dst_c // block_rows, minlength=nb)
        x_need = max(x_need,
                     -(-int(cnt.max()) // 128) * 128)
    if x_need > X_MAX:
        return None
    et = e_loc + e_hal
    plans, se_sl, es_sl = [], [], []
    for dst_c, src_c, shardpos, lc, hc in combos:
        p = build_attention_plan(dst_c, src_c, rows,
                                 block_rows=block_rows,
                                 n_src=rows + ph, x_slots=x_need,
                                 bwd_block_mode=False, device=False)
        if p is None:
            return None
        slots = p.slots
        se = np.asarray(p.slot_edge)                  # ghost -> e_orig
        se2 = np.where(se < p.e_orig,
                       shardpos[np.minimum(se, p.e_orig - 1)],
                       et).astype(np.int32)
        es2 = np.full(et, slots, np.int32)
        es2[shardpos] = np.asarray(p.edge_slot)
        plans.append(p)
        se_sl.append(se2)
        es_sl.append(es2)
    return (stack_attention_plans(plans),
            (jnp.asarray(np.stack(se_sl)), jnp.asarray(np.stack(es_sl))))


def halo_gat_attention(hg: HaloGraph, feat: jax.Array,
                       attn_l: jax.Array, attn_r: jax.Array,
                       slope: float = 0.2, drop_rate: float = 0.0,
                       drop_rng=None, fused: bool | None = None
                       ) -> jax.Array:
    """Whole GAT attention layer on a sharded graph. feat [n_pad, H, D]
    row-sharded; returns the same shape/sharding. With per-shard
    attention plans (and the Pallas tier selected), each shard runs the
    fused slot-space kernel over [its rows; its recv buffer]; otherwise
    the per-op halo tier composes the identical math."""
    h = feat.shape[1]
    if fused is None:
        fused = jax.default_backend() == "tpu"
    if hg.att is None or not fused:
        el = jnp.sum(feat * attn_l[None], axis=-1)
        er = jnp.sum(feat * attn_r[None], axis=-1)
        e = halo_u_add_v(hg, el, er)
        e = jnp.where(e >= 0, e, slope * e)
        alpha = halo_edge_softmax(hg, e)
        if drop_rate > 0.0:
            if drop_rng is None:
                raise ValueError("attention dropout needs drop_rng")
            keep = 1.0 - drop_rate
            m = jax.random.bernoulli(drop_rng, keep, alpha.shape)
            alpha = alpha * m.astype(alpha.dtype) / keep
        return halo_u_mul_e_sum(hg, feat, alpha)

    from glnn_tpu.ops.attention_plan import shard_slice_attention_plan
    from glnn_tpu.ops.gat_pallas import _fused_gat

    plan = hg.att
    rows = hg.rows_per_shard
    n_sh = hg.n_shards
    ph = n_sh * hg.halo_rows
    mask, inv_keep = None, 1.0
    if drop_rate > 0.0:
        if drop_rng is None:
            raise ValueError("attention dropout needs drop_rng")
        keep = 1.0 - drop_rate
        mask = jax.random.bernoulli(
            drop_rng, keep, (n_sh * plan.slots, h)
        ).astype(jnp.bfloat16)
        inv_keep = 1.0 / keep

    def f(x_blk, sidx, plan_blk, mask_blk, a_l, a_r):
        x_loc = x_blk[0]                           # [rows, H, D]
        hd = x_loc.shape[1] * x_loc.shape[2]
        x2 = x_loc.reshape(rows, hd)
        x_ext = jnp.concatenate([x2, jnp.zeros((1, hd), x2.dtype)])
        sbuf = jnp.take(x_ext, sidx[0].reshape(-1), axis=0).reshape(
            n_sh, hg.halo_rows, hd)
        recv = jax.lax.all_to_all(sbuf, hg.axis, split_axis=0,
                                  concat_axis=0, tiled=True)
        src = jnp.concatenate([x2, recv.reshape(ph, hd)], axis=0
                              ).reshape(rows + ph, *x_loc.shape[1:])
        pl_s = shard_slice_attention_plan(plan_blk)
        m = None if mask_blk is None else mask_blk[0]
        out = _fused_gat(float(slope), float(inv_keep),
                         None if m is None else "mask", pl_s, src, x_loc,
                         a_l, a_r, m)
        return out[None]

    mask_spec = None if mask is None else P(hg.axis)
    out = shard_map(
        f, mesh=hg.mesh,
        in_specs=(P(hg.axis), P(hg.axis), P(hg.axis), mask_spec,
                  P(), P()),
        out_specs=P(hg.axis),
        check_vma=False,      # pallas_call inside can't annotate vma
    )(feat.reshape((n_sh, rows) + feat.shape[1:]), hg.send_idx, plan,
      None if mask is None else mask.reshape(n_sh, plan.slots, h),
      attn_l, attn_r)
    return out.reshape((hg.n_pad,) + feat.shape[1:])
