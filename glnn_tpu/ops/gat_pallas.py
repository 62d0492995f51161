"""Fused slot-space GAT attention + segment softmax (Pallas TPU).

The reference GAT layer (dgl GATConv, /root/reference/models.py:
227-266) chains u_add_v -> leaky_relu -> edge_softmax -> attn_drop ->
u_mul_e_sum. Run as separate edge-order ops, a 2-layer fwd+bwd makes
~25 E-row tensor touches, each ~10-20ms at E=2.4M on v5e — that NUMBER
of touches, not any one kernel, bound the r3 GAT step at 1.24s
(PERF.md "where the GAT step goes"). This module collapses the whole
layer into the AttentionPlan slot space (ops/attention_plan.py):

  forward:  ONE [slots, H*D] feature gather + ONE kernel. Scores,
            softmax, dropout and the weighted aggregation all happen
            per dst block inside the kernel; attention logits are
            formed as feat_slots @ blockdiag(attn_l) on the MXU and
            er is extracted per slot by a one-hot matmul, so no
            [E, H]-shaped tensor ever exists in edge order.
  backward: ONE feature re-gather + ONE kernel that RECOMPUTES alpha
            (cheaper than saving [slots, H] and re-reading it) and
            emits (a) per-dst der directly, (b) a per-slot message
            carrying both the aggregation and score gradients, and
            (c) the attn_l gradient accumulated across blocks. One
            segment_reduce over the transposed plan (whose src_idx
            points into the slot buffer) turns (b) into per-source
            feature gradients.

Softmax numerics: the kernel subtracts each BLOCK's score max — a
per-segment constant (every segment lives inside one block), so the
result is mathematically exact softmax; a segment whose own max sits
> ~80 below its block's max underflows its alphas to 0 in f32 (never
observed on real score magnitudes; the XLA oracle tier remains
available via ops.set_backend("xla")). Features stream in bf16 like
every Pallas-tier message, so parity vs the f32 oracle is ~1e-2
relative.

Also here: the standalone planned ``edge_softmax`` (same contract as
refops.edge_softmax) — scores are gathered slot-ward by plan.slot_edge
(a nearly-monotone gather), normalized by the same per-block-max
kernel, and gathered back by plan.edge_slot; the closed-form softmax
VJP runs as a second slot-space kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from glnn_tpu.ops.attention_plan import AttentionPlan
from glnn_tpu.ops.spmm_pallas import segment_reduce

_NEG = -3.0e38       # effectively -inf in f32 without inf arithmetic
# zero-denominator guard only: just above f32 min NORMAL (1.18e-38 —
# anything subnormal gets flushed to zero under FTZ and turns the
# guard into 0/0) so exp values down to ~exp(-85) still divide
# exactly (a 1e-30 clamp was measured to break single-edge segments
# ~79 logits under their block max)
_TINY = 1e-37


def _interp(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


# the backward kernel's working set ([X, HDp] f32 features + ~10
# [X, 128] f32 intermediates) overflows the default 16MB scoped-vmem
# limit by ~100KB at X=2048, HDp=128 (measured: BENCH r4 first run);
# v5e has far more VMEM — raise the per-kernel cap
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _pad128(n: int) -> int:
    return max(128, -(-n // 128) * 128)


def _lane_pad(a, width):
    """Pad the lane (last) axis with zeros up to `width` in-kernel."""
    h = a.shape[-1]
    if h == width:
        return a
    return jnp.concatenate(
        [a, jnp.zeros(a.shape[:-1] + (width - h,), a.dtype)], axis=-1)


def _extract(onehot, blk_vals):
    """Per-slot extraction of per-dst values WITHOUT materializing the
    transposed one-hot: onehot^T @ blk_vals via a dim0-contraction."""
    return jax.lax.dot_general(
        onehot, blk_vals, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _scores_block(rec_lane, rec_sub, feat, er_blk, al, slope, d, x):
    """Shared score math per block: returns (valid [X,1],
    s_pre [X,128] f32 pre-activation, ex [X,128] exp(s - blockmax),
    onehot [d,X] f32). rec_lane [1,X] builds the one-hot along lanes
    (the proven-fast layout); rec_sub [X,1] is the same values sublane-
    major for row masks — both come precomputed from the plan so the
    kernel never transposes. feat dtype sets the matmul precision
    (bf16 fwd / f32 bwd — the softmax VJP's cancellation amplifies
    rounding, so the backward recompute runs full precision)."""
    valid = rec_sub < d
    el = jnp.dot(feat, al.astype(feat.dtype),
                 preferred_element_type=jnp.float32)
    row_d = jax.lax.broadcasted_iota(jnp.int32, (d, x), 0)
    onehot = (row_d == rec_lane).astype(jnp.float32)   # [d, X]
    er_s = _extract(onehot, er_blk)                    # [X, 128]
    s_pre = el + er_s
    s = jnp.where(s_pre >= 0, s_pre, slope * s_pre)
    s = jnp.where(valid, s, _NEG)
    bmax = jnp.max(s, axis=0, keepdims=True)          # per-block max:
    # constant within every segment of the block -> exact softmax
    ex = jnp.where(valid, jnp.exp(s - bmax), 0.0)
    return valid, s_pre, ex, onehot


def _gat_fwd_kernel(rec_lane_ref, rec_sub_ref, feat_ref, er_ref, al_ref,
                    rrep_ref, *rest, slope, use_mask):
    mask_ref = rest[0] if use_mask else None
    out_ref = rest[-1]
    d = out_ref.shape[0]
    x = feat_ref.shape[0]
    feat = feat_ref[:, :]
    valid, _, ex, onehot = _scores_block(
        rec_lane_ref[0], rec_sub_ref[0], feat, er_ref[:, :], al_ref[:, :],
        slope, d, x)
    denom = jnp.dot(onehot, ex, preferred_element_type=jnp.float32)
    denom = jnp.maximum(denom, _TINY)                  # [d, 128]
    exd = ex * _lane_pad(mask_ref[:, :], 128) if use_mask else ex
    rrep = rrep_ref[:, :]                              # [128, HDp] bf16
    w_rep = jnp.dot(exd.astype(jnp.bfloat16), rrep,
                    preferred_element_type=jnp.float32)
    msgs = feat * w_rep.astype(jnp.bfloat16)           # [X, HDp]
    agg = jnp.dot(onehot.astype(jnp.bfloat16), msgs,
                  preferred_element_type=jnp.float32)  # [d, HDp]
    denom_rep = jnp.dot(denom, rrep.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    out_ref[:, :] = agg / jnp.maximum(denom_rep, _TINY)


def _gat_bwd_kernel(rec_lane_ref, rec_sub_ref, feat_ref, er_ref, al_ref,
                    rrep_ref, *rest, slope, use_mask):
    if use_mask:
        mask_ref, dout_ref = rest[0], rest[1]
    else:
        mask_ref, dout_ref = None, rest[0]
    der_ref, msg_ref, dal_ref = rest[-3], rest[-2], rest[-1]
    b = pl.program_id(0)
    d = der_ref.shape[0]
    x = feat_ref.shape[0]
    feat = feat_ref[:, :]
    al = al_ref[:, :]
    rrep = rrep_ref[:, :]
    valid, s_pre, ex, onehot = _scores_block(
        rec_lane_ref[0], rec_sub_ref[0], feat, er_ref[:, :], al, slope,
        d, x)
    denom = jnp.maximum(
        jnp.dot(onehot, ex, preferred_element_type=jnp.float32), _TINY)
    mask_w = _lane_pad(mask_ref[:, :], 128) if use_mask else None
    exd = ex * mask_w if use_mask else ex

    dout = dout_ref[:, :]                              # [d, HDp] f32
    denom_rep = jnp.dot(denom, rrep.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    doutn = dout / jnp.maximum(denom_rep, _TINY)       # [d, HDp]
    doutn_s = jax.lax.dot_general(                     # [X, HDp]
        onehot, doutn, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # d(exd)_s = <feat_s, doutn_dst>_head — f32: this feeds the
    # softmax-VJP difference dexd + ddenom, whose cancellation turns
    # ~0.5% bf16 rounding into ~10% gradient error (measured)
    prod = feat.astype(jnp.float32) * doutn_s
    dexd = jax.lax.dot_general(
        prod, rrep.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # [X, 128]
    # denominator chain: ddenom_dh = -sum_{s in seg} exd*dexd / denom
    t_seg = jnp.dot(onehot, exd * dexd,
                    preferred_element_type=jnp.float32)
    ddenom = -(t_seg / denom)                          # [d, 128]
    dex = (dexd * mask_w if use_mask else dexd) + _extract(onehot, ddenom)
    ds = dex * ex
    ds_pre = jnp.where(s_pre >= 0, ds, slope * ds)     # leaky'
    ds_pre = jnp.where(valid, ds_pre, 0.0)

    der_ref[:, :] = jnp.dot(onehot, ds_pre,
                            preferred_element_type=jnp.float32)
    # per-slot message reduced over SOURCE outside: aggregation term
    # exd*doutn[dst] plus the el-path term ds_pre @ attn_l^T
    del_feat = jax.lax.dot_general(
        ds_pre, al.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # [X, HDp]
    exd_rep = jnp.dot(exd, rrep.astype(jnp.float32),
                      preferred_element_type=jnp.float32)
    msg_ref[:, :] = (exd_rep * doutn_s + del_feat).astype(jnp.bfloat16)
    # attn_l grad: dal[h, hd] += sum_s ds_pre[s, h] * feat[s, hd]
    contrib = jax.lax.dot_general(
        ds_pre, feat.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [128, HDp]

    @pl.when(b == 0)
    def _():
        dal_ref[:, :] = contrib

    @pl.when(b != 0)
    def _():
        dal_ref[:, :] = dal_ref[:, :] + contrib


def _block_diag_al(attn_l: jax.Array, hdp: int) -> jax.Array:
    """attn_l [H, D] -> AL [HDp, 128] with AL[h*D+j, h] = attn_l[h, j],
    so el = feat_slots @ AL on the MXU. Kept f32 (kernels cast to the
    feature dtype at use): a bf16-rounded AL shifts near-zero scores
    across the leaky_relu kink and flips that edge's gradient branch —
    measured as sparse ~10% gradient errors vs the oracle."""
    h, dd = attn_l.shape
    al = jnp.zeros((hdp, 128), jnp.float32)
    rows = jnp.arange(h * dd)
    return al.at[rows, rows // dd].set(
        attn_l.reshape(-1).astype(jnp.float32))


def _replication(h: int, dd: int, hdp: int) -> jax.Array:
    """R [128, HDp] bf16 with R[h, h*D+j] = 1: alpha @ R broadcasts a
    per-head weight across that head's D feature columns."""
    r = np.zeros((128, hdp), np.float32)
    cols = np.arange(h * dd)
    r[cols // dd, cols] = 1.0
    return jnp.asarray(r, jnp.bfloat16)


def _fwd_call(plan, feat_slots, er_pad, al, rrep, mask, slope,
              interpret, hdp):
    nb, x, d = plan.num_blocks, plan.x, plan.block_rows
    specs = [
        pl.BlockSpec((1, 1, x), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, x, 1), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((x, hdp), lambda b: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, 128), lambda b: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((hdp, 128), lambda b: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((128, hdp), lambda b: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [plan.rec_lane, plan.rec_sub, feat_slots, er_pad, al, rrep]
    if mask is not None:
        specs.append(pl.BlockSpec((x, mask.shape[1]), lambda b: (b, 0),
                                  memory_space=pltpu.VMEM))
        args.append(mask)
    return pl.pallas_call(
        partial(_gat_fwd_kernel, slope=slope, use_mask=mask is not None),
        grid=(nb,),
        in_specs=specs,
        out_specs=pl.BlockSpec((d, hdp), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * d, hdp), jnp.float32),
        compiler_params=_VMEM_LIMIT,
        interpret=_interp(interpret),
    )(*args)


def _bwd_call(plan, feat_slots, er_pad, al, rrep, mask, dout_pad, slope,
              interpret, hdp):
    nb, x, d = plan.num_blocks, plan.x, plan.block_rows
    specs = [
        pl.BlockSpec((1, 1, x), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, x, 1), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((x, hdp), lambda b: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, 128), lambda b: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((hdp, 128), lambda b: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((128, hdp), lambda b: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [plan.rec_lane, plan.rec_sub, feat_slots, er_pad, al, rrep]
    if mask is not None:
        specs.append(pl.BlockSpec((x, mask.shape[1]), lambda b: (b, 0),
                                  memory_space=pltpu.VMEM))
        args.append(mask)
    specs.append(pl.BlockSpec((d, hdp), lambda b: (b, 0),
                              memory_space=pltpu.VMEM))
    args.append(dout_pad)
    return pl.pallas_call(
        partial(_gat_bwd_kernel, slope=slope, use_mask=mask is not None),
        grid=(nb,),
        in_specs=specs,
        out_specs=(
            pl.BlockSpec((d, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((x, hdp), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, hdp), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb * d, 128), jnp.float32),
            jax.ShapeDtypeStruct((nb * x, hdp), jnp.bfloat16),
            jax.ShapeDtypeStruct((128, hdp), jnp.float32),
        ),
        compiler_params=_VMEM_LIMIT,
        interpret=_interp(interpret),
    )(*args)


def _gather_feat(plan: AttentionPlan, feat: jax.Array, hdp: int,
                 dtype=jnp.bfloat16):
    """[slots, HDp] slot-space features. bf16 in the forward (halves
    the gather bytes, like every Pallas-tier message); the backward
    re-gathers in f32 — its kernel needs full precision (see
    _gat_bwd_kernel) and the gather is row-RATE-bound anyway."""
    n, h, dd = feat.shape
    f2 = feat.reshape(n, h * dd).astype(dtype)
    f2 = jnp.pad(f2, ((0, 1), (0, hdp - h * dd)))      # ghost row + lanes
    return jnp.take(f2, plan.src_idx, axis=0)          # [slots, HDp]


def _prep(plan, feat_dst, attn_l, attn_r, hdp):
    n, h, dd = feat_dst.shape
    nb, d = plan.num_blocks, plan.block_rows
    er = jnp.sum(feat_dst.astype(jnp.float32)
                 * attn_r[None].astype(jnp.float32), axis=-1)  # [Nd, H]
    er_pad = jnp.pad(er, ((0, nb * d - n), (0, 128 - h)))
    al = _block_diag_al(attn_l, hdp)
    rrep = _replication(h, dd, hdp)
    return er_pad, al, rrep


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_gat(slope, plan, feat_src, feat_dst, attn_l, attn_r, mask):
    """Rectangular fused attention core: sources (el + messages) come
    from `feat_src` [Ns, H, D] (the plan's src_idx space — ghost row
    Ns), destinations (er + output rows) from `feat_dst` [Nd, H, D].
    The single-graph layer passes the same array twice (JAX sums the
    two cotangents); the halo tier passes [local; recv] as sources and
    the local block as destinations."""
    n, h, dd = feat_dst.shape
    hdp = _pad128(h * dd)
    er_pad, al, rrep = _prep(plan, feat_dst, attn_l, attn_r, hdp)
    feat_slots = _gather_feat(plan, feat_src, hdp)
    out = _fwd_call(plan, feat_slots, er_pad, al, rrep, mask, slope,
                    None, hdp)
    return out[:n, :h * dd].reshape(n, h, dd).astype(feat_dst.dtype)


def _fused_fwd(slope, plan, feat_src, feat_dst, attn_l, attn_r, mask):
    out = _fused_gat(slope, plan, feat_src, feat_dst, attn_l, attn_r,
                     mask)
    return out, (plan, feat_src, feat_dst, attn_l, attn_r, mask)


def _fused_bwd(slope, res, dout):
    plan, feat_src, feat_dst, attn_l, attn_r, mask = res
    n, h, dd = feat_dst.shape
    ns = feat_src.shape[0]
    hd = h * dd
    hdp = _pad128(hd)
    nb, d = plan.num_blocks, plan.block_rows
    er_pad, al, rrep = _prep(plan, feat_dst, attn_l, attn_r, hdp)
    feat_slots = _gather_feat(plan, feat_src, hdp, jnp.float32)
    dout_pad = jnp.pad(dout.reshape(n, hd).astype(jnp.float32),
                       ((0, nb * d - n), (0, hdp - hd)))
    der_buf, msg, dal = _bwd_call(plan, feat_slots, er_pad, al, rrep,
                                  mask, dout_pad, slope, None, hdp)
    # reduce per-slot messages over SOURCE: plan.bwd.src_idx points into
    # the (ghost-extended) slot buffer
    msg_ext = jnp.concatenate(
        [msg, jnp.zeros((1, hdp), msg.dtype)], axis=0)
    red = segment_reduce(plan.bwd,
                         jnp.take(msg_ext, plan.bwd.src_idx, axis=0))
    dfeat_src = red[:ns, :hd].reshape(ns, h, dd).astype(feat_src.dtype)
    der = der_buf[:n, :h]
    dfeat_dst = (der[:, :, None] * attn_r[None].astype(jnp.float32)
                 ).astype(feat_dst.dtype)
    dal3 = dal[:h, :hd].reshape(h, h, dd)
    dattn_l = dal3[jnp.arange(h), jnp.arange(h)]
    dattn_r = jnp.einsum("nh,nhd->hd", der,
                         feat_dst.astype(jnp.float32))
    return (None, dfeat_src, dfeat_dst, dattn_l.astype(attn_l.dtype),
            dattn_r.astype(attn_r.dtype), None)


_fused_gat.defvjp(_fused_fwd, _fused_bwd)


def supported(g, feat) -> bool:
    return isinstance(getattr(g, "smx", None), AttentionPlan) and \
        feat.ndim == 3


def gat_attention(g, feat: jax.Array, attn_l: jax.Array,
                  attn_r: jax.Array, slope: float = 0.2,
                  drop_rate: float = 0.0,
                  drop_rng: jax.Array | None = None) -> jax.Array:
    """Fused attention layer: softmax_v(leaky(a_l.Wh_u + a_r.Wh_v))
    -> attn-dropout -> weighted aggregate. feat [N, H, D] (= Wh),
    attn_l/attn_r [H, D]. Returns [N, H, D]."""
    plan: AttentionPlan = g.smx
    mask = None
    if drop_rate > 0.0:
        if drop_rng is None:
            raise ValueError("gat_attention: drop_rate>0 needs drop_rng")
        keep = 1.0 - drop_rate
        mask = jax.random.bernoulli(
            drop_rng, keep, (plan.slots, feat.shape[1])
        ).astype(jnp.float32) / keep
    return _fused_gat(float(slope), plan, feat, feat, attn_l, attn_r,
                      mask)


# --------------------------------------------------------------------
# standalone planned edge_softmax (same contract as refops.edge_softmax)
# --------------------------------------------------------------------


def _smx_fwd_kernel(rec_lane_ref, rec_sub_ref, s_ref, out_ref, *, d):
    x = s_ref.shape[0]
    hs = s_ref.shape[1]
    valid = rec_sub_ref[0] < d
    s = _lane_pad(s_ref[:, :], 128)
    s = jnp.where(valid, s, _NEG)
    bmax = jnp.max(s, axis=0, keepdims=True)
    ex = jnp.where(valid, jnp.exp(s - bmax), 0.0)
    row_d = jax.lax.broadcasted_iota(jnp.int32, (d, x), 0)
    onehot = (row_d == rec_lane_ref[0]).astype(jnp.float32)
    denom = jnp.maximum(
        jnp.dot(onehot, ex, preferred_element_type=jnp.float32), _TINY)
    denom_s = _extract(onehot, denom)
    alpha = ex / jnp.maximum(denom_s, _TINY)
    alpha = jnp.where(valid, alpha, 0.0)
    out_ref[:, :] = alpha[:, :hs]


def _smx_bwd_kernel(rec_lane_ref, rec_sub_ref, a_ref, da_ref, out_ref,
                    *, d):
    x = a_ref.shape[0]
    hs = a_ref.shape[1]
    a = _lane_pad(a_ref[:, :], 128)
    da = _lane_pad(da_ref[:, :], 128)
    ag = a * da
    row_d = jax.lax.broadcasted_iota(jnp.int32, (d, x), 0)
    onehot = (row_d == rec_lane_ref[0]).astype(jnp.float32)
    seg = jnp.dot(onehot, ag, preferred_element_type=jnp.float32)
    seg_s = _extract(onehot, seg)
    out_ref[:, :] = (ag - a * seg_s)[:, :hs]


def _smx_call(kernel, plan, arrays, hs, interpret):
    nb, x, d = plan.num_blocks, plan.x, plan.block_rows
    specs = [pl.BlockSpec((1, 1, x), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((1, x, 1), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)]
    specs += [pl.BlockSpec((x, hs), lambda b: (b, 0),
                           memory_space=pltpu.VMEM)] * len(arrays)
    return pl.pallas_call(
        partial(kernel, d=d),
        grid=(nb,),
        in_specs=specs,
        out_specs=pl.BlockSpec((x, hs), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * x, hs), jnp.float32),
        compiler_params=_VMEM_LIMIT,
        interpret=_interp(interpret),
    )(plan.rec_lane, plan.rec_sub, *arrays)


def _slotward(plan, e_vals):
    """[E, H] edge-order -> [slots, H] slot order (ghost -> 0); the
    slot_edge gather is nearly monotone (natural dst order)."""
    ext = jnp.concatenate(
        [e_vals, jnp.zeros((1, e_vals.shape[1]), e_vals.dtype)], axis=0)
    return jnp.take(ext, plan.slot_edge, axis=0)


def _edgeward(plan, s_vals):
    return jnp.take(s_vals, plan.edge_slot, axis=0)


@jax.custom_vjp
def _edge_softmax_planned(plan: AttentionPlan, scores: jax.Array):
    """scores [E, H] f32 dst-sorted edge order -> alphas [E, H]."""
    s_slots = _slotward(plan, scores.astype(jnp.float32))
    a_slots = _smx_call(_smx_fwd_kernel, plan, [s_slots],
                        scores.shape[1], None)
    return _edgeward(plan, a_slots).astype(scores.dtype)


def _smx_fwd(plan, scores):
    s_slots = _slotward(plan, scores.astype(jnp.float32))
    a_slots = _smx_call(_smx_fwd_kernel, plan, [s_slots],
                        scores.shape[1], None)
    alpha = _edgeward(plan, a_slots).astype(scores.dtype)
    return alpha, (plan, a_slots)


def _smx_bwd(res, dalpha):
    plan, a_slots = res
    da_slots = _slotward(plan, dalpha.astype(jnp.float32))
    ds_slots = _smx_call(_smx_bwd_kernel, plan, [a_slots, da_slots],
                         dalpha.shape[1], None)
    return None, _edgeward(plan, ds_slots).astype(dalpha.dtype)


_edge_softmax_planned.defvjp(_smx_fwd, _smx_bwd)


def edge_softmax(g, scores: jax.Array) -> jax.Array:
    """Planned-tier edge softmax; same contract as refops.edge_softmax
    (scores [E_pad] or [E_pad, H]; alphas in the same shape, padding
    edges mapped to 0)."""
    plan: AttentionPlan = g.smx
    squeeze = scores.ndim == 1
    s2 = scores[:, None] if squeeze else scores
    e_orig = plan.e_orig
    alpha = _edge_softmax_planned(plan, s2[:e_orig])
    pad = s2.shape[0] - e_orig
    if pad:
        alpha = jnp.concatenate(
            [alpha, jnp.zeros((pad, alpha.shape[1]), alpha.dtype)], axis=0)
    return alpha[:, 0] if squeeze else alpha
