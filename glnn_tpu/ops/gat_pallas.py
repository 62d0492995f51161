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
  backward: ONE kernel that re-reads the forward's gathered bf16 slot
            features (saved as a residual — r5: the r4 design
            re-GATHERED them in f32, and 1 KB f32 rows sit on the
            gather bytes-wall at ~2x the bf16 row time; re-reading the
            saved buffer is a sequential stream) and RECOMPUTES alpha
            in f32 from them, emitting (a) per-dst der directly, (b) a
            per-slot message carrying both the aggregation and score
            gradients, and (c) the attn_l gradient accumulated across
            blocks. One segment_reduce over the transposed plan (whose
            src_idx points into the slot buffer) turns (b) into
            per-source feature gradients. The residual holds the SAME
            bf16 feature values the forward consumed (the f32 re-gather
            additionally re-rounded them); the VJP arithmetic runs f32
            in-kernel on the upcast values (the softmax-VJP cancellation
            amplified bf16 ARITHMETIC to ~10% gradient error, measured),
            with attn_l kept f32 as before so near-zero scores keep the
            right leaky_relu branch.

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
    kernel never transposes. feat dtype sets the score-matmul
    precision; BOTH kernels pass the bf16 slot features, so forward
    and backward scores (and leaky-branch decisions) match
    bit-for-bit (see _gat_bwd_kernel's per-dot precision notes)."""
    valid = rec_sub < d
    el = jnp.dot(feat, al.astype(feat.dtype),
                 preferred_element_type=jnp.float32)
    row_d = jax.lax.broadcasted_iota(jnp.int32, (d, x), 0)
    onehot = (row_d == rec_lane).astype(jnp.float32)   # [d, X]
    # er_blk arrives bf16 (one bf16 rounding of the f32 er, applied
    # identically in fwd and bwd); the one-hot is exact in bf16, so the
    # extraction dot runs at bf16 MXU rate with exact f32 accumulation
    er_s = _extract(onehot.astype(jnp.bfloat16), er_blk)
    s_pre = el + er_s
    s = jnp.where(s_pre >= 0, s_pre, slope * s_pre)
    s = jnp.where(valid, s, _NEG)
    bmax = jnp.max(s, axis=0, keepdims=True)          # per-block max:
    # constant within every segment of the block -> exact softmax.
    # ex is rounded ONCE to bf16 values (kept in f32 storage): every
    # dot that consumes it (denominator, weighted aggregate) is then
    # exact-in-bf16 at bf16 MXU rate, and the softmax identity
    # sum(alpha) = 1 holds exactly because numerator and denominator
    # see the SAME rounded values (fwd and bwd alike)
    ex = jnp.where(valid, jnp.exp(s - bmax), 0.0)
    ex = ex.astype(jnp.bfloat16).astype(jnp.float32)
    return valid, s_pre, ex, onehot


def _drop_weights(drop_mode, drop_ref, inv_keep, keep_thresh, x, b):
    """Per-(slot, lane) dropout weights [X, 128]: either stream the
    {0,1} bf16 mask tensor (interpret/CPU and the halo tier), or
    generate the bits IN-KERNEL from the hardware PRNG seeded by
    (seed, block) — no [slots, H] tensor exists at all, removing the
    strided 16B-row mask DMA that cost ~16 ms/step at arxiv scale
    (VERDICT r4 weak #3). Both kernels of a layer seed identically, so
    forward and backward see the same mask."""
    if drop_mode == "mask":
        return _lane_pad(drop_ref[:, :], 128).astype(jnp.float32) \
            * inv_keep
    pltpu.prng_seed(drop_ref[0], b)
    bits = pltpu.prng_random_bits((x, 128))
    return jnp.where(bits.astype(jnp.uint32) < jnp.uint32(keep_thresh),
                     jnp.float32(inv_keep), 0.0)


def _gat_fwd_kernel(rec_lane_ref, rec_sub_ref, feat_ref, er_ref, al_ref,
                    rrep_ref, *rest, slope, drop_mode, inv_keep=1.0,
                    keep_thresh=0):
    drop_ref = rest[0] if drop_mode else None
    out_ref = rest[-1]
    d = out_ref.shape[0]
    x = feat_ref.shape[0]
    feat = feat_ref[:, :]
    valid, _, ex, onehot = _scores_block(
        rec_lane_ref[0], rec_sub_ref[0], feat, er_ref[:, :], al_ref[:, :],
        slope, d, x)
    # ex is bf16-valued (see _scores_block): exact bf16-input dot
    denom = jnp.dot(onehot.astype(jnp.bfloat16), ex.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    denom = jnp.maximum(denom, _TINY)                  # [d, 128]
    exd = (ex * _drop_weights(drop_mode, drop_ref, inv_keep, keep_thresh,
                              x, pl.program_id(0))
           if drop_mode else ex)
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
                    rrep_ref, *rest, slope, drop_mode, inv_keep=1.0,
                    keep_thresh=0):
    if drop_mode:
        drop_ref, dout_ref = rest[0], rest[1]
    else:
        drop_ref, dout_ref = None, rest[0]
    der_ref, msg_ref, dal_ref = rest[-3], rest[-2], rest[-1]
    b = pl.program_id(0)
    d = der_ref.shape[0]
    x = feat_ref.shape[0]
    # feat_ref holds the forward's SAVED bf16 slot features. MXU dot
    # precision is chosen PER DOT (r5): the f32 MXU runs multi-pass at
    # ~1/6 the bf16 rate and the all-f32 bwd kernel was MXU-bound.
    #  * el is computed from the bf16 inputs EXACTLY like the forward
    #    (fwd/bwd scores now match bit-for-bit, so leaky branch
    #    decisions are consistent by construction);
    #  * the cancellation-sensitive chain (doutn_s extraction, dexd,
    #    t_seg/ddenom) stays f32 — bf16 rounding THERE amplified to
    #    ~10% gradient error (measured r3/r4);
    #  * POST-cancellation dots (del_feat, exd_rep, contrib) take bf16
    #    inputs with f32 accumulation: ds_pre is already the final
    #    small difference, so input rounding is a plain ~0.4%.
    feat_bf = feat_ref[:, :]
    feat = feat_bf.astype(jnp.float32)
    al = al_ref[:, :]
    rrep = rrep_ref[:, :]
    valid, s_pre, ex, onehot = _scores_block(
        rec_lane_ref[0], rec_sub_ref[0], feat_bf, er_ref[:, :], al,
        slope, d, x)
    denom = jnp.maximum(
        jnp.dot(onehot.astype(jnp.bfloat16), ex.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32), _TINY)
    mask_w = (_drop_weights(drop_mode, drop_ref, inv_keep, keep_thresh,
                            x, b) if drop_mode else None)
    exd = ex * mask_w if drop_mode else ex

    dout = dout_ref[:, :]                              # [d, HDp] f32
    denom_rep = jnp.dot(denom, rrep.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    doutn = dout / jnp.maximum(denom_rep, _TINY)       # [d, HDp]
    # extraction one-hot is EXACT in bf16; doutn input rounding is a
    # plain ~0.4% on the upstream cotangent (pre-cancellation, but the
    # per-slot rounding of doutn_s scales dexd and its ddenom
    # contribution coherently — grads stay ~0.5% of the rounded oracle,
    # pinned by tests/test_pallas.py)
    doutn_s = jax.lax.dot_general(                     # [X, HDp]
        onehot.astype(jnp.bfloat16), doutn.astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # d(exd)_s = <feat_s, doutn_dst>_head — f32: this feeds the
    # softmax-VJP difference dexd + ddenom, whose cancellation turns
    # ~0.5% bf16 rounding into ~10% gradient error (measured)
    prod = feat * doutn_s
    dexd = jax.lax.dot_general(
        prod, rrep.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # [X, 128]
    # denominator chain: ddenom_dh = -sum_{s in seg} exd*dexd / denom
    t_seg = jnp.dot(onehot, exd * dexd,
                    preferred_element_type=jnp.float32)
    ddenom = -(t_seg / denom)                          # [d, 128]
    dex = (dexd * mask_w if drop_mode else dexd) + _extract(onehot, ddenom)
    ds = dex * ex
    ds_pre = jnp.where(s_pre >= 0, ds, slope * ds)     # leaky'
    ds_pre = jnp.where(valid, ds_pre, 0.0)

    ds_bf = ds_pre.astype(jnp.bfloat16)
    der_ref[:, :] = jnp.dot(onehot.astype(jnp.bfloat16), ds_bf,
                            preferred_element_type=jnp.float32)
    # per-slot message reduced over SOURCE outside: aggregation term
    # exd*doutn[dst] plus the el-path term ds_pre @ attn_l^T.
    # post-cancellation dots: bf16 inputs, exact f32 accumulation
    del_feat = jax.lax.dot_general(
        ds_bf, al.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # [X, HDp]
    exd_rep = jnp.dot(exd.astype(jnp.bfloat16), rrep,
                      preferred_element_type=jnp.float32)
    msg_ref[:, :] = (exd_rep * doutn_s + del_feat).astype(jnp.bfloat16)
    # attn_l grad: dal[h, hd] += sum_s ds_pre[s, h] * feat[s, hd]
    contrib = jax.lax.dot_general(
        ds_bf, feat_bf, (((0,), (0,)), ((), ())),
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


def _drop_spec_arg(drop, x):
    """(spec, arg, mode, keep_thresh) for the dropout input: a {0,1}
    bf16 mask tensor streamed per block, or an SMEM seed scalar for the
    in-kernel hardware PRNG (TPU only — interpret mode lacks
    prng_seed)."""
    if drop is None:
        return None, None, None, 0
    mode, val, keep = drop
    if mode == "mask":
        return (pl.BlockSpec((x, val.shape[1]), lambda b: (b, 0),
                             memory_space=pltpu.VMEM), val, "mask", 0)
    thresh = min(int(float(keep) * 2.0 ** 32), 2 ** 32 - 1)
    return (pl.BlockSpec(memory_space=pltpu.SMEM), val, "seed", thresh)


def _fwd_call(plan, feat_slots, er_pad, al, rrep, drop, slope,
              interpret, hdp, inv_keep=1.0):
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
    dspec, darg, dmode, thresh = _drop_spec_arg(drop, x)
    if dspec is not None:
        specs.append(dspec)
        args.append(darg)
    return pl.pallas_call(
        partial(_gat_fwd_kernel, slope=slope, drop_mode=dmode,
                inv_keep=inv_keep, keep_thresh=thresh),
        grid=(nb,),
        in_specs=specs,
        out_specs=pl.BlockSpec((d, hdp), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * d, hdp), jnp.float32),
        compiler_params=_VMEM_LIMIT,
        interpret=_interp(interpret),
    )(*args)


def _bwd_call(plan, feat_slots, er_pad, al, rrep, drop, dout_pad, slope,
              interpret, hdp, inv_keep=1.0):
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
    dspec, darg, dmode, thresh = _drop_spec_arg(drop, x)
    if dspec is not None:
        specs.append(dspec)
        args.append(darg)
    specs.append(pl.BlockSpec((d, hdp), lambda b: (b, 0),
                              memory_space=pltpu.VMEM))
    args.append(dout_pad)
    return pl.pallas_call(
        partial(_gat_bwd_kernel, slope=slope, drop_mode=dmode,
                inv_keep=inv_keep, keep_thresh=thresh),
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
    # clip mode: the default fill lowers to gather + a full select_n
    # pass that cannot fuse into the consuming pallas_call (r5 trace)
    return jnp.take(f2, plan.src_idx, axis=0, mode="clip")


def _prep(plan, feat_dst, attn_l, attn_r, hdp):
    n, h, dd = feat_dst.shape
    nb, d = plan.num_blocks, plan.block_rows
    er = jnp.sum(feat_dst.astype(jnp.float32)
                 * attn_r[None].astype(jnp.float32), axis=-1)  # [Nd, H]
    # ONE bf16 rounding of er, shared by fwd and bwd (the kernels'
    # extraction dot is exact over bf16 inputs)
    er_pad = jnp.pad(er, ((0, nb * d - n), (0, 128 - h))
                     ).astype(jnp.bfloat16)
    al = _block_diag_al(attn_l, hdp)
    rrep = _replication(h, dd, hdp)
    return er_pad, al, rrep


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _fused_gat(slope, inv_keep, drop_meta, plan, feat_src, feat_dst,
               attn_l, attn_r, drop_arr):
    # NOTE: feat_src itself is NOT kept in the residuals — only its
    # static row count/dtype are needed by the backward (review r5:
    # keeping it extended the halo tier's [rows+ph] concat buffer's
    # liveness across the whole backward).
    """Rectangular fused attention core: sources (el + messages) come
    from `feat_src` [Ns, H, D] (the plan's src_idx space — ghost row
    Ns), destinations (er + output rows) from `feat_dst` [Nd, H, D].
    The single-graph layer passes the same array twice (JAX sums the
    two cotangents); the halo tier passes [local; recv] as sources and
    the local block as destinations.

    Dropout: `drop_meta` is None (no dropout), "mask" (`drop_arr` is a
    {0,1} bf16 keep mask over [slots, H] — interpret/CPU and the halo
    tier) or ("seed", keep) (`drop_arr` is an int32[1] seed; the
    kernels generate the mask from the hardware PRNG per block — TPU
    only). `inv_keep` is the static 1/keep rescale either way."""
    out, _ = _fused_fwd(slope, inv_keep, drop_meta, plan, feat_src,
                        feat_dst, attn_l, attn_r, drop_arr)
    return out


def _drop_triple(drop_meta, drop_arr):
    if drop_meta is None:
        return None
    if drop_meta == "mask":
        return ("mask", drop_arr, 0.0)
    return ("seed", drop_arr, drop_meta[1])


def _fused_fwd(slope, inv_keep, drop_meta, plan, feat_src, feat_dst,
               attn_l, attn_r, drop_arr):
    n, h, dd = feat_dst.shape
    hdp = _pad128(h * dd)
    er_pad, al, rrep = _prep(plan, feat_dst, attn_l, attn_r, hdp)
    feat_slots = _gather_feat(plan, feat_src, hdp)
    out = _fwd_call(plan, feat_slots, er_pad, al, rrep,
                    _drop_triple(drop_meta, drop_arr), slope, None, hdp,
                    inv_keep)
    out = out[:n, :h * dd].reshape(n, h, dd).astype(feat_dst.dtype)
    # feat_slots rides to the backward as a residual: re-READING the
    # already-materialized bf16 buffer is a sequential stream, while
    # the r4 f32 re-GATHER paid the random-row engine again at 2x the
    # bytes (1 KB f32 rows sit on the gather bytes-wall)
    ns_arr = jnp.zeros((feat_src.shape[0], 0), feat_src.dtype)
    return out, (plan, feat_slots, ns_arr, feat_dst, attn_l, attn_r,
                 drop_arr)


def _fused_bwd(slope, inv_keep, drop_meta, res, dout):
    # ns_arr is a zero-size stand-in carrying feat_src's static row
    # count and dtype without keeping the buffer itself alive
    (plan, feat_slots, ns_arr, feat_dst, attn_l, attn_r,
     drop_arr) = res
    ns, src_dtype = ns_arr.shape[0], ns_arr.dtype
    n, h, dd = feat_dst.shape
    hd = h * dd
    hdp = _pad128(hd)
    nb, d = plan.num_blocks, plan.block_rows
    er_pad, al, rrep = _prep(plan, feat_dst, attn_l, attn_r, hdp)
    dout_pad = jnp.pad(dout.reshape(n, hd).astype(jnp.float32),
                       ((0, nb * d - n), (0, hdp - hd)))
    der_buf, msg, dal = _bwd_call(plan, feat_slots, er_pad, al, rrep,
                                  _drop_triple(drop_meta, drop_arr),
                                  dout_pad, slope, None, hdp, inv_keep)
    # reduce per-slot messages over SOURCE. Ghost bwd slots clamp onto
    # the last real message row instead of an appended zero row: their
    # one-hot column is zero either way, and the ghost-row concatenate
    # copied the whole [slots, HDp] buffer (~4 ms at arxiv scale).
    red = segment_reduce(
        plan.bwd, jnp.take(msg, plan.bwd.src_idx, axis=0, mode="clip"))
    dfeat_src = red[:ns, :hd].reshape(ns, h, dd).astype(src_dtype)
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


# --------------------------------------------------------------------
# chunked fused attention (products scale): the plan is a TUPLE of
# block-range chunks (attention_plan.build_chunked_attention_plans).
# Each chunk gathers its own [slots_c, HDp] buffer, runs the fused
# kernel, and its output rows concatenate (disjoint contiguous block
# ranges). Unlike the single-plan tier the slot buffers are NOT kept
# as residuals — all chunks alive at once is exactly the memory blowup
# chunking exists to avoid — so the backward re-gathers each chunk's
# bf16 slots (same values the forward consumed). Dropout is specified
# as (key, keep): each chunk folds the chunk index into the key, so
# forward and backward regenerate identical masks (hardware-PRNG seeds
# on TPU, bf16 mask tensors in interpret mode).
# --------------------------------------------------------------------


def _chunk_drop(drop_meta, drop_key, ci, plan, h):
    """Per-chunk drop triple from the layer key."""
    if drop_meta is None:
        return None
    keep = drop_meta[1]
    sub = jax.random.fold_in(drop_key, ci)
    if jax.default_backend() == "tpu":
        seed = jax.random.randint(sub, (1,), 0,
                                  jnp.iinfo(jnp.int32).max, jnp.int32)
        return ("seed", seed, keep)
    mask = jax.random.bernoulli(sub, keep, (plan.slots, h)
                                ).astype(jnp.bfloat16)
    return ("mask", mask, 0.0)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _chunked_gat(slope, inv_keep, drop_meta, plans, feat, attn_l,
                 attn_r, drop_key):
    out, _ = _chunked_fwd(slope, inv_keep, drop_meta, plans, feat,
                          attn_l, attn_r, drop_key)
    return out


def _chunked_fwd(slope, inv_keep, drop_meta, plans, feat, attn_l,
                 attn_r, drop_key):
    n, h, dd = feat.shape
    hd = h * dd
    hdp = _pad128(hd)
    er = jnp.sum(feat.astype(jnp.float32)
                 * attn_r[None].astype(jnp.float32), axis=-1)  # [N, H]
    al = _block_diag_al(attn_l, hdp)
    rrep = _replication(h, dd, hdp)
    f2 = jnp.pad(feat.reshape(n, hd).astype(jnp.bfloat16),
                 ((0, 1), (0, hdp - hd)))
    outs = []
    for ci, p in enumerate(plans):
        nb, d = p.num_blocks, p.block_rows
        er_c = jax.lax.dynamic_slice_in_dim(
            jnp.pad(er, ((0, plans[-1].row0
                          + plans[-1].num_blocks * d - n), (0, 0))),
            p.row0, nb * d)
        er_pad = jnp.pad(er_c, ((0, 0), (0, 128 - h))
                         ).astype(jnp.bfloat16)
        feat_slots = jnp.take(f2, p.src_idx, axis=0, mode="clip")
        out_c = _fwd_call(p, feat_slots, er_pad, al, rrep,
                          _chunk_drop(drop_meta, drop_key, ci, p, h),
                          slope, None, hdp, inv_keep)
        outs.append(out_c)
    out = jnp.concatenate(outs, axis=0)[:n, :hd]
    return (out.reshape(n, h, dd).astype(feat.dtype),
            (plans, feat, attn_l, attn_r, drop_key))


def _chunked_bwd(slope, inv_keep, drop_meta, res, dout):
    plans, feat, attn_l, attn_r, drop_key = res
    n, h, dd = feat.shape
    hd = h * dd
    hdp = _pad128(hd)
    er = jnp.sum(feat.astype(jnp.float32)
                 * attn_r[None].astype(jnp.float32), axis=-1)
    al = _block_diag_al(attn_l, hdp)
    rrep = _replication(h, dd, hdp)
    f2 = jnp.pad(feat.reshape(n, hd).astype(jnp.bfloat16),
                 ((0, 1), (0, hdp - hd)))
    total_rows = plans[-1].row0 + plans[-1].num_blocks * plans[-1].block_rows
    er_full = jnp.pad(er, ((0, total_rows - n), (0, 0)))
    dout2 = jnp.pad(dout.reshape(n, hd).astype(jnp.float32),
                    ((0, total_rows - n), (0, hdp - hd)))
    dsrc_acc = jnp.zeros((n, hd), jnp.float32)
    der_parts = []
    dal_acc = jnp.zeros((h, hd), jnp.float32)
    for ci, p in enumerate(plans):
        nb, d = p.num_blocks, p.block_rows
        # serialize the chunks: they are data-independent except
        # through dsrc_acc, so the scheduler otherwise launches all
        # gathers up front and keeps every chunk's [N, hd] reduction
        # output alive at once (measured 22.6 GB > HBM at products
        # scale). Tying each chunk's feature gather to the previous
        # accumulation keeps ONE chunk in flight.
        f2c, dsrc_acc = jax.lax.optimization_barrier((f2, dsrc_acc))
        er_pad = jnp.pad(
            jax.lax.dynamic_slice_in_dim(er_full, p.row0, nb * d),
            ((0, 0), (0, 128 - h))).astype(jnp.bfloat16)
        dout_pad = jax.lax.dynamic_slice_in_dim(dout2, p.row0, nb * d)
        feat_slots = jnp.take(f2c, p.src_idx, axis=0, mode="clip")
        der_c, msg, dal_c = _bwd_call(
            p, feat_slots, er_pad, al, rrep,
            _chunk_drop(drop_meta, drop_key, ci, p, h), dout_pad, slope,
            None, hdp, inv_keep)
        red = segment_reduce(
            p.bwd,
            jnp.take(msg, p.bwd.src_idx, axis=0, mode="clip"))
        dsrc_acc = dsrc_acc + red[:n, :hd].astype(jnp.float32)
        der_parts.append(der_c)
        dal_acc = dal_acc + dal_c[:h, :hd]
    der = jnp.concatenate(der_parts, axis=0)[:n, :h]
    dfeat = dsrc_acc.reshape(n, h, dd) \
        + der[:, :, None] * attn_r[None].astype(jnp.float32)
    dal3 = dal_acc.reshape(h, h, dd)
    dattn_l = dal3[jnp.arange(h), jnp.arange(h)]
    dattn_r = jnp.einsum("nh,nhd->hd", der, feat.astype(jnp.float32))
    return (None, dfeat.astype(feat.dtype),
            dattn_l.astype(attn_l.dtype), dattn_r.astype(attn_r.dtype),
            None)


_chunked_gat.defvjp(_chunked_fwd, _chunked_bwd)


def supported(g, feat) -> bool:
    smx = getattr(g, "smx", None)
    ok = isinstance(smx, AttentionPlan) or (
        isinstance(smx, tuple) and smx
        and isinstance(smx[0], AttentionPlan))
    return ok and feat.ndim == 3


def gat_attention(g, feat: jax.Array, attn_l: jax.Array,
                  attn_r: jax.Array, slope: float = 0.2,
                  drop_rate: float = 0.0,
                  drop_rng: jax.Array | None = None) -> jax.Array:
    """Fused attention layer: softmax_v(leaky(a_l.Wh_u + a_r.Wh_v))
    -> attn-dropout -> weighted aggregate. feat [N, H, D] (= Wh),
    attn_l/attn_r [H, D]. Returns [N, H, D]."""
    plan: AttentionPlan = g.smx
    if isinstance(plan, tuple):
        # chunked tier (products scale): dropout rides as (key, keep)
        # and each chunk folds its index into the key
        drop_meta, key, inv_keep = None, None, 1.0
        if drop_rate > 0.0:
            if drop_rng is None:
                raise ValueError(
                    "gat_attention: drop_rate>0 needs drop_rng")
            keep = 1.0 - drop_rate
            drop_meta, key, inv_keep = ("key", float(keep)), drop_rng, \
                1.0 / keep
        return _chunked_gat(float(slope), float(inv_keep), drop_meta,
                            plan, feat, attn_l, attn_r, key)
    drop_meta, drop_arr, inv_keep = None, None, 1.0
    if drop_rate > 0.0:
        if drop_rng is None:
            raise ValueError("gat_attention: drop_rate>0 needs drop_rng")
        keep = 1.0 - drop_rate
        inv_keep = 1.0 / keep
        if jax.default_backend() == "tpu":
            # in-kernel hardware PRNG: no [slots, H] mask tensor exists
            # (its strided 16B-row DMA cost ~16 ms/step at arxiv scale);
            # fwd+bwd kernels seed identically per block
            drop_meta = ("seed", float(keep))
            drop_arr = jax.random.randint(drop_rng, (1,), 0,
                                          jnp.iinfo(jnp.int32).max,
                                          jnp.int32)
        else:
            # interpret mode lacks prng_seed: {0,1} bf16 mask tensor
            # with the exact f32 1/keep rescale applied in-kernel
            drop_meta = "mask"
            drop_arr = jax.random.bernoulli(
                drop_rng, keep, (plan.slots, feat.shape[1])
            ).astype(jnp.bfloat16)
    return _fused_gat(float(slope), float(inv_keep), drop_meta, plan,
                      feat, feat, attn_l, attn_r, drop_arr)


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
    """[E, H] edge-order -> [slots, H] slot order; the slot_edge gather
    is nearly monotone (natural dst order). Ghost slots clamp onto the
    last real score (mode="clip", no ghost-row copy / select_n pass) —
    the softmax kernel masks them to -inf by rec_sub anyway."""
    return jnp.take(e_vals, plan.slot_edge, axis=0, mode="clip")


def _edgeward(plan, s_vals):
    return jnp.take(s_vals, plan.edge_slot, axis=0, mode="clip")


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
    edges mapped to 0). Chunked plans partition the dst-sorted edge
    list, so per-chunk alphas concatenate."""
    plan = g.smx
    squeeze = scores.ndim == 1
    s2 = scores[:, None] if squeeze else scores
    if isinstance(plan, tuple):
        parts = [_edge_softmax_planned(p, s2[p.e0:p.e0 + p.e_orig])
                 for p in plan]
        alpha = jnp.concatenate(parts, axis=0)
        e_orig = plan[-1].e0 + plan[-1].e_orig
    else:
        e_orig = plan.e_orig
        alpha = _edge_softmax_planned(plan, s2[:e_orig])
    pad = s2.shape[0] - e_orig
    if pad:
        alpha = jnp.concatenate(
            [alpha, jnp.zeros((pad, alpha.shape[1]), alpha.dtype)], axis=0)
    return alpha[:, 0] if squeeze else alpha
