"""Pallas segment softmax over in-edge segments (the GAT attention
normalization; reference math: dgl edge_softmax inside GATConv,
/root/reference/models.py:227-266).

Three passes on the SoftmaxPlan tiling (ops/softmax_plan.py):

  1. segment MAX (this module's kernel): per tile, a segmented
     log-step roll/max scan along slots leaves each segment's max at
     its last slot; a one-hot built from `last_sel` extracts those
     rows on the MXU; tiles of the same block max-accumulate via
     output revisiting (rows untouched by a tile contribute -BIG).
  2. exp(score - max[dst]) in XLA (elementwise, E x H — small).
  3. segment SUM of the exps via the existing one-hot segment_reduce
     (ops/spmm_pallas.py) on the same tiling; normalize in XLA.

Differentiable via the closed-form softmax VJP (one more plan
segment-sum), so GAT training never touches XLA's slow segment ops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from glnn_tpu.ops.softmax_plan import SoftmaxPlan
from glnn_tpu.ops.spmm_pallas import segment_reduce

_NEG = -3.0e38  # effectively -inf in f32 without inf-arithmetic traps


def _segmax_kernel(block_id_ref, rec_ref, lastsel_ref, m_ref, out_ref,
                   *, interpret: bool):
    t = pl.program_id(0)
    is_first = jnp.logical_or(
        t == 0, block_id_ref[t] != block_id_ref[jnp.maximum(t - 1, 0)]
    )
    d = out_ref.shape[0]
    tile = m_ref.shape[0]

    val = m_ref[:, :]                       # [tile, hpad] f32
    rec = rec_ref[:, :]                     # [tile, 1] int32
    roll = jnp.roll if interpret else pltpu.roll
    k = 1
    while k < tile:
        pv = roll(val, k, axis=0)
        pr = roll(rec, k, axis=0)
        # wraparound slots either belong to a different segment (rec
        # mismatch -> no-op) or to the SAME single segment filling the
        # whole tile, where early-slot contamination is harmless: only
        # the segment-LAST slot is extracted below.
        val = jnp.where(pr == rec, jnp.maximum(val, pv), val)
        k *= 2

    sel = lastsel_ref[0].reshape(1, tile)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (d, tile), 0)
    one_hot_b = row_ids == sel             # <=1 true per output row
    ex = jnp.dot(one_hot_b.astype(val.dtype), val,
                 preferred_element_type=jnp.float32)
    touched = jnp.any(one_hot_b, axis=1, keepdims=True)
    contrib = jnp.where(touched, ex, _NEG)

    @pl.when(is_first)
    def _():
        out_ref[:, :] = contrib

    @pl.when(jnp.logical_not(is_first))
    def _():
        out_ref[:, :] = jnp.maximum(out_ref[:, :], contrib)


def _segment_max(plan: SoftmaxPlan, messages: jax.Array,
                 interpret: bool | None = None) -> jax.Array:
    """messages: [num_tiles*tile, H] slot-ordered scores ->
    [num_blocks*block_rows, H_pad] per-dst maxes (-BIG on empty)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t_sz, d = plan.tile, plan.block_rows
    h = messages.shape[1]
    hpad = -(-h // 128) * 128
    if hpad != h:
        messages = jnp.pad(messages, ((0, 0), (0, hpad - h)))
    r_rows = t_sz // 128
    last_sel = plan.last_sel.reshape(plan.num_tiles, r_rows, 128)
    messages = messages.reshape(plan.num_tiles * t_sz, hpad)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,                  # block_id
        grid=(plan.num_tiles,),
        in_specs=[
            pl.BlockSpec((t_sz, 1), lambda t, bid: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_rows, 128), lambda t, bid: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_sz, hpad), lambda t, bid: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, hpad), lambda t, bid: (bid[t], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        partial(_segmax_kernel, interpret=interpret),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.num_blocks * d, hpad),
                                       jnp.float32),
        interpret=interpret,
    )(plan.block_id, plan.rec_sub, last_sel, messages)


def _slot_gather(plan: SoftmaxPlan, e_vals: jax.Array) -> jax.Array:
    """[E, H] edge values -> [slots, H] slot order (ghost -> 0)."""
    ext = jnp.concatenate(
        [e_vals, jnp.zeros((1, e_vals.shape[1]), e_vals.dtype)], axis=0)
    return jnp.take(ext, plan.edge_perm, axis=0)


def _seg_sum(plan: SoftmaxPlan, e_vals: jax.Array) -> jax.Array:
    """Per-dst segment sum of [E, H] edge values via the one-hot
    reduce kernel -> [num_blocks*block_rows, H]."""
    out = segment_reduce(plan.as_spmm_plan(), _slot_gather(plan, e_vals))
    return out[:, : e_vals.shape[1]]


@jax.custom_vjp
def _edge_softmax_planned(plan: SoftmaxPlan, receivers: jax.Array,
                          scores: jax.Array) -> jax.Array:
    """scores: [E, H] f32, dst-sorted edge order -> alphas [E, H]."""
    mx = _segment_max(plan,
                      _slot_gather(plan, scores.astype(jnp.float32)))
    m_e = jnp.take(mx, receivers, axis=0)[:, : scores.shape[1]]
    ex = jnp.exp(scores - m_e.astype(scores.dtype))
    sm = _seg_sum(plan, ex)
    return ex / jnp.take(sm, receivers, axis=0)


def _planned_fwd(plan, receivers, scores):
    alpha = _edge_softmax_planned(plan, receivers, scores)
    return alpha, (plan, receivers, alpha)


def _planned_bwd(res, dalpha):
    plan, receivers, alpha = res
    # segment-softmax jacobian: ds_e = a_e * (da_e - sum_seg a*da)
    ag = alpha * dalpha
    ssum = _seg_sum(plan, ag)
    ds = ag - alpha * jnp.take(ssum, receivers, axis=0)
    return None, None, ds.astype(dalpha.dtype)


_edge_softmax_planned.defvjp(_planned_fwd, _planned_bwd)


def edge_softmax(g, scores: jax.Array) -> jax.Array:
    """Planned-tier edge softmax; same contract as refops.edge_softmax
    (scores [E_pad] or [E_pad, H]; alphas in the same shape, padding
    edges mapped to 0)."""
    plan = g.smx
    squeeze = scores.ndim == 1
    s2 = scores[:, None] if squeeze else scores
    e_orig = plan.e_orig
    alpha = _edge_softmax_planned(plan, g.receivers[:e_orig],
                                  s2[:e_orig])
    pad = s2.shape[0] - e_orig
    if pad:
        alpha = jnp.concatenate(
            [alpha, jnp.zeros((pad, alpha.shape[1]), alpha.dtype)], axis=0)
    return alpha[:, 0] if squeeze else alpha
