"""Pallas TPU SpMM: segmented reduction as one-hot matmuls on the MXU.

Computes H = A @ M for the dst-sorted edge list described by an
`SpmmPlan` (ops/spmm_plan.py). Per grid step (f_block j, edge tile t):

    one_hot[d, s] = (rec_local[t, s] == d)            # built in VMEM
    out[block_id[t]] (+)= one_hot @ M_tile            # MXU matmul

Why this shape: TPU has no fast scatter; XLA's sorted segment-sum runs
at ~107 GB/s on v5e (measured) while the MXU can absorb the reduction
at memory speed. Padding slots carry rec_local == block_rows, matching
no one-hot row, so they contribute exact zeros.

The public ops (`copy_u_sum` / `u_mul_e_sum`) gather messages with one
XLA `jnp.take` and run the reduction here. Both are linear, so the
custom VJP reuses the kernel on the transposed plan: dX = A^T dH.

Performance anatomy (measured on v5e, arxiv-scale E=2.37M F=256,
tools/probe_stages.py + tools/sweep_spmm.py; full table in PERF.md):
the bound is the HBM random ROW RATE of the XLA gather — ~240M rows/s
regardless of row size up to ~512B (int8 256B rows and bf16 512B rows
gather in the SAME time; f32 1KB rows additionally hit a ~135 GB/s
bytes wall) — while sequential streams run at ~650 GB/s. Quantizing
messages therefore does NOT speed the gather; it speeds the REDUCE
(int8 one-hot matmuls run at 2x MXU rate and halve the materialized
message read). The reduce kernel itself costs ~6.8ms bf16 / ~4.0ms
int8 at (tile=512, block_rows=512), partially overlapped with the
gather by XLA's scheduler. Alternatives were evaluated and lose on
this hardware (PERF.md): sequential-streaming/two-sided designs pay
num_blocks sequential passes of X (23x more bytes than the gather
moves at only ~5x more bandwidth); radix/bucketed scatter dies on the
absence of a VMEM row shuffle (any in-VMEM rearrangement is itself a
2*width*F-flop one-hot matmul); an in-kernel DMA gather is
descriptor-issue-bound (~20M rows/s). Since r3 the default is the
BLOCK-MODE kernel (`_block_kernel`): one grid step per dst block with
no output revisiting. Round 5 removed the hidden fill-mode select_n
pass every gather paid when feeding a pallas_call (mode="clip",
PERF.md r5) — 223.9M edges/s bf16 / 228.4M int8 at arxiv scale,
0.98 / 1.00 of the MEASURED gather speed-of-light (builder-side run
of the driver harness; driver artifact at round end): the two-op design now sits within ~2% of its own
gather, retiring the r3 "message round-trip floor" analysis.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from glnn_tpu.graph.container import Graph
from glnn_tpu.ops.spmm_plan import SpmmPlan

F_BLOCK = 512


def _kernel(block_id_ref, rec_local_ref, m_ref, out_ref):
    t = pl.program_id(1)
    is_first = jnp.logical_or(
        t == 0, block_id_ref[t] != block_id_ref[jnp.maximum(t - 1, 0)]
    )

    d = out_ref.shape[0]
    fb = out_ref.shape[1]
    tile = m_ref.shape[0]
    # ONE one-hot [d, tile] and ONE K=tile matmul per (tile, f_block):
    # the MXU accumulates the whole tile internally. (The previous
    # 8-step loop of K=128 dots chained f32 VPU adds between partials —
    # measured ~1us/tile slower on v5e.) The one-hot is exact in bf16,
    # so with bf16 messages the MXU accumulates exact f32 sums of
    # bf16-rounded inputs; with int8 messages (quantized tier) the
    # one-hot is int8 and the MXU accumulates EXACT int32 sums.
    mdt = m_ref.dtype
    acc_t = out_ref.dtype
    # rec_local arrives in native (8-sublane, 128-lane) tiling; the
    # lane-major flatten to [1, tile] is a small int32 relayout.
    rec = rec_local_ref[0].reshape(1, tile)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (d, tile), 0)
    one_hot = (row_ids == rec).astype(mdt)
    contrib = jnp.dot(one_hot, m_ref[:, :], preferred_element_type=acc_t)

    @pl.when(is_first)
    def _():
        out_ref[:, :] = contrib

    @pl.when(jnp.logical_not(is_first))
    def _():
        out_ref[:, :] = out_ref[:, :] + contrib


def _block_kernel(rec_local_ref, m_ref, out_ref):
    """Block-mode: ONE grid step per (f_block, dst block). The plan
    guarantees every block owns exactly tiles_per_block consecutive
    tiles, so there is no output revisiting (and no scalar prefetch);
    the whole block's slots feed one [d, X] @ [X, fb] MXU dot. Cuts
    the tiled kernel's ~5000 grid steps (~0.55us fixed cost each,
    tools/probe_overlap.py) to num_blocks."""
    d = out_ref.shape[0]
    x = m_ref.shape[0]
    rec = rec_local_ref[0].reshape(1, x)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (d, x), 0)
    one_hot = (row_ids == rec).astype(m_ref.dtype)
    out_ref[:, :] = jnp.dot(one_hot, m_ref[:, :],
                            preferred_element_type=out_ref.dtype)


def _segment_reduce_block(plan: SpmmPlan, messages: jax.Array,
                          interpret: bool) -> jax.Array:
    t_sz, d, tpb = plan.tile, plan.block_rows, plan.tiles_per_block
    x = t_sz * tpb
    f = messages.shape[1]
    f_pad = -(-f // 128) * 128
    if f_pad != f:
        messages = jnp.pad(messages, ((0, 0), (0, f_pad - f)))
    fb = min(F_BLOCK, f_pad)
    n_fb = f_pad // fb

    rec_local = plan.rec_local.reshape(plan.num_blocks, 1, x)
    grid = (n_fb, plan.num_blocks)
    acc_dtype = jnp.int32 if messages.dtype == jnp.int8 else jnp.float32
    flops = 2 * plan.num_blocks * d * x * f_pad
    return pl.pallas_call(
        _block_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, x), lambda j, b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((x, fb), lambda j, b: (b, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, fb), lambda j, b: (b, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((plan.num_blocks * d, f_pad),
                                       acc_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(messages.size * messages.dtype.itemsize
                               + plan.num_blocks * d * f_pad * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(rec_local, messages)[:, :f]


def segment_reduce(plan: SpmmPlan, messages: jax.Array,
                   interpret: bool | None = None) -> jax.Array:
    """messages: [num_tiles*tile, F] planned message rows ->
    [num_blocks*block_rows, F] block-padded output.

    interpret=None auto-selects interpreter mode off-TPU, so forced
    pallas backends remain runnable (slowly) in CPU tests."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if plan.tiles_per_block is not None:
        return _segment_reduce_block(plan, messages, interpret)
    t_sz, d = plan.tile, plan.block_rows
    f = messages.shape[1]
    f_pad = -(-f // 128) * 128
    if f_pad != f:
        messages = jnp.pad(messages, ((0, 0), (0, f_pad - f)))
    fb = min(F_BLOCK, f_pad)
    n_fb = f_pad // fb

    r_rows = t_sz // 128
    rec_local = plan.rec_local.reshape(plan.num_tiles, r_rows, 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,                     # block_id
        grid=(n_fb, plan.num_tiles),
        in_specs=[
            pl.BlockSpec((1, r_rows, 128), lambda j, t, bid: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_sz, fb), lambda j, t, bid: (t, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, fb), lambda j, t, bid: (bid[t], j),
                               memory_space=pltpu.VMEM),
    )
    acc_dtype = jnp.int32 if messages.dtype == jnp.int8 else jnp.float32
    flops = 2 * plan.num_tiles * d * t_sz * f_pad
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.num_blocks * d, f_pad),
                                       acc_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(messages.size * 4 + plan.num_blocks * d * f_pad * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(plan.block_id, rec_local, messages)
    return out[:, :f] if f_pad != f else out


def _ghost_extend(x: jax.Array) -> jax.Array:
    """Append one zero row. No op code path uses this since the r5
    clip-mode conversion (sentinel indices clamp and are one-hot
    masked); kept for the probe/bench harnesses that predate it."""
    return jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)], axis=0)


def _take_clip(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Row gather with mode="clip" for gathers that feed Pallas kernels.

    The jnp.take default (fill) lowers to gather + a FULL select_n pass
    over the gathered tensor; when the consumer is a custom call
    (pallas_call) that select cannot fuse and materializes — measured
    ~4 ms per slot-space gather at arxiv scale (r5 trace,
    tools/trace_report.py). Plan sentinel indices (ghost slot = n_src /
    e_orig) clamp to the last real row instead of reading an appended
    zero row; every such slot's contribution is already zeroed by the
    kernel's one-hot (rec_local = block_rows matches no output row), so
    the gathered VALUE is irrelevant for finite inputs — and it also
    removes the O(table) ghost-row concatenate copy each call paid."""
    return jnp.take(table, idx, axis=0, mode="clip")


def _chunks(plan):
    """A plan is either one SpmmPlan or a tuple of block-range chunk
    plans (ops/spmm_plan.py build_chunked_plans — products-scale
    graphs whose E x F message tensor would blow past HBM)."""
    return plan if isinstance(plan, tuple) else (plan,)


def _e_orig(plan) -> int:
    return _chunks(plan)[0].e_orig


def _reduce_chunks(plan, gather_fn, n_out: int) -> jax.Array:
    """gather+reduce each chunk; chunk outputs cover disjoint
    contiguous row ranges, so concatenation is the whole merge."""
    parts = [segment_reduce(p, gather_fn(p)) for p in _chunks(plan)]
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    return out[:n_out]


_MESSAGE_DTYPE = jnp.bfloat16  # halves the dominant HBM traffic
                               # (gather-materialize of E x F messages);
                               # f32 output accumulation stays exact.


def _gather_messages(plan: SpmmPlan, x: jax.Array) -> jax.Array:
    # cast BEFORE the gather: the random-read side of the gather then
    # moves bf16 rows (half the HBM traffic); XLA materializes the
    # bf16 copy once with a cheap sequential pass.
    if x.dtype == jnp.float32:
        x = x.astype(_MESSAGE_DTYPE)
    return _take_clip(x, plan.src_idx)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _spmm(plan_fwd: SpmmPlan, plan_bwd: SpmmPlan, x: jax.Array,
          n_nodes: int) -> jax.Array:
    out = _reduce_chunks(plan_fwd, lambda p: _gather_messages(p, x),
                         n_nodes)
    return out.astype(x.dtype)


def _spmm_fwd(plan_fwd, plan_bwd, x, n_nodes):
    return _spmm(plan_fwd, plan_bwd, x, n_nodes), (plan_fwd, plan_bwd)


def _spmm_bwd(n_nodes, res, dh):
    plan_fwd, plan_bwd = res
    # dh dtype == primal output dtype == x dtype (cast in _spmm)
    dx = _reduce_chunks(plan_bwd, lambda p: _gather_messages(p, dh),
                        n_nodes)
    return None, None, dx.astype(dh.dtype)


_spmm.defvjp(_spmm_fwd, _spmm_bwd)


def supported(g: Graph, x: jax.Array) -> bool:
    """Kernel path needs plans attached to the graph (built at ingest
    via to_device(build_plans=True)) and a rank-2 feature matrix."""
    return g.plans is not None and x.ndim == 2


def copy_u_sum(g: Graph, x: jax.Array) -> jax.Array:
    """Pallas-tier H[v] = sum over in-neighbors of x (differentiable)."""
    plan_fwd, plan_bwd = g.plans
    return _spmm(plan_fwd, plan_bwd, x, g.n_nodes)


def _gather_weighted(plan: SpmmPlan, x: jax.Array, w: jax.Array
                     ) -> jax.Array:
    """Planned weighted messages, flattened to [slots, F_total].

    x: [n, F] with w: [e_orig]         -> scalar-weighted messages
    x: [n, H, D] with w: [e_orig, H]   -> per-head weights folded into
                                          the feature axis (H*D) so ONE
                                          kernel call carries all heads
                                          (the GAT aggregation).
    """
    n = x.shape[0]
    x2 = x.reshape(n, -1)
    m = _take_clip(x2, plan.src_idx)
    ws = _take_clip(w, plan.edge_perm)             # [slots] or [slots, H]
    if w.ndim == 2:
        h = w.shape[1]
        d = x.shape[-1]
        m = (m.reshape(-1, h, d) * ws[..., None]).reshape(-1, h * d)
    else:
        m = m * ws[:, None]
    if m.dtype == jnp.float32:
        m = m.astype(_MESSAGE_DTYPE)
    return m


@partial(jax.custom_vjp, nondiff_argnums=(6,))
def _spmm_weighted(plan_fwd, plan_bwd, senders, receivers, x, w, n_nodes):
    out = _reduce_chunks(plan_fwd, lambda p: _gather_weighted(p, x, w),
                         n_nodes)
    if w.ndim == 2:
        out = out.reshape(n_nodes, w.shape[1], x.shape[-1])
    return out.astype(x.dtype)


def _spmm_weighted_fwd(plan_fwd, plan_bwd, senders, receivers, x, w,
                       n_nodes):
    out = _spmm_weighted(plan_fwd, plan_bwd, senders, receivers, x, w,
                         n_nodes)
    return out, (plan_fwd, plan_bwd, senders, receivers, x, w)


def _spmm_weighted_bwd(n_nodes, res, dh):
    plan_fwd, plan_bwd, senders, receivers, x, w = res
    # dX[u] = sum_{e: src=u} w_e dH[dst_e]: the same weighted reduce on
    # the transposed plan (its edge_perm is composed back into the
    # original dst-sorted order, so the weight gather is shared).
    dx = _reduce_chunks(plan_bwd, lambda p: _gather_weighted(p, dh, w),
                        n_nodes)
    if w.ndim == 2:
        dx = dx.reshape(n_nodes, w.shape[1], x.shape[-1])
    dx = dx.astype(x.dtype)

    # dW_e = <x[src_e], dH[dst_e]> per edge (per head): an SDDMM over
    # the real edges, done with two XLA row-gathers (E x F).
    e_orig = _e_orig(plan_fwd)
    src_e = senders[:e_orig]
    dst_e = receivers[:e_orig]
    if w.ndim == 2:
        xs = jnp.take(x, src_e, axis=0)                # [E, H, D]
        ds = jnp.take(dh, dst_e, axis=0)               # [E, H, D]
        dw = jnp.sum(xs * ds, axis=-1)                 # [E, H]
    else:
        xs = jnp.take(x, src_e, axis=0)
        ds = jnp.take(dh, dst_e, axis=0)
        dw = jnp.sum(xs * ds, axis=-1)
    return None, None, None, None, dx, dw.astype(w.dtype)


_spmm_weighted.defvjp(_spmm_weighted_fwd, _spmm_weighted_bwd)


# --------------------------------------------------------------------
# Rectangular reduction (sharded halo aggregation): sources index an
# n_in-row matrix (a feature block or a halo recv buffer), outputs
# cover n_out rows. Differentiable via the transposed plan.
# --------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def spmm_rect(plan_fwd: SpmmPlan, plan_bwd: SpmmPlan, x: jax.Array,
              n_out: int, n_in: int) -> jax.Array:
    out = _reduce_chunks(plan_fwd, lambda p: _gather_messages(p, x), n_out)
    return out.astype(x.dtype)


def _rect_fwd(plan_fwd, plan_bwd, x, n_out, n_in):
    return spmm_rect(plan_fwd, plan_bwd, x, n_out, n_in), (plan_fwd,
                                                           plan_bwd)


def _rect_bwd(n_out, n_in, res, dh):
    plan_fwd, plan_bwd = res
    dx = _reduce_chunks(plan_bwd, lambda p: _gather_messages(p, dh), n_in)
    return None, None, dx.astype(dh.dtype)


spmm_rect.defvjp(_rect_fwd, _rect_bwd)


# --------------------------------------------------------------------
# int8-quantized tier: the pipeline is gather-BYTES-bound (see module
# docstring), so per-COLUMN int8 quantization halves the dominant
# random-read traffic. Column scales commute with the reduction —
#   sum_u q[u, f] * s[f] == s[f] * sum_u q[u, f]
# — so dequantization is one multiply AFTER the exact int32 MXU
# accumulation; no per-row scale gather is needed. Quantization error
# is ~max_col/254 per element (per-column absmax), i.e. ~1% of sigma
# on gaussian-ish feature columns; opt in via ops.set_backend
# ("pallas_int8"). Backward is straight-through: dX = A^T dH on the
# exact bf16 kernel.
# --------------------------------------------------------------------


def _quantize_cols(x: jax.Array):
    s = jnp.max(jnp.abs(x), axis=0) / 127.0
    s = jnp.where(s > 0, s, 1.0)
    q = jnp.clip(jnp.round(x / s[None, :]), -127, 127).astype(jnp.int8)
    return q, s.astype(jnp.float32)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _spmm_int8(plan_fwd: SpmmPlan, plan_bwd: SpmmPlan, x: jax.Array,
               n_nodes: int) -> jax.Array:
    q, s = _quantize_cols(x)
    out = _reduce_chunks(
        plan_fwd, lambda p: _take_clip(q, p.src_idx), n_nodes)
    return (out.astype(jnp.float32) * s[None, :]).astype(x.dtype)


def _spmm_int8_fwd(plan_fwd, plan_bwd, x, n_nodes):
    return _spmm_int8(plan_fwd, plan_bwd, x, n_nodes), (plan_fwd, plan_bwd)


def _spmm_int8_bwd(n_nodes, res, dh):
    plan_fwd, plan_bwd = res
    dx = _reduce_chunks(plan_bwd, lambda p: _gather_messages(p, dh),
                        n_nodes)
    return None, None, dx.astype(dh.dtype)


_spmm_int8.defvjp(_spmm_int8_fwd, _spmm_int8_bwd)


def copy_u_sum_int8(g: Graph, x: jax.Array) -> jax.Array:
    """Quantized-gather H[v] = sum over in-neighbors of x. ~1.6x the
    bf16 tier on v5e (gather bytes halved); per-column int8 error."""
    plan_fwd, plan_bwd = g.plans
    return _spmm_int8(plan_fwd, plan_bwd, x, g.n_nodes)


def u_mul_e_sum(g: Graph, x: jax.Array, e: jax.Array) -> jax.Array:
    """Weighted SpMM, differentiable in both x and the per-edge
    weights (scalar weights: APPNP edge-drop; [E, H] weights: GAT
    attention, all heads folded into one kernel call). `e` follows the
    container's dst-sorted edge order; padding entries ignored."""
    plan_fwd, plan_bwd = g.plans
    w = e[: _e_orig(plan_fwd)]
    return _spmm_weighted(plan_fwd, plan_bwd, g.senders, g.receivers, x, w,
                          g.n_nodes)
