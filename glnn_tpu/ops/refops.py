"""Tier-A message-passing ops: pure XLA segment primitives.

This is the correctness oracle and the CPU-runnable path. The op
surface is exactly the set of native kernels the reference exercises
through DGL (SURVEY.md §2.3): ``copy_u_sum``/``copy_u_mean`` (GSpMM),
``u_add_v`` + ``edge_softmax`` + ``u_mul_e_sum`` (GSDDMM / GAT path).

All ops take the static `Graph` container (dst-sorted COO). Padding
edges point at the ghost node `n_nodes`, so segment reductions use
``num_segments = n_nodes + 1`` and drop the last row — one code path
for padded and unpadded graphs, no masking in the hot loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from glnn_tpu.graph.container import Graph


def gather_src(g: Graph, x: jax.Array) -> jax.Array:
    """x[senders] with a zero ghost row appended for padding edges."""
    if g.e_pad != g.n_edges:
        x = jnp.concatenate([x, jnp.zeros((1,) + x.shape[1:], x.dtype)], axis=0)
    return jnp.take(x, g.senders, axis=0)


def _segment_sum(g: Graph, messages: jax.Array) -> jax.Array:
    out = jax.ops.segment_sum(
        messages, g.receivers, num_segments=g.n_nodes + 1,
        indices_are_sorted=True,
    )
    return out[: g.n_nodes]


def copy_u_sum(g: Graph, x: jax.Array) -> jax.Array:
    """h_v = sum_{u in N_in(v)} x_u  (GSpMM copy_u->sum)."""
    return _segment_sum(g, gather_src(g, x))


# chunk the edge stream when the gathered message tensor would exceed
# this many bytes (keeps ogbn-products-scale full-graph inference—the
# reference's layer-wise SAGE.inference analog—inside HBM)
MESSAGE_BUDGET_BYTES = 2 ** 31


def copy_u_sum_chunked(g: Graph, x: jax.Array,
                       budget_bytes: int = MESSAGE_BUDGET_BYTES) -> jax.Array:
    """Memory-bounded copy_u_sum: stream dst-sorted edge chunks and
    scatter-add into the output, never materializing all E x F
    messages. Replaces the reference's layer-wise minibatched SAGE
    inference (models.py:121-148) for graphs too large to aggregate in
    one shot. Differentiable (scatter-add <-> gather transpose)."""
    f = x.shape[-1]
    chunk = max(1 << 18, budget_bytes // max(f * x.dtype.itemsize, 1))
    if g.e_pad <= chunk:
        return copy_u_sum(g, x)
    x_ext = jnp.concatenate([x, jnp.zeros((1, f), x.dtype)], axis=0)
    # lax.scan over equal-size chunks (ONE trace of the chunk body
    # instead of ~E/chunk unrolled scatter-adds — at products scale the
    # unroll was compile-heavy, VERDICT r1). The tail chunk is padded
    # with ghost edges (src = dst = n_nodes) whose messages land on the
    # dropped ghost row.
    n_chunks = -(-g.e_pad // chunk)
    pad = n_chunks * chunk - g.e_pad
    snd = jnp.concatenate([g.senders, jnp.full(pad, g.n_nodes, jnp.int32)])
    rec = jnp.concatenate([g.receivers,
                           jnp.full(pad, g.n_nodes, jnp.int32)])
    snd = snd.reshape(n_chunks, chunk)
    rec = rec.reshape(n_chunks, chunk)

    def body(out, edges):
        s, r = edges
        msgs = jnp.take(x_ext, s, axis=0)
        return out.at[r].add(msgs, indices_are_sorted=True), None

    out = jnp.zeros((g.n_nodes + 1, f), x.dtype)
    out, _ = jax.lax.scan(body, out, (snd, rec))
    return out[: g.n_nodes]


def copy_u_mean(g: Graph, x: jax.Array) -> jax.Array:
    """h_v = mean over in-neighbors (degree-0 rows -> 0)."""
    s = copy_u_sum(g, x)
    deg = jnp.maximum(g.in_degrees, 1.0)
    return s / deg[:, None]


def u_mul_e_sum(g: Graph, x: jax.Array, e: jax.Array) -> jax.Array:
    """h_v = sum_u e_uv * x_u; e is per-edge, shape [E_pad] or
    [E_pad, H] (per-head attention weights, broadcast over features)."""
    msgs = gather_src(g, x)
    if e.ndim == msgs.ndim - 1:
        e = e[..., None]
    return _segment_sum(g, msgs * e)


def u_add_v(g: Graph, a_u: jax.Array, a_v: jax.Array) -> jax.Array:
    """Per-edge score a_u[src] + a_v[dst] (the GAT SDDMM: attention
    logits decompose into per-node scalars, models.py GATConv math)."""
    if g.e_pad != g.n_edges:
        pad = jnp.zeros((1,) + a_u.shape[1:], a_u.dtype)
        a_u = jnp.concatenate([a_u, pad], axis=0)
        a_v = jnp.concatenate([a_v, pad], axis=0)
    return jnp.take(a_u, g.senders, axis=0) + jnp.take(a_v, g.receivers, axis=0)


def edge_softmax(g: Graph, scores: jax.Array) -> jax.Array:
    """Softmax over each destination's in-edge segment.

    scores: [E_pad] or [E_pad, H]. Numerically-stable segment softmax:
    subtract per-dst max, exp, divide by per-dst sum.
    """
    seg_max = jax.ops.segment_max(
        scores, g.receivers, num_segments=g.n_nodes + 1,
        indices_are_sorted=True,
    )
    # empty segments give -inf; harmless because never gathered back
    shifted = scores - jnp.take(seg_max, g.receivers, axis=0)
    expv = jnp.exp(shifted)
    seg_sum = jax.ops.segment_sum(
        expv, g.receivers, num_segments=g.n_nodes + 1,
        indices_are_sorted=True,
    )
    return expv / jnp.take(seg_sum, g.receivers, axis=0)


def gcn_norm_both(g: Graph, x: jax.Array, edge_weight=None) -> jax.Array:
    """D^-1/2 A D^-1/2 x with degrees clamped to >= 1 — the
    GraphConv(norm='both') aggregation (DGL 0.6.1 contract, SURVEY §2.2).
    `edge_weight` optionally scales messages (used by APPNP edge-drop)."""
    src_norm = jax.lax.rsqrt(jnp.maximum(g.out_degrees, 1.0))
    dst_norm = jax.lax.rsqrt(jnp.maximum(g.in_degrees, 1.0))
    h = x * src_norm[:, None]
    if edge_weight is None:
        h = copy_u_sum(g, h)
    else:
        h = u_mul_e_sum(g, h, edge_weight)
    return h * dst_norm[:, None]
