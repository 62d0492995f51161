"""Graph conv layers (flax) with DGL-0.6.1-parity math.

Formulas implemented (SURVEY.md §2.2 contracts; reference instantiation
sites cited per class):

* SAGEConvGCN  — SAGEConv(aggregator_type="gcn"): for dst v,
  h~_v = (sum_{u in N_in(v)} h_u + h_v) / (deg_in(v) + 1);
  out = W h~ + b. No separate self-weight, no activation inside.
  (models.py:84-99)
* GraphConv    — norm='both': D^-1/2 A D^-1/2 X W + b, degrees clamped
  to >=1, optional fused activation. W applied before aggregation when
  in_dim > out_dim (fewer FLOPs), after otherwise — same math.
  (models.py:170-187)
* GATConv      — per head: e_uv = LeakyReLU_.2(a_l.Wh_u + a_r.Wh_v),
  alpha = softmax over in-edges, h'_v = sum alpha Wh_u; feat_drop on
  input, attn_drop on alpha; no bias, no residual. (models.py:227-266)
* appnp_propagate — k iterations of
  h <- (1-alpha) D^-1/2 A_drop D^-1/2 h + alpha h0, with per-edge
  dropout (zero + 1/(1-p) rescale) during training. (models.py:323)

All layers consume the static `Graph` and the Tier-A ops; swapping in
Pallas kernels happens inside glnn_tpu.ops without touching this file.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from glnn_tpu.graph.container import Graph
from glnn_tpu.nn import initializers as gi
from glnn_tpu.ops import (copy_u_sum, gat_attention, gcn_norm_both,
                          u_mul_e_sum)


class SAGEConvGCN(nn.Module):
    """SAGEConv('gcn'). `data` is either a full Graph or a sampled
    block dict {nbr_local, valid, self_local} (glnn_tpu.sampling): on
    blocks the divisor is (#sampled real neighbors + 1), matching DGL's
    block in-degree semantics on MFGs.

    `dtype` (default None = float32) sets the COMPUTE dtype: with
    bfloat16 the frontier activations, the neighbor reduce and the
    dense matmul all run/stream in bf16 while parameters stay float32
    — the memory-bound sampled-SAGE passes over the [4.3M, F] frontier
    tensors halve their HBM traffic (PERF.md r4 decomposition; the r5
    'bf16 frontier activations' lever)."""

    out_dim: int
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, data, x: jax.Array,
                 x_dst: Optional[jax.Array] = None) -> jax.Array:
        if self.dtype is not None:
            x = x.astype(self.dtype)
            x_dst = None if x_dst is None else x_dst.astype(self.dtype)
        if not isinstance(data, dict):       # Graph or HaloGraph
            if x_dst is None:
                x_dst = x
            neigh = copy_u_sum(data, x)
            h = (neigh + x_dst) / (data.in_degrees[:, None] + 1.0)
        else:
            nbr, valid, self_local = (data["nbr_local"], data["valid"],
                                      data["self_local"])
            if data.get("concat"):
                # concat-mode blocks (sampler default): nbr_local is
                # n_out + arange(n_out*K) and self_local is arange —
                # static slices, no gather materialization at all
                n_out, k = valid.shape
                gathered = x[n_out:n_out + n_out * k].reshape(
                    n_out, k, x.shape[-1])
                h_self = x[:n_out]
            else:
                gathered = jnp.take(x, nbr, axis=0)      # [V, K, F]
                h_self = jnp.take(x, self_local, axis=0)
            mask = valid[..., None].astype(x.dtype)
            neigh = jnp.sum(gathered * mask, axis=1)
            deg = jnp.sum(valid, axis=1).astype(x.dtype)
            h = (neigh + h_self) / (deg[:, None] + 1.0)
        return nn.Dense(
            self.out_dim,
            kernel_init=gi.xavier_uniform(math.sqrt(2.0)),
            bias_init=gi.torch_linear_bias(x.shape[-1]),
            dtype=self.dtype,
        )(h)


class GraphConv(nn.Module):
    out_dim: int
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, g: Graph, x: jax.Array) -> jax.Array:
        in_dim = x.shape[-1]
        w = self.param("kernel", gi.xavier_uniform(), (in_dim, self.out_dim))
        b = self.param("bias", nn.initializers.zeros, (self.out_dim,))
        if in_dim > self.out_dim:
            h = gcn_norm_both(g, x @ w)
        else:
            h = gcn_norm_both(g, x) @ w
        h = h + b
        if self.activation is not None:
            h = self.activation(h)
        return h


class GATConv(nn.Module):
    out_dim: int            # per-head output dim
    num_heads: int
    feat_drop: float = 0.0
    attn_drop: float = 0.0
    negative_slope: float = 0.2
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, g: Graph, x: jax.Array, training: bool = False) -> jax.Array:
        h = nn.Dropout(self.feat_drop, deterministic=not training)(x)
        feat = nn.Dense(
            self.out_dim * self.num_heads, use_bias=False,
            kernel_init=gi.xavier_normal(math.sqrt(2.0)),
        )(h).reshape(-1, self.num_heads, self.out_dim)

        attn_l = self.param("attn_l", gi.attn_vector_normal(),
                            (self.num_heads, self.out_dim))
        attn_r = self.param("attn_r", gi.attn_vector_normal(),
                            (self.num_heads, self.out_dim))
        # one fused op (scores -> softmax -> attn dropout -> weighted
        # aggregate): the Pallas tier runs it entirely in slot space
        # (ops/gat_pallas.py); graphs without an attention plan compose
        # the per-op tiers inside the dispatcher with the same math
        drop = self.attn_drop if training else 0.0
        rng = self.make_rng("dropout") if drop > 0.0 else None
        out = gat_attention(g, feat, attn_l, attn_r,
                            slope=self.negative_slope, drop_rate=drop,
                            drop_rng=rng)     # [N, H, D]
        if self.activation is not None:
            out = self.activation(out)
        return out


def appnp_propagate(g: Graph, h: jax.Array, k: int, alpha: float,
                    edge_drop: float, training: bool = False,
                    rng: Optional[jax.Array] = None) -> jax.Array:
    """APPNPConv(k, alpha, edge_drop) propagation after the MLP head.

    The k hops run under lax.scan so the SpMM kernel is traced exactly
    once (an unrolled loop would inline k forward + k backward Pallas
    instances and blow up compile time)."""
    h0 = h
    use_drop = training and edge_drop > 0.0
    if use_drop and rng is None:
        raise ValueError("appnp_propagate needs an rng when edge_drop is on")

    def body(carry, i):
        if use_drop:
            keep = jax.random.bernoulli(
                jax.random.fold_in(rng, i), 1.0 - edge_drop, (g.e_pad,)
            )
            w = keep.astype(carry.dtype) / (1.0 - edge_drop)
            prop = gcn_norm_both(g, carry, edge_weight=w)
        else:
            prop = gcn_norm_both(g, carry)
        return (1.0 - alpha) * prop + alpha * h0, None

    h, _ = jax.lax.scan(body, h, jnp.arange(k))
    return h


class BatchNorm1d(nn.Module):
    """torch.nn.BatchNorm1d semantics: biased batch variance for
    normalization, UNBIASED variance into the running average,
    momentum 0.1 (new = 0.9*old + 0.1*batch). Optional row mask so
    ghost-padded frontier rows (sampled SAGE path) don't pollute the
    statistics."""

    use_running_average: bool
    momentum: float = 0.1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None
                 ) -> jax.Array:
        f = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (f,))
        bias = self.param("bias", nn.initializers.zeros, (f,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((f,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((f,), jnp.float32))

        # statistics always in f32: a bf16 mean/variance over ~1M rows
        # loses most of its mantissa (the bf16 compute-dtype tier casts
        # activations down, not the running stats)
        xs = x.astype(jnp.float32)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            if mask is None:
                n = jnp.asarray(x.shape[0], jnp.float32)
                mean = jnp.mean(xs, axis=0)
                var = jnp.mean(jnp.square(xs - mean), axis=0)
            else:
                w = mask.astype(jnp.float32)[:, None]
                n = jnp.maximum(jnp.sum(w), 1.0)
                mean = jnp.sum(xs * w, axis=0) / n
                var = jnp.sum(w * jnp.square(xs - mean), axis=0) / n
            unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        out = (xs - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return out.astype(x.dtype)


class LayerNorm1d(nn.Module):
    """torch.nn.LayerNorm over the feature axis (eps 1e-5)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None
                 ) -> jax.Array:
        f = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (f,))
        bias = self.param("bias", nn.initializers.zeros, (f,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias


def make_norm(norm_type: str, training: bool):
    """BatchNorm1d / LayerNorm with torch eps+momentum (1e-5, 0.1).
    Both returned modules accept an optional row mask."""
    if norm_type == "batch":
        return BatchNorm1d(use_running_average=not training)
    if norm_type == "layer":
        return LayerNorm1d()
    raise ValueError(f"unknown norm_type {norm_type!r}")
