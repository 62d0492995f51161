"""Graph-level utilities on device: SGC feature propagation & min-cut.

* `feature_prop` — k hops of D^-1/2 A D^-1/2 X with in-degrees clamped
  to >=1 applied on BOTH sides (the reference uses in-degrees for both
  scalings, /root/reference/utils.py:171-189). Powers the GA-MLP
  (`--feature_aug_k`) augmentation.
* `compute_min_cut_loss` — tr(S^T A S) / tr(S^T D S) with S = exp(out).
  The reference densifies the adjacency (utils.py:159-168); we compute
  both traces sparsely: tr(S^T A S) = sum_e <S[src_e], S[dst_e]>,
  tr(S^T D S) = sum_v deg_v ||S_v||^2. Never densifies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from glnn_tpu.graph.container import Graph
from glnn_tpu.ops.refops import copy_u_sum


def feature_prop(feats: jax.Array, g: Graph, k: int) -> jax.Array:
    norm = jax.lax.rsqrt(jnp.maximum(g.in_degrees, 1.0))[:, None]
    h = feats
    for _ in range(k):
        h = h * norm
        h = copy_u_sum(g, h)
        h = h * norm
    return h


@jax.jit
def compute_min_cut_loss(g: Graph, out_log_probs: jax.Array) -> jax.Array:
    s = jnp.exp(out_log_probs)
    if g.e_pad != g.n_edges:
        s_pad = jnp.concatenate([s, jnp.zeros((1, s.shape[1]), s.dtype)], 0)
    else:
        s_pad = s
    num = jnp.sum(
        jnp.take(s_pad, g.senders, axis=0) * jnp.take(s_pad, g.receivers, axis=0)
    )
    den = jnp.sum(g.in_degrees[:, None] * s * s)
    return num / den
