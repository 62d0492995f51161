"""Parameter initializers matching the reference's effective init.

The reference mixes torch defaults with DGL layer-specific resets:
* torch nn.Linear default: kaiming_uniform(a=sqrt(5)) on weight ==
  U(-1/sqrt(fan_in), 1/sqrt(fan_in)); bias the same bound.
* DGL GraphConv: xavier_uniform weight, zero bias.
* DGL SAGEConv: xavier_uniform(gain=sqrt(2)) on fc_neigh weight; bias
  keeps the torch Linear default.
* DGL GATConv: xavier_normal(gain=sqrt(2)) on fc and attention vectors.

Flax kernels are (fan_in, fan_out); xavier is symmetric so the layout
difference doesn't matter.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def torch_linear_kernel(key, shape, dtype=jnp.float32):
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def xavier_uniform(gain: float = 1.0):
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[0], shape[-1]
        bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def xavier_normal(gain: float = 1.0):
    def init(key, shape, dtype=jnp.float32):
        if len(shape) >= 2:
            fan_in, fan_out = shape[0], shape[-1]
        else:  # attention vectors (H, D) treated as (1, H*D) by torch
            fan_in, fan_out = 1, shape[-1]
        std = gain * math.sqrt(2.0 / (fan_in + fan_out))
        return std * jax.random.normal(key, shape, dtype)

    return init


def attn_vector_normal(gain: float = math.sqrt(2.0)):
    """xavier_normal for GAT attention vectors of torch shape
    (1, num_heads, out_dim): fan_in = out_dim, fan_out = out_dim per
    torch's _calculate_fan_in_and_fan_out on a 3D tensor."""

    def init(key, shape, dtype=jnp.float32):
        # shape = (num_heads, out_dim)
        fan = shape[-1]
        std = gain * math.sqrt(2.0 / (fan + fan))
        return std * jax.random.normal(key, shape, dtype)

    return init
