"""One-shot packed host->device transfer for array pytrees.

Through the axon relay each `jnp.asarray` upload pays a large
per-transfer floor (~45s/array measured in round 2 — 963s for one
graph + plan set, BENCH_r02). A Graph with Pallas plans is ~15 small
int32/float32 arrays, so shipping it field-by-field is pathological.
`ship_packed` flattens any pytree of host numpy arrays whose dtypes
are 4-byte (int32 / float32), concatenates them into ONE int32
buffer, uploads that buffer once, and re-slices it on device under a
single jit (bitcasting float leaves back). Static pytree structure
(registered-dataclass meta fields) passes through untouched.

Build the host-side tree with the `device=False` paths
(`build_graph(..., device=False)`, `Graph.with_plans(device=False)`)
and ship the result here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pack_tree(tree):
    """Flatten a pytree of host arrays into (int32 buffer, meta).

    Every leaf must be a numpy array (or scalar-free array-like) with
    a 4-byte dtype; float32 leaves are bit-viewed, not converted.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    parts, specs = [], []
    off = 0
    for leaf in leaves:
        a = np.ascontiguousarray(leaf)
        if a.dtype.itemsize != 4:
            raise TypeError(
                f"pack_tree: leaf dtype {a.dtype} is not 4-byte "
                "(cast int64 ids to int32 / float64 to float32 first)")
        parts.append(a.reshape(-1).view(np.int32))
        specs.append((a.shape, a.dtype.str, off))
        off += a.size
    buf = (np.concatenate(parts) if parts
           else np.zeros(0, np.int32))
    return buf, (treedef, tuple(specs))


def unpack_tree(buf: jax.Array, meta):
    """Rebuild the pytree from a device buffer (traceable)."""
    treedef, specs = meta
    leaves = []
    for shape, dtype, off in specs:
        size = int(np.prod(shape, dtype=np.int64))
        flat = jax.lax.slice(buf, (off,), (off + size,))
        dt = np.dtype(dtype)
        if dt != np.dtype(np.int32):
            flat = jax.lax.bitcast_convert_type(flat, dt)
        leaves.append(flat.reshape(shape))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def ship_packed(tree):
    """Move a host-array pytree to device with ONE transfer."""
    buf, meta = pack_tree(tree)
    dbuf = jnp.asarray(buf)                      # the single upload
    out = jax.jit(lambda b: unpack_tree(b, meta))(dbuf)
    return out
