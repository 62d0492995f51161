"""Device mesh construction + sharding placement for graph training.

The reference has no distributed execution (SURVEY.md §2.4); this is a
new capability. Design (scaling-book recipe): pick a mesh, annotate
shardings on the operands, let XLA's SPMD partitioner insert the
collectives, then tighten the hot paths with shard_map + explicit
halo exchange (distributed/halo.py, later tier).

Axes:
  "graph" — 1D node/edge partition (the TP/SP analog for graphs):
            node-feature rows and dst-sorted edges are sharded;
            cross-shard messages become XLA-inserted collectives.
  "data"  — batch parallelism for the graph-free student (DP).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from glnn_tpu.graph.container import Graph, build_graph


def make_mesh(n_devices: int | None = None, axis: str = "graph") -> Mesh:
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if len(devs) < n_devices:
        raise ValueError(f"need {n_devices} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n_devices]), (axis,))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_graph_for_mesh(host_graph, n_shards: int) -> Graph:
    """Device graph with the edge array padded to a multiple of the
    shard count (padding edges target the ghost node)."""
    e_pad = _round_up(host_graph.num_edges(), n_shards)
    return build_graph(host_graph.src, host_graph.dst,
                       host_graph.num_nodes(), pad_to=e_pad)


def shard_graph(g: Graph, mesh: Mesh, axis: str = "graph") -> Graph:
    """Place a Graph on the mesh: edge arrays sharded along `axis`
    (contiguous dst-sorted ranges -> each shard owns a dst range),
    node-level arrays replicated (they are O(N) scalars, cheap; the
    feature matrix is what matters and is sharded separately)."""
    edge_sh = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def put(arr, sh):
        return jax.device_put(arr, sh)

    return Graph(
        senders=put(g.senders, edge_sh),
        receivers=put(g.receivers, edge_sh),
        indptr=put(g.indptr, repl),
        edge_weight=None if g.edge_weight is None else put(g.edge_weight,
                                                           edge_sh),
        in_degrees=put(g.in_degrees, repl),
        out_degrees=put(g.out_degrees, repl),
        n_nodes=g.n_nodes,
        n_edges=g.n_edges,
    )


def shard_nodes(x, mesh: Mesh, axis: str = "graph"):
    """Shard a node-feature matrix row-wise over the mesh axis
    (requires rows % mesh size == 0; pad at ingest if needed)."""
    return jax.device_put(x, NamedSharding(mesh, P(axis, None)))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))
