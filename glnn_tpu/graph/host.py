"""Host-side graph representation and edge-set surgery.

Everything here runs once at data-ingest time on the host (numpy /
scipy.sparse, optionally accelerated by the native C++ library in
`native/`), producing the static arrays that `container.build_graph`
ships to the device. This replaces the reference's reliance on DGL's
C++ graph ops (to_bidirected / add_self_loop / subgraph / largest-CC;
see /root/reference/dataloader.py:75-77,127,159 and
/root/reference/train_and_eval.py:324).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from glnn_tpu.graph.container import Graph, build_graph


class HostGraph:
    """A mutable host graph: COO edges + node features.

    API kept close in spirit to the reference's `g` objects: `.ndata`
    carries node features, `num_nodes()`/`num_edges()` match, and
    `subgraph(idx)` returns the node-induced subgraph with nodes
    relabeled in `idx` order (the contract run_inductive depends on,
    /root/reference/train_and_eval.py:324).
    """

    def __init__(self, src: np.ndarray, dst: np.ndarray, n_nodes: int):
        self.src = np.asarray(src, np.int64)
        self.dst = np.asarray(dst, np.int64)
        self.n_nodes = int(n_nodes)
        self.ndata: dict[str, np.ndarray] = {}
        self._device_graph: Graph | None = None

    # -- basic queries ------------------------------------------------
    def num_nodes(self) -> int:
        return self.n_nodes

    def number_of_nodes(self) -> int:
        return self.n_nodes

    def num_edges(self) -> int:
        return int(self.src.shape[0])

    def number_of_edges(self) -> int:
        return self.num_edges()

    def in_degrees(self) -> np.ndarray:
        return np.bincount(self.dst, minlength=self.n_nodes)

    def out_degrees(self) -> np.ndarray:
        return np.bincount(self.src, minlength=self.n_nodes)

    # -- edge surgery (all return new HostGraph, features carried) ----
    def _with_edges(self, src, dst, n_nodes=None) -> "HostGraph":
        g = HostGraph(src, dst, self.n_nodes if n_nodes is None else n_nodes)
        g.ndata = dict(self.ndata)
        return g

    def add_reverse_edges(self) -> "HostGraph":
        """Append reversed copies of every edge (keeps duplicates),
        mirroring `g.add_edges(dsts, srcs)` for ogbn-arxiv
        (/root/reference/dataloader.py:75-76)."""
        return self._with_edges(
            np.concatenate([self.src, self.dst]),
            np.concatenate([self.dst, self.src]),
        )

    def to_bidirected(self) -> "HostGraph":
        """Symmetrize and deduplicate the edge set (native C++ kernel
        when built, numpy otherwise)."""
        from glnn_tpu import native

        src, dst = native.to_bidirected(self.src, self.dst, self.n_nodes)
        return self._with_edges(src, dst)

    def remove_self_loop(self) -> "HostGraph":
        keep = self.src != self.dst
        return self._with_edges(self.src[keep], self.dst[keep])

    def add_self_loop(self) -> "HostGraph":
        loops = np.arange(self.n_nodes, dtype=np.int64)
        return self._with_edges(
            np.concatenate([self.src, loops]), np.concatenate([self.dst, loops])
        )

    def subgraph(self, idx: np.ndarray) -> "HostGraph":
        """Node-induced subgraph, relabeled so new id i == idx[i]."""
        from glnn_tpu import native

        idx = np.asarray(idx, np.int64)
        src, dst = native.induced_subgraph(self.src, self.dst,
                                           self.n_nodes, idx)
        g = HostGraph(src, dst, idx.shape[0])
        g.ndata = {k: v[idx] for k, v in self.ndata.items()}
        return g

    # -- CSR views ----------------------------------------------------
    def csr(self) -> tuple[np.ndarray, np.ndarray]:
        """Out-adjacency CSR (indptr, indices): neighbors reachable FROM v."""
        from glnn_tpu import native

        return native.coo_to_csr(self.src, self.dst, self.n_nodes)

    def csc(self) -> tuple[np.ndarray, np.ndarray]:
        """In-adjacency CSR (indptr, indices): in-neighbors of v."""
        from glnn_tpu import native

        return native.coo_to_csr(self.dst, self.src, self.n_nodes)

    def adj_scipy(self) -> sp.csr_matrix:
        return sp.csr_matrix(
            (np.ones(self.num_edges(), np.float32), (self.src, self.dst)),
            shape=(self.n_nodes, self.n_nodes),
        )

    # -- device handoff ----------------------------------------------
    def to_device(self, pad_to: int | None = None,
                  build_plans: bool = False,
                  softmax_plans: bool | None = None,
                  window_table: bool = False) -> Graph:
        from glnn_tpu.ops.attention_plan import softmax_auto

        want_smx = (softmax_auto(self.num_edges())
                    if softmax_plans is None else softmax_plans)
        if self._device_graph is None or pad_to is not None:
            g = build_graph(self.src, self.dst, self.n_nodes, pad_to=pad_to)
            if build_plans:
                g = g.with_plans(softmax=want_smx)
                if want_smx and g.smx is None:
                    self._smx_declined = True
            self._device_graph = g
        elif build_plans and (self._device_graph.plans is None or (
                want_smx and self._device_graph.smx is None
                and not getattr(self, "_smx_declined", False))):
            # the attention plan can DECLINE (mega-hub skew / pad
            # waste); remember that, or every later to_device would
            # rebuild all the SpMM plans just to decline again
            g = self._device_graph.with_plans(softmax=want_smx)
            if want_smx and g.smx is None:
                self._smx_declined = True
            self._device_graph = g
        if window_table and self._device_graph.win1 is None:
            # aligned 1-touch sampler table (--sampler_tier window)
            self._device_graph = self._device_graph.with_window_table()
        return self._device_graph


def largest_connected_component(g: HostGraph) -> np.ndarray:
    """Node indices of the largest (weakly) connected component."""
    from glnn_tpu import native

    n_comp, labels = native.connected_components(g.src, g.dst, g.n_nodes)
    if n_comp == 1:
        return np.arange(g.n_nodes)
    sizes = np.bincount(labels)
    return np.where(labels == sizes.argmax())[0]


def rcm_ordering(g: HostGraph) -> np.ndarray:
    """Reverse-Cuthill-McKee node permutation (old -> position). A
    locality-preserving relabeling concentrates edges near the diagonal,
    which tightens the Pallas SpMM's within-tile gather window and cuts
    halo traffic for contiguous partitions."""
    perm = sp.csgraph.reverse_cuthill_mckee(g.adj_scipy(), symmetric_mode=False)
    return np.asarray(perm, np.int64)


def reorder_nodes(g: HostGraph, order: np.ndarray) -> HostGraph:
    """Relabel nodes so new id i == order[i] (features follow)."""
    order = np.asarray(order, np.int64)
    new_id = np.empty(g.n_nodes, np.int64)
    new_id[order] = np.arange(g.n_nodes)
    out = HostGraph(new_id[g.src], new_id[g.dst], g.n_nodes)
    out.ndata = {k: v[order] for k, v in g.ndata.items()}
    return out
