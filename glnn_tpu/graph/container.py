"""Static graph containers for XLA.

Design: the canonical device-side graph is a destination-sorted COO edge
list plus the CSC ``indptr`` implied by that sort. All shapes are static,
so any jitted function over a given dataset traces exactly once.

Why dst-sorted COO (== CSC): every message-passing primitive the GLNN
model zoo needs (reference: /root/reference/models.py:4 delegates to DGL
GSpMM/GSDDMM kernels) reduces messages *at the destination*; with edges
sorted by receiver, ``jax.ops.segment_sum(..., indices_are_sorted=True)``
and the Pallas kernels both stream edge blocks with monotone output rows.

Padding convention: optional trailing padding edges point src=dst=n_nodes
(a ghost node). Aggregations allocate n_nodes+1 segments and drop the
ghost row, so padded and unpadded graphs share one code path.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["senders", "receivers", "indptr", "edge_weight",
                 "in_degrees", "out_degrees", "plans", "smx", "win1"],
    meta_fields=["n_nodes", "n_edges"],
)
@dataclasses.dataclass(frozen=True)
class Graph:
    """Device-side static graph.

    Attributes:
      senders:    int32[E_pad]  source node id per edge.
      receivers:  int32[E_pad]  destination node id per edge, nondecreasing.
      indptr:     int32[N+2]    CSC row pointer over receivers (incl. ghost
                                row N); in-edges of v are indptr[v]:indptr[v+1].
      edge_weight: float32[E_pad] or None  per-edge weight (GCN-style norms
                                are computed from degrees, not stored here;
                                this field carries dataset-level weights).
      in_degrees:  float32[N]   number of in-edges per node (real edges only).
      out_degrees: float32[N]   number of out-edges per node.
      n_nodes:    static int    number of real nodes N.
      n_edges:    static int    number of real (non-padding) edges.
    """

    senders: jax.Array
    receivers: jax.Array
    indptr: jax.Array
    edge_weight: jax.Array | None
    in_degrees: jax.Array
    out_degrees: jax.Array
    n_nodes: int
    n_edges: int
    # optional (forward, backward) SpmmPlan pair for the Pallas kernel
    # tier (ops/spmm_plan.py); None keeps the pure-XLA path.
    plans: tuple | None = None
    # optional AttentionPlan for the fused Pallas attention tier (GAT
    # edge softmax + aggregation, ops/attention_plan.py); built on
    # request only.
    smx: object | None = None
    # optional ALIGNED per-node neighbor window table int32[N+1, W]
    # (with_window_table): row v carries v's first W in-neighbors
    # (ghost-padded; row N is the all-ghost row). The window sampler
    # tier then reads ONE aligned row per frontier node instead of two
    # unaligned rows of the reshaped edge array — the r5 "aligned
    # 1-touch windows" lever (PERF.md r4 decomposition).
    win1: jax.Array | None = None

    def with_plans(self, tile: int = 512, block_rows: int = 512,
                   softmax: bool | None = None,
                   device: bool = True) -> "Graph":
        from glnn_tpu.ops.attention_plan import softmax_auto
        from glnn_tpu.ops.spmm_plan import plan_for_graph

        g = dataclasses.replace(self, plans=plan_for_graph(
            self, tile=tile, block_rows=block_rows, device=device))
        if softmax is None:
            # auto: plans imply the attention tier too unless the graph
            # is large enough that the extra index arrays matter — so
            # ops.edge_softmax / the fused GAT layer hit Pallas with no
            # caller special-casing (r2 VERDICT: the tier was reachable
            # only via one CLI branch)
            softmax = softmax_auto(self.n_edges)
        if softmax:
            from glnn_tpu.ops.attention_plan import \
                build_chunked_attention_plans

            host = getattr(self, "_host_edges", None)
            if host is not None:
                snd, rec = host
            else:
                rec = np.asarray(self.receivers)[: self.n_edges]
                snd = np.asarray(self.senders)[: self.n_edges]
            # beyond the single-plan slot budget this returns a TUPLE
            # of block-range chunk plans (products-scale fused GAT —
            # the attention analog of the chunked SpMM plans)
            att = build_chunked_attention_plans(rec, snd, self.n_nodes,
                                                device=device)
            if att is not None:      # None: mega-hub skew -> XLA tier
                g = dataclasses.replace(g, smx=att)
        host = getattr(self, "_host_edges", None)
        if host is not None:         # keep the host edge cache alive
            object.__setattr__(g, "_host_edges", host)
        return g

    def with_window_table(self, width: int = 64,
                          device: bool = True) -> "Graph":
        """Attach the aligned 1-touch neighbor window table for the
        window sampler tier (sampling/sampler.py): win1[v] = v's first
        `width` in-neighbors, ghost-padded; win1[N] is all-ghost.
        Sampling reads ONE `width`-wide row per frontier node (256 B at
        width=64 — safely inside the row-rate-bound gather regime) and
        is bit-identical to the exact Floyd tier for deg <= width; the
        heavier-node fold bias matches the 2-row window tier's,
        documented there. Costs (N+1)*width*4 bytes of HBM (~627 MB at
        ogbn-products scale)."""
        host = getattr(self, "_host_edges", None)
        if host is not None:
            snd = host[0]
        else:
            snd = np.asarray(self.senders)[: self.n_edges]
        indptr = (np.asarray(self.indptr) if host is None
                  else self._host_indptr())
        n = self.n_nodes
        deg = (indptr[1 : n + 1] - indptr[:n]).astype(np.int64)
        j = np.arange(width, dtype=np.int64)
        idx = indptr[:n, None].astype(np.int64) + j[None, :]
        valid = j[None, :] < np.minimum(deg, width)[:, None]
        if len(snd) == 0:
            tab = np.full((n, width), n, np.int32)
        else:
            idx_c = np.minimum(idx, len(snd) - 1)
            tab = np.where(valid, snd[idx_c], n).astype(np.int32)
        tab = np.concatenate([tab, np.full((1, width), n, np.int32)])
        g = dataclasses.replace(
            self, win1=jnp.asarray(tab) if device else tab)
        if host is not None:
            object.__setattr__(g, "_host_edges", host)
        return g

    def _host_indptr(self) -> np.ndarray:
        """CSC indptr recomputed on host from the edge cache (avoids a
        device->host fetch when the container is already on device)."""
        _, rec = self._host_edges
        counts = np.bincount(rec, minlength=self.n_nodes + 1)
        indptr = np.zeros(self.n_nodes + 2, np.int64)
        np.cumsum(counts, out=indptr[1:])
        return indptr

    @property
    def num_nodes(self) -> int:
        return self.n_nodes

    @property
    def num_edges(self) -> int:
        return self.n_edges

    @property
    def e_pad(self) -> int:
        """Total edge-array length including padding."""
        return self.senders.shape[0]


def _sort_by_dst(dst: np.ndarray, n_nodes: int) -> np.ndarray:
    """Stable sort permutation by destination. The native O(E) counting
    sort (native/graphops.cpp) beats numpy's argsort ~10x at
    ogbn-products scale; numpy is the fallback."""
    try:
        from glnn_tpu import native

        if native.available():
            order = np.empty(dst.shape[0], np.int64)
            native._load().sort_edges(
                dst.shape[0], native._p(native._c64(dst)), n_nodes,
                native._p(order))
            return order
    except Exception:
        pass
    return np.argsort(dst, kind="stable")


def build_graph(
    src: np.ndarray,
    dst: np.ndarray,
    n_nodes: int,
    edge_weight: np.ndarray | None = None,
    pad_to: int | None = None,
    device: bool = True,
) -> Graph:
    """Build a dst-sorted ``Graph`` from host COO arrays.

    Mirrors what `dgl.graph((row, col))` provides the reference models
    (/root/reference/dataloader.py:105) but in a single canonical,
    statically-shaped layout.

    ``device=False`` keeps every field as a host numpy array so the
    whole container (plans included, via ``with_plans(device=False)``)
    can be shipped in ONE transfer with `utils.packing.ship_packed` —
    per-array uploads through the axon relay cost ~45s each.
    """
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    if src.shape != dst.shape:
        raise ValueError("src/dst shape mismatch")
    n_edges = int(src.shape[0])

    order = _sort_by_dst(dst, n_nodes)
    src_s = src[order]
    dst_s = dst[order]
    w_s = None if edge_weight is None else np.asarray(edge_weight, np.float32)[order]

    in_deg = np.bincount(dst, minlength=n_nodes).astype(np.float32)
    out_deg = np.bincount(src, minlength=n_nodes).astype(np.float32)

    e_pad = n_edges if pad_to is None else int(pad_to)
    if e_pad < n_edges:
        raise ValueError(f"pad_to={e_pad} < n_edges={n_edges}")
    if e_pad > n_edges:
        ghost = np.full(e_pad - n_edges, n_nodes, dtype=np.int64)
        src_s = np.concatenate([src_s, ghost])
        dst_s = np.concatenate([dst_s, ghost])
        if w_s is not None:
            w_s = np.concatenate([w_s, np.zeros(e_pad - n_edges, np.float32)])

    # CSC indptr over the padded dst array (ghost node = row N).
    counts = np.bincount(dst_s, minlength=n_nodes + 1)
    indptr = np.zeros(n_nodes + 2, dtype=np.int32)
    np.cumsum(counts, out=indptr[1:])

    arr = jnp.asarray if device else (lambda a, dt=None: np.asarray(
        a, dt if dt is not None else a.dtype))
    g = Graph(
        senders=arr(src_s, jnp.int32),
        receivers=arr(dst_s, jnp.int32),
        indptr=arr(indptr, jnp.int32),
        edge_weight=None if w_s is None else arr(w_s, jnp.float32),
        in_degrees=arr(in_deg),
        out_degrees=arr(out_deg),
        n_nodes=int(n_nodes),
        n_edges=n_edges,
    )
    # Host copies of the sorted real edges, stashed as a NON-field
    # attribute (invisible to the pytree, so jit caching is unaffected;
    # lost across flatten/unflatten, which is fine — it is a cache).
    # plan_for_graph reads this instead of np.asarray(g.receivers):
    # through the axon relay a bulk device->host fetch of the edge
    # arrays takes minutes (measured 266s for 2x10MB), while plan
    # building itself is <0.5s.
    object.__setattr__(g, "_host_edges",
                       (src_s[:n_edges].copy(), dst_s[:n_edges].copy()))
    return g


def graph_from_csr(
    indptr: np.ndarray, indices: np.ndarray, n_nodes: int, **kw
) -> Graph:
    """Build from host CSR (row = src, indices = dst neighbors)."""
    indptr = np.asarray(indptr, np.int64)
    src = np.repeat(np.arange(n_nodes, dtype=np.int64), np.diff(indptr))
    return build_graph(src, np.asarray(indices, np.int64), n_nodes, **kw)
