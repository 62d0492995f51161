"""On-device multi-layer neighbor sampling with static shapes.

TPU-native replacement for DGL's MultiLayerNeighborSampler + MFG block
construction (reference hot path: /root/reference/train_and_eval.py:
179-190 feeding models.py:101-119). Instead of ragged compacted blocks
built by host C++ samplers, everything is jittable:

* top-down frontier expansion: the seed batch samples `fanouts[-1]`
  in-neighbors per node, the union becomes the next frontier, down to
  the input node set;
* default (concat) mode: frontiers are plain concatenations
  `[out_nodes, sampled.flatten()]` with arithmetic local indices — no
  sort/unique/searchsorted anywhere in the traced graph (see
  sample_blocks for why dedup buys nothing under worst-case caps);
* dedup mode (when tightened `caps` are passed): SORTED-UNIQUE
  frontiers with static capacity
  (`jnp.unique(..., size=cap, fill_value=n_nodes)`) and `searchsorted`
  local translation, ghost node n_nodes padding throughout;
* per-conv block = (nbr_local, valid, self_local) index arrays into
  the input frontier.

Fanout semantics vs DGL 0.6.1: identical. deg <= fanout takes ALL
neighbors exactly once; deg > fanout draws a uniform k-subset WITHOUT
replacement (vectorized Floyd sampler in _sample_one_hop).

Capacity overflow: if a frontier's true unique count exceeds its cap,
the largest node ids are dropped (their messages become ghost zeros)
and `overflowed` is set in the result for the trainer to log. Caps
default to the worst case min(prod(fanout+1)*batch, n_nodes)+1, which
cannot overflow; callers may trade memory for a small sampling-noise
increase by passing tighter caps.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp

from glnn_tpu.graph.container import Graph


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["input_nodes", "nbr_local", "valid", "self_local",
                 "out_real", "overflowed"],
    meta_fields=["concat"],
)
@dataclasses.dataclass(frozen=True)
class SampledBlocks:
    """Blocks for an L-layer sampled forward.

    input_nodes: int32[C0+1] global ids whose features feed conv 0
                 (ghost n_nodes padding).
    nbr_local:   tuple of L int32[(n_out_i, K_i)] indices into conv i's
                 input rows.
    valid:       tuple of L bool[(n_out_i, K_i)] real-neighbor masks.
    self_local:  tuple of L int32[n_out_i] self-row index per output.
    out_real:    tuple of L bool[n_out_i] — real (non-ghost) output rows
                 (feeds masked batch-norm statistics).
    overflowed:  bool[] — any frontier hit its capacity.
    """

    input_nodes: jax.Array
    nbr_local: tuple
    valid: tuple
    self_local: tuple
    out_real: tuple
    overflowed: jax.Array
    # static marker: frontiers are plain concatenations, so per-layer
    # neighbor "gathers" are really reshaped slices (see SAGEConvGCN)
    concat: bool = False


def frontier_caps(batch_size: int, fanouts: Sequence[int],
                  n_nodes: int) -> list[int]:
    """Worst-case frontier capacities, outermost (input) first.
    caps[i] bounds the frontier feeding conv i; caps[L] == batch."""
    caps = [batch_size]
    for f in reversed(list(fanouts)):
        caps.insert(0, min(caps[0] * (f + 1), n_nodes))
    return caps


# window-sampler geometry: neighbor windows are read as WIN_ROWS
# consecutive WIN-wide rows of the reshaped edge array (2 row-gathers
# per frontier node instead of `fanout` element-gathers — both cost
# the same per TOUCH on the row-rate-bound gather engine, so fewer
# touches win ~linearly; PERF.md r4 sampled-SAGE anatomy)
WIN = 64
WIN_ROWS = 2
# any start alignment guarantees exact coverage of degrees <= this
WINDOW_EXACT_DEG = WIN * (WIN_ROWS - 1) + 1
# aligned 1-touch tier (Graph.with_window_table): ONE WIN-wide row per
# node, exact for deg <= WIN (the r5 lever from PERF.md r4's batch
# decomposition — halves the sampler's row-gather touches again)
WINDOW1_EXACT_DEG = WIN


def _sample_one_hop(g: Graph, frontier: jax.Array, fanout: int,
                    rng: jax.Array, method: str = "floyd",
                    snd2d: jax.Array | None = None):
    """Uniform in-neighbor sampling for each frontier node.
    Returns (nbr_global [C, K], valid [C, K]).

    Matches DGL 0.6.1 CSRRowWisePerEtypeSampling semantics
    (/root/reference/train_and_eval.py:179-181): deg <= fanout takes
    every neighbor exactly once; deg > fanout draws a uniform k-subset
    WITHOUT replacement via a vectorized Floyd sampler — k static
    iterations, each an O(k) membership test over the slots already
    chosen, so the traced cost is C*k^2 compares (k = fanout <= ~15).

    method="window" keeps the SAME Floyd offsets but replaces the
    `fanout` independent element-gathers with window row reads. With
    the aligned per-node table attached (g.win1,
    Graph.with_window_table — the default for --sampler_tier window)
    each node costs ONE 64-wide row, bit-identical to "floyd" for
    deg <= WINDOW1_EXACT_DEG (=64); without it, 2 consecutive WIN-wide
    rows of the reshaped edge array, exact for
    deg <= WINDOW_EXACT_DEG (=65). Heavier nodes fold their sampled
    offsets back into their own window (mod), biasing the sample
    toward the node's first edges — choose this tier for
    bounded-degree graphs (the products recipe's uniform graph:
    P[deg > 64] ~ 1e-11) or accept the documented bias on heavy
    tails; "floyd" stays the exact default.
    """
    n = g.n_nodes
    is_real = frontier < n
    f_safe = jnp.minimum(frontier, n - 1)
    start = g.indptr[f_safe]
    deg = (g.indptr[f_safe + 1] - start).astype(jnp.int32)
    deg = jnp.where(is_real, deg, 0)

    c = frontier.shape[0]
    j = jnp.arange(fanout, dtype=jnp.int32)[None, :]
    u = jax.random.uniform(rng, (c, fanout))

    # Floyd's uniform k-subset of offsets [0, deg): at step i consider
    # slot jcol = deg-k+i; draw t ~ U[0, jcol]; take jcol iff t was
    # already selected, else t. Uniform over all k-subsets.
    sel = jnp.full((c, fanout), -1, jnp.int32)
    for i in range(fanout):
        jcol = deg - fanout + i                       # (c,)
        t = jnp.floor(u[:, i] * (jcol + 1)).astype(jnp.int32)
        t = jnp.clip(t, 0, jnp.maximum(jcol, 0))
        member = (sel == t[:, None]).any(axis=1)
        chosen = jnp.where(member, jcol, t).astype(jnp.int32)
        sel = sel.at[:, i].set(chosen)

    take_all = (deg <= fanout)[:, None]
    off = jnp.where(take_all, j, sel)
    valid = jnp.where(take_all, j < deg[:, None], deg[:, None] > 0)

    if method == "window":
        if g.win1 is not None:
            nbr = _window1_read(g, f_safe, deg, off)
        else:
            nbr = _window_read(g, start, deg, off, snd2d)
    else:
        edge_idx = start[:, None] + off
        # clip mode: in-bounds for real slots (off < deg); take-all
        # slots past deg clamp harmlessly and are masked by `valid`
        nbr = jnp.take(g.senders, edge_idx, mode="clip")
    nbr = jnp.where(valid, nbr, n)
    return nbr.astype(jnp.int32), valid


def window_view(g: Graph) -> jax.Array:
    """The edge array reshaped to [rows, WIN] with ghost-padded slack
    (the window sampler's gather table). Called once per traced epoch
    OUTSIDE the batch scan so the O(E) pad/copy never sits in the hot
    loop; _window_read also accepts it precomputed."""
    e_pad = g.senders.shape[0]
    rows_total = -(-e_pad // WIN) + WIN_ROWS         # slack rows at tail
    return jnp.pad(g.senders, (0, rows_total * WIN - e_pad),
                   constant_values=g.n_nodes).reshape(rows_total, WIN)


def _select_lanes(win: jax.Array, lane: jax.Array) -> jax.Array:
    """out[c, k] = win[c, lane[c, k]] as ONE fused one-hot
    broadcast-reduce. Lane-axis dynamic gathers (take_along_axis) lower
    to per-element relayouts on TPU (measured r4: they ate the whole
    window win); r4 shipped K separate [C, W] mask+sum passes instead,
    whose unrolled HLO drove the products-scale epoch compile to 164 s
    (VERDICT r4 weak #2). The single [C, K, W] masked reduce keeps the
    same VPU work and ONE win read in one fusion — O(1) HLO per hop."""
    m = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, win.shape[1]), 2)
         == lane[:, :, None])                       # [C, K, W]
    return jnp.sum(jnp.where(m, win[:, None, :], 0), axis=2)


def _window_read(g: Graph, start: jax.Array, deg: jax.Array,
                 off: jax.Array,
                 snd2d: jax.Array | None = None) -> jax.Array:
    """senders[start + off] via WIN_ROWS-row window gathers + in-lane
    selection. start/deg [C], off [C, K] -> [C, K] neighbor ids."""
    if snd2d is None:
        snd2d = window_view(g)
    row0 = start // WIN                              # [C]
    c = start.shape[0]
    rows = row0[:, None] + jnp.arange(WIN_ROWS, dtype=row0.dtype)[None, :]
    win = jnp.take(snd2d, rows.reshape(-1), axis=0,
                   mode="clip").reshape(
        c, WIN_ROWS * WIN)
    s0 = start % WIN                                 # [C]
    # fold oversized offsets onto the node's OWN in-window edge range
    # (reachable only for deg > WINDOW_EXACT_DEG — the documented
    # heavy-tail bias). The fold cap is PER NODE (its own edges that
    # fit the window): a plain mod by the window width wrapped lanes
    # before the segment start and returned the PREVIOUS node's edges
    # for unaligned hubs — caught in review with an 18%-contamination
    # repro; tests/test_sampling.py pins own-neighbor membership now.
    cap = jnp.maximum(jnp.minimum(deg, WIN_ROWS * WIN - s0), 1)
    lane = s0[:, None] + off % cap[:, None]          # [C, K]
    return _select_lanes(win, lane)


def _window1_read(g: Graph, f_safe: jax.Array, deg: jax.Array,
                  off: jax.Array) -> jax.Array:
    """Aligned 1-touch tier: node v's window IS row v of g.win1
    (Graph.with_window_table), so each frontier node costs ONE aligned
    row gather and the start offset is always 0. Bit-identical to the
    Floyd tier for deg <= WIN; heavier nodes fold their offsets onto
    their first WIN edges (same documented bias as the 2-row tier,
    with the exact-degree bound at 64 instead of 65)."""
    w = g.win1.shape[1]
    win = jnp.take(g.win1, f_safe, axis=0, mode="clip")           # [C, W]
    cap = jnp.clip(deg, 1, w)
    lane = off % cap[:, None]                        # [C, K]
    return _select_lanes(win, lane)


def sample_blocks(g: Graph, seeds: jax.Array, fanouts: Sequence[int],
                  rng: jax.Array, caps: Sequence[int] | None = None,
                  dedup: bool | None = None, method: str = "floyd",
                  snd2d: jax.Array | None = None) -> SampledBlocks:
    """Sample L-layer blocks for `seeds` (int32[B], ghost-padded ok).

    Two frontier modes:
    * dedup=False (default when no caps given): frontiers are plain
      concatenations `[out_nodes, sampled.flatten()]`, so local indices
      are pure arithmetic — no sort/unique/searchsorted in the traced
      graph. Since worst-case caps size the arrays identically either
      way, dedup would buy nothing; skipping it cut the products-scale
      compile from 320s to seconds. Duplicated nodes are computed more
      than once (and weighted by multiplicity in masked batch-norm
      stats — a documented deviation from DGL's compacted blocks).
    * dedup=True (default when `caps` are given): sorted-unique capped
      frontiers; needed when the caller tightens caps below worst case
      to bound memory, at the cost of sort-heavy compile.
    """
    fanouts = list(fanouts)
    L = len(fanouts)
    n = g.n_nodes
    if dedup is None:
        dedup = caps is not None
    if not dedup:
        return _sample_blocks_concat(g, seeds, fanouts, rng, method,
                                     snd2d)
    if caps is None:
        caps = frontier_caps(seeds.shape[0], fanouts, n)

    # top-down: frontiers[L] = seeds, frontiers[i] feeds conv i
    frontiers = [None] * (L + 1)
    nbrs_g = [None] * L
    valids = [None] * L
    overflow = jnp.zeros((), bool)
    frontiers[L] = seeds.astype(jnp.int32)

    for i in range(L - 1, -1, -1):
        out_nodes = frontiers[i + 1]
        nbr, valid = _sample_one_hop(g, out_nodes, fanouts[i],
                                     jax.random.fold_in(rng, i), method,
                                     snd2d)
        nbrs_g[i] = nbr
        valids[i] = valid
        pool = jnp.concatenate([out_nodes.reshape(-1), nbr.reshape(-1)])
        uniq = jnp.unique(pool, size=caps[i], fill_value=n)
        # cap saturated with real ids -> later uniques were truncated
        overflow = jnp.logical_or(overflow, uniq[-1] < n)
        # guaranteed ghost slot at the end
        frontier = jnp.concatenate(
            [uniq, jnp.full((1,), n, jnp.int32)])
        frontiers[i] = frontier

    nbr_local, valid_t, self_local, out_real = [], [], [], []
    for i in range(L):
        fin = frontiers[i]
        nbr_local.append(jnp.searchsorted(fin, nbrs_g[i]).astype(jnp.int32))
        valid_t.append(valids[i])
        self_local.append(
            jnp.searchsorted(fin, frontiers[i + 1]).astype(jnp.int32))
        out_real.append(frontiers[i + 1] < n)

    # conv i (for i < L-1) outputs rows for frontiers[i+1] INCLUDING its
    # trailing ghost slot; the ghost row computes on zeros and is dropped
    # by downstream gathers. The final conv outputs the seeds only.
    return SampledBlocks(
        input_nodes=frontiers[0],
        nbr_local=tuple(nbr_local),
        valid=tuple(valid_t),
        self_local=tuple(self_local),
        out_real=tuple(out_real),
        overflowed=overflow,
    )


def _sample_blocks_concat(g: Graph, seeds: jax.Array, fanouts: list,
                          rng: jax.Array, method: str = "floyd",
                          snd2d: jax.Array | None = None
                          ) -> SampledBlocks:
    """No-dedup frontiers: F_i = [F_{i+1}, sampled_i.flatten()].

    self_local[i] = arange(n_out); nbr_local[i] = n_out + slot index.
    Ghost nodes sample nothing (valid=False) and gather zero features.
    """
    L = len(fanouts)
    n = g.n_nodes
    frontier = seeds.astype(jnp.int32)

    nbr_local = [None] * L
    valids = [None] * L
    self_local = [None] * L
    out_real = [None] * L

    for i in range(L - 1, -1, -1):
        out_nodes = frontier
        k = fanouts[i]
        nbr, valid = _sample_one_hop(g, out_nodes, k,
                                     jax.random.fold_in(rng, i), method,
                                     snd2d)
        n_out = out_nodes.shape[0]
        self_local[i] = jnp.arange(n_out, dtype=jnp.int32)
        nbr_local[i] = (n_out + jnp.arange(n_out * k, dtype=jnp.int32)
                        ).reshape(n_out, k)
        valids[i] = valid
        out_real[i] = out_nodes < n
        frontier = jnp.concatenate([out_nodes, nbr.reshape(-1)])

    return SampledBlocks(
        input_nodes=frontier,
        nbr_local=tuple(nbr_local),
        valid=tuple(valids),
        self_local=tuple(self_local),
        out_real=tuple(out_real),
        overflowed=jnp.zeros((), bool),
        concat=True,
    )
