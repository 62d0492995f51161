"""Distributed neighbor-sampled training over a device mesh.

TPU-native form of the capability table in SURVEY.md §2.4 (row
"Distributed neighbor sampling"): the reference's semantics are DGL's
MultiLayerNeighborSampler feeding per-batch SAGE steps
(/root/reference/train_and_eval.py:32-56,179-190); here each device
samples blocks for ITS OWN slice of the seed batch entirely locally
(graph *structure* — int32 CSC — is replicated; it is small next to
features), while node *features* stay row-sharded across the mesh.
The cross-shard exchange happens where TPUs want it: not on index
frontiers but on the frontier's FEATURE ROWS, fetched with two
`all_to_all`s inside `shard_map` (`fetch_rows`). Gradients data-
parallel-reduce with `psum`.

Layout contract: features are padded to `n_pad = P * rows` and
row-sharded (`NamedSharding(mesh, P(axis, None))`), the same layout the
halo-exchange full-batch path uses (distributed/halo.py), so one
placement of the feature matrix serves both training modes.

Two fetch protocols:
  * aligned (`fetch_rows`): shard p asks every shard q for ALL of its
    C slots (ghost-padded); responses inflate by the shard count
    (P*C*F bytes) but need no sort/compaction. Kept as the oracle.
  * compact (`fetch_rows_compact`, the default in the dp epoch):
    requests are sorted by owner and packed into per-owner buckets of
    capacity ceil(C/P * slack); response traffic is ~slack*C*F —
    independent of the shard count (VERDICT r1 weak #4). Bucket
    overflow (pathologically skewed ownership) zero-fills the
    overflowing rows and raises a flag that the epoch surfaces next
    to the sampler's frontier-overflow flag.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from glnn_tpu.sampling.sampler import sample_blocks, window_view
from glnn_tpu.train.losses import log_softmax
from glnn_tpu.train.state import TrainState


def _fetch_rows_local(x_blk, idx, axis: str, n_shards: int, rows: int):
    """Inside-shard_map body: gather global rows from the row-sharded
    feature matrix. x_blk: [rows, F] (my block); idx: [C] global ids,
    ghost = n_pad (or anything >= n_pad) -> zero row. Returns [C, F]."""
    fdim = x_blk.shape[-1]
    owner = idx // rows                                     # [C]; ghost -> P
    pos = idx - owner * rows
    q_ids = jnp.arange(n_shards, dtype=owner.dtype)[:, None]
    # req[q, c] = my slot c's row-within-q, or `rows` (ghost) if q is
    # not slot c's owner — alignment preserved, no compaction.
    req = jnp.where(owner[None, :] == q_ids, pos[None, :], rows)

    # req rows travel to their target shard; I receive what each shard
    # asks of me, answer from my block, and send the rows back.
    req_recv = jax.lax.all_to_all(req, axis, split_axis=0, concat_axis=0,
                                  tiled=True)               # [P, C]
    x_ext = jnp.concatenate([x_blk, jnp.zeros((1, fdim), x_blk.dtype)])
    resp = jnp.take(x_ext, req_recv.reshape(-1), axis=0)
    resp = resp.reshape(n_shards, -1, fdim)                 # [P, C, F]
    resp_back = jax.lax.all_to_all(resp, axis, split_axis=0, concat_axis=0,
                                   tiled=True)              # [P, C, F]
    # exactly one owner answered per non-ghost slot; ghosts are zeros
    return jnp.sum(resp_back, axis=0)


def _fetch_rows_compact_local(x_blk, idx, axis: str, n_shards: int,
                              rows: int, cap: int,
                              n_real: int | None = None):
    """Bucketed-compact variant of _fetch_rows_local. Returns
    ([C, F] rows, overflow flag). Response traffic P*cap*F with
    cap ~= C/P * slack instead of the aligned protocol's P*C*F.

    `n_real` marks the first ghost row id (the sampler pads frontiers
    with id == n_nodes, which plain `idx // rows` would assign to the
    LAST shard and flood its bucket); any idx >= n_real fetches zeros
    without consuming bucket capacity."""
    if n_real is None:
        n_real = n_shards * rows
    fdim = x_blk.shape[-1]
    c = idx.shape[0]
    owner_raw = idx // rows
    owner = jnp.where(idx < n_real, owner_raw, n_shards)    # ghost -> P
    pos = (idx - owner_raw * rows).astype(jnp.int32)

    order = jnp.argsort(owner, stable=True)
    so = jnp.take(owner, order)                             # sorted owners
    start = jnp.searchsorted(so, jnp.arange(n_shards, dtype=so.dtype))
    pos_in_seg = (jnp.arange(c, dtype=jnp.int32)
                  - jnp.take(start, jnp.minimum(so, n_shards - 1))
                  .astype(jnp.int32))
    real = so < n_shards
    rank = jnp.where(real, pos_in_seg, cap)
    overflow = jnp.any((rank >= cap) & real)

    # pack sorted slots' local positions into [P, cap] buckets; the
    # +1 tail row absorbs overflow/ghost scatters
    tgt = jnp.where(real & (rank < cap), so * cap + rank,
                    n_shards * cap).astype(jnp.int32)
    sorted_pos = jnp.take(pos, order)
    buckets = jnp.full((n_shards * cap + 1,), rows, jnp.int32)
    buckets = buckets.at[tgt].set(sorted_pos)[: n_shards * cap]
    req = buckets.reshape(n_shards, cap)

    req_recv = jax.lax.all_to_all(req, axis, split_axis=0, concat_axis=0,
                                  tiled=True)               # [P, cap]
    x_ext = jnp.concatenate([x_blk, jnp.zeros((1, fdim), x_blk.dtype)])
    resp = jnp.take(x_ext, req_recv.reshape(-1), axis=0)
    resp = resp.reshape(n_shards, cap, fdim)
    resp_back = jax.lax.all_to_all(resp, axis, split_axis=0,
                                   concat_axis=0, tiled=True)

    # unpack: slot s's row sits at (owner[s], rank_by_slot[s])
    rank_by_slot = jnp.zeros((c,), jnp.int32).at[order].set(rank)
    ok = owner < n_shards
    flat = jnp.where(ok & (rank_by_slot < cap),
                     owner.astype(jnp.int32) * cap + rank_by_slot,
                     n_shards * cap)
    resp_ext = jnp.concatenate(
        [resp_back.reshape(n_shards * cap, fdim),
         jnp.zeros((1, fdim), resp_back.dtype)])
    return jnp.take(resp_ext, flat, axis=0), overflow


def _compact_cap(c: int, n_shards: int, slack: float) -> int:
    cap = int(-(-c * slack // n_shards))
    return max(8, min(-(-cap // 8) * 8, c))


def fetch_rows_compact(mesh: Mesh, axis: str, x_sharded: jax.Array,
                       idx: jax.Array, slack: float = 2.0,
                       n_real: int | None = None):
    """Compact distributed row gather; same contract as fetch_rows
    plus a per-call overflow flag (True if any owner bucket exceeded
    its ceil(C/P*slack) capacity and rows were zero-filled).
    `n_real`: first ghost row id (defaults to the padded row count)."""
    n_shards = mesh.shape[axis]
    rows = x_sharded.shape[0] // n_shards
    cap = _compact_cap(idx.shape[-1], n_shards, slack)

    def f(x_blk, idx_blk):
        out, ovf = _fetch_rows_compact_local(
            x_blk.reshape(rows, -1), idx_blk[0], axis, n_shards, rows, cap,
            n_real=n_real)
        return out[None], jax.lax.psum(ovf.astype(jnp.int32), axis)[None]

    out, ovf = shard_map(
        f, mesh=mesh, in_specs=(P(axis, None), P(axis, None)),
        out_specs=(P(axis, None, None), P(axis)),
    )(x_sharded, idx.astype(jnp.int32))
    return out, jnp.any(ovf > 0)


def fetch_rows(mesh: Mesh, axis: str, x_sharded: jax.Array,
               idx: jax.Array) -> jax.Array:
    """Distributed row gather: x_sharded [n_pad, F] row-sharded over
    `axis`; idx [P, C] per-device global row ids (ghost >= n_pad).
    Returns [P, C, F] with idx's sharding (device p holds row p)."""
    n_shards = mesh.shape[axis]
    rows = x_sharded.shape[0] // n_shards

    def f(x_blk, idx_blk):
        out = _fetch_rows_local(x_blk.reshape(rows, -1), idx_blk[0],
                                axis, n_shards, rows)
        return out[None]

    return shard_map(
        f, mesh=mesh, in_specs=(P(axis, None), P(axis, None)),
        out_specs=P(axis, None, None),
    )(x_sharded, idx.astype(jnp.int32))


def make_dp_sampled_sage_epoch_fn(model, optimizer, batch_size: int,
                                  fanouts, mesh: Mesh, axis: str = "dp",
                                  lamb: float = 1.0, slack: float = 2.0,
                                  sampler_tier: str = "floyd"):
    """Data-parallel fanout-sampled epoch: global batches of
    `batch_size` split across the mesh; per-device local sampling;
    features row-sharded and fetched via `fetch_rows`; psum'd global
    masked-mean loss and gradients (one Adam step per global batch,
    matching the single-device schedule of train/sage_sampled.py).

    Determinism: with fanouts >= max in-degree sampling is take-all and
    the epoch reproduces the single-device sampled epoch exactly (same
    shuffle rng); below that, per-device sampling streams are
    independent folds of the batch rng (a documented deviation — the
    reference has no distributed counterpart).

    BatchNorm deviation: batch statistics are computed per device over
    its local sub-batch and pmean'd into the running stats (torch-DDP
    behavior), not computed over the global batch.

    Returns (state, mean_loss, overflow[2]) where overflow[0] flags
    sampler frontier-cap truncation and overflow[1] flags compact-fetch
    bucket overflow (feature rows zero-filled; raise `slack` if set) —
    kept separate so skewed-ownership feature loss is diagnosable.
    """
    fanouts = tuple(int(f) for f in fanouts)
    n_shards = mesh.shape[axis]

    @jax.jit
    def epoch(state: TrainState, g, x_sharded, labels, idx_train, rng):
        n = g.n_nodes
        rows = x_sharded.shape[0] // n_shards
        n_train = idx_train.shape[0]
        b = min(batch_size, n_train)
        b_local = -(-b // n_shards)
        num_batches = -(-n_train // b)

        perm_rng, samp_rng, drop_rng = jax.random.split(rng, 3)
        perm = jax.random.permutation(perm_rng, n_train)
        seeds_flat = jnp.full(num_batches * n_shards * b_local, n, jnp.int32)
        seeds_flat = seeds_flat.at[:n_train].set(
            jnp.take(idx_train, perm).astype(jnp.int32))
        seed_mat = seeds_flat.reshape(num_batches, n_shards, b_local)

        labels_ext = jnp.concatenate(
            [labels, jnp.zeros((1,), labels.dtype)], axis=0)
        # window tier: materialize the reshaped edge table ONCE per
        # epoch, outside the per-batch scan (an O(E) pad/copy — same
        # hoist as train/sage_sampled.py)
        snd2d = (window_view(g)
                 if sampler_tier == "window" and g.win1 is None else None)

        def shard_step(params, batch_stats, x_blk, seeds_blk, b_idx):
            x_blk = x_blk.reshape(rows, -1)
            seeds = seeds_blk[0]
            me = jax.lax.axis_index(axis)
            s_rng = jax.random.fold_in(jax.random.fold_in(samp_rng, b_idx),
                                       me)
            d_rng = jax.random.fold_in(jax.random.fold_in(drop_rng, b_idx),
                                       me)
            blocks = sample_blocks(g, seeds, fanouts, s_rng,
                                   method=sampler_tier, snd2d=snd2d)
            cap = _compact_cap(blocks.input_nodes.shape[0], n_shards,
                               slack)
            x_in, fetch_ovf = _fetch_rows_compact_local(
                x_blk, blocks.input_nodes, axis, n_shards, rows, cap,
                n_real=n)
            y = jnp.take(labels_ext, jnp.minimum(seeds, n))
            mask = (seeds < n).astype(jnp.float32)

            def loss_fn(p):
                variables = {"params": p}
                if batch_stats:
                    variables["batch_stats"] = batch_stats
                out = model.apply(variables, blocks, x_in, training=True,
                                  rngs={"dropout": d_rng},
                                  mutable=bool(batch_stats))
                if batch_stats:
                    (_, h), upd = out
                    new_bs = upd["batch_stats"]
                else:
                    h = out[1]
                    new_bs = {}
                logp = log_softmax(h)
                per = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
                num = jax.lax.psum(jnp.sum(per * mask), axis)
                den = jax.lax.psum(jnp.sum(mask), axis)
                loss = num / jnp.maximum(den, 1.0)
                ovf2 = jnp.stack([blocks.overflowed, fetch_ovf])
                return loss * lamb, (loss, new_bs, ovf2)

            grads, (loss, new_bs, ovf2) = jax.grad(loss_fn, has_aux=True)(
                params)
            grads = jax.lax.pmean(grads, axis)
            new_bs = jax.lax.pmean(new_bs, axis)
            ovf2 = jax.lax.psum(ovf2.astype(jnp.int32), axis) > 0
            return grads, loss, new_bs, ovf2

        smapped = shard_map(
            shard_step, mesh=mesh,
            in_specs=(P(), P(), P(axis, None), P(axis, None), P()),
            out_specs=(P(), P(), P(), P()),
        )

        def body(carry, inp):
            params, batch_stats, opt_state, step = carry
            seeds_pb, b_idx = inp
            grads, loss, new_bs, ovf = smapped(params, batch_stats,
                                               x_sharded, seeds_pb, b_idx)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params,
                                            updates)
            return (params, new_bs, opt_state, step + 1), (loss, ovf)

        init = (state.params, state.batch_stats, state.opt_state, state.step)
        (params, batch_stats, opt_state, step), (losses, ovfs) = jax.lax.scan(
            body, init, (seed_mat, jnp.arange(num_batches)))
        new_state = state.replace(step=step, params=params,
                                  batch_stats=batch_stats,
                                  opt_state=opt_state)
        # ovfs: [num_batches, 2] -> (frontier_overflow, fetch_overflow)
        return new_state, jnp.mean(losses), jnp.any(ovfs, axis=0)

    return epoch


def shard_rows(mesh: Mesh, axis: str, x, n_shards_hint=None) -> jax.Array:
    """Pad a [n, F] host array to P*ceil(n/P) rows and place it
    row-sharded over `axis` (same layout as halo.shard_features)."""
    import numpy as np

    n_shards = mesh.shape[axis]
    x = np.asarray(x)
    rows = -(-x.shape[0] // n_shards)
    n_pad = rows * n_shards
    if x.shape[0] < n_pad:
        x = np.concatenate(
            [x, np.zeros((n_pad - x.shape[0],) + x.shape[1:], x.dtype)])
    return jax.device_put(x, NamedSharding(mesh, P(axis, None)))
