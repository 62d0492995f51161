"""Fanout-sampled SAGE training: one jitted lax.scan per epoch.

The reference's production teacher path (train_sage,
/root/reference/train_and_eval.py:32-56): shuffle the train ids, cut
into batches (last batch partial — we ghost-pad it and mask the loss,
matching NodeDataLoader(drop_last=False)), per batch sample multi-layer
blocks, forward over blocks, NLL on the batch, Adam step. Returns the
mean per-batch loss like the reference.

Sampling, block construction, forward, backward, and the optimizer all
run on device inside one scan — there is no host sampler process
(num_workers is meaningless here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from glnn_tpu.sampling.sampler import sample_blocks, window_view
from glnn_tpu.train.losses import log_softmax
from glnn_tpu.train.state import TrainState


def make_sage_sampled_epoch_fn(model, optimizer, batch_size: int,
                               fanouts, lamb: float = 1.0,
                               sampler_tier: str = "floyd"):
    fanouts = tuple(int(f) for f in fanouts)

    @jax.jit
    def epoch(state: TrainState, g, feats, labels, idx_train, rng):
        n = g.n_nodes
        n_train = idx_train.shape[0]
        b = min(batch_size, n_train)
        num_batches = -(-n_train // b)

        perm_rng, samp_rng, drop_rng = jax.random.split(rng, 3)
        perm = jax.random.permutation(perm_rng, n_train)
        seeds_flat = jnp.full(num_batches * b, n, jnp.int32)
        seeds_flat = seeds_flat.at[:n_train].set(
            jnp.take(idx_train, perm).astype(jnp.int32))
        seed_mat = seeds_flat.reshape(num_batches, b)

        x_ext = jnp.concatenate(
            [feats, jnp.zeros((1, feats.shape[1]), feats.dtype)], axis=0)
        # bf16 compute tier (conf compute_dtype): cast BEFORE the scan
        # so the frontier gather inside each batch EMITS bf16 rows —
        # the gather is row-rate-bound either way, but its materialized
        # [frontier, F] output (and every conv pass over it) halves its
        # HBM traffic
        mdtype = getattr(getattr(model, "module", None), "dtype", None)
        if mdtype is not None:
            x_ext = x_ext.astype(mdtype)
        # window tier: materialize the reshaped edge table ONCE per
        # epoch, outside the batch scan (an O(E) pad/copy). Graphs
        # carrying the aligned 1-touch table (with_window_table) skip
        # it — the sampler reads g.win1 rows directly.
        snd2d = (window_view(g)
                 if sampler_tier == "window" and g.win1 is None else None)
        labels_ext = jnp.concatenate(
            [labels, jnp.zeros((1,), labels.dtype)], axis=0)

        def body(carry, inp):
            params, batch_stats, opt_state, step = carry
            seeds, b_idx = inp
            # concat-mode (no-dedup) blocks: sort-free tracing/compile
            blocks = sample_blocks(g, seeds, fanouts,
                                   jax.random.fold_in(samp_rng, b_idx),
                                   method=sampler_tier, snd2d=snd2d)
            x_in = jnp.take(x_ext, blocks.input_nodes, axis=0,
                            mode="clip")
            y = jnp.take(labels_ext, seeds, mode="clip")
            mask = (seeds < n).astype(jnp.float32)

            def loss_fn(p):
                variables = {"params": p}
                if batch_stats:
                    variables["batch_stats"] = batch_stats
                out = model.apply(
                    variables, blocks, x_in, training=True,
                    rngs={"dropout": jax.random.fold_in(drop_rng, b_idx)},
                    mutable=bool(batch_stats),
                )
                if batch_stats:
                    (_, h), upd = out
                    new_bs = upd["batch_stats"]
                else:
                    h = out[1]
                    new_bs = {}
                logp = log_softmax(h)
                per = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
                loss = jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1.0)
                return loss * lamb, (loss, new_bs, blocks.overflowed)

            grads, (loss, new_bs, ovf) = jax.grad(loss_fn, has_aux=True)(
                params)
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
        return new_state, jnp.mean(losses), jnp.any(ovfs)

    return epoch
