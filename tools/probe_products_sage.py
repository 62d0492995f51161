#!/usr/bin/env python
"""Decompose the products-scale sampled-SAGE batch (r3: 9.24s/epoch =
188ms over 49 batches — where does a batch go?).

Per 4096-seed batch (fanouts 5,10,15, concat mode) the frontier
materializes ~4.33M input rows against N=2.45M. Stages timed with
scan-over-index chains (the per-iteration index feeds the sampler rng,
so nothing is loop-invariant):

  1. sampler only (frontier expansion + Floyd + senders gathers)
  2. sampler + f32 feature gather (the r3 production path)
  3. sampler + bf16 feature gather (halves gather bytes — tests
     whether the big-table gather is bytes-bound, unlike arxiv scale)
  4. full train batch (conv fwd+bwd+Adam) via the epoch fn on 1 batch
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np

N = 2_449_029
E = 61_859_140
F = 100
C = 47
BATCH = 4096
FANOUT = (5, 10, 15)


def main():
    import jax
    import jax.numpy as jnp

    from glnn_tpu.graph.container import build_graph
    from glnn_tpu.sampling.sampler import sample_blocks
    from glnn_tpu.utils.packing import ship_packed

    t_start = time.monotonic()

    def log(msg):
        print(f"[{time.monotonic()-t_start:6.1f}s] {msg}", flush=True)

    rs = np.random.RandomState(0)
    src = rs.randint(0, N, E).astype(np.int64)
    dst = rs.randint(0, N, E).astype(np.int64)
    # sampler needs indptr/senders only — skip the SpMM plans
    g = ship_packed(build_graph(src, dst, N, device=False))
    del src, dst
    log("graph shipped")

    x = jax.random.normal(jax.random.PRNGKey(0), (N, F), jnp.float32)
    seeds = jax.random.randint(jax.random.PRNGKey(1), (BATCH,), 0, N,
                               jnp.int32)
    _ = float(x[0, 0]) + int(seeds[0])
    log("features generated")

    def timed(fn, *args, iters=2):
        float(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(fn(*args))
        return (time.perf_counter() - t0) / iters

    def chain(body, args, kk=4, iters=2):
        # graph/features enter as jit ARGUMENTS — closed-over they
        # become HLO constants and the remote-compile payload explodes
        def build(n):
            @jax.jit
            def f(s, *a):
                def stp(c, i):
                    return body(c, i, *a) * (1.0 - 1e-9), None
                c, _ = jax.lax.scan(stp, s, jnp.arange(n))
                return c
            return f
        z = jnp.float32(0.0)
        t1 = timed(build(1), z, *args, iters=iters)
        tk = timed(build(kk), z, *args, iters=iters)
        return max((tk - t1) / (kk - 1), 1e-9)

    rng = jax.random.PRNGKey(7)
    x16 = x.astype(jnp.bfloat16)
    _ = float(x16[0, 0].astype(jnp.float32))

    def samp(c, i, gg):
        blocks = sample_blocks(gg, seeds, FANOUT,
                               jax.random.fold_in(rng, i))
        return c + blocks.input_nodes.sum(dtype=jnp.float32) * 1e-12

    t = chain(samp, (g,))
    log(f"sampler only: {t*1e3:8.2f} ms "
        f"(input slots {4096*16*11*6})")

    def gath(c, i, gg, table):
        blocks = sample_blocks(gg, seeds, FANOUT,
                               jax.random.fold_in(rng, i))
        ext = jnp.concatenate(
            [table, jnp.zeros((1, F), table.dtype)], axis=0)
        xi = jnp.take(ext, blocks.input_nodes, axis=0)
        return c + xi.sum(dtype=jnp.float32) * 1e-12

    t = chain(gath, (g, x))
    log(f"sampler + f32 feature gather: {t*1e3:8.2f} ms")
    t = chain(gath, (g, x16))
    log(f"sampler + bf16 feature gather: {t*1e3:8.2f} ms")

    # full single-batch train step via the epoch fn (1 batch)
    from glnn_tpu.nn.models import Model
    from glnn_tpu.train import create_train_state, make_adam
    from glnn_tpu.train.sage_sampled import make_sage_sampled_epoch_fn

    model = Model(dict(model_name="SAGE", num_layers=3, hidden_dim=256,
                       label_dim=C, dropout_ratio=0.5, norm_type="batch"))
    opt = make_adam(0.003, 0.0)
    tiny = build_graph(np.arange(64), (np.arange(64) + 1) % 64, 64)
    state = create_train_state(
        model.init(jax.random.PRNGKey(0), tiny, x[:64]), opt)
    labels = jax.random.randint(jax.random.PRNGKey(2), (N,), 0, C)
    epoch1 = make_sage_sampled_epoch_fn(model, opt, BATCH, FANOUT)
    idx1 = jax.random.permutation(jax.random.PRNGKey(3), N)[:BATCH]
    t = timed(lambda s: epoch1(s, g, x, labels, idx1,
                               jax.random.PRNGKey(4))[1], state, iters=3)
    log(f"1-batch epoch (sampler+gather+conv fwd/bwd+Adam): "
        f"{t*1e3:8.2f} ms")

    idx8 = jax.random.permutation(jax.random.PRNGKey(5), N)[:8 * BATCH]
    t8 = timed(lambda s: epoch1(s, g, x, labels, idx8,
                                jax.random.PRNGKey(6))[1], state, iters=2)
    log(f"8-batch epoch: {t8*1e3:8.2f} ms -> per batch "
        f"{(t8 - t)/7*1e3:.1f} ms marginal")


if __name__ == "__main__":
    main()
