#!/usr/bin/env python
"""Honest GAT step decomposition for round 5 (per-call method, rpc
floor subtracted — probe_gat_deploy.py showed per-call dispatch with
the full argument set is free; the old chain-of-k marginals were
DCE-flattered because the updated state was discarded).

Pieces, all grad-coupled so nothing is dead code:
  1. full train step (bench config)           <- the BENCH_r05 number
  2. step, all dropout 0
  3. fused attention layer L0 fwd (value only)
  4. fused attention layer L0 fwd+bwd (grad wrt feat+attn)
  5. same with attn dropout 0.3
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache = _os.environ.get("GLNN_COMPILE_CACHE", "~/.cache/glnn_tpu_xla")
    jax.config.update("jax_compilation_cache_dir",
                      _os.path.expanduser(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from glnn_tpu import ops
    from glnn_tpu.graph.container import build_graph
    from glnn_tpu.nn.models import Model
    from glnn_tpu.train import (create_train_state, make_adam,
                                make_gnn_train_step)
    from glnn_tpu.utils.packing import ship_packed

    N, F, H, D = 169_343, 256, 8, 32
    E = N * 14
    rs = np.random.RandomState(0)
    src = rs.randint(0, N, E).astype(np.int64)
    dst = rs.randint(0, N, E).astype(np.int64)
    g = ship_packed(build_graph(src, dst, N, device=False).with_plans(
        softmax=True, device=False))
    t_start = time.monotonic()
    print(f"[{time.monotonic()-t_start:5.1f}s] shipped; slots = "
          f"{g.smx.slots} x = {g.smx.x}", flush=True)

    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (N, F), jnp.float32)
    labels = jax.random.randint(k, (N,), 0, 40)
    idx = jnp.arange(90_000)

    def timed(fn, *args, iters=4, warmup=1):
        for _ in range(warmup):
            out = fn(*args)
            leaf = jax.tree_util.tree_leaves(out)[-1]
            float(leaf.sum() if leaf.ndim else leaf)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
            leaf = jax.tree_util.tree_leaves(out)[-1]
            float(leaf.sum() if leaf.ndim else leaf)
        return (time.perf_counter() - t0) / iters

    rpc = timed(jax.jit(lambda t: t + 1.0), jnp.zeros(()), iters=8,
                warmup=2)
    print(f"[{time.monotonic()-t_start:5.1f}s] rpc floor {rpc*1e3:.1f} ms",
          flush=True)

    opt = make_adam(0.01, 0.0)

    def step_time(conf, tag):
        model = Model(conf)
        v = model.init(jax.random.PRNGKey(0), g, x)
        state = create_train_state(v, opt)
        step = make_gnn_train_step(model, opt)
        t = timed(lambda s: step(s, g, x, labels, idx,
                                 jax.random.PRNGKey(2))[1], state,
                  iters=4) - rpc
        print(f"[{time.monotonic()-t_start:5.1f}s] {tag:40s} "
              f"{t*1e3:8.1f} ms", flush=True)
        return t

    base = dict(model_name="GAT", num_layers=2, hidden_dim=256,
                label_dim=40, dropout_ratio=0.2, attn_dropout_ratio=0.3,
                num_heads=H, norm_type="none")
    step_time(base, "full step (bench config)")
    step_time(dict(base, dropout_ratio=0.0, attn_dropout_ratio=0.0),
              "step, all dropout 0")

    # fused layer pieces
    feat = jax.random.normal(k, (N, H, D), jnp.float32)
    al = jax.random.normal(k, (H, D), jnp.float32) * 0.3
    ar = jax.random.normal(jax.random.PRNGKey(5), (H, D)) * 0.3

    fwd = jax.jit(lambda f, a, b: ops.gat_attention(g, f, a, b)
                  .sum(dtype=jnp.float32))
    t = timed(fwd, feat, al, ar) - rpc
    print(f"[{time.monotonic()-t_start:5.1f}s] L0 fused fwd (value)   "
          f"{t*1e3:8.1f} ms", flush=True)

    fb = jax.jit(jax.grad(lambda f, a, b: ops.gat_attention(g, f, a, b)
                          .sum(dtype=jnp.float32), argnums=(0, 1, 2)))
    t = timed(fb, feat, al, ar) - rpc
    print(f"[{time.monotonic()-t_start:5.1f}s] L0 fused fwd+bwd       "
          f"{t*1e3:8.1f} ms", flush=True)

    fbd = jax.jit(jax.grad(
        lambda f, a, b: ops.gat_attention(
            g, f, a, b, drop_rate=0.3,
            drop_rng=jax.random.PRNGKey(9)).sum(dtype=jnp.float32),
        argnums=(0, 1, 2)))
    t = timed(fbd, feat, al, ar) - rpc
    print(f"[{time.monotonic()-t_start:5.1f}s] L0 fused fwd+bwd +drop "
          f"{t*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
