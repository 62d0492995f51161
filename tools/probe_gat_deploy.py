#!/usr/bin/env python
"""Decompose the GAT bench-method step (188.7 ms r4) vs its chain-of-k
marginal (44.3 ms): VERDICT r4 weak #3.

Round-5 findings (this probe, first run):
  step (feat 0.2 / attn 0.3)   191.6 ms   <- the r4 bench number
  step (attn drop 0)           172.5      <- attn masks ~19 ms
  step (feat drop 0)           187.8      <- feat masks ~4 ms
  step (all drop 0)            169.6      <- NOT a dropout problem
  bare threefry masks          0.8        <- mask GENERATION is free

So ~125 ms of the gap is per-call overhead, not computation. This run
isolates it: a trivial jitted fn taking the IDENTICAL argument set
(state pytree + graph-with-plans pytree + features) vs one taking a
single array, plus the honest sustained chain (rng folded from the
carried step counter so dropout masks are regenerated every step and
cannot be hoisted out of the scan).
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

    from glnn_tpu.graph.container import build_graph
    from glnn_tpu.nn.models import Model
    from glnn_tpu.train import (create_train_state, make_adam,
                                make_gnn_train_step)
    from glnn_tpu.utils.packing import ship_packed

    N, F, H = 169_343, 256, 8
    E = N * 14
    rs = np.random.RandomState(0)
    src = rs.randint(0, N, E).astype(np.int64)
    dst = rs.randint(0, N, E).astype(np.int64)
    g = ship_packed(build_graph(src, dst, N, device=False).with_plans(
        softmax=True, device=False))
    t_start = time.monotonic()
    n_bufs = len(jax.tree_util.tree_leaves(g))
    print(f"[{time.monotonic()-t_start:5.1f}s] shipped; graph pytree has "
          f"{n_bufs} leaves", flush=True)

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
    base = dict(model_name="GAT", num_layers=2, hidden_dim=256,
                label_dim=40, dropout_ratio=0.2, attn_dropout_ratio=0.3,
                num_heads=H, norm_type="none")
    model = Model(base)
    v = model.init(jax.random.PRNGKey(0), g, x)
    state = create_train_state(v, opt)
    n_state = len(jax.tree_util.tree_leaves(state))
    print(f"[{time.monotonic()-t_start:5.1f}s] state pytree has "
          f"{n_state} leaves", flush=True)
    step = make_gnn_train_step(model, opt)

    t = timed(lambda s: step(s, g, x, labels, idx,
                             jax.random.PRNGKey(2))[1], state,
              iters=4) - rpc
    print(f"[{time.monotonic()-t_start:5.1f}s] per-call step [bench]  "
          f"{t*1e3:8.1f} ms", flush=True)

    # same argument SET, trivial computation
    @jax.jit
    def trivial(s, gg, xx, ll, ii, key):
        return jax.tree_util.tree_leaves(s.params)[0].sum() * 0 + xx[0, 0]

    t = timed(lambda s: trivial(s, g, x, labels, idx,
                                jax.random.PRNGKey(2)), state,
              iters=6) - rpc
    print(f"[{time.monotonic()-t_start:5.1f}s] trivial fn, same args  "
          f"{t*1e3:8.1f} ms", flush=True)

    @jax.jit
    def trivial1(xx):
        return xx[0, 0]

    t = timed(trivial1, x, iters=6) - rpc
    print(f"[{time.monotonic()-t_start:5.1f}s] trivial fn, one array  "
          f"{t*1e3:8.1f} ms", flush=True)

    # honest sustained chain: key folded from the carried step counter,
    # so masks are regenerated every iteration (no hoisting)
    def chain(kk):
        @jax.jit
        def f(s):
            def body(c, _):
                s_c, acc = c
                s2, loss = step(s_c, g, x, labels, idx,
                                jax.random.fold_in(jax.random.PRNGKey(2),
                                                   s_c.step))
                return (s2, acc + loss), None
            (s_f, acc), _ = jax.lax.scan(body, (s, jnp.float32(0)), None,
                                         length=kk)
            return acc
        return f

    c1 = timed(chain(1), state, iters=3)
    c5 = timed(chain(5), state, iters=3)
    print(f"[{time.monotonic()-t_start:5.1f}s] chain marginal "
          f"(carry-folded keys) {(c5-c1)/4*1e3:8.1f} ms", flush=True)
    print(f"[{time.monotonic()-t_start:5.1f}s] chain(1) per-call "
          f"{(c1-rpc)*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
