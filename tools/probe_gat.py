#!/usr/bin/env python
"""Decompose the GAT teacher step cost on the bench graph (r3: the
driver bench shows gat2_teacher_step_ms ~1.2s — find where it goes).

Times each edge-level primitive the GAT forward uses, at H=8 heads,
plus a full fwd and a full train step, so the gap between
"sum of primitives" and "step" exposes what the op surface hides.

WARNING (r5): the chain-of-k "train step" marginal here is
DCE-FLATTERED — the scan body discards the updated state, so XLA
eliminates the whole backward pass and hoists the loop-invariant
dropout masks; the r4 "44.3 ms marginal" was a forward pass. For
honest step timing use the donated fed-back loop (bench.py
step_loop_time / tools/probe_gat_step5.py) and per-HLO device traces
(tools/trace_report.py). Kept for the per-primitive rows, which are
grad-coupled and remain valid.
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

    from glnn_tpu import ops
    from glnn_tpu.graph.container import build_graph
    from glnn_tpu.utils.packing import ship_packed

    N, F, H, D = 169_343, 256, 8, 32
    E = N * 14
    rs = np.random.RandomState(0)
    src = rs.randint(0, N, E).astype(np.int64)
    dst = rs.randint(0, N, E).astype(np.int64)
    g = ship_packed(build_graph(src, dst, N, device=False).with_plans(
        softmax=True, device=False))
    t_start = time.monotonic()
    print(f"[{time.monotonic()-t_start:5.1f}s] shipped", flush=True)

    k = jax.random.PRNGKey(0)
    el = jax.random.normal(k, (N, H), jnp.float32)
    er = jax.random.normal(k, (N, H), jnp.float32)
    x3 = jax.random.normal(k, (N, H, D), jnp.float32)
    scores = jax.random.normal(k, (g.e_pad, H), jnp.float32)

    def timed(fn, args, iters=3):
        float(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(fn(*args))
        return (time.perf_counter() - t0) / iters

    def chain_time(body, args, iters=3, kk=6):
        def chained(n):
            @jax.jit
            def f(s, *a):
                def step(c, _):
                    return body(c, *a) * 1e-6, None
                c, _ = jax.lax.scan(step, s, None, length=n)
                return c
            return f
        z = jnp.float32(0.0)
        c1, ck = chained(1), chained(kk)
        best = float("inf")
        for _ in range(2):
            t1 = timed(c1, (z,) + args, iters)
            tk = timed(ck, (z,) + args, iters)
            best = min(best, (tk - t1) / (kk - 1))
        return max(best, 1e-9)

    al_p = jax.random.normal(k, (H, D), jnp.float32) * 0.3
    ar_p = jax.random.normal(jax.random.PRNGKey(5), (H, D)) * 0.3

    def fused_fwd(c, xx):
        return ops.gat_attention(g, xx + c, al_p, ar_p).sum(
            dtype=jnp.float32)

    def fused_step(c, xx):
        return jax.grad(lambda f: ops.gat_attention(g, f, al_p, ar_p)
                        .sum(dtype=jnp.float32))(xx + c).sum(
            dtype=jnp.float32)

    probes = [
        ("fused attention fwd", fused_fwd, (x3,)),
        ("fused attention fwd+bwd", fused_step, (x3,)),
        ("u_add_v [E,8]", lambda c, a, b: ops.u_add_v(
            g, a + c, b).sum(dtype=jnp.float32), (el, er)),
        ("edge_softmax [E,8]", lambda c, s: ops.edge_softmax(
            g, s + c).sum(dtype=jnp.float32), (scores,)),
        ("u_mul_e_sum [N,8,32]x[E,8]", lambda c, xx, s: ops.u_mul_e_sum(
            g, xx + c, jax.nn.softmax(s)).sum(dtype=jnp.float32),
         (x3, scores)),
        ("copy_u_sum [N,256]", lambda c, xx: ops.copy_u_sum(
            g, xx.reshape(N, H * D) + c).sum(dtype=jnp.float32), (x3,)),
        ("bernoulli [E,8]", lambda c, s: (jax.random.bernoulli(
            jax.random.PRNGKey(1), 0.7, s.shape).astype(jnp.float32)
            + c).sum(dtype=jnp.float32), (scores,)),
    ]
    for name, body, args in probes:
        try:
            t = chain_time(body, args)
            print(f"[{time.monotonic()-t_start:5.1f}s] {name:28s} "
                  f"{t*1e3:8.2f} ms", flush=True)
        except Exception as exc:
            print(f"{name}: error {str(exc)[:160]}", flush=True)

    # full GAT fwd + train step
    from glnn_tpu.nn.models import Model
    from glnn_tpu.train import create_train_state, make_adam, \
        make_gnn_train_step

    conf = dict(model_name="GAT", num_layers=2, hidden_dim=256,
                label_dim=40, dropout_ratio=0.2, attn_dropout_ratio=0.3,
                num_heads=8, norm_type="none")
    model = Model(conf)
    x = jax.random.normal(k, (N, F), jnp.float32)
    labels = jax.random.randint(k, (N,), 0, 40)
    idx = jnp.arange(90_000)
    v = model.init(jax.random.PRNGKey(0), g, x)
    # params must be jit ARGUMENTS: closed-over they become HLO
    # constants and the remote-compile POST rejects the payload (413)
    t_fwd = chain_time(
        lambda c, vv, xx: model.apply(vv, g, xx + c, training=False)[1]
        .sum(dtype=jnp.float32), (v, x), iters=2, kk=4)
    print(f"[{time.monotonic()-t_start:5.1f}s] GAT fwd (eval)          "
          f"{t_fwd*1e3:8.2f} ms", flush=True)
    opt = make_adam(0.01, 0.0)
    state = create_train_state(v, opt)
    step = make_gnn_train_step(model, opt)
    t_step = chain_time(
        lambda c, s: step(s, g, x + c, labels, idx,
                          jax.random.PRNGKey(2))[1],
        (state,), iters=2, kk=4)
    print(f"[{time.monotonic()-t_start:5.1f}s] GAT train step          "
          f"{t_step*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
