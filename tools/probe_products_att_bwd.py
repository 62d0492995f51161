#!/usr/bin/env python
"""Products-scale fused-attention fwd+bwd through the uniform-geometry
chunked plans; appends the fused_attention_fwd_bwd_products row to
bench/products_scale_r5.json (the full bench script records the rest)."""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/glnn_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from glnn_tpu import ops
    from glnn_tpu.graph.container import build_graph
    from glnn_tpu.ops.attention_plan import build_chunked_attention_plans
    from glnn_tpu.utils.packing import ship_packed

    N, E, F = 2_449_029, 61_859_140, 100
    rs = np.random.RandomState(0)
    src = rs.randint(0, N, E).astype(np.int64)
    dst = rs.randint(0, N, E).astype(np.int64)
    g = build_graph(src, dst, N, device=False)
    del src, dst
    snd_h, rec_h = g._host_edges
    t0 = time.perf_counter()
    att = build_chunked_attention_plans(rec_h, snd_h, N, device=False)
    print("att build", round(time.perf_counter() - t0, 1), "s, chunks",
          len(att), flush=True)
    g = dataclasses.replace(g, smx=att)
    g = ship_packed(g)
    print("shipped", flush=True)
    kf = jax.random.PRNGKey(7)
    feats = jax.random.normal(kf, (N, F), jnp.float32)
    h_n, d_n = 4, 25
    feat3 = feats.reshape(N, h_n, d_n)
    al = jax.random.normal(jax.random.PRNGKey(11), (h_n, d_n),
                           jnp.float32) * 0.3
    ar = jax.random.normal(jax.random.PRNGKey(12), (h_n, d_n),
                           jnp.float32) * 0.3

    def time_scalar(fn, *args, iters=2, warmup=1):
        def force(out):
            leaf = jax.tree_util.tree_leaves(out)[-1]
            return float(leaf.sum() if getattr(leaf, "ndim", 0) else leaf)
        for _ in range(warmup):
            force(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            force(fn(*args))
        return (time.perf_counter() - t0) / iters

    att_fb = jax.jit(jax.grad(
        lambda f, a, b, gg: ops.gat_attention(gg, f, a, b)
        .sum(dtype=jnp.float32), argnums=(0, 1, 2)))
    t0 = time.perf_counter()
    fb = time_scalar(lambda f: att_fb(f, al, ar, g), feat3, iters=2,
                     warmup=1)
    print("fwd_bwd", round(fb, 3), "s (first call incl compile",
          round(time.perf_counter() - t0, 1), "s)", flush=True)
    row = {"stage": "fused_attention_fwd_bwd_products",
           "seconds": round(fb, 3),
           "edges_per_s_fwd_bwd": round(E / fb, 1),
           "note": "uniform-geometry chunks: one fwd + one bwd kernel "
                   "shape compiled, reused by all 16 chunks"}
    out = os.path.join(os.path.dirname(__file__), "..", "bench",
                       "products_scale_r5.json")
    with open(out, "a") as f:
        f.write(json.dumps(row) + "\n")
    print("row appended", flush=True)


if __name__ == "__main__":
    main()
