#!/usr/bin/env python
"""Block-mode vs tiled SpMM on the real TPU (arxiv-scale bench graph).

For each candidate: full copy_u_sum, carry-coupled bare gather of the
plan's own slots, effective reduce = full - take. One packed upload
per candidate.
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from glnn_tpu.graph.container import build_graph
    from glnn_tpu.ops import spmm_pallas as sp
    from glnn_tpu.ops.spmm_plan import (build_block_plan, build_spmm_plan,
                                        plan_for_graph)
    from glnn_tpu.utils.packing import ship_packed

    N, F = 169_343, 256
    E = N * 14
    rs = np.random.RandomState(0)
    src = rs.randint(0, N, E).astype(np.int64)
    dst = rs.randint(0, N, E).astype(np.int64)
    kx = jax.random.PRNGKey(0)

    def timed(fn, args, iters=3):
        float(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(fn(*args))
        return (time.perf_counter() - t0) / iters

    def chain_time(body, args, iters=3, k=6):
        def chained(n):
            @jax.jit
            def f(s, *a):
                def step(c, _):
                    return body(c, *a) * 1e-6, None
                c, _ = jax.lax.scan(step, s, None, length=n)
                return c
            return f
        z = jnp.float32(0.0)
        c1, ck = chained(1), chained(k)
        best = float("inf")
        for _ in range(2):
            t1 = timed(c1, (z,) + args, iters)
            tk = timed(ck, (z,) + args, iters)
            best = min(best, (tk - t1) / (k - 1))
        return max(best, 1e-9)

    g0 = build_graph(src, dst, N, device=False)
    host = getattr(g0, "_host_edges", None)
    snd, rec = host

    def tiled(tile, br):
        return build_spmm_plan(rec, snd, N, tile, br, device=False)

    def block(tile, br):
        return build_block_plan(rec, snd, N, tile, br, device=False)

    cands = [
        ("block 256/256", block(256, 256)),
        ("block 128/256", block(128, 256)),
        ("block 256/128", block(256, 128)),
    ]
    t0 = time.monotonic()
    for name, pf in cands:
        if pf is None:
            print(f"{name}: declined", flush=True)
            continue
        g = ship_packed(dataclasses.replace(g0, plans=(pf, pf)))
        x = jax.random.normal(kx, (N, F), jnp.float32)
        p = g.plans[0]
        slots = p.src_idx.shape[0]

        def take_c(c, xx, pp=p):
            xb = (xx + c).astype(jnp.bfloat16)
            m = jnp.take(sp._ghost_extend(xb), pp.src_idx, axis=0)
            return m.sum(dtype=jnp.float32) * 1e-9

        def full(c, gg, xx):
            return sp.copy_u_sum(gg, xx + c).sum(dtype=jnp.float32)

        def full_i8(c, gg, xx):
            return sp.copy_u_sum_int8(gg, xx + c).sum(dtype=jnp.float32)

        try:
            t_take = chain_time(take_c, (x,))
            t_full = chain_time(full, (g, x))
            t_i8 = chain_time(full_i8, (g, x))
        except Exception as exc:
            print(f"{name}: error {type(exc).__name__}: "
                  f"{str(exc)[:200]}", flush=True)
            continue
        print(f"[{time.monotonic()-t0:6.1f}s] {name:14s} "
              f"pad={slots/E-1:+6.1%} steps={p.num_tiles if p.tiles_per_block is None else p.num_blocks:5d} | "
              f"take {t_take*1e3:6.2f} | full {t_full*1e3:6.2f} ms "
              f"({E/t_full/1e6:5.1f} Me/s) | sol {t_take/t_full:5.3f} | "
              f"int8 {t_i8*1e3:6.2f} ms ({E/t_i8/1e6:5.1f} Me/s)",
              flush=True)


if __name__ == "__main__":
    main()
