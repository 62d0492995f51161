#!/usr/bin/env python
"""Sweep SpMM plan geometry (tile, block_rows) on the real TPU.

For each config: time the reduce kernel alone and the full bf16 +
int8 spmm ops over the arxiv-scale uniform graph. Timing is
chain-of-k under lax.scan (subtracts the RPC floor exactly).
"""


from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
# NOTE: PYTHONPATH breaks the axon TPU plugin load; bootstrap via sys.path instead


import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from glnn_tpu.graph.container import build_graph
    from glnn_tpu.ops import spmm_pallas as sp

    N, F = 169_343, 256
    E = N * 14
    rs = np.random.RandomState(0)
    src = rs.randint(0, N, E).astype(np.int64)
    dst = rs.randint(0, N, E).astype(np.int64)
    g0 = build_graph(src, dst, N)
    x = jnp.asarray(rs.randn(N, F).astype(np.float32))

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
        best = float("inf")
        for _ in range(2):
            t1 = timed(chained(1), (z,) + args, iters)
            tk = timed(chained(k), (z,) + args, iters)
            best = min(best, (tk - t1) / (k - 1))
        return max(best, 1e-9)

    for tile, br in [(512, 512), (256, 256)]:
        g = g0.with_plans(tile=tile, block_rows=br)
        pf = g.plans[0]
        slots = pf.src_idx.shape[0]
        mb = jnp.take(sp._ghost_extend(x.astype(jnp.bfloat16)),
                      pf.src_idx, axis=0)
        t_red = chain_time(
            lambda c, mm, p=pf: sp.segment_reduce(
                p, mm + c.astype(mm.dtype)).sum(dtype=jnp.float32), (mb,))
        t_bf = chain_time(
            lambda c, gg, xx: sp.copy_u_sum(gg, xx + c).sum(
                dtype=jnp.float32), (g, x))
        t_i8 = chain_time(
            lambda c, gg, xx: sp.copy_u_sum_int8(gg, xx + c).sum(
                dtype=jnp.float32), (g, x))
        print(f"tile={tile:5d} br={br:4d} pad={slots/E-1:+6.1%} "
              f"tiles={pf.num_tiles:5d} | reduce {t_red*1e3:6.2f} ms | "
              f"bf16 {t_bf*1e3:6.2f} ms ({E/t_bf/1e6:5.1f} Me/s) | "
              f"int8 {t_i8*1e3:6.2f} ms ({E/t_i8/1e6:5.1f} Me/s)",
              flush=True)


if __name__ == "__main__":
    main()
