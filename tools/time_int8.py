#!/usr/bin/env python
"""Time the int8-quantized SpMM tier vs bf16 on the real TPU."""


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
    g = build_graph(src, dst, N).with_plans()
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
        t1 = timed(chained(1), (z,) + args, iters)
        tk = timed(chained(k), (z,) + args, iters)
        return max((tk - t1) / (k - 1), 1e-9)

    def body_bf16(c, gg, xx):
        return sp.copy_u_sum(gg, xx + c).sum(dtype=jnp.float32)

    def body_int8(c, gg, xx):
        return sp.copy_u_sum_int8(gg, xx + c).sum(dtype=jnp.float32)

    t_bf = chain_time(body_bf16, (g, x))
    print(f"bf16: {t_bf*1e3:7.2f}ms  {E/t_bf/1e6:6.1f}M edges/s", flush=True)
    t_i8 = chain_time(body_int8, (g, x))
    print(f"int8: {t_i8*1e3:7.2f}ms  {E/t_i8/1e6:6.1f}M edges/s "
          f"({t_bf/t_i8:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
