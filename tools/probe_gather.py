#!/usr/bin/env python
"""Probe the TPU HBM random row-gather: bytes-bound or rows-bound?

Times fused take+sum (pure random read) for bf16 vs f32 rows, plus a
locality variant (indices within a +-4096 window of a moving cursor —
the access pattern slot-sorted plans produce on RCM-ordered graphs).
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    N = 169_343
    E = N * 14
    F = 256
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(N, F).astype(np.float32))
    xb = x.astype(jnp.bfloat16)

    idx_rand = jnp.asarray(rs.randint(0, N, E).astype(np.int32))
    # sorted-window pattern: edge slots visit dst blocks in order; with
    # graph locality the sources cluster near the block. cursor walks N.
    base = (np.arange(E, dtype=np.int64) * N) // E
    off = rs.randint(-4096, 4096, E)
    idx_loc = jnp.asarray(np.clip(base + off, 0, N - 1).astype(np.int32))

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

    def take_sum(c, xx, idx):
        return jnp.take(xx + c.astype(xx.dtype), idx, axis=0).sum(
            dtype=jnp.float32)

    for name, xx, idx, bpr in [
        ("bf16 random", xb, idx_rand, F * 2),
        ("f32  random", x, idx_rand, F * 4),
        ("bf16 local+-4k", xb, idx_loc, F * 2),
        ("bf16 sorted", xb, jnp.sort(idx_rand), F * 2),
    ]:
        t = chain_time(take_sum, (xx, idx))
        gbs = E * bpr / t / 1e9
        print(f"{name:15s}: {t*1e3:7.2f}ms  {gbs:6.0f} GB/s  "
              f"{E/t/1e6:6.0f}M rows/s", flush=True)


if __name__ == "__main__":
    main()
