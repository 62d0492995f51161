#!/usr/bin/env python
"""Probe: does index ORDER change the HBM random row-gather rate?

The SpMM plan's slot order within a tile is free (the one-hot reduce
maps slot -> row explicitly), so if ascending gather indices run
faster than shuffled ones we can sort slots by src at plan-build time
for free. Cases, all gathering E rows of F bf16 from an N-row table:

  random      iid uniform indices (the current plan's distribution)
  sorted      globally ascending (lower bound on locality win;
              unattainable in the plan but bounds the opportunity)
  tile-sorted ascending within each 512-slot tile, tiles shuffled
              (exactly what the plan could ship)
  dup-runs    globally sorted WITH duplicates (each row ~deg times):
              measures whether repeated-row reads coalesce

Chain-of-k scan timing (cancels the RPC floor).
"""

from __future__ import annotations

import time

import numpy as np

N = 169_343
E = N * 14
F = 256
TILE = 512


def main():
    import jax
    import jax.numpy as jnp

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(N, F).astype(np.float32)).astype(jnp.bfloat16)

    idx_random = rs.randint(0, N, E).astype(np.int32)
    idx_sorted = np.sort(idx_random)
    tiles = idx_random[: E - E % TILE].reshape(-1, TILE)
    tiles = np.sort(tiles, axis=1)
    perm = rs.permutation(tiles.shape[0])
    idx_tile_sorted = tiles[perm].reshape(-1)

    def timeit(idx, k=6, iters=3):
        idx = jnp.asarray(idx)

        @jax.jit
        def f(xx):
            def body(h, _):
                # carry-coupled: the gathered table depends on h, so the
                # scan cannot hoist the gather (loop-invariant code
                # motion otherwise removes it entirely). The h*0 add
                # streams the 87MB table once (~0.3ms, reported raw).
                m = jnp.take(xx + h.astype(xx.dtype), idx, axis=0)
                return h + m.sum(dtype=jnp.float32) * 1e-12, None
            h, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
            return h

        float(f(x))                   # compile
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            float(f(x))
            best = min(best, time.perf_counter() - t0)
        # subtract rpc floor
        g = jax.jit(lambda t: t + 1.0)
        z = jnp.zeros(())
        float(g(z))
        t0 = time.perf_counter()
        for _ in range(8):
            float(g(z))
        rpc = (time.perf_counter() - t0) / 8
        dt = max((best - rpc) / k, 1e-9)
        rows_per_s = len(np.asarray(idx)) / dt
        print(f"  {dt*1e3:7.2f} ms   {rows_per_s/1e6:7.1f} M rows/s")
        return dt

    print("random:")
    timeit(idx_random)
    print("tile-sorted (512):")
    timeit(idx_tile_sorted)
    print("sorted (global):")
    timeit(idx_sorted)


if __name__ == "__main__":
    main()
