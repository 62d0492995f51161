#!/usr/bin/env python
"""SpMM kernel tuning sweep (run on the real TPU).

Times, for several (tile, block_rows) plan configs:
  * kernel-only (pre-gathered messages -> segment_reduce)
  * full spmm   (gather + kernel)
so the gather/kernel split is visible. Chain-of-k timing under lax.scan
subtracts the axon RPC floor exactly (see bench.py).
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from glnn_tpu.ops import spmm_pallas
    from glnn_tpu.ops.spmm_plan import build_spmm_plan

    N = 169_343
    E = N * 14
    F = 256
    rs = np.random.RandomState(0)
    src = rs.randint(0, N, E).astype(np.int64)
    dst = rs.randint(0, N, E).astype(np.int64)
    order = np.argsort(dst, kind="stable")
    src_s, dst_s = src[order], dst[order]

    x = jnp.asarray(rs.randn(N, F).astype(np.float32))
    xb = x.astype(jnp.bfloat16)

    def timed(fn, arg, iters=3):
        r = float(fn(arg))  # warm (compile)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = float(fn(arg))
        return (time.perf_counter() - t0) / iters

    def chain_time(body, iters=3, k=6):
        def chained(n):
            @jax.jit
            def f(s):
                def step(c, _):
                    return body(c) * 1e-6, None
                c, _ = jax.lax.scan(step, s, None, length=n)
                return c
            return f
        z = jnp.float32(0.0)
        t1 = timed(chained(1), z, iters)
        tk = timed(chained(k), z, iters)
        return max((tk - t1) / (k - 1), 1e-9)

    start = time.monotonic()

    # bandwidth references over an E x F bf16 buffer: ref_read = one
    # fused sequential read; ref_rw = read + materialize + read (the
    # add-materialize overhead baked into kern_body is ref_rw-ref_read)
    m0 = jnp.take(jnp.concatenate([xb, jnp.zeros((1, F), jnp.bfloat16)]),
                  jnp.asarray(np.where(np.arange(E) % 2 == 0,
                                       np.arange(E) % N, 0), np.int32),
                  axis=0)
    ref_read = chain_time(
        lambda c: (m0 + c.astype(jnp.bfloat16)).sum(dtype=jnp.float32))
    ref_rw = chain_time(
        lambda c: jax.lax.optimization_barrier(
            m0 + c.astype(jnp.bfloat16)).sum(dtype=jnp.float32))
    gb = E * F * 2 / 1e9
    print(f"ref: fused-read {ref_read*1e3:.2f}ms ({gb/ref_read:.0f} GB/s), "
          f"r+w+r {ref_rw*1e3:.2f}ms; add-pass overhead "
          f"{(ref_rw-ref_read)*1e3:.2f}ms  [+{time.monotonic()-start:.0f}s]",
          flush=True)

    for tile, d in [(1024, 256), (1024, 128), (512, 128), (512, 64),
                    (2048, 256), (1024, 512)]:
        plan = build_spmm_plan(dst_s, src_s, N, tile=tile, block_rows=d)
        slots = plan.num_tiles * plan.tile
        pad = slots / E - 1

        # pre-gathered messages resident on device
        msgs = jnp.take(
            jnp.concatenate([xb, jnp.zeros((1, F), jnp.bfloat16)]),
            plan.src_idx, axis=0)

        def kern_body(c, _plan=plan, _m=msgs):
            m = _m + c.astype(jnp.bfloat16)
            return spmm_pallas.segment_reduce(_plan, m).sum(dtype=jnp.float32)

        def full_body(c, _plan=plan, _x=x):
            m = spmm_pallas._gather_messages(_plan, _x + c)
            return spmm_pallas.segment_reduce(_plan, m).sum(dtype=jnp.float32)

        tk = chain_time(kern_body)
        tf = chain_time(full_body)
        print(f"tile={tile:5d} d={d:3d} pad={pad*100:5.1f}% "
              f"kernel={tk*1e3:7.2f}ms full={tf*1e3:7.2f}ms "
              f"gather~={(tf-tk)*1e3:7.2f}ms "
              f"edges/s={E/tf/1e6:6.1f}M  [+{time.monotonic()-start:.0f}s]",
              flush=True)


if __name__ == "__main__":
    main()
