#!/usr/bin/env python
"""SpMM kernel tuning sweep (run on the real TPU).

Times, for several (tile, block_rows) plan configs:
  * kernel-only (pre-gathered messages -> segment_reduce)
  * full spmm   (gather + kernel)
so the gather/kernel split is visible. Chain-of-k timing under lax.scan
subtracts the axon RPC floor exactly (see bench.py). All device arrays
are passed as jit ARGUMENTS — the axon remote-compile service rejects
closures over large constants (HTTP 413).
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

    def timed(fn, args, iters=3):
        r = float(fn(*args))  # warm (compile)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = float(fn(*args))
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

    start = time.monotonic()

    # bandwidth references over an E x F bf16 buffer: ref_read = one
    # fused sequential read; ref_rw = read + materialize + read (the
    # add-materialize overhead baked into kern_body is ref_rw-ref_read)
    idx0 = jnp.asarray(
        np.where(np.arange(E) % 2 == 0, np.arange(E) % N, 0).astype(np.int32))
    m0 = jnp.take(jnp.concatenate([xb, jnp.zeros((1, F), jnp.bfloat16)]),
                  idx0, axis=0)

    def body_read(c, m):
        return (m + c.astype(jnp.bfloat16)).sum(dtype=jnp.float32)

    def body_rw(c, m):
        return jax.lax.optimization_barrier(
            m + c.astype(jnp.bfloat16)).sum(dtype=jnp.float32)

    ref_read = chain_time(body_read, (m0,))
    ref_rw = chain_time(body_rw, (m0,))
    gb = E * F * 2 / 1e9
    print(f"ref: fused-read {ref_read*1e3:.2f}ms ({gb/ref_read:.0f} GB/s), "
          f"r+w+r {ref_rw*1e3:.2f}ms; add-pass overhead "
          f"{(ref_rw-ref_read)*1e3:.2f}ms  [+{time.monotonic()-start:.0f}s]",
          flush=True)

    def kern_body(c, plan, m):
        mm = m + c.astype(jnp.bfloat16)
        return spmm_pallas.segment_reduce(plan, mm).sum(dtype=jnp.float32)

    def full_body(c, plan, xx):
        m = spmm_pallas._gather_messages(plan, xx + c)
        return spmm_pallas.segment_reduce(plan, m).sum(dtype=jnp.float32)

    import sys
    cfgs = [(1024, 256), (1024, 128), (512, 128), (512, 64),
            (2048, 256), (1024, 512)]
    if len(sys.argv) > 1:
        cfgs = [tuple(int(v) for v in c.split(",")) for c in sys.argv[1:]]
    for tile, d in cfgs:
        plan = build_spmm_plan(dst_s, src_s, N, tile=tile, block_rows=d)
        slots = plan.num_tiles * plan.tile
        pad = slots / E - 1

        msgs = jnp.take(
            jnp.concatenate([xb, jnp.zeros((1, F), jnp.bfloat16)]),
            plan.src_idx, axis=0)

        tk = chain_time(kern_body, (plan, msgs))
        tf = chain_time(full_body, (plan, x))
        kern_true = tk - (ref_rw - ref_read)
        print(f"tile={tile:5d} d={d:3d} pad={pad*100:5.1f}% "
              f"kernel~={kern_true*1e3:7.2f}ms full={tf*1e3:7.2f}ms "
              f"gather~={(tf-kern_true)*1e3:7.2f}ms "
              f"edges/s={E/tf/1e6:6.1f}M  [+{time.monotonic()-start:.0f}s]",
              flush=True)


if __name__ == "__main__":
    main()
