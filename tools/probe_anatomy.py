#!/usr/bin/env python
"""Time each phase of the planned SpMM pipeline on the real chip:
gather (f32/bf16/int8), segment_reduce kernel alone, quantization,
and the assembled tiers. Chain-of-k timing (RPC-floor-free)."""


import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
# NOTE: PYTHONPATH breaks the axon TPU plugin load; bootstrap via sys.path instead
import time
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

N, AVG_DEG, F = 169_343, 14, 256


def main():
    import jax
    import jax.numpy as jnp

    from glnn_tpu.graph.container import build_graph
    from glnn_tpu.ops import spmm_pallas, refops

    rs = np.random.RandomState(0)
    e = N * AVG_DEG
    src = rs.randint(0, N, e).astype(np.int64)
    dst = rs.randint(0, N, e).astype(np.int64)
    g = build_graph(src, dst, N).with_plans()
    plan_fwd, plan_bwd = g.plans
    x = jnp.asarray(rs.randn(N, F).astype(np.float32))

    def chain(op, k, *args):
        @jax.jit
        def f(*a):
            def body(h, _):
                return op(*a[:-1], h) * 1e-3, None
            h, _ = jax.lax.scan(body, a[-1], None, length=k)
            return h.sum()
        return f

    def t_scalar(f, *args, iters=3):
        float(f(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(f(*args))
        return (time.perf_counter() - t0) / iters

    def bench(name, op, *args, repeats=3):
        c1, c6 = chain(op, 1, *args), chain(op, 6, *args)
        best = float("inf")
        for _ in range(repeats):
            t1 = t_scalar(c1, *args)
            t6 = t_scalar(c6, *args)
            best = min(best, (t6 - t1) / 5)
        print(f"{name:34s} {best*1e3:8.2f} ms", flush=True)
        return best

    src_idx = plan_fwd.src_idx
    n_slots = int(src_idx.shape[0])
    print(f"E={e} slots={n_slots} tiles={plan_fwd.num_tiles} "
          f"block_rows={plan_fwd.block_rows} blocks={plan_fwd.num_blocks}")

    xb = x.astype(jnp.bfloat16)
    q, s = spmm_pallas._quantize_cols(x)

    # 1. pure gathers (cast outside): h is dummy scalar-carrier
    def mk_gather(xx):
        def op(h):
            m = jnp.take(xx + h.astype(xx.dtype)[None, None] * 0, src_idx,
                         axis=0)
            return m[::4096, :8].astype(jnp.float32).sum() + h * 0
        # op consumes/produces scalar h so chain works
        return op

    def chain_scalar(op, k):
        @jax.jit
        def f(h0):
            def body(h, _):
                return op(h) * 1e-3 + h * 1e-6, None
            h, _ = jax.lax.scan(body, h0, None, length=k)
            return h
        return f

    def bench_scalar(name, op, repeats=3):
        c1, c6 = chain_scalar(op, 1), chain_scalar(op, 6)
        z = jnp.float32(1.0)
        best = float("inf")
        for _ in range(repeats):
            t1 = t_scalar(c1, z)
            t6 = t_scalar(c6, z)
            best = min(best, (t6 - t1) / 5)
        print(f"{name:34s} {best*1e3:8.2f} ms", flush=True)
        return best

    bench_scalar("gather f32 (1KB rows)", mk_gather(x))
    bench_scalar("gather bf16 (512B rows)", mk_gather(xb))
    bench_scalar("gather int8 (256B rows)", mk_gather(q))
    # wider rows: same bytes, half the rows
    x2 = jnp.asarray(rs.randn(N // 2, 2 * F).astype(np.float32)
                     ).astype(jnp.bfloat16)
    idx2 = jnp.asarray(rs.randint(0, N // 2, n_slots // 2))
    def g2(h):
        m = jnp.take(x2 + h.astype(x2.dtype) * 0, idx2, axis=0)
        return m[::4096, :8].astype(jnp.float32).sum() + h * 0
    bench_scalar("gather bf16 1KB rows half count", g2)

    # 2. kernel alone on pre-gathered messages
    m_bf = jnp.take(spmm_pallas._ghost_extend(xb), src_idx, axis=0)
    m_i8 = jnp.take(
        jnp.concatenate([q, jnp.zeros((1, F), jnp.int8)]), src_idx, axis=0)
    def mk_kernel(mm):
        def op(h):
            out = spmm_pallas.segment_reduce(
                plan_fwd, mm + h.astype(mm.dtype) * 0)
            return out[::1024, :8].astype(jnp.float32).sum() * 1e-9 + h * 0
        return op
    bench_scalar("segment_reduce bf16", mk_kernel(m_bf))
    bench_scalar("segment_reduce int8", mk_kernel(m_i8))

    # 3. quantize alone
    def qop(h):
        qq, ss = spmm_pallas._quantize_cols(x + h * 0)
        return qq[::4096, :8].astype(jnp.float32).sum() + ss.sum() * 0 + h * 0
    bench_scalar("quantize_cols", qop)

    # 4. assembled tiers
    bench("copy_u_sum pallas bf16", spmm_pallas.copy_u_sum, g, x)
    bench("copy_u_sum int8", spmm_pallas.copy_u_sum_int8, g, x)
    bench("copy_u_sum xla", refops.copy_u_sum, g, x)


if __name__ == "__main__":
    main()
