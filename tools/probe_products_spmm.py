#!/usr/bin/env python
"""Decompose the products-scale chunked SpMM (r3: 68.8M edges/s vs
155M at arxiv scale — find the 2.3x).

Stages timed on the real chip, products-scale synthetic graph
(N=2.45M, E=62M, F=100, 16 chunk plans):
  1. bare gather of ONE chunk's slots from the bf16 feature table
     (row-rate SOL at a 2.45M-row table — the arxiv 250M rows/s was
     measured on a 169K-row table)
  2. reduce-only of one chunk (kernel fed a precomputed message buffer)
  3. one full chunk (gather + reduce)
  4. the full 16-chunk copy_u_sum (the r3 headline path)
  5. full copy_u_sum with F pre-padded to 128 on the host side
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np

N = 2_449_029
E = 61_859_140
F = 100


def main():
    import jax
    import jax.numpy as jnp

    from glnn_tpu import ops
    from glnn_tpu.graph.container import build_graph
    from glnn_tpu.ops import spmm_pallas as sp
    from glnn_tpu.utils.packing import ship_packed

    t_start = time.monotonic()

    def log(msg):
        print(f"[{time.monotonic()-t_start:6.1f}s] {msg}", flush=True)

    rs = np.random.RandomState(0)
    src = rs.randint(0, N, E).astype(np.int64)
    dst = rs.randint(0, N, E).astype(np.int64)
    g = build_graph(src, dst, N, device=False).with_plans(
        softmax=False, device=False)
    del src, dst
    g = ship_packed(g)
    log("graph+plans shipped")

    x = jax.random.normal(jax.random.PRNGKey(0), (N, F), jnp.float32)
    _ = float(x[0, 0])
    log("features generated")

    def timed(fn, *args, iters=3):
        float(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(fn(*args))
        return (time.perf_counter() - t0) / iters

    def chain(body, args, kk=4, iters=2):
        def build(n):
            @jax.jit
            def f(s, *a):
                def stp(c, _):
                    return body(c, *a) * 1e-6, None
                c, _ = jax.lax.scan(stp, s, None, length=n)
                return c
            return f
        z = jnp.float32(0.0)
        t1 = timed(build(1), z, *args, iters=iters)
        tk = timed(build(kk), z, *args, iters=iters)
        return max((tk - t1) / (kk - 1), 1e-9)

    pf = g.plans[0]
    chunks = pf if isinstance(pf, tuple) else (pf,)
    log(f"fwd chunks: {len(chunks)}; slots "
        f"{sum(p.num_tiles*p.tile for p in chunks)}; "
        f"block_mode {chunks[0].tiles_per_block is not None}")
    p0 = chunks[len(chunks) // 2]
    s0 = p0.num_tiles * p0.tile

    # carry-coupling: every body folds the scan carry into its INPUT
    # (xx + c) so XLA cannot hoist the op out of the scan; the cost of
    # that (xx + c) streaming pass is measured separately and reported
    def base(c, pp, xx):
        return (xx + c).sum(dtype=jnp.float32) * 1e-12 + c
    t_base = chain(base, (p0, x))
    log(f"carry-coupling pass (x + c).sum: {t_base*1e3:8.2f} ms")

    # 1) bare gather of one chunk's slots
    def bare(c, pp, xx):
        xb = (xx + c).astype(jnp.bfloat16)
        m = jnp.take(sp._ghost_extend(xb), pp.src_idx, axis=0)
        return c + m.sum(dtype=jnp.float32) * 1e-12
    t = chain(bare, (p0, x)) - t_base
    log(f"bare gather 1 chunk ({s0} slots): {t*1e3:8.2f} ms "
        f"-> {s0/t/1e6:.1f}M rows/s")

    # 2) reduce-only of one chunk from a resident message buffer
    msgs = jax.random.normal(jax.random.PRNGKey(1), (s0, F),
                             jnp.float32).astype(jnp.bfloat16)
    _ = float(msgs[0, 0].astype(jnp.float32))
    def mbase(c, pp, mm):
        return (mm + c).sum(dtype=jnp.float32) * 1e-12 + c
    t_mbase = chain(mbase, (p0, msgs))
    def red(c, pp, mm):
        return c + sp.segment_reduce(pp, mm + c).sum(
            dtype=jnp.float32) * 1e-9
    t = chain(red, (p0, msgs)) - t_mbase
    log(f"reduce-only 1 chunk: {t*1e3:8.2f} ms "
        f"(msg-pass baseline {t_mbase*1e3:.2f} ms)")

    # 3) one full chunk
    def one(c, pp, xx):
        m = sp._gather_messages(pp, xx + c)
        return c + sp.segment_reduce(pp, m).sum(dtype=jnp.float32) * 1e-9
    t1c = chain(one, (p0, x)) - t_base
    log(f"gather+reduce 1 chunk: {t1c*1e3:8.2f} ms "
        f"(x{len(chunks)} = {t1c*len(chunks)*1e3:.0f} ms)")

    # 4) full 16-chunk copy_u_sum, carry-coupled exactly like bench.py
    def full(c, gg, xx):
        h = ops.copy_u_sum(gg, xx + c) * 1e-3
        return h.sum(dtype=jnp.float32) * 1e-9 + c
    tf = chain(full, (g, x), kk=3) - t_base
    log(f"full copy_u_sum: {tf*1e3:8.2f} ms -> {E/tf/1e6:.1f}M edges/s")

    # 5) full copy_u_sum with a RESIDENT bf16 table: is the per-chunk
    # f32->bf16 cast being recomputed 16x?
    xb16 = x.astype(jnp.bfloat16)
    _ = float(xb16[0, 0].astype(jnp.float32))
    def b16base(c, gg, xx):
        return (xx + c.astype(jnp.bfloat16)).sum(
            dtype=jnp.float32) * 1e-12 + c
    t_b16 = chain(b16base, (g, xb16))
    def full16(c, gg, xx):
        h = ops.copy_u_sum(gg, xx + c.astype(jnp.bfloat16))
        return h.sum(dtype=jnp.float32) * 1e-9 + c
    t16 = chain(full16, (g, xb16), kk=3) - t_b16
    log(f"full copy_u_sum (bf16 input): {t16*1e3:8.2f} ms "
        f"-> {E/t16/1e6:.1f}M edges/s")


if __name__ == "__main__":
    main()
