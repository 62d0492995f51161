#!/usr/bin/env python
"""Decompose the Pallas SpMM pipeline into timed stages on the TPU.

Stages (arxiv-scale uniform graph, N=169343 E=2.37M F=256):
  seq_copy      sequential HBM copy bandwidth ceiling (x -> x*2)
  take_bf16     the planned message gather alone (cast+take+sum)
  take_int8     the quantized message gather alone
  reduce_bf16   segment_reduce kernel on pre-gathered bf16 messages
  reduce_int8   segment_reduce kernel on pre-gathered int8 messages
  spmm_bf16     full copy_u_sum (gather + reduce)
  spmm_int8     full copy_u_sum_int8
  plan_build    host wall time for plan_for_graph (native builder)
  plan_ship     device transfer of the two plans

Timing is chain-of-k under lax.scan (subtracts the RPC floor exactly).
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
    from glnn_tpu.ops import spmm_plan as spp

    N, F = 169_343, 256
    E = N * 14
    rs = np.random.RandomState(0)
    src = rs.randint(0, N, E).astype(np.int64)
    dst = rs.randint(0, N, E).astype(np.int64)

    t0 = time.perf_counter()
    g = build_graph(src, dst, N)
    t_graph = time.perf_counter() - t0
    t0 = time.perf_counter()
    plans = spp.plan_for_graph(g)
    t_plan = time.perf_counter() - t0
    t0 = time.perf_counter()
    plans = jax.tree.map(
        lambda a: jax.device_put(a).block_until_ready()
        if hasattr(a, "shape") else a, plans)
    t_ship = time.perf_counter() - t0
    import dataclasses
    g = dataclasses.replace(g, plans=plans)
    print(f"build_graph {t_graph:.2f}s  plan_build {t_plan:.2f}s  "
          f"plan_ship {t_ship:.2f}s", flush=True)

    x = jnp.asarray(rs.randn(N, F).astype(np.float32))
    plan_fwd = g.plans[0]

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

    slots = plan_fwd.src_idx.shape[0]
    print(f"slots={slots} (pad {slots/E-1:+.1%})  tiles={plan_fwd.num_tiles}",
          flush=True)

    # sequential ceiling
    dt = chain_time(lambda c, xx: (xx * (1.0 + c)).sum(dtype=jnp.float32),
                    (x,))
    print(f"seq mul+sum f32   {dt*1e3:7.2f} ms  "
          f"{2*N*F*4/dt/1e9:6.1f} GB/s", flush=True)

    # gather alone, bf16
    def take_bf16(c, xx):
        xb = (xx + c).astype(jnp.bfloat16)
        m = jnp.take(sp._ghost_extend(xb), plan_fwd.src_idx, axis=0)
        return m.sum(dtype=jnp.float32)
    dt = chain_time(take_bf16, (x,))
    print(f"take bf16         {dt*1e3:7.2f} ms  "
          f"{slots*F*2/dt/1e9:6.1f} GB/s gathered", flush=True)

    # gather alone, int8
    def take_int8(c, xx):
        q, s = sp._quantize_cols(xx + c)
        q_ext = jnp.concatenate([q, jnp.zeros((1, F), jnp.int8)], axis=0)
        m = jnp.take(q_ext, plan_fwd.src_idx, axis=0)
        return m.sum(dtype=jnp.float32) + s.sum()
    dt = chain_time(take_int8, (x,))
    print(f"take int8         {dt*1e3:7.2f} ms  "
          f"{slots*F/dt/1e9:6.1f} GB/s gathered", flush=True)

    # reduce kernel alone on pre-gathered messages
    mb = jnp.take(sp._ghost_extend(x.astype(jnp.bfloat16)),
                  plan_fwd.src_idx, axis=0)
    dt = chain_time(
        lambda c, mm: sp.segment_reduce(
            plan_fwd, mm + c.astype(mm.dtype)).sum(dtype=jnp.float32),
        (mb,))
    print(f"reduce bf16       {dt*1e3:7.2f} ms  "
          f"{slots*F*2/dt/1e9:6.1f} GB/s absorbed", flush=True)

    mi = jnp.clip(jnp.round(jnp.take(sp._ghost_extend(x), plan_fwd.src_idx,
                                     axis=0)), -127, 127).astype(jnp.int8)
    dt = chain_time(
        lambda c, mm: sp.segment_reduce(
            plan_fwd, (mm + c.astype(jnp.int8))).sum(dtype=jnp.float32),
        (mi,))
    print(f"reduce int8       {dt*1e3:7.2f} ms  "
          f"{slots*F/dt/1e9:6.1f} GB/s absorbed", flush=True)

    # full ops
    dt = chain_time(lambda c, gg, xx: sp.copy_u_sum(gg, xx + c).sum(
        dtype=jnp.float32), (g, x))
    print(f"spmm bf16         {dt*1e3:7.2f} ms  "
          f"{E/dt/1e6:6.1f} M edges/s", flush=True)

    dt = chain_time(lambda c, gg, xx: sp.copy_u_sum_int8(gg, xx + c).sum(
        dtype=jnp.float32), (g, x))
    print(f"spmm int8         {dt*1e3:7.2f} ms  "
          f"{E/dt/1e6:6.1f} M edges/s", flush=True)


if __name__ == "__main__":
    main()
