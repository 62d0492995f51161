#!/usr/bin/env python
"""Sweep SpMM plan geometry (tile, block_rows) on the real TPU.

Per geometry: bare gather of the plan's own slots (the measured
speed-of-light denominator), the reduce kernel alone, and the full
bf16 copy_u_sum. One packed upload per geometry (utils/packing.py);
features generated on device. Chain-of-k timing under lax.scan
cancels the ~25ms RPC floor of the tunnel.

Purpose (r3): the round-2 default (512, 512) spends ~6.7ms in the
reduce on top of a ~10.3ms gather. Reduce MXU flops scale with
block_rows (2*d*F per slot) while padding slots scale with
tile*num_blocks/2 = tile*N/(2*d); this probe maps the tradeoff.
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
# NOTE: PYTHONPATH breaks the axon TPU plugin load; bootstrap via sys.path

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from glnn_tpu.graph.container import build_graph
    from glnn_tpu.ops import spmm_pallas as sp
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
        c1, ck = chained(1), chained(k)    # compile each exactly once
        best = float("inf")
        for _ in range(2):
            t1 = timed(c1, (z,) + args, iters)
            tk = timed(ck, (z,) + args, iters)
            best = min(best, (tk - t1) / (k - 1))
        return max(best, 1e-9)

    geos = [(512, 512), (512, 256), (256, 256), (512, 128)]
    t0 = time.monotonic()
    for tile, br in geos:
        gh = build_graph(src, dst, N, device=False).with_plans(
            tile=tile, block_rows=br, softmax=False, device=False)
        g = ship_packed(gh)
        x = jax.random.normal(kx, (N, F), jnp.float32)
        pf = g.plans[0]
        pf = pf[0] if isinstance(pf, tuple) else pf
        slots = pf.src_idx.shape[0]

        def take_only(c, gg, xx, p=pf):
            xb = xx.astype(jnp.bfloat16)
            m = jnp.take(sp._ghost_extend(xb), p.src_idx, axis=0)
            return c + m.sum(dtype=jnp.float32) * 1e-12

        t_take = chain_time(take_only, (g, x))
        mb = jax.jit(lambda xx, p=pf: jnp.take(
            sp._ghost_extend(xx.astype(jnp.bfloat16)), p.src_idx, axis=0))(x)
        t_red = chain_time(
            lambda c, mm, p=pf: sp.segment_reduce(
                p, mm + c.astype(mm.dtype)).sum(dtype=jnp.float32), (mb,))
        t_bf = chain_time(
            lambda c, gg, xx: sp.copy_u_sum(gg, xx + c).sum(
                dtype=jnp.float32), (g, x))
        print(f"[{time.monotonic()-t0:6.1f}s] tile={tile:4d} br={br:4d} "
              f"pad={slots/E-1:+6.1%} tiles={pf.num_tiles:6d} | "
              f"take {t_take*1e3:6.2f} | reduce {t_red*1e3:6.2f} | "
              f"full {t_bf*1e3:6.2f} ms ({E/t_bf/1e6:5.1f} Me/s) | "
              f"sol {t_take/t_bf:5.3f}",
              flush=True)


if __name__ == "__main__":
    main()
