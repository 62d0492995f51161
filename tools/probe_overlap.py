#!/usr/bin/env python
"""Decompose the SpMM pipeline: carry-coupled gather timing (the r3
probe_geometry take-chain was loop-invariant and got hoisted), ghost
(padding) gather cost, and effective reduce = full - gather per
geometry. One packed upload per geometry.
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

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
        c1, ck = chained(1), chained(k)
        best = float("inf")
        for _ in range(2):
            t1 = timed(c1, (z,) + args, iters)
            tk = timed(ck, (z,) + args, iters)
            best = min(best, (tk - t1) / (k - 1))
        return max(best, 1e-9)

    t0 = time.monotonic()
    for tile, br in [(512, 512), (512, 256), (512, 128)]:
        gh = build_graph(src, dst, N, device=False).with_plans(
            tile=tile, block_rows=br, softmax=False, device=False)
        g = ship_packed(gh)
        x = jax.random.normal(kx, (N, F), jnp.float32)
        pf = g.plans[0]
        pf = pf[0] if isinstance(pf, tuple) else pf
        slots = pf.src_idx.shape[0]

        # carry-coupled gather: the recast depends on c, so the take
        # cannot be hoisted out of the scan; the extra (x + c) stream
        # pass costs ~0.3ms (measured separately below as t_touch)
        def take_c(c, xx, p=pf):
            xb = (xx + c).astype(jnp.bfloat16)
            m = jnp.take(sp._ghost_extend(xb), p.src_idx, axis=0)
            return m.sum(dtype=jnp.float32) * 1e-9

        def touch(c, xx):
            xb = (xx + c).astype(jnp.bfloat16)
            return xb.sum(dtype=jnp.float32) * 1e-9

        t_touch = chain_time(touch, (x,))
        t_take = chain_time(take_c, (x,)) - t_touch
        t_full = chain_time(
            lambda c, gg, xx: sp.copy_u_sum(gg, xx + c).sum(
                dtype=jnp.float32), (g, x)) - t_touch
        print(f"[{time.monotonic()-t0:6.1f}s] tile={tile:4d} br={br:4d} "
              f"pad={slots/E-1:+6.1%} | touch {t_touch*1e3:5.2f} | "
              f"take {t_take*1e3:6.2f} | full {t_full*1e3:6.2f} | "
              f"reduce_eff {(t_full-t_take)*1e3:6.2f} ms | "
              f"sol {t_take/t_full:5.3f}", flush=True)

    # ghost-row (padding) gather cost: gather E real rows vs E ghosts
    gh = build_graph(src, dst, N, device=False).with_plans(
        tile=512, block_rows=512, softmax=False, device=False)
    g = ship_packed(gh)
    pf = g.plans[0]
    pf = pf[0] if isinstance(pf, tuple) else pf
    x = jax.random.normal(kx, (N, F), jnp.float32)
    idx_real = pf.src_idx
    idx_ghost = jnp.full_like(idx_real, N)

    def take_idx(c, xx, idx):
        xb = (xx + c).astype(jnp.bfloat16)
        m = jnp.take(sp._ghost_extend(xb), idx, axis=0)
        return m.sum(dtype=jnp.float32) * 1e-9

    t_real = chain_time(take_idx, (x, idx_real))
    t_ghost = chain_time(take_idx, (x, idx_ghost))
    print(f"[{time.monotonic()-t0:6.1f}s] gather real {t_real*1e3:.2f} ms "
          f"vs all-ghost {t_ghost*1e3:.2f} ms "
          f"(ghost/real {t_ghost/t_real:.2f})", flush=True)


if __name__ == "__main__":
    main()
