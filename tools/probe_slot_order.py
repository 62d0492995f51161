#!/usr/bin/env python
"""A/B the SLOT ORDER of the chunked-plan gather at products scale.

tools/probe_gather_scaling.py measured uniform-random 4M-row gathers at
150-226M rows/s on the 2.45M-row table, while the real plan's gather
(src-SORTED within each block, ascending stride ~380 rows) ran at
78.9M rows/s. Hypothesis: the ascending strided order serializes DRAM
banks/pages at large tables — the very sort that helps (or at least
never hurt) at arxiv scale anti-optimizes at products scale.

Variants timed on one real chunk's slot multiset (~4.37M slots):
  sorted   — the plan as built (src-sorted per block)
  natural  — dst-sorted edge order within each block (no src sort)
  shuffled — random permutation within each block
(All three keep slots within their dst block, so any of them is a
valid plan ordering for the one-hot reduce.)
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

    from glnn_tpu.graph.container import build_graph
    from glnn_tpu.utils.packing import ship_packed

    t_start = time.monotonic()

    def log(msg):
        print(f"[{time.monotonic()-t_start:6.1f}s] {msg}", flush=True)

    rs = np.random.RandomState(0)
    src = rs.randint(0, N, E).astype(np.int64)
    dst = rs.randint(0, N, E).astype(np.int64)
    gh = build_graph(src, dst, N, device=False).with_plans(
        softmax=False, device=False)
    del src, dst
    pf = gh.plans[0]
    chunks = pf if isinstance(pf, tuple) else (pf,)
    p0 = chunks[len(chunks) // 2]
    x_tile = int(p0.tile) * int(p0.tiles_per_block or 1)
    src_idx = np.asarray(p0.src_idx).reshape(-1, x_tile)  # [B, X]
    b, x = src_idx.shape
    log(f"chunk: {b} blocks x {x} slots (tiles_per_block "
        f"{p0.tiles_per_block})")

    rs2 = np.random.RandomState(1)
    shuffled = src_idx.copy()
    for i in range(b):                 # per-block shuffle keeps validity
        rs2.shuffle(shuffled[i])
    # natural order: un-sort = order by the plan's edge_perm per block
    perm = np.asarray(p0.edge_perm).reshape(b, x)
    order = np.argsort(perm, axis=1, kind="stable")
    natural = np.take_along_axis(src_idx, order, axis=1)

    variants = {"sorted": src_idx.reshape(-1),
                "natural": natural.reshape(-1),
                "shuffled": shuffled.reshape(-1)}
    dev = ship_packed({k: v.astype(np.int32)
                       for k, v in variants.items()})
    log("variants shipped")

    xdev = jax.random.normal(jax.random.PRNGKey(0), (N, F), jnp.float32)
    tables = {
        "bf16": jnp.concatenate([xdev.astype(jnp.bfloat16),
                                 jnp.zeros((1, F), jnp.bfloat16)], axis=0),
        "f32": jnp.concatenate([xdev, jnp.zeros((1, F), jnp.float32)],
                               axis=0),
        "int8": jnp.concatenate([(xdev * 10).astype(jnp.int8),
                                 jnp.zeros((1, F), jnp.int8)], axis=0),
    }
    _ = sum(float(t[0, 0].astype(jnp.float32)) for t in tables.values())
    log("tables ready")

    def timed(fn, *args, iters=3):
        float(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(fn(*args))
        return (time.perf_counter() - t0) / iters

    def run(name, idx, ext):
        @jax.jit
        def f1(s, tbl, ii):
            def stp(c, _):
                i2 = ii + c.astype(jnp.int32)
                m = jnp.take(tbl, i2, axis=0)
                return c + m.sum(dtype=jnp.float32) * 1e-12, None
            c, _ = jax.lax.scan(stp, s, None, length=1)
            return c

        @jax.jit
        def f4(s, tbl, ii):
            def stp(c, _):
                i2 = ii + c.astype(jnp.int32)
                m = jnp.take(tbl, i2, axis=0)
                return c + m.sum(dtype=jnp.float32) * 1e-12, None
            c, _ = jax.lax.scan(stp, s, None, length=4)
            return c

        z = jnp.float32(0.0)
        t1 = timed(f1, z, ext, idx)
        t4 = timed(f4, z, ext, idx)
        t = max((t4 - t1) / 3, 1e-9)
        log(f"{name:22s}: {t*1e3:7.2f} ms -> "
            f"{idx.shape[0]/t/1e6:6.1f}M rows/s")

    for name in ("sorted", "natural", "shuffled"):
        run(name + "/bf16", dev[name], tables["bf16"])
    for dt in ("f32", "int8"):
        run("natural/" + dt, dev["natural"], tables[dt])
    # gather fused into the sum vs MATERIALIZED (what the kernel path
    # actually does: the message tensor is written to HBM for pallas)
    def run_mat(name, idx, ext):
        @jax.jit
        def f1(s, tbl, ii):
            def stp(c, _):
                m = jnp.take(tbl, ii + c.astype(jnp.int32), axis=0)
                m = jax.lax.optimization_barrier(m)    # force materialize
                return c + m.sum(dtype=jnp.float32) * 1e-12, None
            c, _ = jax.lax.scan(stp, s, None, length=1)
            return c

        @jax.jit
        def f4(s, tbl, ii):
            def stp(c, _):
                m = jnp.take(tbl, ii + c.astype(jnp.int32), axis=0)
                m = jax.lax.optimization_barrier(m)
                return c + m.sum(dtype=jnp.float32) * 1e-12, None
            c, _ = jax.lax.scan(stp, s, None, length=4)
            return c

        z = jnp.float32(0.0)
        t1 = timed(f1, z, ext, idx)
        t4 = timed(f4, z, ext, idx)
        t = max((t4 - t1) / 3, 1e-9)
        log(f"{name:22s}: {t*1e3:7.2f} ms -> "
            f"{idx.shape[0]/t/1e6:6.1f}M rows/s")

    run_mat("natural/bf16 MATERIAL", dev["natural"], tables["bf16"])


if __name__ == "__main__":
    main()
