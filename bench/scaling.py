#!/usr/bin/env python
"""Edges/s scaling-efficiency sweep over mesh sizes.

BASELINE target: >= 80% edges/s scaling efficiency from 1 shard to N
shards. On real multi-chip hardware this measures the halo-exchange
SpMM throughput per mesh size; on a single host it still validates the
sharded path end-to-end and reports the partition statistics (halo
fraction = the communication-volume proxy).

  python bench/scaling.py [--nodes 200000] [--avg_deg 14] [--feat 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=200_000)
    ap.add_argument("--avg_deg", type=int, default=14)
    ap.add_argument("--feat", type=int, default=256)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU with 8 virtual devices")
    args = ap.parse_args()

    if args.cpu:
        os.environ.setdefault("XLA_FLAGS",
                              "--xla_force_host_platform_device_count=8")
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from glnn_tpu.distributed.halo import (build_halo_graph,
                                           halo_copy_u_sum, shard_features)
    from glnn_tpu.distributed.mesh import make_mesh
    from glnn_tpu.graph.container import build_graph
    from glnn_tpu.ops import refops

    n, f = args.nodes, args.feat
    e = n * args.avg_deg
    rs = np.random.RandomState(0)
    src = rs.randint(0, n, e)
    dst = rs.randint(0, n, e)
    x = rs.randn(n, f).astype(np.float32)

    def timed(fn, *a, iters=4):
        s = float(fn(*a))
        t0 = time.perf_counter()
        for _ in range(iters):
            s = float(fn(*a))
        return (time.perf_counter() - t0) / iters

    n_dev = len(jax.devices())
    results = {}
    # single-device baseline
    g1 = build_graph(src, dst, n)
    f1 = jax.jit(lambda xx: refops.copy_u_sum(g1, xx).sum())
    t1 = timed(f1, jnp.asarray(x))
    results[1] = e / t1

    sizes = [p for p in (2, 4, 8) if p <= n_dev]
    for p in sizes:
        mesh = make_mesh(p, axis="graph")
        hg = build_halo_graph(src, dst, n, mesh)
        xs = shard_features(x, hg)
        fp = jax.jit(lambda xx: halo_copy_u_sum(hg, xx).sum())
        tp = timed(fp, xs)
        halo_frac = 1.0 - hg.e_local / max(hg.e_local + hg.e_halo, 1)
        results[p] = e / tp
        print(json.dumps({
            "shards": p,
            "edges_per_s": round(e / tp, 1),
            "scaling_efficiency": round((e / tp) / (results[1] * p), 4),
            "halo_edge_fraction": round(halo_frac, 4),
        }), flush=True)

    print(json.dumps({
        "metric": "edges_per_s_scaling",
        "baseline_1dev": round(results[1], 1),
        "devices": n_dev,
    }))


if __name__ == "__main__":
    main()
