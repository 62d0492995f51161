#!/usr/bin/env python
"""Edges/s scaling-efficiency sweep over mesh sizes.

BASELINE target: >= 80% edges/s scaling efficiency from 1 shard to N
shards. On real multi-chip hardware this measures the halo-exchange
SpMM throughput per mesh size; on a single host it still validates the
sharded path end-to-end and reports the partition statistics (halo
fraction = the communication-volume proxy).

  python bench/scaling.py [--nodes 200000] [--avg_deg 14] [--feat 256]
           [--partition contiguous|degree_balanced|rcm] [--out FILE]

Each mesh size reports edges/s, scaling efficiency vs 1 device, the
halo edge fraction (communication proxy) and the per-shard in-edge
load balance under the chosen node relabeling. Results append to the
--out JSONL artifact (committed as bench/scaling_rN.json).
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
    ap.add_argument("--partition", default="degree_balanced",
                    choices=["contiguous", "degree_balanced", "rcm"])
    ap.add_argument("--out", default=None)
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

    from glnn_tpu.distributed.partition import (
        degree_balanced_order, inverse_permutation, shard_edge_balance)

    n, f = args.nodes, args.feat
    e = n * args.avg_deg
    rs = np.random.RandomState(0)
    src = rs.randint(0, n, e)
    dst = rs.randint(0, n, e)
    x = rs.randn(n, f).astype(np.float32)

    rows = []

    def emit(obj):
        print(json.dumps(obj), flush=True)
        rows.append(obj)
        if args.out:
            with open(args.out, "w") as fh:
                for r in rows:
                    fh.write(json.dumps(r) + "\n")

    n_dev0 = len(jax.devices())
    if args.partition == "degree_balanced":
        deg = np.bincount(dst, minlength=n)
        order = degree_balanced_order(deg, max(
            p for p in (1, 2, 4, 8) if p <= n_dev0))
        new_id = inverse_permutation(order)
        src, dst, x = new_id[src], new_id[dst], x[order]
    elif args.partition == "rcm":
        from glnn_tpu.graph.host import HostGraph, rcm_ordering

        order = rcm_ordering(HostGraph(src, dst, n))
        new_id = inverse_permutation(order)
        src, dst, x = new_id[src], new_id[dst], x[order]

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
        emit({
            "shards": p,
            "edges_per_s": round(e / tp, 1),
            "scaling_efficiency": round((e / tp) / (results[1] * p), 4),
            "halo_edge_fraction": round(halo_frac, 4),
            "edge_balance_max_over_mean": round(
                shard_edge_balance(dst, n, p), 4),
        })

    emit({
        "metric": "edges_per_s_scaling",
        "baseline_1dev": round(results[1], 1),
        "devices": n_dev,
        "partition": args.partition,
        "graph": f"uniform N={n} E={e} F={f}",
        "note": ("virtual CPU mesh: efficiency numbers share one host "
                 "and understate real multi-chip scaling; halo fraction "
                 "and balance are exact" if args.cpu else "tpu"),
    })


if __name__ == "__main__":
    main()
