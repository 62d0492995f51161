#!/usr/bin/env python
"""Edges/s scaling-efficiency sweep over mesh sizes.

BASELINE target: >= 80% edges/s scaling efficiency from 1 shard to N
shards. On real multi-chip hardware this measures the halo-exchange
SpMM throughput per mesh size; on a single host it still validates the
sharded path end-to-end and reports the partition statistics (halo
fraction = the communication-volume proxy).

  python bench/scaling.py [--nodes 200000] [--avg_deg 14] [--feat 256]
           [--graph uniform|clustered]
           [--partition contiguous|degree_balanced|rcm|rcm_balanced]
           [--out FILE] [--time_build]

`--graph clustered` builds a planted-partition graph (64 communities,
90% in-community edges) whose node ids are SHUFFLED — the realistic
case where a locality ordering must *recover* structure. A uniform
random graph is the adversarial no-locality case: every partitioner
is stuck near halo fraction (P-1)/P there.

Partitions (node relabelings, recomputed per shard count):
  contiguous       identity order, equal blocks
  degree_balanced  global LPT by in-degree (balance, no locality)
  rcm              reverse-Cuthill-McKee (locality, no balance)
  rcm_balanced     RCM chunks LPT-assigned to shards
  community        label-propagation communities, LPT-assigned whole
                   (split only above shard capacity) — recovers planted
                   structure RCM cannot (halo 0.09 vs 0.80 at P=8);
                   default

Each mesh size reports edges/s, scaling efficiency vs 1 device, the
halo edge fraction and per-shard in-edge balance under the relabeling,
and (--time_build) build_halo_graph wall seconds. Results stream to
the --out JSONL artifact (committed as bench/scaling_rN.json).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_graph(kind: str, n: int, avg_deg: int, rs: np.random.RandomState):
    if kind == "uniform":
        e = n * avg_deg
        return rs.randint(0, n, e), rs.randint(0, n, e)
    # clustered: planted partition, shuffled ids
    c = 64
    comm = rs.randint(0, c, n)                     # community per node
    members = [np.where(comm == k)[0] for k in range(c)]
    sizes = np.array([len(m) for m in members])
    table = np.full((c, sizes.max()), 0, np.int64)
    for k in range(c):
        if sizes[k]:
            table[k, :sizes[k]] = members[k]
            table[k, sizes[k]:] = members[k][0]
    e = n * avg_deg
    src = rs.randint(0, n, e)
    inside = rs.rand(e) < 0.9
    pick = rs.randint(0, np.maximum(sizes[comm[src]], 1))
    dst_in = table[comm[src], pick]
    dst_out = rs.randint(0, n, e)
    dst = np.where(inside, dst_in, dst_out)
    return src, dst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=200_000)
    ap.add_argument("--avg_deg", type=int, default=14)
    ap.add_argument("--feat", type=int, default=256)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU with 8 virtual devices")
    ap.add_argument("--graph", default="clustered",
                    choices=["uniform", "clustered"])
    ap.add_argument("--partition", default="community",
                    choices=["contiguous", "degree_balanced", "rcm",
                             "rcm_balanced", "community"])
    ap.add_argument("--time_build", action="store_true")
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
    from glnn_tpu.graph.host import HostGraph, rcm_ordering
    from glnn_tpu.ops import refops

    from glnn_tpu.distributed.partition import (
        chunked_balanced_order, community_balanced_order,
        degree_balanced_order, inverse_permutation,
        label_propagation_labels, shard_edge_balance)

    n, f = args.nodes, args.feat
    rs = np.random.RandomState(0)
    src0, dst0 = make_graph(args.graph, n, args.avg_deg, rs)
    e = len(src0)
    x0 = rs.randn(n, f).astype(np.float32)

    rows = []

    def emit(obj):
        print(json.dumps(obj), flush=True)
        rows.append(obj)
        if args.out:
            with open(args.out, "w") as fh:
                for r in rows:
                    fh.write(json.dumps(r) + "\n")

    deg = np.bincount(dst0, minlength=n)
    rcm = None
    lp_labels = None
    if args.partition in ("rcm", "rcm_balanced"):
        t0 = time.perf_counter()
        rcm = rcm_ordering(HostGraph(src0, dst0, n))
        rcm_s = time.perf_counter() - t0
    if args.partition == "community":
        t0 = time.perf_counter()
        lp_labels = label_propagation_labels(src0, dst0, n)
        lp_s = time.perf_counter() - t0

    def relabel(p):
        """Node relabeling for THIS shard count (ADVICE r2: the LPT
        bucket capacity depends on p, so recompute per sweep point)."""
        if args.partition == "contiguous":
            return None
        if args.partition == "degree_balanced":
            order = degree_balanced_order(deg, p)
        elif args.partition == "rcm":
            order = rcm
        elif args.partition == "community":
            order = community_balanced_order(lp_labels, deg, p)
        else:
            order = chunked_balanced_order(rcm, deg, p)
        return order

    def timed(fn, *a, iters=4):
        s = float(fn(*a))
        t0 = time.perf_counter()
        for _ in range(iters):
            s = float(fn(*a))
        return (time.perf_counter() - t0) / iters

    n_dev = len(jax.devices())
    results = {}
    # single-device baseline (unpartitioned)
    g1 = build_graph(src0, dst0, n)
    f1 = jax.jit(lambda xx: refops.copy_u_sum(g1, xx).sum())
    t1 = timed(f1, jnp.asarray(x0))
    results[1] = e / t1

    sizes = [p for p in (2, 4, 8) if p <= n_dev]
    for p in sizes:
        order = relabel(p)
        if order is None:
            src, dst, x = src0, dst0, x0
        else:
            new_id = inverse_permutation(order)
            src, dst, x = new_id[src0], new_id[dst0], x0[order]
        mesh = make_mesh(p, axis="graph")
        t0 = time.perf_counter()
        hg = build_halo_graph(src, dst, n, mesh)
        build_s = time.perf_counter() - t0
        xs = shard_features(x, hg)
        fp = jax.jit(lambda xx, h=hg: halo_copy_u_sum(h, xx).sum())
        tp = timed(fp, xs)
        halo_frac = 1.0 - hg.e_local / max(hg.e_local + hg.e_halo, 1)
        results[p] = e / tp
        row = {
            "shards": p,
            "edges_per_s": round(e / tp, 1),
            "scaling_efficiency": round((e / tp) / (results[1] * p), 4),
            "halo_edge_fraction": round(halo_frac, 4),
            "edge_balance_max_over_mean": round(
                shard_edge_balance(dst, n, p), 4),
        }
        if args.time_build:
            row["halo_build_s"] = round(build_s, 2)
        emit(row)

    summary = {
        "metric": "edges_per_s_scaling",
        "baseline_1dev": round(results[1], 1),
        "devices": n_dev,
        "partition": args.partition,
        "graph": f"{args.graph} N={n} E={e} F={f}",
        "note": ("virtual CPU mesh: efficiency numbers share one host "
                 "and understate real multi-chip scaling; halo fraction "
                 "and balance are exact" if args.cpu else "tpu"),
    }
    if rcm is not None:
        summary["rcm_order_s"] = round(rcm_s, 2)
    if lp_labels is not None:
        summary["label_prop_s"] = round(lp_s, 2)
    emit(summary)


if __name__ == "__main__":
    main()
