#!/usr/bin/env python
"""Convert external dataset formats to glnn_tpu's canonical npz layout.

Run this ONCE on a machine with the relevant source packages/network;
the training CLIs then load the converted files fully offline.

  # OGB (needs `pip install ogb`):
  python tools/convert_datasets.py ogb ogbn-arxiv --data_path ./data
      -> ./data/ogbn-arxiv.graph.npz

  # BGNN house_class/vk_class from the reference's DGL artifacts
  # (needs `dgl` to read graph.dgl):
  python tools/convert_datasets.py bgnn ./raw/house_class --out ./data/house_class

Canonical graph npz schema (read by glnn_tpu.graph.datasets):
  src, dst        int64[E]    COO edge list
  n_nodes         int64 scalar
  feat            float32[N, F]
  labels          int64[N]
  idx_train/val/test  int64 split indices
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

import numpy as np


def convert_ogb(dataset: str, data_path: str) -> None:
    from ogb.nodeproppred import NodePropPredDataset

    data = NodePropPredDataset(dataset, root=data_path)
    split = data.get_idx_split()
    graph, labels = data[0]
    src, dst = graph["edge_index"]
    out = Path(data_path) / f"{dataset}.graph.npz"
    np.savez(
        out,
        src=src.astype(np.int64),
        dst=dst.astype(np.int64),
        n_nodes=np.int64(graph["num_nodes"]),
        feat=np.asarray(graph["node_feat"], np.float32),
        labels=np.asarray(labels).squeeze().astype(np.int64),
        idx_train=np.asarray(split["train"], np.int64),
        idx_val=np.asarray(split["valid"], np.int64),
        idx_test=np.asarray(split["test"], np.int64),
    )
    print(f"wrote {out}")


def convert_bgnn(raw_dir: str, out_dir: str) -> None:
    """Reference BGNN layout: X.csv, y.csv, masks.json, cat_features.txt,
    graph.dgl -> our layout keeps the CSVs and adds graph.npz."""
    import shutil

    os.makedirs(out_dir, exist_ok=True)
    raw = Path(raw_dir)
    try:
        import dgl

        graphs, _ = dgl.load_graphs(str(raw / "graph.dgl"))
        g = graphs[0]
        src, dst = (t.numpy().astype(np.int64) for t in g.edges())
    except ImportError:
        sys.exit("BGNN conversion needs `dgl` to read graph.dgl")
    np.savez(Path(out_dir) / "graph.npz", src=src, dst=dst)
    for f in ("X.csv", "y.csv", "masks.json", "cat_features.txt"):
        if (raw / f).exists():
            shutil.copy(raw / f, Path(out_dir) / f)
    print(f"wrote {out_dir}")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    po = sub.add_parser("ogb")
    po.add_argument("dataset", choices=["ogbn-arxiv", "ogbn-products"])
    po.add_argument("--data_path", default="./data")
    pb = sub.add_parser("bgnn")
    pb.add_argument("raw_dir")
    pb.add_argument("--out", required=True)
    args = p.parse_args()
    if args.cmd == "ogb":
        convert_ogb(args.dataset, args.data_path)
    else:
        convert_bgnn(args.raw_dir, args.out)


if __name__ == "__main__":
    main()
