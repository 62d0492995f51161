#!/usr/bin/env python
"""Fetch the five CPF-format npz datasets (cora, citeseer, pubmed,
a-computer, a-photo) from the public CPF repository — the same files
the reference expects under `--data_path` (cora loads from
`data/cora.npz` etc.; CPF schema documented at
/root/reference/dataloader.py:534-590 and mirrored by
glnn_tpu/graph/sparse.py).

This build environment has no network egress, so the download is a
separate, explicitly-invoked tool: run it once on a connected machine,
then point `--data_path` at the directory it populated. The OGB
datasets (ogbn-arxiv / ogbn-products) are fetched + converted by
`tools/convert_datasets.py` on a machine with the `ogb` package.

Usage:
    python tools/fetch_cpf.py --out data
"""

from __future__ import annotations

import argparse
import sys
import urllib.request

# Public raw-file URLs of the CPF paper repository (BUPT-GAMMA/CPF),
# the dataset source named by the reference's README data instructions.
BASE = ("https://raw.githubusercontent.com/BUPT-GAMMA/CPF/master/data/npz/")
FILES = {
    "cora.npz": BASE + "cora.npz",
    "citeseer.npz": BASE + "citeseer.npz",
    "pubmed.npz": BASE + "pubmed.npz",
    "amazon_electronics_computers.npz":
        BASE + "amazon_electronics_computers.npz",
    "amazon_electronics_photo.npz":
        BASE + "amazon_electronics_photo.npz",
}
# load_data name -> file name (a-computer/a-photo aliases, matching
# the reference's dataloader file-name mapping)
ALIASES = {
    "a-computer": "amazon_electronics_computers.npz",
    "a-photo": "amazon_electronics_photo.npz",
}


def fetch(url: str, dest: str) -> None:
    print(f"fetching {url} -> {dest}", flush=True)
    with urllib.request.urlopen(url) as r, open(dest, "wb") as f:
        while True:
            chunk = r.read(1 << 20)
            if not chunk:
                break
            f.write(chunk)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data")
    args = ap.parse_args(argv)
    import os

    os.makedirs(args.out, exist_ok=True)
    for name, url in FILES.items():
        dest = os.path.join(args.out, name)
        if os.path.exists(dest):
            print(f"{dest} already present, skipping")
            continue
        try:
            fetch(url, dest)
        except OSError as exc:
            print(f"download failed ({exc}); this environment may have "
                  f"no egress — run this tool on a connected machine",
                  file=sys.stderr)
            return 1
    for alias, target in ALIASES.items():
        link = os.path.join(args.out, alias + ".npz")
        if not os.path.exists(link) and os.path.exists(
                os.path.join(args.out, target)):
            os.symlink(target, link)
            print(f"aliased {link} -> {target}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
