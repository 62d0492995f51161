#!/usr/bin/env python
"""Fetch the pokec .mat + fixed splits from their public Google Drive
shares (the same files the reference auto-downloads at load time,
/root/reference/dataloader.py:174-215).

This build environment has no network egress, so the download is a
separate, explicitly-invoked tool rather than an implicit side effect
of load_data: run it once on a connected machine, then point
`--data_path` at the directory it populated.

Usage:
    python tools/fetch_pokec.py --out data/nonhom
"""

from __future__ import annotations

import argparse
import sys
import urllib.request

DRIVE_FILES = {
    # data file -> Google Drive file id (public shares published by the
    # LINKX authors; ids recorded in the reference's dataloader)
    "pokec.mat": "1dNs5E7BrWJbgcHeQ_zuy5Ozp2tRCWG0y",
    "pokec-splits.npy": "1ZhpAiyTNc0cE_hhgyiqxnkKREHK7MK-_",
}


def fetch_drive(file_id: str, dest: str) -> None:
    """Plain-HTTP Google Drive download (large-file confirm flow)."""
    url = (f"https://drive.usercontent.google.com/download?id={file_id}"
           f"&export=download&confirm=t")
    print(f"fetching {file_id} -> {dest}", flush=True)
    with urllib.request.urlopen(url) as r, open(dest, "wb") as f:
        while True:
            chunk = r.read(1 << 20)
            if not chunk:
                break
            f.write(chunk)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/nonhom")
    args = ap.parse_args(argv)
    import os

    os.makedirs(args.out, exist_ok=True)
    for name, fid in DRIVE_FILES.items():
        dest = os.path.join(args.out, name)
        if os.path.exists(dest):
            print(f"{dest} already present, skipping")
            continue
        try:
            fetch_drive(fid, dest)
        except OSError as exc:
            print(f"download failed ({exc}); this environment may have "
                  f"no egress — run this tool on a connected machine",
                  file=sys.stderr)
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
