#!/usr/bin/env python
"""Capture a jax.profiler device trace around a callable and print a
per-HLO-op time table (works through the axon relay — verified r5).

Usage as a library:
    from tools.trace_report import trace_and_report
    trace_and_report(lambda: float(f(x)), iters=3, out_dir="/tmp/tr")

The report aggregates the TPU device timeline (pid = /device:TPU:0)
by op name, printing count / total ms / mean ms / bytes_accessed, and
returns the row list so probes can assert against it.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os


def trace_and_report(run, iters: int = 3, out_dir: str = "/tmp/jaxtrace",
                     top: int = 30, quiet: bool = False):
    import jax

    os.makedirs(out_dir, exist_ok=True)
    run()                                    # warm (compile outside trace)
    with jax.profiler.trace(out_dir):
        for _ in range(iters):
            run()
    return report(out_dir, iters=iters, top=top, quiet=quiet)


def _latest_trace(out_dir):
    paths = sorted(glob.glob(os.path.join(
        out_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no trace under {out_dir}")
    return paths[-1]


def report(out_dir: str, iters: int = 1, top: int = 30,
           quiet: bool = False):
    path = _latest_trace(out_dir)
    with gzip.open(path) as f:
        d = json.load(f)
    ev = d.get("traceEvents", [])
    dev_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    rows = collections.defaultdict(lambda: [0, 0.0, 0])
    total = 0.0
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        args = e.get("args", {})
        # tid 2 carries the whole-executable envelope (XLA Ops rows are
        # on other tids); count leaf ops only (those with hlo_category)
        if "hlo_category" not in args:
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0)) / 1e3      # us -> ms
        rows[name][0] += 1
        rows[name][1] += dur
        rows[name][2] += int(args.get("bytes_accessed", 0) or 0)
        total += dur
    out = sorted(((n, c, t, b) for n, (c, t, b) in rows.items()),
                 key=lambda r: -r[2])
    if not quiet:
        print(f"# {path}")
        print(f"# device-op total {total:.3f} ms over {iters} iters "
              f"= {total/max(iters,1):.3f} ms/iter")
        print(f"{'op':52s} {'n':>4s} {'ms/iter':>9s} {'GB/iter':>8s}")
        for n, c, t, b in out[:top]:
            print(f"{n[:52]:52s} {c:4d} {t/max(iters,1):9.3f} "
                  f"{b/max(iters,1)/1e9:8.3f}")
    return {"path": path, "total_ms_per_iter": total / max(iters, 1),
            "rows": out}


if __name__ == "__main__":
    import sys

    report(sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace",
           iters=int(sys.argv[2]) if len(sys.argv) > 2 else 1)
