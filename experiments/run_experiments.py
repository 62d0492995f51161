#!/usr/bin/env python
"""Paper-reproduction + ablation experiment driver.

Python port of the reference's experiments/*.sh harness (SURVEY.md §2.1
C14): each experiment loops (settings x datasets x models), invokes the
teacher/student CLIs, and appends every stdout score row to an
aggregate text file. Canonical hyperparameters preserved:
`--num_exp 10 --max_epoch 200 --patience 50`, except ogbn-products
(teacher max_epoch 40 / patience 10; student patience 30).

Usage: python experiments/run_experiments.py <experiment> [--datasets ...]
Experiments: sage_cpf, glnn_cpf, sage_arxiv, glnn_arxiv, sage_products,
glnn_products, ga_glnn_arxiv, ablation_gnn, ablation_feature_noise,
ablation_ind_split_rate, glnn_synth (offline smoke).
"""

from __future__ import annotations

import argparse
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
CPF = ["cora", "citeseer", "pubmed", "a-computer", "a-photo"]
SYNTH = ["synth-n2048-c7-f128-d10-noise3.0"]


_EXTRA_FLAGS: dict = {}
DRY_RUN = False


def _run(cli: str, out_file: str | None, label: str | None, **flags) -> None:
    flags = dict(_EXTRA_FLAGS, **flags)
    cmd = [sys.executable, str(REPO / cli)]
    for k, v in flags.items():
        cmd += [f"--{k}", str(v)]
    print("+", " ".join(cmd), flush=True)
    if DRY_RUN:
        return
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0:
        print(res.stderr, file=sys.stderr)
        raise SystemExit(f"command failed: {' '.join(cmd)}")
    row = res.stdout.strip().splitlines()[-1] if res.stdout.strip() else ""
    if out_file:
        with open(out_file, "a") as f:
            if label:
                f.write(f"{label:>12}\t")
            f.write(row + "\n")
    print(row, flush=True)


def teacher(**kw):
    _run("train_teacher.py", kw.pop("out_file", None), kw.pop("label", None),
         **kw)


def student(**kw):
    _run("train_student.py", kw.pop("out_file", None), kw.pop("label", None),
         **kw)


STD = dict(num_exp=10, max_epoch=200, patience=50)
ABL = dict(num_exp=5, max_epoch=200, patience=50)


def sage_cpf(datasets):
    for e in ("tran", "ind"):
        for ds in datasets:
            teacher(exp_setting=e, teacher="SAGE", dataset=ds,
                    out_file="sage_cpf.txt", label=f"{e}/{ds}", **STD)


def glnn_cpf(datasets):
    for e in ("tran", "ind"):
        for ds in datasets:
            student(exp_setting=e, teacher="SAGE", dataset=ds,
                    out_file="glnn_cpf.txt", label=f"{e}/{ds}", **STD)


def sage_arxiv(_):
    for e in ("tran", "ind"):
        teacher(exp_setting=e, teacher="SAGE", dataset="ogbn-arxiv", **STD)


def glnn_arxiv(_):
    for e in ("tran", "ind"):
        student(exp_setting=e, teacher="SAGE", student="MLP3w4",
                dataset="ogbn-arxiv", **STD)


def sage_products(_):
    for e in ("tran", "ind"):
        teacher(exp_setting=e, teacher="SAGE", dataset="ogbn-products",
                num_exp=10, max_epoch=40, patience=10)


def glnn_products(_):
    for e in ("tran", "ind"):
        student(exp_setting=e, teacher="SAGE", student="MLP3w8",
                dataset="ogbn-products", num_exp=10, max_epoch=200,
                patience=30)


def ga_glnn_arxiv(_):
    teacher(exp_setting="ind", teacher="MLP3w4", dataset="ogbn-arxiv",
            feature_aug_k=1, **ABL)
    student(exp_setting="ind", teacher="SAGE", student="MLP3w4",
            dataset="ogbn-arxiv", feature_aug_k=1, **ABL)


def ablation_gnn(datasets):
    for e in ("tran", "ind"):
        for t in ("GCN", "GAT", "SAGE", "MLP", "APPNP"):
            for ds in datasets:
                teacher(exp_setting=e, teacher=t, dataset=ds,
                        out_file="ablation_gnn.txt",
                        label=f"{e}/{t}/{ds}", **ABL)
                if t != "MLP":
                    student(exp_setting=e, teacher=t, dataset=ds,
                            out_file="ablation_gnn.txt",
                            label=f"{e}/{t}+MLP/{ds}", **ABL)


def ablation_feature_noise(datasets):
    for n in [round(0.1 * i, 1) for i in range(1, 11)]:
        for ds in datasets:
            teacher(exp_setting="ind", teacher="SAGE", dataset=ds,
                    feature_noise=n, out_file="ablation_feature_noise.txt",
                    label=f"n={n}/{ds}", **ABL)
            student(exp_setting="ind", teacher="SAGE", dataset=ds,
                    feature_noise=n, out_file="ablation_feature_noise.txt",
                    label=f"n={n}/{ds}+MLP", **ABL)


def ablation_ind_split_rate(datasets):
    for r in [round(0.1 * i, 1) for i in range(1, 10)]:
        for ds in datasets:
            teacher(exp_setting="ind", teacher="SAGE", dataset=ds,
                    split_rate=r, out_file="ablation_ind_split_rate.txt",
                    label=f"r={r}/{ds}", **ABL)
            student(exp_setting="ind", teacher="SAGE", dataset=ds,
                    split_rate=r, out_file="ablation_ind_split_rate.txt",
                    label=f"r={r}/{ds}+MLP", **ABL)


def glnn_synth(datasets):
    """Offline smoke reproduction on planted-partition graphs."""
    ds_list = datasets if datasets != CPF else SYNTH
    for e in ("tran", "ind"):
        for ds in ds_list:
            teacher(exp_setting=e, teacher="SAGE", dataset=ds, num_exp=2,
                    max_epoch=50, patience=20, out_file="glnn_synth.txt",
                    label=f"{e}/{ds}/SAGE")
            student(exp_setting=e, teacher="SAGE", dataset=ds, num_exp=2,
                    max_epoch=50, patience=20, out_file="glnn_synth.txt",
                    label=f"{e}/{ds}/GLNN")


EXPERIMENTS = {f.__name__: f for f in [
    sage_cpf, glnn_cpf, sage_arxiv, glnn_arxiv, sage_products,
    glnn_products, ga_glnn_arxiv, ablation_gnn, ablation_feature_noise,
    ablation_ind_split_rate, glnn_synth,
]}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("experiment", choices=sorted(EXPERIMENTS))
    p.add_argument("--datasets", nargs="*", default=CPF)
    p.add_argument("--device", type=int, default=None,
                   help="forwarded to the CLIs (-1 forces CPU)")
    p.add_argument("--dry_run", action="store_true",
                   help="print every CLI invocation without executing "
                        "(used by experiments/reproduce_all.sh's "
                        "preflight)")
    p.add_argument("--data_path", type=str, default=None,
                   help="forwarded to the CLIs")
    args = p.parse_args()
    global DRY_RUN
    DRY_RUN = args.dry_run
    if args.device is not None:
        _EXTRA_FLAGS["device"] = args.device
    if args.data_path is not None:
        _EXTRA_FLAGS["data_path"] = args.data_path
    EXPERIMENTS[args.experiment](args.datasets)


if __name__ == "__main__":
    main()
