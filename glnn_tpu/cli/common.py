"""Shared CLI plumbing for the teacher/student entry points.

Flag surface and output-directory contract preserved from the
reference CLIs (/root/reference/train_teacher.py:21-149,167-199 and
/root/reference/train_student.py): outputs land in
`outputs/{transductive | inductive/split_rate_R}/{dataset}/{model}/seed_{s}/`
with `log`, `out.npz`, optional `loss_and_score.npz` + checkpoint, and
append-only `exp_results` / `min_cut_loss` files one level up.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

DEFAULT_CONFIG = os.path.join(os.path.dirname(__file__), "..", "configs",
                              "train.conf.yaml")


def add_common_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--device", type=int, default=0,
                        help="Accelerator ordinal (-1 forces CPU)")
    parser.add_argument("--seed", type=int, default=0, help="Random seed")
    parser.add_argument("--log_level", type=int, default=20,
                        help="10: DEBUG, 20: INFO, 30: WARNING")
    parser.add_argument("--console_log", action="store_true",
                        help="Mirror log lines to the console")
    parser.add_argument("--output_path", type=str, default="outputs",
                        help="Path to save outputs")
    parser.add_argument("--num_exp", type=int, default=1,
                        help="Repeat how many experiments")
    parser.add_argument("--exp_setting", type=str, default="tran",
                        help="One of [tran, ind]")
    parser.add_argument("--eval_interval", type=int, default=1,
                        help="Evaluate once per how many epochs")
    parser.add_argument("--save_results", action="store_true",
                        help="Also save loss curves and model checkpoint")
    parser.add_argument("--n_shards", type=int, default=1,
                        help="Devices to shard over (graph-partitioned "
                             "halo execution for full-batch teachers, "
                             "data-parallel for sampled SAGE / students); "
                             "1 = single device")
    parser.add_argument("--debug_checks", action="store_true",
                        help="Enable NaN/Inf + out-of-bounds-index "
                             "guards (checkify float/index checks and "
                             "per-epoch finite-loss asserts); slower")
    parser.add_argument("--ops_backend", type=str, default="auto",
                        help="Message-passing kernel tier: one of "
                             "[auto, xla, pallas, pallas_int8]. "
                             "pallas_int8 quantizes unweighted "
                             "aggregations (~1.25x faster, ~1%% feature "
                             "error; backward stays exact bf16) — "
                             "suited to eval/inference sweeps, not "
                             "default training")
    parser.add_argument("--exact_eval", action="store_true",
                        help="Force the exact bf16 tier for eval/"
                             "inference forwards. By default (auto "
                             "backend) no-grad eval aggregations use "
                             "the int8 gather tier (~1.2x faster, ~1%% "
                             "feature error swamped by the argmax)")
    parser.add_argument("--compile_cache", type=str,
                        default=os.environ.get("GLNN_COMPILE_CACHE",
                                               "~/.cache/glnn_tpu_xla"),
                        help="Persistent XLA compilation-cache dir "
                             "(empty string disables). Repeat runs skip "
                             "the first-call jit compile — the sampled "
                             "products epoch's ~178s trace+compile "
                             "amortizes across the 10-seed protocol")

    # dataset
    parser.add_argument("--dataset", type=str, default="cora")
    parser.add_argument("--data_path", type=str, default="./data")
    parser.add_argument("--labelrate_train", type=int, default=20,
                        help="Labeled nodes per class in the train set")
    parser.add_argument("--labelrate_val", type=int, default=30,
                        help="Labeled nodes per class in the valid set")
    parser.add_argument("--split_idx", type=int, default=0,
                        help="NonHom/BGNN datasets: which fixed split")

    # model
    parser.add_argument("--model_config_path", type=str,
                        default=DEFAULT_CONFIG)
    parser.add_argument("--num_layers", type=int, default=2)
    parser.add_argument("--hidden_dim", type=int, default=128)
    parser.add_argument("--dropout_ratio", type=float, default=0)
    parser.add_argument("--norm_type", type=str, default="none",
                        help="One of [none, batch, layer]")

    # SAGE specific
    parser.add_argument("--batch_size", type=int, default=512)
    parser.add_argument("--fan_out", type=str, default="5,5",
                        help="Comma list of per-layer fanouts for sampled SAGE")
    parser.add_argument("--sampler_tier", type=str, default="floyd",
                        choices=["floyd", "window"],
                        help="Neighbor-sampling gather tier: floyd = "
                             "DGL-exact element gathers; window = same "
                             "Floyd offsets read through ONE aligned "
                             "64-wide neighbor-table row per node "
                             "(Graph.with_window_table; ~fanout/2 fewer "
                             "row-rate-bound touches; exact for degrees "
                             "<= 64, heavy-tail nodes sample from their "
                             "first 64 edges)")
    parser.add_argument("--compute_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="Activation compute dtype for the sampled "
                             "SAGE teacher and the MLP student "
                             "(bfloat16 halves the memory-bound "
                             "frontier traffic and runs the student's "
                             "dense stack at bf16 MXU rate; parameters, "
                             "norm statistics and losses stay float32)")
    parser.add_argument("--num_workers", type=int, default=0,
                        help="Unused on TPU (sampling is on-device); kept "
                             "for flag compatibility")
    parser.add_argument("--sage_sampling", type=str, default="auto",
                        help="SAGE trainer mode: auto|full|sampled")

    # optimization
    parser.add_argument("--learning_rate", type=float, default=0.01)
    parser.add_argument("--weight_decay", type=float, default=0.0005)
    parser.add_argument("--max_epoch", type=int, default=500)
    parser.add_argument("--patience", type=int, default=50,
                        help="Early stop after this many non-improving evals")

    # ablation
    parser.add_argument("--feature_noise", type=float, default=0,
                        help="Blend features with white noise: (1-a)x + aN")
    parser.add_argument("--split_rate", type=float, default=0.2,
                        help="Inductive split rate (see graph_split)")
    parser.add_argument("--compute_min_cut", action="store_true",
                        help="Compute and append the min-cut loss")
    parser.add_argument("--feature_aug_k", type=int, default=0,
                        help="GA-MLP: propagate features k hops first")


def setup_compile_cache(args) -> None:
    """Enable JAX's persistent compilation cache (--compile_cache).
    Makes repeat CLI runs (the 10-seed reproduction protocol,
    experiments/*.sh) skip first-call jit compiles — the sampled
    products epoch alone costs ~178s to trace+compile cold."""
    path = getattr(args, "compile_cache", "")
    if not path:
        return
    try:
        import jax

        if jax.default_backend() != "tpu":
            # CPU AOT cache entries pin host machine features and can
            # SIGILL when loaded under a different feature set (the
            # virtual-device dryrun environment); the cache's payoff —
            # the ~178s products epoch compile — is TPU-only anyway
            return
        d = os.path.expanduser(path)
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass                      # cache is an optimization, never fatal


def parse_fan_out(fan_out: str) -> list[int]:
    """Int parsing — the reference `eval()`s each piece
    (train_and_eval.py:180), consciously fixed here."""
    return [int(x) for x in str(fan_out).split(",")]


def teacher_output_dir(args, model_name: str) -> Path:
    if args.exp_setting == "tran":
        return Path.cwd().joinpath(args.output_path, "transductive",
                                   args.dataset, model_name,
                                   f"seed_{args.seed}")
    if args.exp_setting == "ind":
        return Path.cwd().joinpath(args.output_path, "inductive",
                                   f"split_rate_{args.split_rate}",
                                   args.dataset, model_name,
                                   f"seed_{args.seed}")
    raise ValueError(f"Unknown experiment setting! {args.exp_setting}")


def apply_output_path_reroutes(args, is_student: bool = False) -> None:
    """noisy-feature / feature-aug runs get rerouted output roots
    (train_teacher.py:167-176). The reference only reroutes when
    seed == 0 because repeat_run mutates seed after the first run;
    we keep the same guard for directory-layout parity."""
    if args.feature_noise != 0 and args.seed == 0:
        args.output_path = str(Path.cwd().joinpath(
            args.output_path, "noisy_features", f"noise_{args.feature_noise}"
        ))
        if is_student:
            args.out_t_path = args.output_path
    if args.feature_aug_k > 0 and args.seed == 0:
        args.output_path = str(Path.cwd().joinpath(
            args.output_path, "aug_features", f"aug_hop_{args.feature_aug_k}"
        ))
        if is_student:
            args.student = f"GA{args.feature_aug_k}{args.student}"
        else:
            args.teacher = f"GA{args.feature_aug_k}{args.teacher}"
