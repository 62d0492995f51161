"""Student CLI: distill a teacher's soft labels into a graph-free MLP.

Pipeline (mirrors /root/reference/train_student.py:168-392): resolve
both the student output dir and the teacher's out dir (symmetric path
scheme), load data + teacher `out.npz`, build NLL + KL(batchmean,
log_target) criteria, construct distill index tuples, and dispatch to
distill_run_{transductive,inductive}. Default --lamb 0 = pure
distillation (the hard-label pass still runs, scaled to zero).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from glnn_tpu.cli.common import (add_common_args, teacher_output_dir,
                                 apply_output_path_reroutes,
                                 setup_compile_cache)
from glnn_tpu.graph.datasets import load_data, load_out_t
from glnn_tpu.nn.models import Model
from glnn_tpu.ops.graph_utils import compute_min_cut_loss, feature_prop
from glnn_tpu.train import (
    distill_run_inductive,
    distill_run_transductive,
    make_adam,
)
from glnn_tpu.utils import (
    check_readable,
    check_writable,
    get_evaluator,
    get_logger,
    get_training_config,
    graph_split,
    set_seed,
)
from glnn_tpu.utils.config import merge_args_with_config


def get_args(argv=None):
    parser = argparse.ArgumentParser(description="TPU-native GLNN student")
    add_common_args(parser)
    parser.add_argument("--teacher", type=str, default="SAGE",
                        help="Teacher whose outputs to distill from")
    parser.add_argument("--student", type=str, default="MLP",
                        help="Student model")
    parser.add_argument("--lamb", type=float, default=0,
                        help="Hard-label loss weight in [0,1]; soft gets 1-lamb")
    parser.add_argument("--out_t_path", type=str, default="outputs",
                        help="Path to load teacher outputs")
    return parser.parse_args(argv)


def run(args):
    set_seed(args.seed)
    if args.device < 0:
        import jax
        jax.config.update("jax_platforms", "cpu")
    elif args.device > 0:
        # honor the ordinal on multi-accelerator hosts (the reference
        # maps device>=0 to cuda:{device}); out-of-range falls back to
        # the default device with a warning rather than crashing on
        # single-chip/tunneled environments
        import jax
        devs = jax.devices()
        if args.device < len(devs):
            jax.config.update("jax_default_device", devs[args.device])
        else:
            print(f"WARNING: --device {args.device} out of range "
                  f"({len(devs)} device(s)); using the default device")
    if getattr(args, "ops_backend", "auto") != "auto":
        from glnn_tpu import ops
        ops.set_backend(args.ops_backend)
    if getattr(args, "exact_eval", False):
        from glnn_tpu import ops
        ops.set_eval_quant(False)
    setup_compile_cache(args)

    apply_output_path_reroutes(args, is_student=True)

    # one path scheme, defined once in cli/common.py: the student's
    # own dir is teacher_output_dir with the joint model name, and the
    # teacher's out.npz dir is the same scheme rooted at --out_t_path
    import copy as _copy

    output_dir = teacher_output_dir(args,
                                    f"{args.teacher}_{args.student}")
    t_args = _copy.copy(args)
    t_args.output_path = args.out_t_path
    out_t_dir = teacher_output_dir(t_args, args.teacher)
    args.output_dir = output_dir

    check_writable(output_dir, overwrite=False)
    check_readable(out_t_dir)
    logger = get_logger(output_dir.joinpath("log"), args.console_log,
                        args.log_level)
    logger.info(f"output_dir: {output_dir}")
    logger.info(f"out_t_dir: {out_t_dir}")

    g, labels, idx_train, idx_val, idx_test = load_data(
        args.dataset, args.data_path, split_idx=args.split_idx,
        seed=args.seed, labelrate_train=args.labelrate_train,
        labelrate_val=args.labelrate_val,
    )
    logger.info(f"Total {g.number_of_nodes()} nodes.")
    logger.info(f"Total {g.number_of_edges()} edges.")

    feats = np.asarray(g.ndata["feat"], np.float32)
    args.feat_dim = feats.shape[1]
    args.label_dim = int(labels.max()) + 1

    if 0 < args.feature_noise <= 1:
        rs = np.random.RandomState(args.seed)
        feats = ((1 - args.feature_noise) * feats
                 + args.feature_noise
                 * rs.randn(*feats.shape).astype(np.float32))

    conf = {}
    if args.model_config_path is not None:
        conf = get_training_config(args.model_config_path, args.student,
                                   args.dataset)
    conf = merge_args_with_config(dict(args.__dict__), conf, logger)
    logger.info(f"conf: { {k: v for k, v in conf.items() if k != 'output_dir'} }")

    model = Model(conf)
    optimizer = make_adam(conf["learning_rate"], conf["weight_decay"])
    evaluator = get_evaluator(conf["dataset"])

    out_t = load_out_t(out_t_dir)
    for name, idx in (("train", idx_train), ("val", idx_val),
                      ("test", idx_test)):
        logger.debug(
            f"teacher score on {name} data: "
            f"{evaluator(out_t[idx], labels[idx])}"
        )

    loss_and_score = []
    state_out = {} if args.save_results else None
    # the student is graph-free: only GA-prop (--feature_aug_k) and the
    # min-cut diagnostic touch the device graph — build it lazily so a
    # default products-scale distillation never ships the ~GB edge
    # arrays to HBM
    _G_cache = []

    def G():
        if not _G_cache:
            _G_cache.append(g.to_device())
        return _G_cache[0]

    if args.exp_setting == "tran":
        idx_l = idx_train
        idx_t = np.concatenate([idx_train, idx_val, idx_test])
        distill_indices = (idx_l, idx_t, idx_val, idx_test)
        if args.feature_aug_k > 0:
            feats = np.asarray(feature_prop(feats, G(),
                                            args.feature_aug_k))
        out, score_val, score_test = distill_run_transductive(
            conf, model, feats, labels, out_t, distill_indices, optimizer,
            logger, loss_and_score, state_out=state_out,
        )
        score_lst = [score_test]
    else:
        obs_idx_train, obs_idx_val, obs_idx_test, idx_obs, idx_test_ind = (
            graph_split(idx_train, idx_val, idx_test, args.split_rate,
                        args.seed))
        obs_idx_l = obs_idx_train
        obs_idx_t = np.concatenate([obs_idx_train, obs_idx_val, obs_idx_test])
        distill_indices = (obs_idx_l, obs_idx_t, obs_idx_val, obs_idx_test,
                           idx_obs, idx_test_ind)
        if args.feature_aug_k > 0:
            obs_g = g.subgraph(idx_obs)
            obs_G = obs_g.to_device()
            obs_feats = np.asarray(
                feature_prop(feats[idx_obs], obs_G, args.feature_aug_k))
            feats = np.asarray(feature_prop(feats, G(),
                                             args.feature_aug_k))
            feats[idx_obs] = obs_feats
        out, score_val, score_test_tran, score_test_ind = (
            distill_run_inductive(
                conf, model, feats, labels, out_t, distill_indices,
                optimizer, logger, loss_and_score, state_out=state_out,
            ))
        score_lst = [score_test_tran, score_test_ind]

    logger.info(
        f"num_layers: {conf['num_layers']}. hidden_dim: "
        f"{conf['hidden_dim']}. dropout_ratio: {conf['dropout_ratio']}"
    )

    np.savez(output_dir.joinpath("out"), np.asarray(out))

    if args.save_results:
        np.savez(output_dir.joinpath("loss_and_score"),
                 np.array(loss_and_score))
        from glnn_tpu.utils.checkpoint import save_model
        save_model(output_dir.joinpath("model.ckpt"),
                   state_out["params"], state_out["batch_stats"])

    if args.exp_setting == "tran" and args.compute_min_cut:
        min_cut = float(compute_min_cut_loss(G(), np.asarray(out)))
        with open(output_dir.parent.joinpath("min_cut_loss"), "a+") as f:
            f.write(f"{min_cut :.4f}\n")

    return score_lst


def repeat_run(args):
    scores = []
    for seed in range(args.num_exp):
        args.seed = seed
        scores.append(run(args))
    scores_np = np.array(scores)
    return scores_np.mean(axis=0), scores_np.std(axis=0)


def main(argv=None):
    args = get_args(argv)
    if args.num_exp == 1:
        score = run(args)
        score_str = "".join([f"{s : .4f}\t" for s in score])
    else:
        score_mean, score_std = repeat_run(args)
        score_str = "".join(
            [f"{s : .4f}\t" for s in score_mean]
            + [f"{s : .4f}\t" for s in score_std]
        )

    with open(args.output_dir.parent.joinpath("exp_results"), "a+") as f:
        f.write(f"{score_str}\n")
    print(score_str)


if __name__ == "__main__":
    main()
