"""Teacher CLI: train a GNN (or MLP baseline) and dump soft labels.

Pipeline (mirrors /root/reference/train_teacher.py:152-314): seed ->
output dir -> load data -> optional feature noise -> YAML config merge
(YAML beats CLI) -> Model + Adam -> run_{transductive,inductive} ->
save `out.npz` all-node log-probs (+ optional curves/checkpoint/min-cut).
Multi-seed `--num_exp` aggregates mean/std and appends to `exp_results`.
"""

from __future__ import annotations

import argparse

import numpy as np

from glnn_tpu.cli.common import (
    setup_compile_cache,
    add_common_args,
    apply_output_path_reroutes,
    teacher_output_dir,
)
from glnn_tpu.graph.datasets import load_data
from glnn_tpu.nn.models import Model
from glnn_tpu.ops.graph_utils import compute_min_cut_loss, feature_prop
from glnn_tpu.train import make_adam, run_inductive, run_transductive
from glnn_tpu.utils import (
    check_writable,
    get_logger,
    get_training_config,
    graph_split,
    set_seed,
)
from glnn_tpu.utils.config import merge_args_with_config


def get_args(argv=None):
    parser = argparse.ArgumentParser(description="TPU-native GLNN teacher")
    add_common_args(parser)
    parser.add_argument("--teacher", type=str, default="SAGE",
                        help="Teacher model")
    return parser.parse_args(argv)


_LOCALITY_MAX_EDGES = 20_000_000          # numpy LP tier budget
_LOCALITY_MAX_EDGES_NATIVE = 300_000_000  # C++ LP tier (products fits)


def _locality_relabel(g, feats, labels, idxs, n_shards, logger):
    """Community-locality node relabeling ahead of the contiguous halo
    partition (SURVEY.md §2.4 graph partitioning): label-propagation
    communities, LPT-assigned whole to equal node blocks. Cuts the halo
    edge fraction from ~(P-1)/P to the graph's true cross-community
    fraction (bench/scaling_r3.json: 0.09 vs 0.85 at P=8). Returns
    (g, feats, labels, idxs, new_id) with new_id = None when skipped;
    callers un-relabel the final out via out[new_id] so the out.npz
    contract stays in original node order."""
    from glnn_tpu.distributed.partition import (
        community_balanced_order, inverse_permutation,
        label_propagation_labels)
    from glnn_tpu.graph.host import reorder_nodes

    from glnn_tpu import native

    n = g.num_nodes()
    budget = (_LOCALITY_MAX_EDGES_NATIVE if native.available()
              else _LOCALITY_MAX_EDGES)
    if g.num_edges() > budget:
        logger.info("locality relabel skipped: graph above the "
                    "label-propagation tier's edge budget")
        return g, feats, labels, idxs, None
    lab = label_propagation_labels(g.src, g.dst, n)
    deg = np.bincount(g.dst, minlength=n)
    order = community_balanced_order(lab, deg, n_shards)
    new_id = inverse_permutation(order)
    rows = -(-n // n_shards)
    hf = float((new_id[g.src] // rows != new_id[g.dst] // rows).mean())
    logger.info(f"locality relabel: halo edge fraction {hf:.3f} "
                f"at n_shards={n_shards}")
    g2 = reorder_nodes(g, order)
    return (g2, feats[order], labels[order],
            tuple(new_id[np.asarray(i)] for i in idxs), new_id)


def run(args):
    """Train one teacher; returns the score list ([test] for tran,
    [test_tran, test_ind] for ind)."""
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

    apply_output_path_reroutes(args)
    output_dir = teacher_output_dir(args, args.teacher)
    args.output_dir = output_dir
    check_writable(output_dir, overwrite=False)
    logger = get_logger(output_dir.joinpath("log"), args.console_log,
                        args.log_level)
    logger.info(f"output_dir: {output_dir}")

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
        conf = get_training_config(args.model_config_path, args.teacher,
                                   args.dataset)
    conf = merge_args_with_config(dict(args.__dict__), conf, logger)
    logger.info(f"conf: { {k: v for k, v in conf.items() if k != 'output_dir'} }")

    model = Model(conf)
    optimizer = make_adam(conf["learning_rate"], conf["weight_decay"])

    loss_and_score = []
    state_out = {} if args.save_results else None
    n_shards = int(conf.get("n_shards", 1) or 1)
    # GNN teachers get the Pallas SpMM plan; MLP never touches the
    # graph. Only GAT consults the attention plan (ops.edge_softmax /
    # fused attention), so non-attention teachers skip its ~16B/edge of
    # index arrays; GAT keeps the auto policy (None) so products-scale
    # graphs still decline it.
    build_plans = not model.is_mlp
    smx_plans = None if "GAT" in conf["model_name"] else False
    unmap = None
    if n_shards > 1 and not model.is_mlp:
        (g, feats, labels, (idx_train, idx_val, idx_test),
         unmap) = _locality_relabel(
            g, feats, labels, (idx_train, idx_val, idx_test), n_shards,
            logger)
    from glnn_tpu.train.engine import _use_sampled_sage
    want_win1 = (conf.get("sampler_tier") == "window"
                 and _use_sampled_sage(conf, model))
    G = g.to_device(build_plans=build_plans, softmax_plans=smx_plans,
                    window_table=want_win1)

    def _to_halo(host_g, want_plans):
        """Graph-partitioned halo view over the first n_shards devices
        (SURVEY.md §2.4: 1D node partition, dst-owned edges, boundary
        rows exchanged via all_to_all under shard_map)."""
        import jax
        from glnn_tpu.distributed.halo import build_halo_graph
        from glnn_tpu.distributed.mesh import make_mesh

        mesh = make_mesh(n_shards, axis="shard")
        plans = want_plans and jax.default_backend() == "tpu"
        return build_halo_graph(host_g.src, host_g.dst, host_g.num_nodes(),
                                mesh, axis="shard", build_plans=plans,
                                attention_plans=(
                                    plans and "GAT" in conf["model_name"]))

    if args.exp_setting == "tran":
        indices = (idx_train, idx_val, idx_test)
        if args.feature_aug_k > 0:
            feats = np.asarray(feature_prop(feats, G, args.feature_aug_k))
        g_train, g_struct = G, None
        if n_shards > 1 and not model.is_mlp:
            logger.info(f"distributed: n_shards={n_shards} halo-sharded")
            g_train, g_struct = _to_halo(g, build_plans), G
        out, score_val, score_test = run_transductive(
            conf, model, g_train, feats, labels, indices, optimizer, logger,
            loss_and_score, state_out=state_out, g_struct=g_struct,
        )
        score_lst = [score_test]
    elif args.exp_setting == "ind":
        indices = graph_split(idx_train, idx_val, idx_test, args.split_rate,
                              args.seed)
        if unmap is not None:
            # obs-local node ids follow idx_obs ORDER; sorting idx_obs
            # ascending carries the community relabeling's locality into
            # the observed subgraph's halo partition (the obs_idx_*
            # position system is remapped accordingly — membership and
            # the out[idx_obs] merge are unchanged)
            obs_tr, obs_va, obs_te, idx_obs, idx_ind = indices
            order_obs = np.argsort(idx_obs, kind="stable")
            pos = np.empty_like(order_obs)
            pos[order_obs] = np.arange(len(order_obs))
            indices = (pos[np.asarray(obs_tr)], pos[np.asarray(obs_va)],
                       pos[np.asarray(obs_te)], idx_obs[order_obs], idx_ind)
        obs_g = g.subgraph(indices[3])
        obs_G = obs_g.to_device(build_plans=build_plans,
                                softmax_plans=smx_plans,
                                window_table=want_win1)
        if args.feature_aug_k > 0:
            idx_obs = indices[3]
            obs_feats = np.asarray(
                feature_prop(feats[idx_obs], obs_G, args.feature_aug_k))
            feats = np.asarray(feature_prop(feats, G, args.feature_aug_k))
            feats[idx_obs] = obs_feats
        g_full, g_obs, g_struct = G, obs_G, None
        if n_shards > 1 and not model.is_mlp:
            logger.info(f"distributed: n_shards={n_shards} halo-sharded")
            g_full = _to_halo(g, build_plans)
            g_obs = _to_halo(obs_g, build_plans)
            g_struct = obs_G
        out, score_val, score_test_tran, score_test_ind = run_inductive(
            conf, model, g_full, g_obs, feats, labels, indices, optimizer,
            logger, loss_and_score, state_out=state_out, g_struct=g_struct,
        )
        score_lst = [score_test_tran, score_test_ind]
    else:
        raise ValueError(f"Unknown experiment setting! {args.exp_setting}")

    logger.info(
        f"num_layers: {conf['num_layers']}. hidden_dim: "
        f"{conf['hidden_dim']}. dropout_ratio: {conf['dropout_ratio']}"
    )

    out_np = np.asarray(out)
    if unmap is not None:
        # back to original node order (the out.npz teacher->student
        # contract; metrics above are permutation-invariant)
        out_np = out_np[unmap]
    np.savez(output_dir.joinpath("out"), out_np)

    if args.save_results:
        np.savez(output_dir.joinpath("loss_and_score"),
                 np.array(loss_and_score))
        from glnn_tpu.utils.checkpoint import save_model
        save_model(output_dir.joinpath("model.ckpt"),
                   state_out["params"], state_out["batch_stats"])

    if args.exp_setting == "tran" and args.compute_min_cut:
        min_cut = float(compute_min_cut_loss(G, np.asarray(out)))
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
