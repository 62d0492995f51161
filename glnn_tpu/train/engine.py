"""Jitted train/eval primitives + the four epoch runners.

Mirrors the reference's training engine (/root/reference/train_and_eval.py)
with the epoch loop on the host and every numeric step jit-compiled:

* `train`-style full-batch GNN step (train_and_eval.py:12-29): one
  device call per epoch; loss reported PRE lamb-scaling, gradient
  scaled by lamb.
* `train_mini_batch`-style MLP epoch (train_and_eval.py:59-86): one
  jitted lax.scan over shuffled fixed-size batches; the tail remainder
  is DROPPED each epoch when N >= batch_size (preserved quirk — it
  affects products student convergence).
* `evaluate` / `evaluate_mini_batch` (train_and_eval.py:89-136): eval
  returns all-node log-probs; loss/score computed on a subset.
* Runners `run_transductive` / `run_inductive` /
  `distill_run_transductive` / `distill_run_inductive`
  (train_and_eval.py:144-742): eval every `eval_interval` epochs,
  best-checkpoint on `score_val >= best` (ties refresh the snapshot),
  early stop when `count == patience`, restore best before final eval.
  Distillation runs TWO separate optimizer passes per epoch (hard pass
  scaled lamb, soft pass scaled 1-lamb) — never a fused objective; the
  Adam moments advance on the zero-gradient pass when lamb == 0.

TPU notes: the SAGE teacher trains full-batch here (full-neighbor
aggregation is a plain SpMM on TPU); the fanout-sampled path lives in
glnn_tpu.sampling and is selected via conf["sage_sampling"].
SAGE layer-wise minibatched inference (models.py:121-148) is replaced
by the equivalent full-graph forward.
"""

from __future__ import annotations




import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

from glnn_tpu.train.losses import (
    accuracy,
    kl_div_batchmean_log_target,
    log_softmax,
    nll_loss,
)
from glnn_tpu.train.state import TrainState
from glnn_tpu.utils.profiling import StepTimer


# --------------------------------------------------------------------
# Step factories
# --------------------------------------------------------------------

def _split_apply(model, params, batch_stats, g, feats, rng):
    """Training-mode forward returning (logits, new_batch_stats)."""
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    out = model.apply(
        variables, g, feats, training=True,
        rngs={"dropout": rng} if rng is not None else None,
        mutable=bool(batch_stats),
    )
    if batch_stats:
        (_, h), upd = out
        return h, upd["batch_stats"]
    return out[1], {}


def make_gnn_train_step(model, optimizer, lamb: float = 1.0,
                        donate: bool = False):
    """Full-batch GNN step: NLL on idx_train, Adam update.

    `donate=True` donates the input state's buffers to the outputs
    (params/opt_state update in place on device) — callers must then
    ALWAYS feed the returned state forward and never reuse the old one
    (the epoch loops do; bench.py's step loops opt in)."""

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(state: TrainState, g, feats, labels, idx_train, rng):
        def loss_fn(params):
            h, new_bs = _split_apply(model, params, state.batch_stats, g,
                                     feats, rng)
            out = log_softmax(h)
            loss = nll_loss(out[idx_train], labels[idx_train])
            return loss * lamb, (loss, new_bs)

        grads, (loss, new_bs) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, state.params,
                                        updates)
        return state.replace(step=state.step + 1, params=params,
                             batch_stats=new_bs,
                             opt_state=opt_state), loss

    return step


def make_eval_fn(model, exact: bool = False):
    """All-node log-probs in eval mode (no dropout, running stats).

    The trace is marked `ops.inference_mode()`: no gradient flows, so
    under the auto backend the unweighted aggregations pick the int8
    gather tier (0.81 of measured gather SOL vs 0.69 bf16, ~1% feature
    error swamped by the argmax scoring) — `--exact_eval` /
    ops.set_eval_quant(False) restores the exact tier globally.

    `exact=True` skips the marker for THIS eval fn regardless of the
    global flag: the runners use it for the FINAL all-node forward
    whose log-probs become out.npz — the student's distillation
    targets consume those values directly (KL, not argmax), so the
    quantized tier is only ever applied to intermediate
    early-stop/model-selection scoring."""
    from glnn_tpu import ops

    @jax.jit
    def evaluate(params, batch_stats, g, feats):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        if exact:
            h = model.apply(variables, g, feats, training=False)[1]
        else:
            with ops.inference_mode():
                h = model.apply(variables, g, feats, training=False)[1]
        return log_softmax(h)

    return evaluate


def make_mlp_epoch_fn(model, optimizer, batch_size: int, criterion: str,
                      lamb: float = 1.0):
    """One jitted epoch of shuffled fixed-size minibatches over an MLP.

    criterion: "nll" (int targets) or "kl" (teacher log-prob targets).
    Returns (new_state, mean unscaled loss). Tail-drop semantics as in
    the reference (see module docstring).
    """
    use_kl = criterion == "kl"

    @jax.jit
    def epoch(state: TrainState, feats, targets, rng):
        n = feats.shape[0]
        num_batches = max(1, n // batch_size)
        eff_batch = batch_size if n >= batch_size else n
        perm_rng, drop_rng = jax.random.split(rng)
        idx = jax.random.permutation(perm_rng, n)[: num_batches * eff_batch]
        idx = idx.reshape(num_batches, eff_batch)

        def body(carry, batch_idx):
            params, batch_stats, opt_state, step = carry
            x = jnp.take(feats, batch_idx, axis=0)
            y = jnp.take(targets, batch_idx, axis=0)
            rng_b = jax.random.fold_in(drop_rng, step)

            def loss_fn(p):
                h, new_bs = _split_apply(model, p, batch_stats, None, x,
                                         rng_b)
                out = log_softmax(h)
                loss = (kl_div_batchmean_log_target(out, y) if use_kl
                        else nll_loss(out, y))
                return loss * lamb, (loss, new_bs)

            grads, (loss, new_bs) = jax.grad(loss_fn, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params,
                                            updates)
            return (params, new_bs, opt_state, step + 1), loss

        init = (state.params, state.batch_stats, state.opt_state, state.step)
        (params, batch_stats, opt_state, step), losses = jax.lax.scan(
            body, init, idx
        )
        new_state = state.replace(step=step, params=params,
                                  batch_stats=batch_stats,
                                  opt_state=opt_state)
        return new_state, jnp.mean(losses)

    return epoch


def make_mlp_eval_fn(model, batch_size: int | None = None):
    """All-node log-probs in eval mode (no dropout, running stats).

    With `batch_size`, the forward streams ceil(N/B) fixed-size chunks
    under one lax.scan — the reference's `evaluate_mini_batch`
    (train_and_eval.py:108-136; chunked, NO tail dropping) — bounding
    activation memory so products-scale students (2.45M nodes x 2048
    hidden) evaluate inside HBM. Chunk results are bitwise identical to
    the full forward because every layer is row-independent in eval
    mode (Linear/norm-with-running-stats/ReLU)."""

    @jax.jit
    def evaluate(params, batch_stats, feats):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        h = model.apply(variables, None, feats, training=False)[1]
        return log_softmax(h)

    if batch_size is None:
        return evaluate

    @jax.jit
    def evaluate_chunked(params, batch_stats, feats):
        n = feats.shape[0]
        if n <= batch_size:          # static: shapes fixed under jit
            return evaluate(params, batch_stats, feats)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        num_batches = -(-n // batch_size)
        pad = num_batches * batch_size - n
        fp = jnp.pad(feats, ((0, pad), (0, 0)))
        chunks = fp.reshape(num_batches, batch_size, feats.shape[1])

        def body(_, x):
            h = model.apply(variables, None, x, training=False)[1]
            return None, log_softmax(h)

        _, outs = jax.lax.scan(body, None, chunks)
        return outs.reshape(num_batches * batch_size, -1)[:n]

    return evaluate_chunked


def _fanouts(conf):
    fan = conf.get("fan_out", "5,5")
    if isinstance(fan, str):
        fan = [int(x) for x in fan.split(",")]
    fan = [int(x) for x in fan]
    if len(fan) != conf["num_layers"]:
        raise ValueError(
            f"fan_out length {len(fan)} != num_layers {conf['num_layers']}")
    return fan


def _use_sampled_sage(conf, model) -> bool:
    """SAGE teachers train on fanout-sampled minibatches by default
    (the reference always does, train_and_eval.py:173-204); set
    conf['sage_sampling']='full' for the full-batch variant."""
    if model.is_mlp or "SAGE" not in model.model_name:
        return False
    return conf.get("sage_sampling", "auto") != "full"



def _maybe_shard_data(conf, feats):
    """Row-shard a feature matrix over a data mesh when conf asks for
    n_shards > 1 (graph-free paths: MLP teacher, GLNN student). The
    jitted epoch/eval functions then run SPMD under GSPMD with batch
    gathers resolved across shards — the TPU-native data parallelism
    of SURVEY.md §2.4 row 1."""
    n_shards = int(conf.get("n_shards", 1) or 1)
    if n_shards <= 1:
        return jnp.asarray(feats)
    from jax.sharding import NamedSharding, PartitionSpec as P

    from glnn_tpu.distributed.mesh import make_mesh

    mesh = make_mesh(n_shards, axis="data")
    return jax.device_put(jnp.asarray(feats),
                          NamedSharding(mesh, P("data", None)))


def _is_halo(g) -> bool:
    from glnn_tpu.distributed.halo import HaloGraph

    return isinstance(g, HaloGraph)


def _prep_halo_inputs(g, feats, labels):
    """Shard features row-wise over the halo graph's mesh and ghost-pad
    labels to n_pad, so the same jitted step/eval functions run SPMD.
    Returns (feats_sharded, labels_padded)."""
    from glnn_tpu.distributed.halo import shard_features

    feats_np = np.asarray(feats, np.float32)
    feats = shard_features(feats_np, g)
    labels_np = np.asarray(labels)
    pad = g.n_pad - labels_np.shape[0]
    labels = jnp.asarray(np.concatenate(
        [labels_np, np.zeros(pad, labels_np.dtype)]))
    return feats, labels


# --------------------------------------------------------------------
# Shared early-stop skeleton
# --------------------------------------------------------------------

class _BestTracker:
    """score_val >= best refreshes the snapshot and resets patience."""

    def __init__(self, state: TrainState):
        self.best_epoch = 0
        self.best_score_val = 0.0
        self.count = 0
        self.snap = state.snapshot()

    def update(self, epoch: int, score_val: float, state: TrainState) -> None:
        if score_val >= self.best_score_val:
            self.best_epoch = epoch
            self.best_score_val = score_val
            self.snap = state.snapshot()
            self.count = 0
        else:
            self.count += 1


def _subset_metrics(out, labels, idx):
    """(loss, score) of log-probs `out` restricted to idx (host floats)."""
    sub = out[idx]
    lab = labels[idx]
    loss = float(nll_loss(sub, lab))
    score = float(accuracy(sub, lab))
    return loss, score


# --------------------------------------------------------------------
# Teacher runners
# --------------------------------------------------------------------

def _debug_guard(conf, loss, epoch, where):
    """Opt-in (--debug_checks) per-epoch NaN guard (SURVEY.md §4/§5)."""
    if conf.get("debug_checks"):
        from glnn_tpu.utils.guards import assert_finite_loss

        assert_finite_loss(loss, epoch, where)


def run_transductive(conf, model, g, feats, labels, indices, optimizer,
                     logger, loss_and_score, state_out=None, g_struct=None):
    """Teacher training, transductive. Returns (out, score_val, score_test)
    with `out` = all-node log-probs from the best checkpoint.

    Multi-chip: pass `g` as a HaloGraph (distributed/halo.py) — features
    are row-sharded over its mesh, the full-batch step and the all-node
    eval run SPMD via halo exchange, and the runner protocol (eval
    interval / patience / best-restore) is unchanged. For fanout-sampled
    SAGE additionally pass `g_struct` = the replicated single-device
    Graph (structure only) used by the on-device sampler; the epoch then
    runs data-parallel with features fetched from their owner shards
    (distributed/sampling.py)."""
    idx_train, idx_val, idx_test = [jnp.asarray(i) for i in indices]
    n_real = int(np.asarray(labels).shape[0])
    halo = _is_halo(g)
    if halo:
        feats, labels = _prep_halo_inputs(g, feats, labels)
    else:
        labels = jnp.asarray(labels)
        feats = (_maybe_shard_data(conf, feats) if model.is_mlp
                 else jnp.asarray(feats))

    rng = jax.random.PRNGKey(conf["seed"])
    init_rng, run_rng = jax.random.split(rng)
    variables = model.init(init_rng, g, feats)

    from glnn_tpu.train.state import create_train_state
    state = create_train_state(variables, optimizer)

    is_mlp = model.is_mlp
    sampled = _use_sampled_sage(conf, model)
    if is_mlp:
        epoch_fn = make_mlp_epoch_fn(model, optimizer, conf["batch_size"],
                                     "nll")
        eval_fn = make_mlp_eval_fn(
            model, conf.get("eval_batch_size", conf["batch_size"]))
        feats_train = feats[idx_train]
        labels_train = labels[idx_train]
    elif sampled and halo:
        if g_struct is None:
            raise ValueError(
                "sampled SAGE on a HaloGraph needs g_struct (the "
                "replicated structure Graph) for the on-device sampler")
        from glnn_tpu.distributed.sampling import (
            make_dp_sampled_sage_epoch_fn)
        epoch_fn = make_dp_sampled_sage_epoch_fn(
            model, optimizer, conf["batch_size"], _fanouts(conf),
            mesh=g.mesh, axis=g.axis,
            sampler_tier=conf.get("sampler_tier", "floyd") or "floyd")
        eval_fn = make_eval_fn(model)
    elif sampled:
        from glnn_tpu.train.sage_sampled import make_sage_sampled_epoch_fn
        epoch_fn = make_sage_sampled_epoch_fn(
            model, optimizer, conf["batch_size"], _fanouts(conf),
            sampler_tier=conf.get("sampler_tier", "floyd") or "floyd")
        eval_fn = make_eval_fn(model)
    else:
        step_fn = make_gnn_train_step(model, optimizer)
        eval_fn = make_eval_fn(model)

    tracker = _BestTracker(state)
    timer = StepTimer()
    for epoch in range(1, conf["max_epoch"] + 1):
        epoch_rng = jax.random.fold_in(run_rng, epoch)
        timer.__enter__()
        if is_mlp:
            state, loss = epoch_fn(state, feats_train, labels_train, epoch_rng)
            loss = float(loss)     # sync: the timer must not measure
            # async dispatch only (the reference fetches loss.item()
            # per epoch too, so this is also protocol parity)
        elif sampled:
            state, loss, overflow = epoch_fn(
                state, g_struct if halo else g, feats, labels, idx_train,
                epoch_rng)
            ovf = np.atleast_1d(np.asarray(overflow))
            if bool(ovf[0]):
                logger.warning(f"Ep {epoch}: sampler frontier cap overflow")
            if ovf.shape[0] > 1 and bool(ovf[1]):
                logger.warning(
                    f"Ep {epoch}: compact-fetch bucket overflow — feature "
                    "rows zero-filled (raise fetch slack)")
        else:
            state, loss = step_fn(state, g, feats, labels, idx_train,
                                  epoch_rng)
            loss = float(loss)     # sync before the timer reads
        timer.__exit__()
        _debug_guard(conf, loss, epoch, "teacher tran runner")
        if epoch % conf["eval_interval"] == 0:
            if is_mlp:
                # one all-node eval; train metrics via row slicing (the
                # chunked eval is row-independent and bitwise equal to
                # a separate subset forward — make_mlp_eval_fn contract)
                out = eval_fn(state.params, state.batch_stats, feats)
                loss_train, score_train = _subset_metrics(out, labels,
                                                          idx_train)
                loss_val, score_val = _subset_metrics(out, labels, idx_val)
                loss_test, score_test = _subset_metrics(out, labels, idx_test)
            else:
                out = eval_fn(state.params, state.batch_stats, g, feats)
                loss_train, score_train = _subset_metrics(out, labels,
                                                          idx_train)
                loss_val, score_val = _subset_metrics(out, labels, idx_val)
                loss_test, score_test = _subset_metrics(out, labels, idx_test)

            logger.debug(
                f"Ep {epoch:3d} | loss: {float(loss):.4f} | "
                f"s_train: {score_train:.4f} | s_val: {score_val:.4f} | "
                f"s_test: {score_test:.4f}"
            )
            loss_and_score.append([epoch, loss_train, loss_val, loss_test,
                                   score_train, score_val, score_test])
            tracker.update(epoch, score_val, state)

        if tracker.count == conf["patience"] or epoch == conf["max_epoch"]:
            break

    logger.info(
        f"mean epoch time: {timer.mean * 1e3:.1f} ms over {timer.count} epochs")
    state = state.restore(tracker.snap)
    if state_out is not None:
        state_out["params"] = state.params
        state_out["batch_stats"] = state.batch_stats
        state_out["best_epoch"] = tracker.best_epoch
    if is_mlp:
        out = eval_fn(state.params, state.batch_stats, feats)
    else:
        # FINAL all-node log-probs feed out.npz (the student's KL
        # targets): under the auto policy, always the exact tier —
        # never the int8 eval gather. (A forced set_backend
        # ("pallas_int8") quantizes everything by explicit user
        # choice, final eval included.) When the marker cannot change
        # the tier, reuse the compiled eval_fn instead of paying a
        # second identical trace+compile.
        from glnn_tpu import ops
        final_fn = (make_eval_fn(model, exact=True)
                    if ops.eval_quant_active() else eval_fn)
        out = final_fn(state.params, state.batch_stats, g, feats)
    _, score_val = _subset_metrics(out, labels, idx_val)
    _, score_test = _subset_metrics(out, labels, idx_test)
    logger.info(
        f"Best valid model at epoch: {tracker.best_epoch: 3d}, "
        f"score_val: {score_val:.4f}, score_test: {score_test:.4f}"
    )
    return np.asarray(out)[:n_real], score_val, score_test


def run_inductive(conf, model, g, obs_g, feats, labels, indices, optimizer,
                  logger, loss_and_score, state_out=None, g_struct=None):
    """Teacher training, inductive. Trains on the observed subgraph only;
    final soft labels merge obs-graph predictions over the full-graph
    tensor (`out[idx_obs] = obs_out`, train_and_eval.py:508).

    Multi-chip: pass `g` AND `obs_g` as HaloGraphs over the same mesh
    (see run_transductive); `g_struct` is the replicated OBSERVED
    structure Graph for the sampled-SAGE path.

    Returns (out, score_val, score_test_tran, score_test_ind)."""
    obs_idx_train, obs_idx_val, obs_idx_test, idx_obs, idx_test_ind = [
        jnp.asarray(i) for i in indices
    ]
    n_real = int(np.asarray(labels).shape[0])
    n_obs = int(np.asarray(indices[3]).shape[0])
    halo = _is_halo(obs_g)
    if halo:
        feats_np = np.asarray(feats, np.float32)
        labels_np = np.asarray(labels)
        obs_sel = np.asarray(indices[3])
        feats, labels = _prep_halo_inputs(g, feats_np, labels_np)
        obs_feats, obs_labels = _prep_halo_inputs(
            obs_g, feats_np[obs_sel], labels_np[obs_sel])
    else:
        labels = jnp.asarray(labels)
        feats = jnp.asarray(feats)
        obs_feats = feats[idx_obs]
        obs_labels = labels[idx_obs]

    rng = jax.random.PRNGKey(conf["seed"])
    init_rng, run_rng = jax.random.split(rng)
    variables = model.init(init_rng, obs_g, obs_feats)

    from glnn_tpu.train.state import create_train_state
    state = create_train_state(variables, optimizer)

    is_mlp = model.is_mlp
    sampled = _use_sampled_sage(conf, model)
    if is_mlp:
        epoch_fn = make_mlp_epoch_fn(model, optimizer, conf["batch_size"],
                                     "nll")
        eval_fn = make_mlp_eval_fn(
            model, conf.get("eval_batch_size", conf["batch_size"]))
        feats_train = obs_feats[obs_idx_train]
        labels_train = obs_labels[obs_idx_train]
    elif sampled and halo:
        if g_struct is None:
            raise ValueError(
                "sampled SAGE on a HaloGraph needs g_struct (the "
                "replicated observed structure Graph)")
        from glnn_tpu.distributed.sampling import (
            make_dp_sampled_sage_epoch_fn)
        epoch_fn = make_dp_sampled_sage_epoch_fn(
            model, optimizer, conf["batch_size"], _fanouts(conf),
            mesh=obs_g.mesh, axis=obs_g.axis,
            sampler_tier=conf.get("sampler_tier", "floyd") or "floyd")
        eval_fn = make_eval_fn(model)
    elif sampled:
        from glnn_tpu.train.sage_sampled import make_sage_sampled_epoch_fn
        epoch_fn = make_sage_sampled_epoch_fn(
            model, optimizer, conf["batch_size"], _fanouts(conf),
            sampler_tier=conf.get("sampler_tier", "floyd") or "floyd")
        eval_fn = make_eval_fn(model)
    else:
        step_fn = make_gnn_train_step(model, optimizer)
        eval_fn = make_eval_fn(model)

    tracker = _BestTracker(state)
    timer = StepTimer()
    for epoch in range(1, conf["max_epoch"] + 1):
        epoch_rng = jax.random.fold_in(run_rng, epoch)
        timer.__enter__()
        if is_mlp:
            state, loss = epoch_fn(state, feats_train, labels_train, epoch_rng)
            loss = float(loss)     # sync before the timer reads
        elif sampled:
            state, loss, overflow = epoch_fn(
                state, g_struct if halo else obs_g, obs_feats, obs_labels,
                obs_idx_train, epoch_rng)
            ovf = np.atleast_1d(np.asarray(overflow))
            if bool(ovf[0]):
                logger.warning(f"Ep {epoch}: sampler frontier cap overflow")
            if ovf.shape[0] > 1 and bool(ovf[1]):
                logger.warning(
                    f"Ep {epoch}: compact-fetch bucket overflow — feature "
                    "rows zero-filled (raise fetch slack)")
        else:
            state, loss = step_fn(state, obs_g, obs_feats, obs_labels,
                                  obs_idx_train, epoch_rng)
            loss = float(loss)     # sync before the timer reads
        timer.__exit__()
        _debug_guard(conf, loss, epoch, "teacher ind runner")
        if epoch % conf["eval_interval"] == 0:
            if is_mlp:
                out_all = eval_fn(state.params, state.batch_stats, feats)
                obs_out = out_all[idx_obs]
            else:
                obs_out = eval_fn(state.params, state.batch_stats, obs_g,
                                  obs_feats)
                out_all = eval_fn(state.params, state.batch_stats, g, feats)
            loss_train, score_train = _subset_metrics(obs_out, obs_labels,
                                                      obs_idx_train)
            loss_val, score_val = _subset_metrics(obs_out, obs_labels,
                                                  obs_idx_val)
            loss_tt, score_test_tran = _subset_metrics(obs_out, obs_labels,
                                                       obs_idx_test)
            loss_ti, score_test_ind = _subset_metrics(out_all, labels,
                                                      idx_test_ind)
            logger.debug(
                f"Ep {epoch:3d} | loss: {float(loss):.4f} | "
                f"s_train: {score_train:.4f} | s_val: {score_val:.4f} | "
                f"s_tt: {score_test_tran:.4f} | s_ti: {score_test_ind:.4f}"
            )
            loss_and_score.append([epoch, loss_train, loss_val, loss_tt,
                                   loss_ti, score_train, score_val,
                                   score_test_tran, score_test_ind])
            tracker.update(epoch, score_val, state)

        if tracker.count == conf["patience"] or epoch == conf["max_epoch"]:
            break

    logger.info(
        f"mean epoch time: {timer.mean * 1e3:.1f} ms over {timer.count} epochs")
    state = state.restore(tracker.snap)
    if state_out is not None:
        state_out["params"] = state.params
        state_out["batch_stats"] = state.batch_stats
        state_out["best_epoch"] = tracker.best_epoch
    if is_mlp:
        out_all = eval_fn(state.params, state.batch_stats, feats)
        obs_out = out_all[idx_obs]
    else:
        # FINAL log-probs feed out.npz (KL targets): exact tier under
        # the auto policy (reuse eval_fn when the marker cannot change
        # the tier; forced pallas_int8 quantizes by user choice)
        from glnn_tpu import ops
        exact_eval = (make_eval_fn(model, exact=True)
                      if ops.eval_quant_active() else eval_fn)
        obs_out = exact_eval(state.params, state.batch_stats, obs_g,
                             obs_feats)
        out_all = exact_eval(state.params, state.batch_stats, g, feats)
    _, score_val = _subset_metrics(obs_out, obs_labels, obs_idx_val)
    _, score_test_tran = _subset_metrics(obs_out, obs_labels, obs_idx_test)
    _, score_test_ind = _subset_metrics(out_all, labels, idx_test_ind)

    out = np.array(out_all)[:n_real]
    out[np.asarray(idx_obs)] = np.asarray(obs_out)[:n_obs]
    logger.info(
        f"Best valid model at epoch: {tracker.best_epoch:3d}, "
        f"score_val: {score_val:.4f}, "
        f"score_test_tran: {score_test_tran:.4f}, "
        f"score_test_ind: {score_test_ind:.4f}"
    )
    return out, score_val, score_test_tran, score_test_ind


# --------------------------------------------------------------------
# Distillation runners (student = MLP, graph-free)
# --------------------------------------------------------------------

def distill_run_transductive(conf, model, feats, labels, out_t_all,
                             distill_indices, optimizer, logger,
                             loss_and_score, state_out=None):
    """GLNN distillation, transductive. Two optimizer passes per epoch:
    hard labels on idx_l scaled by lamb, then teacher log-probs on
    idx_t scaled by 1-lamb (train_and_eval.py:559-566)."""
    lamb = conf["lamb"]
    idx_l, idx_t, idx_val, idx_test = [jnp.asarray(i) for i in
                                       distill_indices]
    feats = _maybe_shard_data(conf, feats)
    labels = jnp.asarray(labels)
    out_t_all = jnp.asarray(out_t_all)

    feats_l, labels_l = feats[idx_l], labels[idx_l]
    feats_t, out_t = feats[idx_t], out_t_all[idx_t]

    rng = jax.random.PRNGKey(conf["seed"])
    init_rng, run_rng = jax.random.split(rng)
    variables = model.init(init_rng, None, feats)

    from glnn_tpu.train.state import create_train_state
    state = create_train_state(variables, optimizer)

    batch_size = conf["batch_size"]
    hard_epoch = make_mlp_epoch_fn(model, optimizer, batch_size, "nll",
                                   lamb=lamb)
    soft_epoch = make_mlp_epoch_fn(model, optimizer, batch_size, "kl",
                                   lamb=1.0 - lamb)
    eval_fn = make_mlp_eval_fn(model,
                               conf.get("eval_batch_size", batch_size))

    tracker = _BestTracker(state)
    timer = StepTimer()
    for epoch in range(1, conf["max_epoch"] + 1):
        rng_l = jax.random.fold_in(run_rng, 2 * epoch)
        rng_t = jax.random.fold_in(run_rng, 2 * epoch + 1)
        timer.__enter__()
        state, loss_l = hard_epoch(state, feats_l, labels_l, rng_l)
        state, loss_t = soft_epoch(state, feats_t, out_t, rng_t)
        loss = float(loss_l) + float(loss_t)

        timer.__exit__()
        _debug_guard(conf, loss, epoch, "distill runner")
        if epoch % conf["eval_interval"] == 0:
            out = eval_fn(state.params, state.batch_stats, feats)
            # the logged loss_l is the EVAL-mode NLL on the hard-label
            # set (reference re-evaluates before appending,
            # train_and_eval.py:568-583), not the dropout-affected
            # training loss
            loss_l_ev, score_l = _subset_metrics(out, labels, idx_l)
            loss_val, score_val = _subset_metrics(out, labels, idx_val)
            loss_test, score_test = _subset_metrics(out, labels, idx_test)
            logger.debug(
                f"Ep {epoch:3d} | loss: {loss:.4f} | s_l: {score_l:.4f} | "
                f"s_val: {score_val:.4f} | s_test: {score_test:.4f}"
            )
            loss_and_score.append([epoch, loss_l_ev, loss_val, loss_test,
                                   score_l, score_val, score_test])
            tracker.update(epoch, score_val, state)

        if tracker.count == conf["patience"] or epoch == conf["max_epoch"]:
            break

    logger.info(
        f"mean epoch time: {timer.mean * 1e3:.1f} ms over {timer.count} epochs")
    state = state.restore(tracker.snap)
    if state_out is not None:
        state_out["params"] = state.params
        state_out["batch_stats"] = state.batch_stats
        state_out["best_epoch"] = tracker.best_epoch
    out = eval_fn(state.params, state.batch_stats, feats)
    _, score_val = _subset_metrics(out, labels, idx_val)
    _, score_test = _subset_metrics(out, labels, idx_test)
    logger.info(
        f"Best valid model at epoch: {tracker.best_epoch: 3d}, "
        f"score_val: {score_val:.4f}, score_test: {score_test:.4f}"
    )
    return np.asarray(out), score_val, score_test


def distill_run_inductive(conf, model, feats, labels, out_t_all,
                          distill_indices, optimizer, logger,
                          loss_and_score, state_out=None):
    """GLNN distillation, inductive: soft-label set is the OBSERVED
    train+val+test only; final out merges obs predictions
    (train_and_eval.py:737). Returns
    (out, score_val, score_test_tran, score_test_ind)."""
    lamb = conf["lamb"]
    (obs_idx_l, obs_idx_t, obs_idx_val, obs_idx_test, idx_obs,
     idx_test_ind) = [jnp.asarray(i) for i in distill_indices]
    feats = _maybe_shard_data(conf, feats)
    labels = jnp.asarray(labels)
    out_t_all = jnp.asarray(out_t_all)

    obs_feats = feats[idx_obs]
    obs_labels = labels[idx_obs]
    obs_out_t = out_t_all[idx_obs]

    feats_l, labels_l = obs_feats[obs_idx_l], obs_labels[obs_idx_l]
    feats_t, out_t = obs_feats[obs_idx_t], obs_out_t[obs_idx_t]

    rng = jax.random.PRNGKey(conf["seed"])
    init_rng, run_rng = jax.random.split(rng)
    variables = model.init(init_rng, None, feats)

    from glnn_tpu.train.state import create_train_state
    state = create_train_state(variables, optimizer)

    batch_size = conf["batch_size"]
    hard_epoch = make_mlp_epoch_fn(model, optimizer, batch_size, "nll",
                                   lamb=lamb)
    soft_epoch = make_mlp_epoch_fn(model, optimizer, batch_size, "kl",
                                   lamb=1.0 - lamb)
    eval_fn = make_mlp_eval_fn(model,
                               conf.get("eval_batch_size", batch_size))

    tracker = _BestTracker(state)
    timer = StepTimer()
    for epoch in range(1, conf["max_epoch"] + 1):
        rng_l = jax.random.fold_in(run_rng, 2 * epoch)
        rng_t = jax.random.fold_in(run_rng, 2 * epoch + 1)
        timer.__enter__()
        state, loss_l = hard_epoch(state, feats_l, labels_l, rng_l)
        state, loss_t = soft_epoch(state, feats_t, out_t, rng_t)
        loss = float(loss_l) + float(loss_t)

        timer.__exit__()
        _debug_guard(conf, loss, epoch, "distill runner")
        if epoch % conf["eval_interval"] == 0:
            out_all = eval_fn(state.params, state.batch_stats, feats)
            obs_out = out_all[idx_obs]
            # eval-mode losses, 9-field reference row layout
            # (train_and_eval.py:702-714)
            loss_l_ev, score_l = _subset_metrics(obs_out, obs_labels,
                                                 obs_idx_l)
            loss_val, score_val = _subset_metrics(obs_out, obs_labels,
                                                  obs_idx_val)
            loss_tt, score_test_tran = _subset_metrics(
                obs_out, obs_labels, obs_idx_test)
            loss_ti, score_test_ind = _subset_metrics(out_all, labels,
                                                      idx_test_ind)
            logger.debug(
                f"Ep {epoch:3d} | l: {loss:.4f} | s_l: {score_l:.4f} | "
                f"s_val: {score_val:.4f} | s_tt: {score_test_tran:.4f} | "
                f"s_ti: {score_test_ind:.4f}"
            )
            loss_and_score.append([epoch, loss_l_ev, loss_val, loss_tt,
                                   loss_ti, score_l, score_val,
                                   score_test_tran, score_test_ind])
            tracker.update(epoch, score_val, state)

        if tracker.count == conf["patience"] or epoch == conf["max_epoch"]:
            break

    logger.info(
        f"mean epoch time: {timer.mean * 1e3:.1f} ms over {timer.count} epochs")
    state = state.restore(tracker.snap)
    if state_out is not None:
        state_out["params"] = state.params
        state_out["batch_stats"] = state.batch_stats
        state_out["best_epoch"] = tracker.best_epoch
    out_all = eval_fn(state.params, state.batch_stats, feats)
    obs_out = out_all[idx_obs]
    _, score_val = _subset_metrics(obs_out, obs_labels, obs_idx_val)
    _, score_test_tran = _subset_metrics(obs_out, obs_labels, obs_idx_test)
    _, score_test_ind = _subset_metrics(out_all, labels, idx_test_ind)

    out = np.array(out_all)
    out[np.asarray(idx_obs)] = np.asarray(obs_out)
    logger.info(
        f"Best valid model at epoch: {tracker.best_epoch: 3d} "
        f"score_val: {score_val:.4f}, "
        f"score_test_tran: {score_test_tran:.4f}, "
        f"score_test_ind: {score_test_ind:.4f}"
    )
    return out, score_val, score_test_tran, score_test_ind
