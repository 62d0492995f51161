"""Sharded execution: halo-exchange SpMM vs single-device oracle on an
8-virtual-device CPU mesh (SURVEY.md §4 item 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glnn_tpu.distributed.halo import (
    build_halo_graph,
    halo_copy_u_sum,
    shard_features,
)
from glnn_tpu.distributed.mesh import make_mesh
from glnn_tpu.graph.container import build_graph
from glnn_tpu.ops import refops


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8, axis="graph")


def _setup(mesh, n=203, e=1500, f=16, seed=0):
    rs = np.random.RandomState(seed)
    src, dst = rs.randint(0, n, e), rs.randint(0, n, e)
    g = build_graph(src, dst, n)
    hg = build_halo_graph(src, dst, n, mesh)
    x = rs.randn(n, f).astype(np.float32)
    return g, hg, x


def test_halo_spmm_matches_single_device(mesh8):
    g, hg, x = _setup(mesh8)
    xs = shard_features(x, hg)
    out = np.asarray(jax.jit(lambda a: halo_copy_u_sum(hg, a))(xs))
    expect = np.asarray(refops.copy_u_sum(g, jnp.asarray(x)))
    np.testing.assert_allclose(out[: g.n_nodes], expect, rtol=1e-5,
                               atol=1e-5)
    # ghost rows untouched
    assert np.abs(out[g.n_nodes:]).max() == 0.0


def test_halo_spmm_gradient(mesh8):
    g, hg, x = _setup(mesh8, seed=1)
    co = np.random.RandomState(2).randn(hg.n_pad, 16).astype(np.float32)

    def f_halo(a):
        return (halo_copy_u_sum(hg, a) * co).sum()

    def f_ref(a):
        return (refops.copy_u_sum(g, a) * co[: g.n_nodes]).sum()

    gx = np.asarray(jax.jit(jax.grad(f_halo))(shard_features(x, hg)))
    gr = np.asarray(jax.grad(f_ref)(jnp.asarray(x)))
    np.testing.assert_allclose(gx[: g.n_nodes], gr, rtol=1e-5, atol=1e-5)


def test_full_gcn_forward_on_halo_graph(mesh8):
    """The flax GCN runs unchanged on a HaloGraph: sharded activations
    must match the single-device forward (allclose)."""
    from glnn_tpu.nn.models import Model

    g, hg, x = _setup(mesh8, n=264, e=2000, f=24, seed=3)
    model = Model(dict(model_name="GCN", num_layers=2, hidden_dim=32,
                       label_dim=5, dropout_ratio=0.0, norm_type="none"))
    v = model.init(jax.random.PRNGKey(0), g, jnp.asarray(x))
    single = model.apply(v, g, jnp.asarray(x), training=False)[1]

    xs = shard_features(x, hg)
    sharded = jax.jit(
        lambda vv, a: model.apply(vv, hg, a, training=False)[1])(v, xs)
    np.testing.assert_allclose(np.asarray(sharded)[: g.n_nodes],
                               np.asarray(single), rtol=1e-4, atol=1e-4)


def test_full_sage_forward_on_halo_graph(mesh8):
    from glnn_tpu.nn.models import Model

    g, hg, x = _setup(mesh8, n=264, e=2000, f=24, seed=4)
    model = Model(dict(model_name="SAGE", num_layers=2, hidden_dim=32,
                       label_dim=5, dropout_ratio=0.0, norm_type="none"))
    v = model.init(jax.random.PRNGKey(0), g, jnp.asarray(x))
    single = model.apply(v, g, jnp.asarray(x), training=False)[1]
    xs = shard_features(x, hg)
    sharded = jax.jit(
        lambda vv, a: model.apply(vv, hg, a, training=False)[1])(v, xs)
    np.testing.assert_allclose(np.asarray(sharded)[: g.n_nodes],
                               np.asarray(single), rtol=1e-4, atol=1e-4)


def test_sharded_training_step_matches_single_device(mesh8):
    """One full GCN training step on the sharded graph: loss and the
    updated parameters must match the single-device step."""
    from glnn_tpu.nn.models import Model
    from glnn_tpu.train import (create_train_state, make_adam,
                                make_gnn_train_step)

    g, hg, x = _setup(mesh8, n=264, e=2000, f=24, seed=5)
    rs = np.random.RandomState(6)
    labels = rs.randint(0, 5, g.n_nodes)
    labels_pad = np.concatenate([labels, np.zeros(hg.n_pad - g.n_nodes,
                                                  np.int64)])
    idx_train = rs.choice(g.n_nodes, 50, replace=False)

    model = Model(dict(model_name="GCN", num_layers=2, hidden_dim=32,
                       label_dim=5, dropout_ratio=0.0, norm_type="none"))
    opt = make_adam(0.01, 0.0005)
    v = model.init(jax.random.PRNGKey(0), g, jnp.asarray(x))
    step = make_gnn_train_step(model, opt)

    s0 = create_train_state(v, opt)
    s1, loss1 = step(s0, g, jnp.asarray(x), jnp.asarray(labels),
                     jnp.asarray(idx_train), jax.random.PRNGKey(1))

    s0b = create_train_state(v, opt)
    xs = shard_features(x, hg)
    s2, loss2 = step(s0b, hg, xs, jnp.asarray(labels_pad),
                     jnp.asarray(idx_train), jax.random.PRNGKey(1))

    assert abs(float(loss1) - float(loss2)) < 1e-5
    for k1, k2 in zip(jax.tree_util.tree_leaves(s1.params),
                      jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(k1), np.asarray(k2),
                                   rtol=1e-4, atol=1e-5)


def test_halo_edge_ops_match_single_device(mesh8):
    """u_add_v / edge_softmax / u_mul_e_sum on a HaloGraph agree with
    the single-device tier (up to edge ordering: compare aggregated
    outputs)."""
    from glnn_tpu import ops

    g, hg, x = _setup(mesh8, n=203, e=1500, f=8, seed=7)
    rs = np.random.RandomState(7)
    au = rs.randn(g.n_nodes, 3).astype(np.float32)
    av = rs.randn(g.n_nodes, 3).astype(np.float32)
    au_pad = np.concatenate([au, np.zeros((hg.n_pad - g.n_nodes, 3),
                                          np.float32)])
    av_pad = np.concatenate([av, np.zeros((hg.n_pad - g.n_nodes, 3),
                                          np.float32)])

    def agg_single():
        e = ops.u_add_v(g, jnp.asarray(au), jnp.asarray(av))
        alpha = ops.edge_softmax(g, e)
        return ops.u_mul_e_sum(g, jnp.asarray(x), alpha[:, 0])

    def agg_halo():
        from glnn_tpu.distributed.halo import shard_features

        au_s = shard_features(au_pad, hg)
        av_s = shard_features(av_pad, hg)
        xs = shard_features(x, hg)
        e = ops.u_add_v(hg, au_s, av_s)
        alpha = ops.edge_softmax(hg, e)
        return ops.u_mul_e_sum(hg, xs, alpha[:, 0])

    out_s = np.asarray(jax.jit(agg_single)())
    out_h = np.asarray(jax.jit(agg_halo)())[: g.n_nodes]
    np.testing.assert_allclose(out_h, out_s, rtol=1e-4, atol=1e-4)


def test_full_gat_forward_on_halo_graph(mesh8):
    from glnn_tpu.nn.models import Model

    g, hg, x = _setup(mesh8, n=203, e=1500, f=12, seed=8)
    model = Model(dict(model_name="GAT", num_layers=2, hidden_dim=16,
                       label_dim=4, dropout_ratio=0.0, num_heads=4,
                       attn_dropout_ratio=0.0))
    v = model.init(jax.random.PRNGKey(0), g, jnp.asarray(x))
    single = model.apply(v, g, jnp.asarray(x), training=False)[1]
    xs = shard_features(x, hg)
    sharded = jax.jit(
        lambda vv, a: model.apply(vv, hg, a, training=False)[1])(v, xs)
    np.testing.assert_allclose(np.asarray(sharded)[: g.n_nodes],
                               np.asarray(single), rtol=1e-4, atol=1e-4)


def test_full_appnp_forward_on_halo_graph(mesh8):
    from glnn_tpu.nn.models import Model

    g, hg, x = _setup(mesh8, n=203, e=1500, f=12, seed=9)
    model = Model(dict(model_name="APPNP", num_layers=2, hidden_dim=16,
                       label_dim=4, dropout_ratio=0.0, norm_type="none"))
    v = model.init(jax.random.PRNGKey(0), g, jnp.asarray(x))
    single = model.apply(v, g, jnp.asarray(x), training=False)[1]
    xs = shard_features(x, hg)
    sharded = jax.jit(
        lambda vv, a: model.apply(vv, hg, a, training=False)[1])(v, xs)
    np.testing.assert_allclose(np.asarray(sharded)[: g.n_nodes],
                               np.asarray(single), rtol=1e-4, atol=1e-4)


def test_dp_student_epoch_matches_single_device(mesh8):
    """Data-parallel MLP distillation epoch: identical RNG -> identical
    losses and parameters whether inputs are replicated or row-sharded
    over the data axis."""
    from jax.sharding import NamedSharding, PartitionSpec as SP

    from glnn_tpu.nn.models import Model
    from glnn_tpu.train import (create_train_state, make_adam,
                                make_mlp_epoch_fn)

    dmesh = make_mesh(8, axis="data")
    rs = np.random.RandomState(10)
    n, f, c = 512, 16, 5
    feats = rs.randn(n, f).astype(np.float32)
    labels = rs.randint(0, c, n)

    model = Model(dict(model_name="MLP", num_layers=2, hidden_dim=32,
                       label_dim=c, dropout_ratio=0.0, norm_type="none"))
    opt = make_adam(0.01, 0.0)
    v = model.init(jax.random.PRNGKey(0), None, feats[:2])
    epoch_fn = make_mlp_epoch_fn(model, opt, batch_size=64, criterion="nll")

    s1 = create_train_state(v, opt)
    s1, l1 = epoch_fn(s1, jnp.asarray(feats), jnp.asarray(labels),
                      jax.random.PRNGKey(3))

    s2 = create_train_state(v, opt)
    feats_dp = jax.device_put(feats, NamedSharding(dmesh, SP("data", None)))
    labels_dp = jax.device_put(labels, NamedSharding(dmesh, SP("data")))
    s2, l2 = epoch_fn(s2, feats_dp, labels_dp, jax.random.PRNGKey(3))

    assert abs(float(l1) - float(l2)) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------
# Distributed neighbor-sampled training (distributed/sampling.py)
# ---------------------------------------------------------------------

def test_fetch_rows_matches_local_gather(mesh8):
    """Two-all_to_all distributed row gather == plain x[idx], ghosts
    (idx >= n_pad) fetch zeros."""
    from glnn_tpu.distributed.sampling import fetch_rows, shard_rows

    rs = np.random.RandomState(3)
    n, f, c = 203, 12, 37
    x = rs.randn(n, f).astype(np.float32)
    x_sh = shard_rows(mesh8, "graph", x)
    n_pad = x_sh.shape[0]

    idx = rs.randint(0, n_pad + 2, (8, c))           # some ghosts
    got = np.asarray(fetch_rows(mesh8, "graph", x_sh, jnp.asarray(idx)))

    x_pad = np.zeros((n_pad + 2, f), np.float32)
    x_pad[:n] = x
    want = x_pad[np.minimum(idx, n_pad)]
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_dp_sampled_sage_epoch_takeall_matches_single_device(mesh8):
    """With fanouts >= max in-degree sampling is deterministic
    (take-all), so the data-parallel sampled epoch must reproduce the
    single-device sampled epoch exactly: same shuffle rng, same global
    masked-mean loss, same Adam trajectory."""
    from glnn_tpu.distributed.sampling import (
        make_dp_sampled_sage_epoch_fn, shard_rows)
    from glnn_tpu.nn.models import Model
    from glnn_tpu.train import create_train_state, make_adam
    from glnn_tpu.train.sage_sampled import make_sage_sampled_epoch_fn

    dmesh = make_mesh(8, axis="dp")
    rs = np.random.RandomState(11)
    n, e, f, c = 257, 900, 16, 5
    src, dst = rs.randint(0, n, e), rs.randint(0, n, e)
    g = build_graph(src, dst, n)
    max_deg = int(np.bincount(np.asarray(dst), minlength=n).max())
    feats = rs.randn(n, f).astype(np.float32)
    labels = rs.randint(0, c, n)
    idx_train = np.sort(rs.choice(n, 150, replace=False))

    model = Model(dict(model_name="SAGE", num_layers=2, hidden_dim=32,
                       label_dim=c, dropout_ratio=0.0, norm_type="none"))
    opt = make_adam(0.01, 0.0)
    v = model.init(jax.random.PRNGKey(0), g, jnp.asarray(feats))

    fanouts = (max_deg, max_deg)
    b = 64                                            # divisible by 8

    s1 = create_train_state(v, opt)
    ep1 = make_sage_sampled_epoch_fn(model, opt, b, fanouts)
    s1, l1, _ = ep1(s1, g, jnp.asarray(feats), jnp.asarray(labels),
                    jnp.asarray(idx_train), jax.random.PRNGKey(7))

    s2 = create_train_state(v, opt)
    ep2 = make_dp_sampled_sage_epoch_fn(model, opt, b, fanouts, dmesh,
                                        axis="dp")
    x_sh = shard_rows(dmesh, "dp", feats)
    s2, l2, ovf = ep2(s2, g, x_sh, jnp.asarray(labels),
                      jnp.asarray(idx_train), jax.random.PRNGKey(7))

    assert not bool(np.asarray(ovf).any())   # (frontier, fetch) flags
    assert abs(float(l1) - float(l2)) < 1e-5
    for a, b2 in zip(jax.tree_util.tree_leaves(s1.params),
                     jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   rtol=2e-4, atol=2e-5)


def test_dp_sampled_sage_epoch_batchnorm_runs(mesh8):
    """Sampled DP epoch with batch-norm (per-device stats, pmean'd):
    runs, finite loss, params and stats stay replicated-consistent."""
    from glnn_tpu.distributed.sampling import (
        make_dp_sampled_sage_epoch_fn, shard_rows)
    from glnn_tpu.nn.models import Model
    from glnn_tpu.train import create_train_state, make_adam

    dmesh = make_mesh(8, axis="dp")
    rs = np.random.RandomState(12)
    n, e, f, c = 300, 1800, 16, 4
    src, dst = rs.randint(0, n, e), rs.randint(0, n, e)
    g = build_graph(src, dst, n)
    feats = rs.randn(n, f).astype(np.float32)
    labels = rs.randint(0, c, n)
    idx_train = np.sort(rs.choice(n, 120, replace=False))

    model = Model(dict(model_name="SAGE", num_layers=2, hidden_dim=32,
                       label_dim=c, dropout_ratio=0.3, norm_type="batch"))
    opt = make_adam(0.01, 0.0)
    v = model.init(jax.random.PRNGKey(0), g, jnp.asarray(feats))
    st = create_train_state(v, opt)

    ep = make_dp_sampled_sage_epoch_fn(model, opt, 40, (3, 5), dmesh,
                                       axis="dp")
    x_sh = shard_rows(dmesh, "dp", feats)
    st, loss, _ = ep(st, g, x_sh, jnp.asarray(labels),
                     jnp.asarray(idx_train), jax.random.PRNGKey(9))
    assert np.isfinite(float(loss))
    assert int(st.step) == 3                          # ceil(120/40) batches


def test_halo_pallas_plans_match_single_device(mesh8):
    """Pallas-tier sharded aggregation (per-shard plans, spmm_rect in
    shard_map) == single-device oracle, forward and gradient."""
    from glnn_tpu import ops as gops

    rs = np.random.RandomState(21)
    n, e, f = 203, 1500, 16
    src, dst = rs.randint(0, n, e), rs.randint(0, n, e)
    g = build_graph(src, dst, n)
    hg = build_halo_graph(src, dst, n, mesh8, build_plans=True,
                          plan_tile=128, plan_block_rows=16)
    x = rs.randn(n, f).astype(np.float32)

    want = np.asarray(refops.copy_u_sum(g, jnp.asarray(x)))
    x_sh = shard_features(x, hg)

    gops.set_backend("pallas")       # force the planned path off-TPU
    try:
        got = np.asarray(halo_copy_u_sum(hg, x_sh))[:n]
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)

        def loss_sharded(xx):
            return jnp.sum(halo_copy_u_sum(hg, xx) ** 2)

        def loss_single(xx):
            return jnp.sum(refops.copy_u_sum(g, xx) ** 2)

        g_sh = np.asarray(jax.grad(loss_sharded)(x_sh))[:n]
        g_1d = np.asarray(jax.grad(loss_single)(jnp.asarray(x)))
        # bf16 message rounding: absolute error scales with the gradient
        # magnitude. Scale by a robust per-element statistic (RMS of the
        # whole gradient, not a single max entry — ADVICE r1); no extra
        # fixed cap, since sums of ~deg bf16 messages legitimately carry
        # O(1e-2 * RMS) rounding error regardless of any one element.
        scale = float(np.sqrt(np.mean(g_1d ** 2)))
        np.testing.assert_allclose(g_sh, g_1d, rtol=5e-2,
                                   atol=2e-2 * scale)
    finally:
        gops.set_backend("auto")


def test_fetch_rows_compact_matches_aligned(mesh8):
    """Compact (bucketed) fetch == aligned fetch == direct numpy gather;
    traffic ~2CF instead of PCF (VERDICT r1 weak #4)."""
    from glnn_tpu.distributed.sampling import (
        fetch_rows, fetch_rows_compact, shard_rows)

    rs = np.random.RandomState(33)
    n, f, c = 1000, 16, 96
    x = rs.randn(n, f).astype(np.float32)
    xs = shard_rows(mesh8, "graph", x)
    n_pad = xs.shape[0]
    idx = rs.randint(0, n, (8, c)).astype(np.int32)
    # sprinkle ghosts
    idx[2, 5] = n_pad
    idx[7, 0] = n_pad

    want = np.asarray(fetch_rows(mesh8, "graph", xs, jnp.asarray(idx)))
    got, ovf = fetch_rows_compact(mesh8, "graph", xs, jnp.asarray(idx))
    assert not bool(ovf)
    np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=0)

    x_ext = np.concatenate([x, np.zeros((n_pad - n + 1, f), np.float32)])
    np.testing.assert_allclose(want, x_ext[np.minimum(idx, n_pad)],
                               rtol=1e-6, atol=1e-6)


def test_fetch_rows_compact_overflow_flag(mesh8):
    """All requests owned by one shard with slack 1 -> overflow True,
    overflowing rows zero-filled (never garbage)."""
    from glnn_tpu.distributed.sampling import fetch_rows_compact, shard_rows

    rs = np.random.RandomState(34)
    n, f, c = 800, 8, 64
    x = rs.randn(n, f).astype(np.float32)
    xs = shard_rows(mesh8, "graph", x)
    idx = np.zeros((8, c), np.int32)      # every slot owned by shard 0
    got, ovf = fetch_rows_compact(mesh8, "graph", xs, jnp.asarray(idx),
                                  slack=1.0)
    assert bool(ovf)
    got = np.asarray(got)
    # served slots carry row 0, dropped slots are exact zeros
    row0 = x[0]
    served = np.isclose(got, row0[None, None, :]).all(-1)
    dropped = (got == 0).all(-1)
    assert ((served | dropped)).all()
    assert served.any() and dropped.any()


def test_fused_halo_gat_attention_matches_single_device(mesh8):
    """VERDICT r3 task 7: the fused slot-space attention runs per
    shard over combined (local + halo) edges with sources indexing
    [local rows; recv buffer] — fwd AND grads must match the
    single-device oracle compose."""
    from glnn_tpu.distributed.halo import (build_halo_graph,
                                           halo_gat_attention)
    from glnn_tpu.ops import refops

    rs = np.random.RandomState(31)
    n, e, h, d = 203, 1500, 2, 8
    src, dst = rs.randint(0, n, e), rs.randint(0, n, e)
    g = build_graph(src, dst, n)
    hg = build_halo_graph(src, dst, n, mesh8, attention_plans=True)
    assert hg.att is not None
    feat = jnp.asarray(rs.randn(n, h, d).astype(np.float32))
    al = jnp.asarray(rs.randn(h, d).astype(np.float32) * 0.3)
    ar = jnp.asarray(rs.randn(h, d).astype(np.float32) * 0.3)

    def ref(f, a, b):
        # src-path bf16 rounding mirrors the fused kernel (see
        # tests/test_pallas.py grads test): the r5 backward recomputes
        # from the forward's SAVED bf16 slots, so its gradient is exact
        # for THIS function; vs the pure-f32 compose, kink-crossing
        # edges differ by up to ~7% (bf16-forward property)
        fr = f.astype(jnp.bfloat16).astype(jnp.float32)
        el = jnp.sum(fr * a.astype(jnp.bfloat16).astype(jnp.float32)[None],
                     -1)
        er = jnp.sum(f * b[None], -1)
        s = refops.u_add_v(g, el, er)
        s = jnp.where(s >= 0, s, 0.2 * s)
        alpha = refops.edge_softmax(g, s)
        return refops.u_mul_e_sum(g, fr, alpha)

    pad = hg.n_pad - n
    feat_p = jnp.pad(feat, ((0, pad), (0, 0), (0, 0)))
    fused = jax.jit(lambda f, a, b: halo_gat_attention(
        hg, f, a, b, fused=True))
    out = np.asarray(fused(feat_p, al, ar))[:n]
    want = np.asarray(ref(feat, al, ar))
    scale = np.abs(want).max()
    np.testing.assert_allclose(out, want, rtol=2e-2, atol=scale * 1e-2)

    def loss_f(f, a, b):
        return jnp.sum(jnp.sin(fused(f, a, b)[:n]))

    def loss_r(f, a, b):
        return jnp.sum(jnp.sin(ref(f, a, b)))

    gf = jax.grad(loss_f, argnums=(0, 1, 2))(feat_p, al, ar)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(feat, al, ar)
    for got, want_g in zip((gf[0][:n], gf[1], gf[2]), gr):
        got, want_g = np.asarray(got), np.asarray(want_g)
        s = np.abs(want_g).max() + 1e-6
        assert np.abs(got - want_g).max() / s < 3e-2


def test_fused_halo_gat_attention_dropout_deterministic(mesh8):
    from glnn_tpu.distributed.halo import (build_halo_graph,
                                           halo_gat_attention)

    rs = np.random.RandomState(33)
    n, e, h, d = 150, 900, 2, 8
    src, dst = rs.randint(0, n, e), rs.randint(0, n, e)
    hg = build_halo_graph(src, dst, n, mesh8, attention_plans=True)
    feat = jnp.pad(jnp.asarray(rs.randn(n, h, d).astype(np.float32)),
                   ((0, hg.n_pad - n), (0, 0), (0, 0)))
    al = jnp.asarray(rs.randn(h, d).astype(np.float32) * 0.3)
    ar = jnp.asarray(rs.randn(h, d).astype(np.float32) * 0.3)
    rng = jax.random.PRNGKey(5)
    o1 = np.asarray(halo_gat_attention(hg, feat, al, ar, drop_rate=0.4,
                                       drop_rng=rng, fused=True))
    o2 = np.asarray(halo_gat_attention(hg, feat, al, ar, drop_rate=0.4,
                                       drop_rng=rng, fused=True))
    assert (o1 == o2).all()
    o3 = np.asarray(halo_gat_attention(hg, feat, al, ar, fused=True))
    assert np.abs(o1 - o3).max() > 1e-4     # dropout actually applied


# --------------------------------------------------------------------
# r5: planned (slot-space kernel) tiers of halo_edge_softmax /
# halo_u_mul_e_sum — sharded APPNP / GAT per-op fallback no longer
# drop to XLA segment ops when attention plans are present
# --------------------------------------------------------------------


def _att_setup(mesh, n=203, e=1500, seed=3):
    rs = np.random.RandomState(seed)
    src, dst = rs.randint(0, n, e), rs.randint(0, n, e)
    g = build_graph(src, dst, n)
    hg = build_halo_graph(src, dst, n, mesh, attention_plans=True)
    assert hg.att is not None and hg.att_maps is not None
    return g, hg


def _force_pallas():
    from glnn_tpu import ops

    ops.set_backend("pallas")
    return ops


def test_planned_halo_edge_softmax_matches_xla_tier(mesh8):
    from glnn_tpu.distributed.halo import halo_edge_softmax

    g, hg = _att_setup(mesh8)
    rs = np.random.RandomState(5)
    et = hg.e_local + hg.e_halo
    scores = jnp.asarray(rs.randn(hg.n_shards * et, 3).astype(np.float32))
    want = np.asarray(halo_edge_softmax(hg, scores))     # XLA tier (auto/cpu)
    ops = _force_pallas()
    try:
        got = np.asarray(jax.jit(
            lambda s: halo_edge_softmax(hg, s))(scores))
        # grads too
        def loss(fn, s):
            return jnp.sum(jnp.cos(fn(hg, s)))
        d_got = np.asarray(jax.grad(
            lambda s: loss(halo_edge_softmax, s))(scores))
    finally:
        ops.set_backend("auto")
    d_want = np.asarray(jax.grad(
        lambda s: jnp.sum(jnp.cos(halo_edge_softmax(hg, s))))(scores))
    # ghost edges: the XLA tier computes softmax over ghost segments
    # too (dst=rows ghost row) while the planned tier zeroes them; only
    # compare real-edge entries
    real = np.zeros(hg.n_shards * et, bool)
    lc = np.asarray((hg.local_dst < hg.rows_per_shard).sum(axis=1))
    hc = np.asarray((hg.halo_dst < hg.rows_per_shard).sum(axis=1))
    for p in range(hg.n_shards):
        real[p * et: p * et + lc[p]] = True
        real[p * et + hg.e_local: p * et + hg.e_local + hc[p]] = True
    np.testing.assert_allclose(got[real], want[real], rtol=5e-5,
                               atol=1e-5)
    np.testing.assert_allclose(d_got[real], d_want[real], rtol=5e-4,
                               atol=1e-5)


def test_planned_halo_u_mul_e_sum_matches_xla_tier(mesh8):
    from glnn_tpu.distributed.halo import halo_u_mul_e_sum

    g, hg = _att_setup(mesh8)
    rs = np.random.RandomState(7)
    et = hg.e_local + hg.e_halo
    n_pad = hg.n_pad
    for shape_x, shape_e in [((n_pad, 16), (hg.n_shards * et,)),
                             ((n_pad, 2, 8), (hg.n_shards * et, 2))]:
        x = jnp.asarray(rs.randn(*shape_x).astype(np.float32))
        e = jnp.asarray(rs.rand(*shape_e).astype(np.float32))
        want = np.asarray(halo_u_mul_e_sum(hg, x, e))
        ops = _force_pallas()
        try:
            got = np.asarray(jax.jit(
                lambda a, b: halo_u_mul_e_sum(hg, a, b))(x, e))
            co = jnp.asarray(rs.randn(*want.shape).astype(np.float32))
            gx_p, ge_p = jax.grad(
                lambda a, b: (halo_u_mul_e_sum(hg, a, b) * co).sum(),
                argnums=(0, 1))(x, e)
        finally:
            ops.set_backend("auto")
        scale = np.abs(want).max() + 1e-6
        np.testing.assert_allclose(got, want, rtol=2e-2,
                                   atol=scale * 1e-2)
        gx_r, ge_r = jax.grad(
            lambda a, b: (halo_u_mul_e_sum(hg, a, b) * co).sum(),
            argnums=(0, 1))(x, e)
        np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                                   rtol=2e-2, atol=5e-2)
        # real edges only: ghost-edge weight cotangents are zeroed by
        # the planned tier (the XLA tier leaks ghost-segment values)
        lc = np.asarray((hg.local_dst < hg.rows_per_shard).sum(axis=1))
        hc = np.asarray((hg.halo_dst < hg.rows_per_shard).sum(axis=1))
        real = np.zeros(hg.n_shards * et, bool)
        for p in range(hg.n_shards):
            real[p * et: p * et + lc[p]] = True
            real[p * et + hg.e_local: p * et + hg.e_local + hc[p]] = True
        np.testing.assert_allclose(np.asarray(ge_p)[real],
                                   np.asarray(ge_r)[real],
                                   rtol=2e-2, atol=5e-2)


def test_halo_u_mul_e_sum_broadcast_weights_fall_back(mesh8):
    """e [P*Et, F] elementwise-broadcast weights are NOT a planned-tier
    shape (review r5: _w_slot_messages would mis-fold them); with the
    pallas backend forced they must still produce the XLA tier's
    result."""
    from glnn_tpu.distributed.halo import halo_u_mul_e_sum

    g, hg = _att_setup(mesh8, seed=9)
    rs = np.random.RandomState(9)
    et = hg.e_local + hg.e_halo
    x = jnp.asarray(rs.randn(hg.n_pad, 8).astype(np.float32))
    e = jnp.asarray(rs.rand(hg.n_shards * et, 8).astype(np.float32))
    want = np.asarray(halo_u_mul_e_sum(hg, x, e))
    ops = _force_pallas()
    try:
        got = np.asarray(jax.jit(
            lambda a, b: halo_u_mul_e_sum(hg, a, b))(x, e))
    finally:
        ops.set_backend("auto")
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_planned_halo_u_mul_e_sum_scalar_weights_multihead_x(mesh8):
    """(3-D x, 1-D e): scalar per-edge weights broadcast over heads —
    in-contract per the docstring and handled by the planned tier's
    flattened-row multiply (review r5 follow-up: an earlier guard fix
    accidentally excluded it)."""
    from glnn_tpu.distributed.halo import halo_u_mul_e_sum

    g, hg = _att_setup(mesh8, seed=11)
    rs = np.random.RandomState(11)
    et = hg.e_local + hg.e_halo
    x = jnp.asarray(rs.randn(hg.n_pad, 2, 8).astype(np.float32))
    e = jnp.asarray(rs.rand(hg.n_shards * et).astype(np.float32))
    want = np.asarray(halo_u_mul_e_sum(hg, x, e))     # XLA tier
    ops = _force_pallas()
    try:
        got = np.asarray(jax.jit(
            lambda a, b: halo_u_mul_e_sum(hg, a, b))(x, e))
        co = jnp.asarray(rs.randn(*want.shape).astype(np.float32))
        gx_p, ge_p = jax.grad(
            lambda a, b: (halo_u_mul_e_sum(hg, a, b) * co).sum(),
            argnums=(0, 1))(x, e)
    finally:
        ops.set_backend("auto")
    scale = np.abs(want).max() + 1e-6
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=scale * 1e-2)
    gx_r, ge_r = jax.grad(
        lambda a, b: (halo_u_mul_e_sum(hg, a, b) * co).sum(),
        argnums=(0, 1))(x, e)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               rtol=2e-2, atol=5e-2)


def test_attach_attention_plans_matches_build_flag(mesh8):
    """attach_attention_plans on an existing HaloGraph produces the
    same plans/maps as build_halo_graph(attention_plans=True)."""
    from glnn_tpu.distributed.halo import attach_attention_plans

    rs = np.random.RandomState(17)
    n, e = 203, 1500
    src, dst = rs.randint(0, n, e), rs.randint(0, n, e)
    hg_a = build_halo_graph(src, dst, n, mesh8, attention_plans=True)
    hg_b = attach_attention_plans(build_halo_graph(src, dst, n, mesh8))
    assert hg_b.att is not None and hg_b.att_maps is not None
    for f in ("src_idx", "slot_edge", "edge_slot", "rec_lane",
              "rec_sub"):
        np.testing.assert_array_equal(
            np.asarray(getattr(hg_a.att, f)),
            np.asarray(getattr(hg_b.att, f)))
    for i in range(2):
        np.testing.assert_array_equal(np.asarray(hg_a.att_maps[i]),
                                      np.asarray(hg_b.att_maps[i]))
