"""Tier-A op parity vs dense-adjacency oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glnn_tpu.graph.container import build_graph
from glnn_tpu.ops import refops
from tests.conftest import dense_adj


def _rand_graph(n=64, e=400, seed=0):
    rs = np.random.RandomState(seed)
    src = rs.randint(0, n, e)
    dst = rs.randint(0, n, e)
    return src, dst, n


def test_copy_u_sum_matches_dense():
    src, dst, n = _rand_graph()
    g = build_graph(src, dst, n)
    x = np.random.RandomState(1).randn(n, 16).astype(np.float32)
    A = np.zeros((n, n), np.float32)
    np.add.at(A, (dst, src), 1.0)
    np.testing.assert_allclose(refops.copy_u_sum(g, jnp.asarray(x)), A @ x,
                               rtol=1e-5, atol=1e-5)


def test_copy_u_sum_padding_equivalence():
    src, dst, n = _rand_graph()
    x = np.random.RandomState(1).randn(n, 8).astype(np.float32)
    g = build_graph(src, dst, n)
    g_pad = build_graph(src, dst, n, pad_to=512)
    np.testing.assert_allclose(
        refops.copy_u_sum(g, jnp.asarray(x)),
        refops.copy_u_sum(g_pad, jnp.asarray(x)), rtol=1e-5, atol=1e-5,
    )


def test_copy_u_mean():
    src, dst, n = _rand_graph()
    g = build_graph(src, dst, n)
    x = np.random.RandomState(2).randn(n, 4).astype(np.float32)
    A = np.zeros((n, n), np.float32)
    np.add.at(A, (dst, src), 1.0)
    deg = np.maximum(A.sum(1), 1.0)
    np.testing.assert_allclose(refops.copy_u_mean(g, jnp.asarray(x)),
                               (A @ x) / deg[:, None], rtol=1e-5, atol=1e-5)


def test_u_mul_e_sum():
    src, dst, n = _rand_graph()
    g = build_graph(src, dst, n)
    rs = np.random.RandomState(3)
    x = rs.randn(n, 4).astype(np.float32)
    # edge values must follow the dst-sorted edge order of the container
    e = rs.randn(g.e_pad).astype(np.float32)
    out = refops.u_mul_e_sum(g, jnp.asarray(x), jnp.asarray(e))
    senders = np.asarray(g.senders)
    receivers = np.asarray(g.receivers)
    expect = np.zeros((n, 4), np.float32)
    for k in range(g.e_pad):
        expect[receivers[k]] += e[k] * x[senders[k]]
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)


def test_edge_softmax_sums_to_one_per_dst():
    src, dst, n = _rand_graph()
    g = build_graph(src, dst, n)
    scores = jnp.asarray(np.random.RandomState(4).randn(g.e_pad, 3),
                         jnp.float32)
    alpha = refops.edge_softmax(g, scores)
    sums = jax.ops.segment_sum(alpha, g.receivers, num_segments=n + 1)[:n]
    in_deg = np.asarray(g.in_degrees)
    mask = in_deg > 0
    np.testing.assert_allclose(np.asarray(sums)[mask],
                               np.ones((mask.sum(), 3)), rtol=1e-5, atol=1e-5)


def test_edge_softmax_matches_dense():
    src, dst, n = _rand_graph(n=16, e=60, seed=7)
    g = build_graph(src, dst, n)
    scores = np.random.RandomState(5).randn(g.e_pad).astype(np.float32)
    alpha = np.asarray(refops.edge_softmax(g, jnp.asarray(scores)))
    receivers = np.asarray(g.receivers)
    for v in range(n):
        m = receivers == v
        if m.sum() == 0:
            continue
        ex = np.exp(scores[m] - scores[m].max())
        np.testing.assert_allclose(alpha[m], ex / ex.sum(), rtol=1e-5,
                                   atol=1e-6)


def test_gcn_norm_both_matches_dense(tiny_graph):
    g = tiny_graph
    G = g.to_device()
    x = g.ndata["feat"]
    A = dense_adj(g)
    din = np.maximum(A.sum(1), 1.0)
    dout = np.maximum(A.sum(0), 1.0)
    expect = (A * (din ** -0.5)[:, None] * (dout ** -0.5)[None, :]) @ x
    np.testing.assert_allclose(refops.gcn_norm_both(G, jnp.asarray(x)),
                               expect, rtol=1e-5, atol=1e-5)


def test_u_add_v():
    src, dst, n = _rand_graph(n=10, e=30)
    g = build_graph(src, dst, n)
    au = np.random.RandomState(6).randn(n, 2).astype(np.float32)
    av = np.random.RandomState(7).randn(n, 2).astype(np.float32)
    out = np.asarray(refops.u_add_v(g, jnp.asarray(au), jnp.asarray(av)))
    senders, receivers = np.asarray(g.senders), np.asarray(g.receivers)
    np.testing.assert_allclose(out, au[senders] + av[receivers], rtol=1e-6)


def test_chunked_copy_u_sum_matches():
    src, dst, n = _rand_graph(n=128, e=3000, seed=9)
    g = build_graph(src, dst, n)
    x = jnp.asarray(np.random.RandomState(9).randn(n, 16).astype(np.float32))
    full = refops.copy_u_sum(g, x)
    chunked = refops.copy_u_sum_chunked(g, x, budget_bytes=16 * 512)
    np.testing.assert_allclose(chunked, full, rtol=1e-5, atol=1e-5)


def test_chunked_gradient_matches():
    import jax

    src, dst, n = _rand_graph(n=64, e=500, seed=10)
    g = build_graph(src, dst, n)
    x = jnp.asarray(np.random.RandomState(10).randn(n, 8).astype(np.float32))
    g1 = jax.grad(lambda z: refops.copy_u_sum(g, z).sum())(x)
    g2 = jax.grad(
        lambda z: refops.copy_u_sum_chunked(g, z, budget_bytes=2048).sum()
    )(x)
    np.testing.assert_allclose(g1, g2, rtol=1e-5, atol=1e-5)


def test_inference_mode_selects_int8_tier(monkeypatch):
    """VERDICT r3 task 4a: eval/inference traces (marked by
    ops.inference_mode) pick the int8 gather tier under the auto
    backend; set_eval_quant(False) and explicit backends opt out."""
    from glnn_tpu import ops as gops

    assert gops.get_backend() == "auto"
    assert gops._unweighted_tier() == "bf16"          # training path
    with gops.inference_mode():
        assert gops._unweighted_tier() == "int8"      # eval path
        with gops.inference_mode():
            assert gops._unweighted_tier() == "int8"  # re-entrant
        assert gops._unweighted_tier() == "int8"
    assert gops._unweighted_tier() == "bf16"

    gops.set_eval_quant(False)                        # --exact_eval
    try:
        with gops.inference_mode():
            assert gops._unweighted_tier() == "bf16"
    finally:
        gops.set_eval_quant(True)

    gops.set_backend("pallas")                        # explicit tier wins
    try:
        with gops.inference_mode():
            assert gops._unweighted_tier() == "bf16"
        gops.set_backend("pallas_int8")
        assert gops._unweighted_tier() == "int8"      # even in training
    finally:
        gops.set_backend("auto")

    # dispatch: copy_u_sum routes to the int8 op inside inference_mode
    from glnn_tpu.ops import spmm_pallas

    src, dst, n = _rand_graph(n=64, e=400, seed=21)
    g = build_graph(src, dst, n).with_plans(softmax=False)
    x = jnp.asarray(np.random.RandomState(2).randn(n, 8).astype(np.float32))
    hits = []
    orig = spmm_pallas.copy_u_sum_int8
    monkeypatch.setattr(spmm_pallas, "copy_u_sum_int8",
                        lambda *a: hits.append(1) or orig(*a))
    monkeypatch.setattr(gops, "_use_pallas", lambda g_, x_: True)
    from glnn_tpu import ops as o2
    with o2.inference_mode():
        got = np.asarray(o2.copy_u_sum(g, x))
    assert hits
    want = np.asarray(refops.copy_u_sum(g, x))
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-6)
    assert err < 0.05


def test_eval_fn_marks_inference_mode(monkeypatch):
    """make_eval_fn's trace must run inside ops.inference_mode (the
    int8 eval tier depends on the marker being present at trace time)."""
    from glnn_tpu import ops as gops
    from glnn_tpu.nn.models import Model
    from glnn_tpu.train.engine import make_eval_fn

    src, dst, n = _rand_graph(n=48, e=300, seed=22)
    g = build_graph(src, dst, n)
    x = jnp.asarray(np.random.RandomState(3).randn(n, 8).astype(np.float32))
    model = Model(dict(model_name="GCN", num_layers=2, hidden_dim=16,
                       label_dim=4, dropout_ratio=0.0, norm_type="none"))
    variables = model.init(__import__("jax").random.PRNGKey(0), g, x)
    seen = []
    orig = gops.copy_u_sum
    monkeypatch.setattr(gops, "copy_u_sum",
                        lambda *a: seen.append(gops._IN_EVAL) or orig(*a))
    fn = make_eval_fn(model)
    fn(variables["params"], variables.get("batch_stats", {}), g, x)
    assert seen and all(seen)


def test_exact_eval_fn_skips_inference_mode(monkeypatch):
    """The runners' FINAL all-node eval (whose log-probs become the
    out.npz distillation targets) must NOT carry the inference_mode
    marker — the int8 tier is for intermediate argmax scoring only."""
    from glnn_tpu import ops as gops
    from glnn_tpu.nn.models import Model
    from glnn_tpu.train.engine import make_eval_fn

    src, dst, n = _rand_graph(n=48, e=300, seed=23)
    g = build_graph(src, dst, n)
    x = jnp.asarray(np.random.RandomState(4).randn(n, 8).astype(np.float32))
    model = Model(dict(model_name="GCN", num_layers=2, hidden_dim=16,
                       label_dim=4, dropout_ratio=0.0, norm_type="none"))
    variables = model.init(__import__("jax").random.PRNGKey(0), g, x)
    seen = []
    orig = gops.copy_u_sum
    monkeypatch.setattr(gops, "copy_u_sum",
                        lambda *a: seen.append(gops._IN_EVAL) or orig(*a))
    fn = make_eval_fn(model, exact=True)
    fn(variables["params"], variables.get("batch_stats", {}), g, x)
    assert seen and not any(seen)
