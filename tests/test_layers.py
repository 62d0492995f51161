"""Layer-math parity vs the DGL 0.6.1 formulas (SURVEY.md §2.2)."""

import jax
import jax.numpy as jnp
import numpy as np

from glnn_tpu.nn.layers import GATConv, GraphConv, SAGEConvGCN, appnp_propagate
from glnn_tpu.nn.models import GAT, GCN, MLP, SAGE, Model
from tests.conftest import dense_adj


def test_sage_conv_gcn_formula(tiny_graph):
    g = tiny_graph
    G = g.to_device()
    x = jnp.asarray(g.ndata["feat"])
    layer = SAGEConvGCN(4)
    v = layer.init(jax.random.PRNGKey(0), G, x)
    out = layer.apply(v, G, x)

    A = dense_adj(g)
    deg = A.sum(1)
    htilde = (A @ np.asarray(x) + np.asarray(x)) / (deg[:, None] + 1.0)
    W = np.asarray(v["params"]["Dense_0"]["kernel"])
    b = np.asarray(v["params"]["Dense_0"]["bias"])
    np.testing.assert_allclose(out, htilde @ W + b, rtol=1e-5, atol=1e-5)


def test_graph_conv_formula(tiny_graph):
    g = tiny_graph
    G = g.to_device()
    x = jnp.asarray(g.ndata["feat"])
    layer = GraphConv(4)
    v = layer.init(jax.random.PRNGKey(0), G, x)
    out = layer.apply(v, G, x)

    A = dense_adj(g)
    din = np.maximum(A.sum(1), 1.0) ** -0.5
    dout = np.maximum(A.sum(0), 1.0) ** -0.5
    W = np.asarray(v["params"]["kernel"])
    b = np.asarray(v["params"]["bias"])
    expect = (A * din[:, None] * dout[None, :]) @ np.asarray(x) @ W + b
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


def test_graph_conv_w_first_and_w_last_agree(tiny_graph):
    """in_dim > out_dim multiplies W first; both orders must agree."""
    g = tiny_graph
    G = g.to_device()
    x = jnp.asarray(np.random.RandomState(0).randn(5, 8).astype(np.float32))
    wide = GraphConv(3)   # 8 -> 3: W first
    v = wide.init(jax.random.PRNGKey(1), G, x)
    out = wide.apply(v, G, x)
    A = dense_adj(g)
    din = np.maximum(A.sum(1), 1.0) ** -0.5
    dout = np.maximum(A.sum(0), 1.0) ** -0.5
    W = np.asarray(v["params"]["kernel"])
    b = np.asarray(v["params"]["bias"])
    expect = (A * din[:, None] * dout[None, :]) @ (np.asarray(x) @ W) + b
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


def test_gat_conv_matches_dense_attention(tiny_graph):
    g = tiny_graph
    G = g.to_device()
    x = jnp.asarray(g.ndata["feat"])
    layer = GATConv(out_dim=4, num_heads=2)
    v = layer.init(jax.random.PRNGKey(0), G, x)
    out = np.asarray(layer.apply(v, G, x, training=False))

    W = np.asarray(v["params"]["Dense_0"]["kernel"])  # (3, 8)
    al = np.asarray(v["params"]["attn_l"])            # (2, 4)
    ar = np.asarray(v["params"]["attn_r"])
    feat = (np.asarray(x) @ W).reshape(5, 2, 4)
    el = (feat * al).sum(-1)  # (5, 2)
    er = (feat * ar).sum(-1)

    src, dst = np.asarray(g.src), np.asarray(g.dst)
    for h in range(2):
        expect = np.zeros((5, 4), np.float32)
        for vtx in range(5):
            mask = dst == vtx
            if mask.sum() == 0:
                continue
            e = el[src[mask], h] + er[vtx, h]
            e = np.where(e > 0, e, 0.2 * e)  # leaky relu
            a = np.exp(e - e.max())
            a /= a.sum()
            expect[vtx] = (a[:, None] * feat[src[mask], h]).sum(0)
        np.testing.assert_allclose(out[:, h], expect, rtol=1e-4, atol=1e-5)


def test_appnp_propagate_no_drop(tiny_graph):
    g = tiny_graph
    G = g.to_device()
    x = np.asarray(g.ndata["feat"])
    out = np.asarray(appnp_propagate(G, jnp.asarray(x), k=3, alpha=0.1,
                                     edge_drop=0.0))
    A = dense_adj(g)
    din = np.maximum(A.sum(1), 1.0) ** -0.5
    dout = np.maximum(A.sum(0), 1.0) ** -0.5
    P = A * din[:, None] * dout[None, :]
    h = x.copy()
    for _ in range(3):
        h = 0.9 * (P @ h) + 0.1 * x
    np.testing.assert_allclose(out, h, rtol=1e-5, atol=1e-5)


def test_mlp_h_list_is_pre_norm():
    x = jnp.asarray(np.random.RandomState(0).randn(6, 8).astype(np.float32))
    mlp = MLP(num_layers=3, hidden_dim=16, output_dim=4, dropout_ratio=0.0,
              norm_type="layer")
    v = mlp.init(jax.random.PRNGKey(0), x, training=False)
    h_list, h = mlp.apply(v, x, training=False)
    assert len(h_list) == 2
    assert h_list[0].shape == (6, 16)
    assert h.shape == (6, 4)
    # h_list entries are pre-norm pre-relu: generally contain negatives
    assert np.asarray(h_list[0]).min() < 0


def test_gat_head_layout(tiny_graph):
    g = tiny_graph
    G = g.to_device()
    x = jnp.asarray(np.random.RandomState(0).randn(5, 6).astype(np.float32))
    gat = GAT(num_layers=2, hidden_dim=16, output_dim=3, dropout_ratio=0.0,
              num_heads=4)
    v = gat.init(jax.random.PRNGKey(0), G, x, training=False)
    h_list, h = gat.apply(v, G, x, training=False)
    assert h_list[0].shape == (5, 16)  # 4 heads x (16//4) concat
    assert h.shape == (5, 3)           # single head averaged


def test_model_substring_dispatch():
    conf = dict(num_layers=2, hidden_dim=8, label_dim=3, dropout_ratio=0.0,
                norm_type="none", feat_dim=4)
    assert Model(dict(conf, model_name="MLP3w4")).is_mlp
    assert Model(dict(conf, model_name="GA1MLP")).is_mlp
    assert isinstance(Model(dict(conf, model_name="GA1SAGE")).module, SAGE)
    assert isinstance(Model(dict(conf, model_name="GCN")).module, GCN)


def test_single_layer_gcn_keeps_activation():
    """Reference quirk: a 1-layer GCN is built with activation=relu on
    its ONLY layer (models.py:169-170) — outputs are non-negative —
    while multi-layer GCNs leave the last layer bare."""
    import jax

    from glnn_tpu.nn.models import Model

    from glnn_tpu.graph.container import build_graph

    rs = np.random.RandomState(3)
    g = build_graph(rs.randint(0, 40, 200), rs.randint(0, 40, 200), 40)
    x = jnp.asarray(rs.randn(40, 8).astype(np.float32))
    m1 = Model(dict(model_name="GCN", num_layers=1, hidden_dim=16,
                    label_dim=5, dropout_ratio=0.0, norm_type="none"))
    v1 = m1.init(jax.random.PRNGKey(0), g, x)
    out1 = np.asarray(m1.apply(v1, g, x, training=False)[1])
    assert (out1 >= 0).all()          # relu applied
    m2 = Model(dict(model_name="GCN", num_layers=2, hidden_dim=16,
                    label_dim=5, dropout_ratio=0.0, norm_type="none"))
    v2 = m2.init(jax.random.PRNGKey(0), g, x)
    out2 = np.asarray(m2.apply(v2, g, x, training=False)[1])
    assert (out2 < 0).any()           # last layer bare
