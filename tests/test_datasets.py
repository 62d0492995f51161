"""Dataset-family loaders on synthetic on-disk fixtures."""

import json

import numpy as np
import pytest
import scipy.sparse as sp

from glnn_tpu.graph import sparse as gsp
from glnn_tpu.graph.datasets import (
    load_bgnn_data,
    load_cpf_data,
    load_ogb_data,
)


def test_cpf_loader_end_to_end(tmp_path, monkeypatch):
    rs = np.random.RandomState(0)
    n = 120
    adj = sp.random(n, n, 0.05, random_state=rs, format="csr")
    adj = adj + adj.T            # ensure mostly connected
    attr = rs.randn(n, 12).astype(np.float32)
    labels = rs.randint(0, 3, n)
    gsp.save_npz_sparse_graph(tmp_path / "toycpf.npz", adj.tocsr(), attr,
                              labels)
    monkeypatch.chdir(tmp_path)
    g, lab, itr, iva, ite = load_cpf_data("toycpf", ".", seed=0,
                                          labelrate_train=5,
                                          labelrate_val=5)
    assert g.num_nodes() <= n                 # largest CC
    assert g.ndata["feat"].shape[1] == 12
    # pattern trick: self loops present
    assert (g.src == g.dst).sum() == g.num_nodes()
    assert len(itr) == 15 and len(iva) == 15


def test_ogb_npz_loader(tmp_path, monkeypatch):
    rs = np.random.RandomState(1)
    n, e = 50, 200
    np.savez(
        tmp_path / "ogbn-arxiv.graph.npz",
        src=rs.randint(0, n, e).astype(np.int64),
        dst=rs.randint(0, n, e).astype(np.int64),
        n_nodes=np.int64(n),
        feat=rs.randn(n, 8).astype(np.float32),
        labels=rs.randint(0, 4, n).astype(np.int64),
        idx_train=np.arange(0, 30, dtype=np.int64),
        idx_val=np.arange(30, 40, dtype=np.int64),
        idx_test=np.arange(40, 50, dtype=np.int64),
    )
    monkeypatch.chdir(tmp_path)
    g, labels, itr, iva, ite = load_ogb_data("ogbn-arxiv", ".")
    # arxiv path: symmetrized + self loops
    assert (g.src == g.dst).sum() == n
    pairs = set(zip(g.src.tolist(), g.dst.tolist()))
    assert all((b, a) in pairs for a, b in pairs)
    assert len(itr) == 30


def test_bgnn_loader(tmp_path, monkeypatch):
    import pandas as pd

    rs = np.random.RandomState(2)
    n = 60
    X = pd.DataFrame({
        "num1": rs.randn(n),
        "cat1": rs.choice(["a", "b", "c"], n),
        "num2": rs.rand(n) * 10,
    })
    X.loc[3, "num1"] = np.nan
    y = pd.DataFrame({"y": rs.randint(0, 3, n)})
    d = tmp_path / "house_class"
    d.mkdir()
    X.to_csv(d / "X.csv", index=False)
    y.to_csv(d / "y.csv", index=False)
    masks = {"0": {"train": list(range(30)), "val": list(range(30, 45)),
                   "test": list(range(45, 60))}}
    (d / "masks.json").write_text(json.dumps(masks))
    (d / "cat_features.txt").write_text("cat1\n")
    np.savez(d / "graph.npz", src=rs.randint(0, n, 150),
             dst=rs.randint(0, n, 150))

    monkeypatch.chdir(tmp_path)
    g, labels, itr, iva, ite = load_bgnn_data("house_class", ".", 0)
    feats = g.ndata["feat"]
    assert feats.shape == (n, 3)
    assert np.isfinite(feats).all()           # NA replaced
    assert feats.min() >= -1.5                # min-max'd (train stats)
    assert len(itr) == 30 and len(ite) == 15


def test_catboost_ordered_target_encoding_golden():
    """Exact CatBoostEncoder semantics (a=1, sigma=None), hand-computed
    golden values (category_encoders itself is not installed here).

    Train rows (order as stored): cats [a, b, a, a, b], y [1, 0, 0, 1, 1]
    prior = 3/5 = 0.6
      row0 a: (0.6 + 0)   / (1+0) = 0.6
      row1 b: (0.6 + 0)   / (1+0) = 0.6
      row2 a: (0.6 + 1)   / (1+1) = 0.8
      row3 a: (0.6 + 1)   / (1+2) = 0.5333...
      row4 b: (0.6 + 0)   / (1+1) = 0.3
    Test rows: a -> (0.6+2)/(1+3) = 0.65 ; b -> (0.6+1)/(1+2) = 0.5333
               unseen c -> prior 0.6
    """
    import pandas as pd

    from glnn_tpu.graph.datasets import encode_cat_features

    X = pd.DataFrame({"cat": ["a", "b", "a", "a", "b", "a", "b", "c"]})
    y = pd.DataFrame({"y": [1, 0, 0, 1, 1, 9, 9, 9]})  # 9s never used
    out = encode_cat_features(X, y, ["cat"], np.arange(5))
    got = out["cat"].to_numpy()
    want = np.array([0.6, 0.6, 0.8, 1.6 / 3, 0.3,
                     0.65, 1.6 / 3, 0.6])
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_catboost_encoding_boolean_mask():
    import pandas as pd

    from glnn_tpu.graph.datasets import encode_cat_features

    X = pd.DataFrame({"cat": ["a", "a", "b", "a"]})
    y = pd.DataFrame({"y": [1.0, 0.0, 1.0, 5.0]})
    mask = np.array([True, True, True, False])
    out = encode_cat_features(X, y, ["cat"], mask)
    prior = 2.0 / 3
    want = np.array([prior, (prior + 1) / 2, prior, (prior + 1) / 3])
    np.testing.assert_allclose(out["cat"].to_numpy(), want, rtol=1e-12)


def test_create_subgraph_guards():
    adj = sp.eye(5, format="csr")
    with pytest.raises(ValueError, match="Either"):
        gsp.create_subgraph(adj, None, None)
    with pytest.raises(ValueError, match="Only one"):
        gsp.create_subgraph(adj, None, None, nodes_to_remove=[0],
                            nodes_to_keep=[1])
    a2, _, _ = gsp.create_subgraph(adj, None, None, nodes_to_remove=[0, 1])
    assert a2.shape == (3, 3)


def test_binary_bag_of_words():
    f = np.array([[0.0, 2.0], [3.0, 0.0]])
    b = gsp.to_binary_bag_of_words(f)
    assert gsp.is_binary_bag_of_words(b)
    assert not gsp.is_binary_bag_of_words(f)
