"""Host graph surgery + CPF ingest round-trips."""

import numpy as np
import scipy.sparse as sp

from glnn_tpu.graph import sparse as gsp
from glnn_tpu.graph.host import HostGraph, largest_connected_component


def test_to_bidirected_dedups():
    g = HostGraph(np.array([0, 1, 0]), np.array([1, 0, 1]), 3)
    b = g.to_bidirected()
    pairs = set(zip(b.src.tolist(), b.dst.tolist()))
    assert pairs == {(0, 1), (1, 0)}


def test_self_loop_ops():
    g = HostGraph(np.array([0, 1, 1]), np.array([1, 1, 2]), 3)
    g2 = g.remove_self_loop().add_self_loop()
    pairs = set(zip(g2.src.tolist(), g2.dst.tolist()))
    assert pairs == {(0, 1), (1, 2), (0, 0), (1, 1), (2, 2)}


def test_subgraph_relabels_in_idx_order():
    g = HostGraph(np.array([0, 1, 2, 3]), np.array([1, 2, 3, 0]), 4)
    g.ndata["feat"] = np.arange(4, dtype=np.float32)[:, None]
    sub = g.subgraph(np.array([2, 3, 0]))
    # kept edges: 2->3 and 3->0, relabeled through idx order [2,3,0]
    pairs = set(zip(sub.src.tolist(), sub.dst.tolist()))
    assert pairs == {(0, 1), (1, 2)}
    np.testing.assert_array_equal(sub.ndata["feat"].ravel(), [2.0, 3.0, 0.0])


def test_largest_cc():
    # two components: {0,1,2} and {3,4}
    g = HostGraph(np.array([0, 1, 3]), np.array([1, 2, 4]), 5)
    keep = largest_connected_component(g)
    assert set(keep.tolist()) == {0, 1, 2}


def test_csr_csc_consistency():
    rs = np.random.RandomState(0)
    src, dst = rs.randint(0, 20, 100), rs.randint(0, 20, 100)
    g = HostGraph(src, dst, 20)
    indptr, indices = g.csr()
    assert indptr[-1] == 100
    for v in range(20):
        neigh = sorted(indices[indptr[v]:indptr[v + 1]].tolist())
        assert neigh == sorted(dst[src == v].tolist())
    cptr, cind = g.csc()
    for v in range(20):
        neigh = sorted(cind[cptr[v]:cptr[v + 1]].tolist())
        assert neigh == sorted(src[dst == v].tolist())


def test_cpf_npz_roundtrip(tmp_path):
    rs = np.random.RandomState(0)
    adj = sp.random(30, 30, 0.1, random_state=rs, format="csr")
    attr = rs.randn(30, 8).astype(np.float32)
    labels = rs.randint(0, 3, 30)
    path = tmp_path / "toy.npz"
    gsp.save_npz_sparse_graph(path, adj, attr, labels)
    adj2, attr2, labels2 = gsp.load_npz_sparse_graph(path)
    np.testing.assert_allclose(adj.toarray(), adj2.toarray())
    np.testing.assert_allclose(attr, attr2)
    np.testing.assert_array_equal(labels, labels2)


def test_standardize():
    # weighted, directed, with self-loop and a disconnected island
    adj = sp.csr_matrix(np.array([
        [2.0, 3.0, 0, 0, 0],
        [0, 0, 1.0, 0, 0],
        [0, 0, 0, 0, 0],
        [0, 0, 0, 0, 5.0],
        [0, 0, 0, 0, 0],
    ]))
    attr = np.eye(5, dtype=np.float32)
    labels = np.arange(5)
    a2, at2, l2 = gsp.standardize(adj, attr, labels)
    A = a2.toarray()
    assert A.shape == (3, 3)
    assert (A == A.T).all()          # undirected
    assert A.max() == 1.0            # unweighted
    assert np.diag(A).sum() == 0     # no self loops
    np.testing.assert_array_equal(l2, [0, 1, 2])


def test_normalize_adj_pattern_keeps_self_loops():
    adj = sp.csr_matrix((np.ones(2), (np.array([0, 1]), np.array([1, 0]))),
                        shape=(2, 2))
    pat = gsp.normalize_adj(adj).tocoo()
    pairs = set(zip(pat.row.tolist(), pat.col.tolist()))
    assert pairs == {(0, 0), (0, 1), (1, 0), (1, 1)}


def test_binarize_labels():
    out = gsp.binarize_labels(np.array([2, 0, 2, 5]))
    assert out.shape == (4, 3)
    np.testing.assert_array_equal(out.argmax(1), [1, 0, 1, 2])


def test_rcm_reorder_preserves_structure():
    from glnn_tpu.graph.host import rcm_ordering, reorder_nodes

    rs = np.random.RandomState(3)
    g = HostGraph(rs.randint(0, 40, 200), rs.randint(0, 40, 200), 40)
    g.ndata["feat"] = rs.randn(40, 4).astype(np.float32)
    order = rcm_ordering(g)
    assert sorted(order.tolist()) == list(range(40))
    g2 = reorder_nodes(g, order)
    # degree multiset preserved; feature rows follow their nodes
    assert sorted(g.in_degrees().tolist()) == sorted(g2.in_degrees().tolist())
    new_id = np.empty(40, np.int64)
    new_id[order] = np.arange(40)
    np.testing.assert_allclose(g2.ndata["feat"][new_id[5]],
                               g.ndata["feat"][5])
