"""Locality partitioners: label propagation + community-balanced LPT
(SURVEY.md §2.4 graph partitioning; the TPU analog of an edge-cut
partitioner feeding equal-row-block shards)."""

import numpy as np

from glnn_tpu.distributed.partition import (
    community_balanced_order,
    contiguous_partition,
    degree_balanced_order,
    inverse_permutation,
    label_propagation_labels,
    shard_edge_balance,
)


def _planted(n=4000, c=8, p_in=0.92, avg_deg=12, seed=0):
    rs = np.random.RandomState(seed)
    comm = rs.randint(0, c, n)
    e = n * avg_deg
    src = rs.randint(0, n, e)
    # in-community dst: random member of src's community
    members = [np.where(comm == k)[0] for k in range(c)]
    dst_in = np.array(
        [members[comm[s]][rs.randint(len(members[comm[s]]))] for s in src])
    dst = np.where(rs.rand(e) < p_in, dst_in, rs.randint(0, n, e))
    return src, dst, comm


def _halo_fraction(src, dst, order, p):
    n = len(order)
    ni = inverse_permutation(order)
    rows = -(-n // p)
    return float((ni[src] // rows != ni[dst] // rows).mean())


def test_label_propagation_recovers_planted_communities():
    src, dst, comm = _planted()
    lab = label_propagation_labels(src, dst, len(comm))
    # most nodes in a planted community share one LP label
    agree = 0
    for k in range(comm.max() + 1):
        vals, cnt = np.unique(lab[comm == k], return_counts=True)
        agree += cnt.max()
    assert agree / len(comm) > 0.9


def test_community_balanced_order_cuts_halo_and_balances():
    src, dst, comm = _planted()
    n = len(comm)
    deg = np.bincount(dst, minlength=n)
    lab = label_propagation_labels(src, dst, n)
    for p in (2, 4):
        order = community_balanced_order(lab, deg, p)
        assert sorted(order.tolist()) == list(range(n))   # permutation
        hf = _halo_fraction(src, dst, order, p)
        assert hf < 0.25, f"P={p} halo {hf}"              # vs ~(P-1)/P random
        ni = inverse_permutation(order)
        assert shard_edge_balance(ni[dst], n, p) < 1.3


def test_community_order_splits_oversized_groups():
    # one giant community larger than any shard's capacity
    n = 100
    lab = np.zeros(n, np.int64)
    deg = np.ones(n, np.int64)
    order = community_balanced_order(lab, deg, 4)
    assert sorted(order.tolist()) == list(range(n))


def test_degree_balanced_order_is_permutation():
    deg = np.random.RandomState(0).randint(0, 50, 1000)
    order = degree_balanced_order(deg, 8)
    assert sorted(order.tolist()) == list(range(1000))
    ni = inverse_permutation(order)
    # per-block degree loads are near-equal
    rows = 125
    loads = np.bincount(ni // rows, weights=deg, minlength=8)
    assert loads.max() / loads.mean() < 1.05


def test_contiguous_partition_bounds():
    b = contiguous_partition(10, 3)
    assert b.tolist() == [0, 4, 7, 10]
