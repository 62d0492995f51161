"""Split machinery: stratified sampling + inductive dual index system."""

import numpy as np
import pytest

from glnn_tpu.utils.splits import (
    get_train_val_test_split,
    graph_split,
    idx_split,
    sample_per_class,
)
from glnn_tpu.graph.sparse import binarize_labels


def test_per_class_split_counts_and_disjoint():
    labels = binarize_labels(np.arange(200) % 4)
    rs = np.random.RandomState(0)
    tr, va, te = get_train_val_test_split(rs, labels, 10, 15)
    assert len(tr) == 40 and len(va) == 60
    assert len(te) == 200 - 100
    assert not set(tr) & set(va) and not set(tr) & set(te)
    # stratified: 10 per class in train
    assert all((labels[tr].sum(0) == 10))


def test_split_deterministic_in_seed():
    labels = binarize_labels(np.arange(100) % 5)
    a = get_train_val_test_split(np.random.RandomState(7), labels, 5, 5)
    b = get_train_val_test_split(np.random.RandomState(7), labels, 5, 5)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_idx_split_partitions():
    idx = np.arange(50, 100)
    a, b = idx_split(idx, 0.3, seed=1)
    assert len(a) == 15 and len(b) == 35
    assert sorted(a.tolist() + b.tolist()) == idx.tolist()


def test_graph_split_index_systems():
    idx_train = np.arange(0, 10)
    idx_val = np.arange(10, 20)
    idx_test = np.arange(20, 100)
    obs_tr, obs_va, obs_te, idx_obs, idx_ti = graph_split(
        idx_train, idx_val, idx_test, rate=0.25, seed=0
    )
    assert len(idx_ti) == 20                       # 25% of test hidden
    assert len(idx_obs) == 10 + 10 + 60
    # obs-local indices address positions WITHIN idx_obs
    np.testing.assert_array_equal(idx_obs[obs_tr], idx_train)
    np.testing.assert_array_equal(idx_obs[obs_va], idx_val)
    # observed test + inductive test partition the original test set
    got = sorted(idx_obs[obs_te].tolist() + idx_ti.tolist())
    assert got == idx_test.tolist()


def test_sample_per_class_respects_forbidden():
    labels = binarize_labels(np.arange(60) % 3)
    forbidden = np.arange(0, 30)
    picks = sample_per_class(np.random.RandomState(0), labels, 5, forbidden)
    assert len(picks) == 15
    assert not set(picks) & set(forbidden.tolist())
