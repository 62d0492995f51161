"""Train/val/test split machinery.

Two split systems, mirroring the reference:

1. Per-class stratified sampling for CPF datasets
   (/root/reference/dataloader.py:593-702). Given the same
   `np.random.RandomState(seed)`, `sample_per_class` issues the exact
   same sequence of `choice` calls as the reference, so CPF splits are
   bit-identical for a given seed.

2. The inductive `graph_split` (/root/reference/utils.py:103-127):
   hide `rate` of the test set as inductive-test; the remaining nodes
   form the observed graph. Returns both the obs-local index system
   (`obs_idx_*`, positions within idx_obs) and global indices
   (`idx_obs`, `idx_test_ind`). `idx_split`'s permutation is drawn from
   numpy (RandomState(seed)) rather than torch.randperm — same
   distribution, deterministic in (seed, rate), but not the identical
   permutation torch would produce.
"""

from __future__ import annotations

import numpy as np


def idx_split(idx: np.ndarray, ratio: float, seed: int = 0):
    """Randomly split idx into (ratio, 1-ratio) portions."""
    idx = np.asarray(idx)
    rs = np.random.RandomState(seed)
    n = len(idx)
    cut = int(n * ratio)
    perm = rs.permutation(n)
    return idx[perm[:cut]], idx[perm[cut:]]


def graph_split(idx_train, idx_val, idx_test, rate: float, seed: int):
    """Build the inductive split (see module docstring)."""
    idx_train = np.asarray(idx_train)
    idx_val = np.asarray(idx_val)
    idx_test = np.asarray(idx_test)

    idx_test_ind, idx_test_tran = idx_split(idx_test, rate, seed)

    idx_obs = np.concatenate([idx_train, idx_val, idx_test_tran])
    n1, n2 = idx_train.shape[0], idx_val.shape[0]
    obs_idx_all = np.arange(idx_obs.shape[0])
    obs_idx_train = obs_idx_all[:n1]
    obs_idx_val = obs_idx_all[n1 : n1 + n2]
    obs_idx_test = obs_idx_all[n1 + n2 :]
    return obs_idx_train, obs_idx_val, obs_idx_test, idx_obs, idx_test_ind


def sample_per_class(random_state, labels_onehot, num_examples_per_class,
                     forbidden_indices=None):
    """Sample a fixed number of node indices per class, skipping any in
    `forbidden_indices`. Call-sequence-compatible with the reference."""
    num_samples, num_classes = labels_onehot.shape
    forbidden = (
        np.zeros(num_samples, bool)
        if forbidden_indices is None
        else np.isin(np.arange(num_samples), forbidden_indices)
    )
    picks = []
    for c in range(num_classes):
        members = np.where((labels_onehot[:, c] > 0.0) & ~forbidden)[0]
        picks.append(
            random_state.choice(members, num_examples_per_class, replace=False)
        )
    return np.concatenate(picks)


def get_train_val_test_split(random_state, labels_onehot,
                             train_examples_per_class=None,
                             val_examples_per_class=None,
                             test_examples_per_class=None,
                             train_size=None, val_size=None, test_size=None):
    """Stratified (or size-based) disjoint train/val/test node splits."""
    num_samples, _ = labels_onehot.shape
    remaining = np.arange(num_samples)

    if train_examples_per_class is not None:
        train_idx = sample_per_class(random_state, labels_onehot,
                                     train_examples_per_class)
    else:
        train_idx = random_state.choice(remaining, train_size, replace=False)

    if val_examples_per_class is not None:
        val_idx = sample_per_class(random_state, labels_onehot,
                                   val_examples_per_class,
                                   forbidden_indices=train_idx)
    else:
        remaining = np.setdiff1d(remaining, train_idx)
        val_idx = random_state.choice(remaining, val_size, replace=False)

    forbidden = np.concatenate([train_idx, val_idx])
    if test_examples_per_class is not None:
        test_idx = sample_per_class(random_state, labels_onehot,
                                    test_examples_per_class,
                                    forbidden_indices=forbidden)
    elif test_size is not None:
        remaining = np.setdiff1d(remaining, forbidden)
        test_idx = random_state.choice(remaining, test_size, replace=False)
    else:
        test_idx = np.setdiff1d(np.arange(num_samples), forbidden)

    # disjointness + stratification invariants
    assert len(set(train_idx)) == len(train_idx)
    assert len(set(val_idx)) == len(val_idx)
    assert len(set(test_idx)) == len(test_idx)
    assert not set(train_idx) & set(val_idx)
    assert not set(train_idx) & set(test_idx)
    assert not set(val_idx) & set(test_idx)
    if test_size is None and test_examples_per_class is None:
        assert len(train_idx) + len(val_idx) + len(test_idx) == num_samples
    for idx, per_class in ((train_idx, train_examples_per_class),
                           (val_idx, val_examples_per_class),
                           (test_idx, test_examples_per_class)):
        if per_class is not None:
            assert np.unique(labels_onehot[idx].sum(axis=0)).size == 1

    return train_idx, val_idx, test_idx
