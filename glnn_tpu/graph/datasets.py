"""Dataset loading layer: one dispatch over all dataset families.

`load_data(dataset, path, **kw) -> (HostGraph, labels, idx_train,
idx_val, idx_test)` — same surface as the reference dispatch
(/root/reference/dataloader.py:42-58) with one addition: a `synth*`
family of deterministic planted-partition graphs so the full pipeline
runs (and is tested/benchmarked) without any downloads.

Families:
* CPF (cora/citeseer/pubmed/a-computer/a-photo): npz on disk, CPF schema
  (dataloader.py:82-111 semantics, incl. the pattern-only normalize_adj
  quirk that bakes self-loops into the edge set but discards weights).
* OGB (ogbn-arxiv/ogbn-products): via the `ogb` package if importable,
  else from a pre-converted npz at `<path>/<dataset>.graph.npz`.
  arxiv is made undirected by appending reversed edges then
  remove+add self-loop; products ships as-is (dataloader.py:61-79).
* NonHom (penn94/pokec): .mat + fixed split files (dataloader.py:114-137).
* BGNN (house_class/vk_class): CSV features + masks (dataloader.py:140-166).
* synth: `synth[-<key><val>...]`, e.g. `synth-n2048-c7-f128-d10`.
"""

from __future__ import annotations

import json
import os
import re
from pathlib import Path

import numpy as np

from glnn_tpu.graph import sparse as gsp
from glnn_tpu.graph.host import HostGraph
from glnn_tpu.utils.common import (
    BGNN_data, CPF_data, NonHom_data, OGB_data, SYNTH_prefix,
)
from glnn_tpu.utils.splits import get_train_val_test_split


def load_data(dataset: str, dataset_path: str, **kwargs):
    if dataset in CPF_data:
        return load_cpf_data(
            dataset, dataset_path, kwargs["seed"],
            kwargs["labelrate_train"], kwargs["labelrate_val"],
        )
    if dataset in OGB_data:
        return load_ogb_data(dataset, dataset_path)
    if dataset in NonHom_data:
        return load_nonhom_data(dataset, dataset_path, kwargs["split_idx"])
    if dataset in BGNN_data:
        return load_bgnn_data(dataset, dataset_path, kwargs["split_idx"])
    if dataset.startswith(SYNTH_prefix):
        return load_synth_data(
            dataset, kwargs.get("seed", 0),
            kwargs.get("labelrate_train", 20), kwargs.get("labelrate_val", 30),
        )
    raise ValueError(f"Unknown dataset: {dataset}")


def load_out_t(out_t_dir):
    """Read teacher log-probs from the `out.npz` contract
    (teacher->student filesystem handoff, dataloader.py:169-170)."""
    return np.load(Path(out_t_dir).joinpath("out.npz"))["arr_0"]


# --------------------------------------------------------------------
# CPF
# --------------------------------------------------------------------

def load_cpf_data(dataset, dataset_path, seed, labelrate_train, labelrate_val):
    data_path = Path.cwd().joinpath(dataset_path, f"{dataset}.npz")
    if not os.path.isfile(data_path):
        raise ValueError(f"{data_path} doesn't exist.")
    adj, attr, labels = gsp.load_npz_sparse_graph(data_path)
    adj, attr, labels = gsp.standardize(adj, attr, labels)

    labels_onehot = gsp.binarize_labels(labels)
    rs = np.random.RandomState(seed)
    idx_train, idx_val, idx_test = get_train_val_test_split(
        rs, labels_onehot, labelrate_train, labelrate_val
    )

    import scipy.sparse as sp
    features = np.asarray(attr.todense() if sp.issparse(attr) else attr,
                          np.float32)
    labels = labels_onehot.argmax(axis=1).astype(np.int64)

    # Keep only the PATTERN of D^-1(A+I): self-loops enter the edge set,
    # the row-normalized weights are discarded (dataloader.py:103-105).
    pat = gsp.normalize_adj(adj).tocoo()
    g = HostGraph(pat.row.astype(np.int64), pat.col.astype(np.int64),
                  adj.shape[0])
    g.ndata["feat"] = features
    return g, labels, idx_train, idx_val, idx_test


# --------------------------------------------------------------------
# OGB
# --------------------------------------------------------------------

def load_ogb_data(dataset, dataset_path):
    pre = Path.cwd().joinpath(dataset_path, f"{dataset}.graph.npz")
    if os.path.isfile(pre):
        d = np.load(pre)
        g = HostGraph(d["src"], d["dst"], int(d["n_nodes"]))
        g.ndata["feat"] = d["feat"].astype(np.float32)
        labels = d["labels"].astype(np.int64)
        idx_train, idx_val, idx_test = d["idx_train"], d["idx_val"], d["idx_test"]
    else:
        try:
            from ogb.nodeproppred import NodePropPredDataset
        except ImportError as e:
            raise ValueError(
                f"{pre} not found and `ogb` is unavailable; pre-convert the "
                f"dataset with tools/convert_datasets.py on a machine with ogb."
            ) from e
        data = NodePropPredDataset(dataset, root=str(dataset_path))
        split = data.get_idx_split()
        idx_train, idx_val, idx_test = split["train"], split["valid"], split["test"]
        graph, labels = data[0]
        labels = np.asarray(labels).squeeze().astype(np.int64)
        src, dst = graph["edge_index"]
        g = HostGraph(src.astype(np.int64), dst.astype(np.int64),
                      int(graph["num_nodes"]))
        g.ndata["feat"] = np.asarray(graph["node_feat"], np.float32)

    if dataset == "ogbn-arxiv":
        g = g.add_reverse_edges().remove_self_loop().add_self_loop()
    return g, labels, np.asarray(idx_train), np.asarray(idx_val), np.asarray(idx_test)


# --------------------------------------------------------------------
# NonHom (penn94 / pokec)
# --------------------------------------------------------------------

def load_nonhom_data(dataset, dataset_path, split_idx):
    data_path = Path.cwd().joinpath(dataset_path, f"{dataset}.mat")
    split_path = Path.cwd().joinpath(dataset_path, "splits",
                                     f"{dataset}-splits.npy")
    if dataset == "pokec":
        g, features, labels = _load_pokec_mat(data_path)
    elif dataset == "penn94":
        g, features, labels = _load_penn94_mat(data_path)
    else:
        raise ValueError("Invalid dataname")

    g = g.remove_self_loop().add_self_loop()
    g.ndata["feat"] = features
    labels = np.asarray(labels, np.int64)

    splits = load_fixed_splits(dataset, split_path, split_idx)
    return g, labels, splits["train"], splits["valid"], splits["test"]


def _load_penn94_mat(data_path):
    """penn94: facebook .mat; feature = one-hot of columns != gender,
    label = gender - 1 (unlabeled -1) (dataloader.py:174-199 contract)."""
    import scipy.io
    mat = scipy.io.loadmat(str(data_path))
    A = mat["A"].tocsr().tocoo()
    metadata = mat["local_info"].astype(np.int64)
    n = A.shape[0]

    g = HostGraph(A.row.astype(np.int64), A.col.astype(np.int64), n)
    # reference applies dgl.to_bidirected (dataloader.py:195-196);
    # facebook100 A happens to be symmetric, but a non-canonical .mat
    # must still produce the same edge set
    g = g.to_bidirected()
    labels = metadata[:, 1] - 1  # gender label, unlabeled -> -1

    # one-hot all columns except gender (col 1). sklearn's
    # label_binarize emits a SINGLE 0/1 column for binary columns and
    # k columns otherwise — binarize_labels always emits k, which
    # shifted the feature matrix for any 2-valued metadata column
    feature_vals = np.hstack(
        (np.expand_dims(metadata[:, 0], 1), metadata[:, 2:])
    )
    features = []
    for col in range(feature_vals.shape[1]):
        feat_col = feature_vals[:, col]
        classes = np.unique(feat_col)
        if len(classes) == 2:
            feat_onehot = (feat_col == classes[1]).astype(
                np.float32)[:, None]
        else:
            feat_onehot = gsp.binarize_labels(feat_col)
        features.append(feat_onehot)
    features = np.hstack(features).astype(np.float32)
    return g, features, labels


def _load_pokec_mat(data_path):
    import scipy.io
    if not os.path.isfile(data_path):
        raise ValueError(
            f"{data_path} doesn't exist — fetch it once with "
            f"tools/fetch_pokec.py on a machine with network access "
            f"(this environment has no egress)."
        )
    mat = scipy.io.loadmat(str(data_path))
    edge_index = np.asarray(mat["edge_index"], np.int64)
    features = np.asarray(mat["node_feat"], np.float32)
    labels = np.asarray(mat["label"], np.int64).ravel()
    n = features.shape[0]
    g = HostGraph(edge_index[0], edge_index[1], n).to_bidirected()
    return g, features, labels


def load_fixed_splits(dataset, split_path, split_idx):
    """5 pre-generated splits; `split_idx` selects one
    (dataloader.py:298-312 contract)."""
    if not os.path.exists(split_path):
        raise ValueError(f"split file {split_path} not found")
    splits_lst = np.load(split_path, allow_pickle=True)
    split = splits_lst[split_idx]
    return {k: np.asarray(split[k]).ravel() for k in ("train", "valid", "test")}


# --------------------------------------------------------------------
# BGNN (house_class / vk_class)
# --------------------------------------------------------------------

def load_bgnn_data(dataset, dataset_path, split_idx):
    import pandas as pd

    data_path = Path.cwd().joinpath(dataset_path, f"{dataset}")
    X = pd.read_csv(data_path.joinpath("X.csv"))
    y = pd.read_csv(data_path.joinpath("y.csv"))
    with open(data_path.joinpath("masks.json")) as f:
        masks = json.load(f)
    categorical_columns = []
    if os.path.exists(data_path.joinpath("cat_features.txt")):
        with open(data_path.joinpath("cat_features.txt")) as f:
            for line in f:
                if line.strip():
                    categorical_columns.append(line.strip())
    edges = np.load(data_path.joinpath("graph.npz"))
    src, dst = edges["src"].astype(np.int64), edges["dst"].astype(np.int64)

    train_mask = np.asarray(masks[str(split_idx)]["train"], np.int64)
    val_mask = np.asarray(masks[str(split_idx)]["val"], np.int64)
    test_mask = np.asarray(masks[str(split_idx)]["test"], np.int64)

    encoded_X = X.copy()
    cat_features = [c for c in categorical_columns if c in encoded_X.columns]
    if cat_features:
        encoded_X = encode_cat_features(
            encoded_X, y, cat_features, train_mask
        )
    encoded_X = normalize_features(encoded_X, train_mask)
    encoded_X = replace_na(encoded_X, train_mask)

    features = encoded_X.to_numpy(dtype=np.float32)
    labels = y.to_numpy().ravel().astype(np.int64)

    g = HostGraph(src, dst, features.shape[0]).remove_self_loop().add_self_loop()
    g.ndata["feat"] = features
    return g, labels, train_mask, val_mask, test_mask


def encode_cat_features(X, y, cat_features, train_mask):
    """Exact CatBoost ordered-target encoding, matching what the
    reference's category_encoders.CatBoostEncoder() computes
    (dataloader.py:364-375; CatBoostEncoder defaults a=1, sigma=None):

    * train rows, in their stored row order (the single "permutation"
      CatBoostEncoder uses): value_i = (prior + sum of y over PRIOR
      train occurrences of the category) / (1 + count of prior
      occurrences) — the current row's own label is excluded;
    * non-train rows: value = (prior + total train sum of the
      category) / (1 + total train count); categories unseen in train
      fall back to the prior (sum=0, count=0 gives exactly that);
    * prior = mean of y over the fit (train) rows.
    """
    import pandas as pd

    X = X.copy()
    y_arr = y.to_numpy().ravel().astype(np.float64)
    train_idx = np.asarray(train_mask)
    if train_idx.dtype == bool:
        train_idx = np.where(train_idx)[0]
    prior = y_arr[train_idx].mean()
    rest_idx = np.setdiff1d(np.arange(len(X)), train_idx)
    for col in cat_features:
        # NaN categories: pandas groupby drops NaN keys, which would
        # leave those rows NaN (later min-1-filled) where
        # CatBoostEncoder treats missing as a regular category value —
        # encode NaN as its own sentinel category instead
        col_series = X[col]
        if col_series.isna().any():
            col_series = col_series.fillna("\x00__nan__")
        col_vals = col_series.to_numpy()
        c_tr = pd.Series(col_vals[train_idx])
        y_tr = pd.Series(y_arr[train_idx])
        grp = y_tr.groupby(c_tr)
        cumsum = grp.cumsum() - y_tr          # prior-occurrence sums
        cumcnt = grp.cumcount()               # prior-occurrence counts
        enc = np.empty(len(X), np.float64)
        enc[train_idx] = ((prior + cumsum) / (1.0 + cumcnt)).to_numpy()
        totals = grp.agg(["sum", "count"])
        t_sum = pd.Series(col_vals[rest_idx]).map(totals["sum"]).fillna(0.0)
        t_cnt = pd.Series(col_vals[rest_idx]).map(
            totals["count"]).fillna(0.0)
        enc[rest_idx] = ((prior + t_sum) / (1.0 + t_cnt)).to_numpy()
        X[col] = enc
    return X


def normalize_features(X, train_mask):
    """Min-max normalize, statistics fit on train rows only
    (dataloader.py:350-355 contract)."""
    from sklearn import preprocessing

    # float frame FIRST: assigning scaled floats into integer-dtyped
    # columns raises under pandas 3 (lossy setitem) and silently
    # truncated to zeros on older pandas — real BGNN CSVs carry int
    # columns (counts/years) that pd.read_csv infers as int64
    X = X.astype(np.float64)
    min_max_scaler = preprocessing.MinMaxScaler()
    min_max_scaler.fit(X.iloc[train_mask])
    X.iloc[:] = min_max_scaler.transform(X)
    return X


def replace_na(X, train_mask):
    """NA -> train-min - 1 (dataloader.py:358-361 contract)."""
    if X.isna().any().any():
        return X.fillna(X.iloc[train_mask].min() - 1)
    return X


# --------------------------------------------------------------------
# Synthetic planted-partition graphs (offline-friendly)
# --------------------------------------------------------------------

_SYNTH_DEFAULTS = dict(n=2048, c=7, f=128, d=10, p_in=0.8, noise=1.0)


def parse_synth_name(name: str) -> dict:
    """`synth-n2048-c7-f128-d10` -> params. Unknown tokens rejected."""
    params = dict(_SYNTH_DEFAULTS)
    if name == SYNTH_prefix:
        return params
    body = name[len(SYNTH_prefix):].lstrip("-")
    for tok in body.split("-"):
        m = re.fullmatch(r"([a-z_]+)([0-9.]+)", tok)
        if not m:
            raise ValueError(f"bad synth dataset token: {tok!r} in {name!r}")
        key, val = m.group(1), m.group(2)
        if key not in params:
            raise ValueError(f"unknown synth param {key!r}")
        params[key] = type(params[key])(float(val) if "." in val else int(val))
    return params


def make_synth_graph(n, c, f, d, p_in=0.8, noise=1.0, data_seed=42):
    """Deterministic planted-partition graph.

    Class assignment round-robin; each node draws ~d neighbors, a
    p_in fraction within its class. Features = class centroid + white
    noise, so an MLP gets partial signal and a GNN does better — the
    regime GLNN distillation targets.
    """
    rs = np.random.RandomState(data_seed)
    labels = np.arange(n, dtype=np.int64) % c
    class_members = [np.where(labels == k)[0] for k in range(c)]

    num_draws = n * d
    src = np.repeat(np.arange(n, dtype=np.int64), d)
    same = rs.rand(num_draws) < p_in
    # vectorized within-class draw: pick a random member of src's class
    class_sizes = np.array([len(m) for m in class_members])
    member_table = np.full((c, class_sizes.max()), -1, np.int64)
    for k in range(c):
        member_table[k, : class_sizes[k]] = class_members[k]
    pick = rs.randint(0, class_sizes[labels[src]])
    dst_same = member_table[labels[src], pick]
    dst_rand = rs.randint(0, n, size=num_draws)
    dst = np.where(same, dst_same, dst_rand)

    keep = src != dst
    g = HostGraph(src[keep], dst[keep], n).to_bidirected().add_self_loop()

    centroids = rs.randn(c, f).astype(np.float32) * 0.5
    feats = centroids[labels] + noise * rs.randn(n, f).astype(np.float32)
    g.ndata["feat"] = feats
    return g, labels


def load_synth_data(dataset, seed, labelrate_train, labelrate_val):
    p = parse_synth_name(dataset)
    g, labels = make_synth_graph(p["n"], p["c"], p["f"], p["d"],
                                 p["p_in"], p["noise"])
    onehot = gsp.binarize_labels(labels)
    rs = np.random.RandomState(seed)
    idx_train, idx_val, idx_test = get_train_val_test_split(
        rs, onehot, labelrate_train, labelrate_val
    )
    return g, labels, idx_train, idx_val, idx_test
