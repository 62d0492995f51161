"""ctypes bindings for the native host-graph kernels (native/graphops.cpp).

Loads `native/libglnnops.so`, building it with make on first use if the
toolchain is available. Every entry point has a numpy fallback, so the
framework runs (slower) without a compiler. `available()` reports which
path is active; HostGraph routes its edge surgery through here.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libglnnops.so"))

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    for name, argtypes in [
        ("sort_edges", [ctypes.c_int64, i64p, ctypes.c_int64, i64p]),
        ("coo_to_csr", [ctypes.c_int64, ctypes.c_int64, i64p, i64p, i64p,
                        i64p]),
        ("to_bidirected", [ctypes.c_int64, ctypes.c_int64, i64p, i64p,
                           i64p, i64p]),
        ("connected_components", [ctypes.c_int64, ctypes.c_int64, i64p,
                                  i64p, i64p]),
        ("induced_subgraph", [ctypes.c_int64, ctypes.c_int64, i64p, i64p,
                              ctypes.c_int64, i64p, i64p, i64p, i64p]),
        ("degrees", [ctypes.c_int64, ctypes.c_int64, i64p, i64p]),
        ("label_propagation", [ctypes.c_int64, ctypes.c_int64, i64p, i64p,
                               ctypes.c_int64, i64p]),
        ("spmm_block_plan_tmax", [ctypes.c_int64, i64p, ctypes.c_int64,
                                  ctypes.c_int64, ctypes.c_int64]),
        ("spmm_block_plan_fill", [ctypes.c_int64, i64p, i64p,
                                  ctypes.c_int64, ctypes.c_int64,
                                  ctypes.c_int64, ctypes.c_int64,
                                  ctypes.c_int64, "i32p", "i32p", "i32p"]),
        ("spmm_plan_num_tiles", [ctypes.c_int64, i64p, ctypes.c_int64,
                                 ctypes.c_int64, ctypes.c_int64]),
        ("spmm_plan_fill", [ctypes.c_int64, i64p, i64p, ctypes.c_int64,
                            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                            "i32p", "i32p", "i32p", "i32p"]),
        ("att_plan_fill", [ctypes.c_int64, i64p, i64p, ctypes.c_int64,
                           ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                           "i32p", "i32p", "i32p", "i32p"]),
    ]:
        fn = getattr(lib, name)
        fn.argtypes = [i32p if a == "i32p" else a for a in argtypes]
        fn.restype = ctypes.c_int64
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _c64(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, np.int64))


def coo_to_csr(src, dst, n: int):
    src, dst = _c64(src), _c64(dst)
    e = src.shape[0]
    lib = _load()
    if lib is not None:
        indptr = np.empty(n + 1, np.int64)
        indices = np.empty(e, np.int64)
        lib.coo_to_csr(n, e, _p(src), _p(dst), _p(indptr), _p(indices))
        return indptr, indices
    order = np.argsort(src, kind="stable")
    counts = np.bincount(src, minlength=n)
    indptr = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=indptr[1:])
    return indptr, dst[order]


def to_bidirected(src, dst, n: int):
    src, dst = _c64(src), _c64(dst)
    e = src.shape[0]
    lib = _load()
    if lib is not None:
        so = np.empty(2 * e, np.int64)
        do = np.empty(2 * e, np.int64)
        m = lib.to_bidirected(n, e, _p(src), _p(dst), _p(so), _p(do))
        return so[:m].copy(), do[:m].copy()
    s2 = np.concatenate([src, dst])
    d2 = np.concatenate([dst, src])
    key = s2 * n + d2
    _, keep = np.unique(key, return_index=True)
    return s2[keep], d2[keep]


def connected_components(src, dst, n: int):
    src, dst = _c64(src), _c64(dst)
    lib = _load()
    if lib is not None:
        comp = np.empty(n, np.int64)
        k = lib.connected_components(n, src.shape[0], _p(src), _p(dst),
                                     _p(comp))
        return int(k), comp
    import scipy.sparse as sp
    adj = sp.csr_matrix((np.ones(len(src), np.int8), (src, dst)),
                        shape=(n, n))
    k, comp = sp.csgraph.connected_components(adj, directed=False)
    return int(k), comp.astype(np.int64)


def induced_subgraph(src, dst, n: int, idx):
    src, dst, idx = _c64(src), _c64(dst), _c64(idx)
    e, k = src.shape[0], idx.shape[0]
    lib = _load()
    if lib is not None:
        new_id = np.empty(n, np.int64)
        so = np.empty(max(e, 1), np.int64)
        do = np.empty(max(e, 1), np.int64)
        m = lib.induced_subgraph(n, e, _p(src), _p(dst), k, _p(idx),
                                 _p(new_id), _p(so), _p(do))
        return so[:m].copy(), do[:m].copy()
    new_id = np.full(n, -1, np.int64)
    new_id[idx] = np.arange(k)
    keep = (new_id[src] >= 0) & (new_id[dst] >= 0)
    return new_id[src[keep]], new_id[dst[keep]]


def label_propagation(src, dst, n: int, iters: int = 10):
    """Native synchronous label propagation (graphops.cpp). Returns
    int64[n] labels or None when the library is unavailable (callers
    fall back to the numpy tier in distributed/partition.py)."""
    lib = _load()
    if lib is None:
        return None
    src, dst = _c64(src), _c64(dst)
    labels = np.empty(n, np.int64)
    lib.label_propagation(n, src.shape[0], _p(src), _p(dst), iters,
                          _p(labels))
    return labels


def _p32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def spmm_block_plan_arrays(rec, snd, n_nodes: int, n_src: int, tile: int,
                           block_rows: int):
    """Native block-mode plan build (see native/graphops.cpp).
    Returns (src_idx, edge_perm, rec_local [all i32, B*t_max*tile],
    t_max, num_blocks) or None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    rec, snd = _c64(rec), _c64(snd)
    e = rec.shape[0]
    t_max = lib.spmm_block_plan_tmax(e, _p(rec), n_nodes, tile, block_rows)
    if t_max < 0:
        raise ValueError("receivers not dst-sorted")
    num_blocks = max(1, -(-n_nodes // block_rows))
    size = num_blocks * t_max * tile
    src_idx = np.empty(size, np.int32)
    edge_perm = np.empty(size, np.int32)
    rec_local = np.empty(size, np.int32)
    got = lib.spmm_block_plan_fill(e, _p(rec), _p(snd), n_nodes, n_src,
                                   tile, block_rows, t_max,
                                   _p32(src_idx), _p32(edge_perm),
                                   _p32(rec_local))
    assert got == num_blocks
    return src_idx, edge_perm, rec_local, int(t_max), num_blocks


def att_plan_arrays(rec, snd, n_nodes: int, n_src: int, block_rows: int,
                    x: int):
    """Native attention-plan fill (see native/graphops.cpp). Returns
    (src_idx, slot_edge, rec_local [i32, nb*x], edge_slot [i32, e]) or
    None when the library is unavailable; raises if a block's edge
    count exceeds x (callers pre-check)."""
    lib = _load()
    if lib is None:
        return None
    rec, snd = _c64(rec), _c64(snd)
    e = rec.shape[0]
    nb = max(1, -(-n_nodes // block_rows))
    src_idx = np.empty(nb * x, np.int32)
    slot_edge = np.empty(nb * x, np.int32)
    rec_local = np.empty(nb * x, np.int32)
    edge_slot = np.empty(e, np.int32)
    got = lib.att_plan_fill(e, _p(rec), _p(snd), n_nodes, n_src,
                            block_rows, x, _p32(src_idx), _p32(slot_edge),
                            _p32(rec_local), _p32(edge_slot))
    if got < 0:
        raise ValueError("att_plan_fill: block edge count exceeds x")
    assert got == nb
    return src_idx, slot_edge, rec_local, edge_slot


def spmm_plan_arrays(rec, snd, n_nodes: int, n_src: int, tile: int,
                     block_rows: int):
    """Native SpMM-plan build (see native/graphops.cpp). Returns
    (src_idx[i32, T*tile], edge_perm[i32, T*tile],
     rec_local[i32, T, tile], block_id[i32, T]) or None when the native
    library is unavailable (callers fall back to the numpy builder)."""
    lib = _load()
    if lib is None:
        return None
    rec, snd = _c64(rec), _c64(snd)
    e = rec.shape[0]
    t = lib.spmm_plan_num_tiles(e, _p(rec), n_nodes, tile, block_rows)
    src_idx = np.empty(t * tile, np.int32)
    edge_perm = np.empty(t * tile, np.int32)
    rec_local = np.empty(t * tile, np.int32)
    block_id = np.empty(t, np.int32)
    got = lib.spmm_plan_fill(e, _p(rec), _p(snd), n_nodes, n_src, tile,
                             block_rows, _p32(src_idx), _p32(edge_perm),
                             _p32(rec_local), _p32(block_id))
    if got != t:
        raise ValueError("spmm_plan_fill: receivers not dst-sorted")
    return src_idx, edge_perm, rec_local.reshape(t, tile), block_id
