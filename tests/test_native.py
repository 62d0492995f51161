"""Native C++ graph kernels vs numpy fallback parity."""

import numpy as np
import pytest

from glnn_tpu import native


def _rand(n=500, e=4000, seed=0):
    rs = np.random.RandomState(seed)
    return rs.randint(0, n, e), rs.randint(0, n, e), n


def test_native_builds():
    assert native.available(), (
        "libglnnops.so failed to build — check native/Makefile and g++"
    )


def test_coo_to_csr():
    src, dst, n = _rand()
    indptr, indices = native.coo_to_csr(src, dst, n)
    assert indptr[-1] == len(src)
    for v in range(0, n, 37):
        got = sorted(indices[indptr[v]:indptr[v + 1]].tolist())
        assert got == sorted(dst[src == v].tolist())


def test_to_bidirected_matches_numpy():
    src, dst, n = _rand(seed=1)
    so, do = native.to_bidirected(src, dst, n)
    # numpy reference
    s2 = np.concatenate([src, dst])
    d2 = np.concatenate([dst, src])
    key = np.unique(s2 * n + d2)
    got = np.sort(so * n + do)
    np.testing.assert_array_equal(got, key)


def test_connected_components():
    # chain 0-1-2, chain 3-4, isolated 5
    src = np.array([0, 1, 3])
    dst = np.array([1, 2, 4])
    k, comp = native.connected_components(src, dst, 6)
    assert k == 3
    assert comp[0] == comp[1] == comp[2]
    assert comp[3] == comp[4]
    assert comp[5] not in (comp[0], comp[3])


def test_induced_subgraph():
    src = np.array([0, 1, 2, 3])
    dst = np.array([1, 2, 3, 0])
    so, do = native.induced_subgraph(src, dst, 4, np.array([2, 3, 0]))
    pairs = set(zip(so.tolist(), do.tolist()))
    assert pairs == {(0, 1), (1, 2)}


def test_large_roundtrip_consistency():
    """Native and numpy paths agree on a bigger random graph."""
    src, dst, n = _rand(n=3000, e=40000, seed=2)
    indptr_n, indices_n = native.coo_to_csr(src, dst, n)
    order = np.argsort(src, kind="stable")
    counts = np.bincount(src, minlength=n)
    indptr_ref = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=indptr_ref[1:])
    np.testing.assert_array_equal(indptr_n, indptr_ref)
    # per-row sets equal (order within a row may differ)
    ref_sorted = dst[order]
    for v in range(0, n, 211):
        a = np.sort(indices_n[indptr_n[v]:indptr_n[v + 1]])
        b = np.sort(ref_sorted[indptr_ref[v]:indptr_ref[v + 1]])
        np.testing.assert_array_equal(a, b)


def test_native_spmm_plan_matches_numpy():
    """The C++ plan builder must reproduce the numpy builder's plan
    exactly (same tiling, same within-tile src ordering)."""
    import numpy as np

    from glnn_tpu import native
    from glnn_tpu.ops import spmm_plan as sp

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")

    rs = np.random.RandomState(3)
    n, e = 700, 5000
    snd = rs.randint(0, n, e).astype(np.int64)
    rec = np.sort(rs.randint(0, n, e)).astype(np.int64)

    got = sp.build_spmm_plan(rec, snd, n, tile=256, block_rows=128)

    # force the numpy fallback by monkeypatching availability
    orig = native.available
    native.available = lambda: False
    try:
        want = sp.build_spmm_plan(rec, snd, n, tile=256, block_rows=128)
    finally:
        native.available = orig

    assert got.num_tiles == want.num_tiles
    assert got.num_blocks == want.num_blocks
    np.testing.assert_array_equal(got.block_id, want.block_id)
    np.testing.assert_array_equal(got.rec_local, want.rec_local)
    np.testing.assert_array_equal(got.src_idx, want.src_idx)
    np.testing.assert_array_equal(got.edge_perm, want.edge_perm)


def test_native_label_propagation_matches_numpy():
    import numpy as np

    from glnn_tpu import native
    from glnn_tpu.distributed import partition as pt

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")

    rs = np.random.RandomState(7)
    n, e = 3000, 24000
    comm = rs.randint(0, 6, n)
    members = [np.where(comm == k)[0] for k in range(6)]
    src = rs.randint(0, n, e)
    dst_in = np.array(
        [members[comm[s]][rs.randint(len(members[comm[s]]))] for s in src])
    dst = np.where(rs.rand(e) < 0.9, dst_in, rs.randint(0, n, e))

    got = native.label_propagation(src, dst, n)

    orig = native.available
    native.available = lambda: False
    try:
        want = pt.label_propagation_labels(src, dst, n)
    finally:
        native.available = orig
    np.testing.assert_array_equal(got, want)


def test_native_block_plan_matches_numpy():
    import numpy as np

    from glnn_tpu import native
    from glnn_tpu.ops import spmm_plan as sp

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")

    rs = np.random.RandomState(9)
    n, e = 5000, 60000
    snd = rs.randint(0, n, e).astype(np.int64)
    rec = np.sort(rs.randint(0, n, e)).astype(np.int64)

    got = sp.build_block_plan(rec, snd, n, device=False)

    orig = native.available
    native.available = lambda: False
    try:
        want = sp.build_block_plan(rec, snd, n, device=False)
    finally:
        native.available = orig

    assert got is not None and want is not None
    assert got.tiles_per_block == want.tiles_per_block
    np.testing.assert_array_equal(got.src_idx, want.src_idx)
    np.testing.assert_array_equal(got.edge_perm, want.edge_perm)
    np.testing.assert_array_equal(np.asarray(got.rec_local),
                                  np.asarray(want.rec_local))
    np.testing.assert_array_equal(got.block_id, want.block_id)


def test_native_att_plan_fill_matches_numpy():
    """r5: single-pass C++ attention-plan fill vs the numpy fallback."""
    import glnn_tpu.native as nat
    from glnn_tpu.ops import attention_plan as ap

    if not nat.available():
        import pytest
        pytest.skip("native lib unavailable")
    rs = np.random.RandomState(3)
    n, e = 700, 5000
    dst = np.sort(rs.randint(0, n, e))
    src = rs.randint(0, n, e)
    p_nat = ap.build_attention_plan(dst, src, n, device=False)
    orig = nat.available
    nat.available = lambda: False
    try:
        p_np = ap.build_attention_plan(dst, src, n, device=False)
    finally:
        nat.available = orig
    for f in ("src_idx", "slot_edge", "rec_lane", "rec_sub", "edge_slot"):
        a = np.asarray(getattr(p_nat, f)).reshape(-1)
        b = np.asarray(getattr(p_np, f)).reshape(-1)
        assert np.array_equal(a, b), f
    for f in ("src_idx", "edge_perm", "rec_local", "block_id"):
        a = np.asarray(getattr(p_nat.bwd, f)).reshape(-1)
        b = np.asarray(getattr(p_np.bwd, f)).reshape(-1)
        assert np.array_equal(a, b), f
