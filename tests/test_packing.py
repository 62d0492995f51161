"""Packed one-shot device transfer (utils/packing.py) and the
chunked-plan ghost-source contract.

Through the axon relay every host->device array upload pays a ~45s
floor, so shipping a Graph + SpmmPlans field-by-field (~15 arrays) is
pathological; `ship_packed` must move the whole pytree in ONE buffer
and reproduce it exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from glnn_tpu.graph.container import build_graph
from glnn_tpu.ops import refops
from glnn_tpu.utils.packing import pack_tree, unpack_tree, ship_packed


def _edges(n=700, e=5000, seed=0):
    rs = np.random.RandomState(seed)
    return rs.randint(0, n, e), rs.randint(0, n, e)


def test_pack_roundtrip_mixed_dtypes():
    tree = {
        "a": np.arange(7, dtype=np.int32),
        "b": np.linspace(-3, 9, 10, dtype=np.float32).reshape(2, 5),
        "nested": (np.zeros((3, 1), np.int32),
                   np.float32(-0.0) * np.ones((4,), np.float32)),
    }
    buf, meta = pack_tree(tree)
    assert buf.dtype == np.int32 and buf.ndim == 1
    out = jax.jit(lambda b: unpack_tree(b, meta))(jnp.asarray(buf))
    flat_in, _ = jax.tree_util.tree_flatten(tree)
    flat_out, _ = jax.tree_util.tree_flatten(out)
    for a, b in zip(flat_in, flat_out):
        assert a.shape == b.shape and a.dtype == np.asarray(b).dtype
        np.testing.assert_array_equal(np.asarray(b), a)


def test_pack_rejects_8byte_dtypes():
    import pytest

    with pytest.raises(TypeError):
        pack_tree({"bad": np.arange(3, dtype=np.int64)})


def test_shipped_graph_matches_direct_build():
    src, dst = _edges()
    n = 700
    gh = build_graph(src, dst, n, device=False).with_plans(
        softmax=True, device=False)
    # host build keeps numpy leaves (no per-array uploads)
    assert isinstance(gh.senders, np.ndarray)
    assert isinstance(gh.plans[0].src_idx, np.ndarray)
    g = ship_packed(gh)
    g2 = build_graph(src, dst, n).with_plans(softmax=True)

    for a, b in zip(jax.tree_util.tree_leaves(g),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    x = jnp.asarray(np.random.RandomState(1).randn(n, 32)
                    .astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(refops.copy_u_sum(g, x)),
        np.asarray(refops.copy_u_sum(g2, x)))

    from glnn_tpu.ops import spmm_pallas
    got = np.asarray(spmm_pallas.copy_u_sum(g, x))
    want = np.asarray(refops.copy_u_sum(g, x))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_chunked_ghost_src_is_global_ghost_row():
    """Padding slots in CHUNK plans must gather the global ghost row
    (n_nodes), never a chunk-local row count — a chunk-local default
    points padding at an arbitrary real feature row, and a non-finite
    value there poisons every padded tile through 0 * inf = nan in the
    MXU one-hot matmul."""
    from glnn_tpu.ops import spmm_pallas
    from glnn_tpu.ops.spmm_plan import build_chunked_plans

    n = 700
    src, dst = _edges(n=n, e=6000, seed=3)
    order = np.argsort(dst, kind="stable")
    rec, snd = dst[order], src[order]
    plans = build_chunked_plans(rec, snd, n, tile=128, block_rows=64,
                                max_slots=1024, device=False)
    assert isinstance(plans, tuple) and len(plans) > 2
    e = len(rec)
    for p in plans:
        ghost = np.asarray(p.edge_perm) >= e
        assert ghost.any()
        assert (np.asarray(p.src_idx)[ghost] == n).all()

    # functional: blow up the row a buggy chunk-local ghost would hit
    # (64 = the first chunk's local row count). With the global ghost,
    # padding gathers the appended zero row and the op still matches
    # the oracle exactly (a NaN there would have poisoned whole blocks
    # through 0 * nan in the MXU dot — NaN in a REAL row block-poisons
    # by design and is what --debug_checks exists for).
    g = build_graph(src, dst, n, device=False)
    import dataclasses
    g = ship_packed(dataclasses.replace(
        g, plans=(plans, plans)))   # fwd only; bwd unused here
    x = np.random.RandomState(5).randn(n, 16).astype(np.float32)
    x[64] = 3e4
    out = np.asarray(spmm_pallas.copy_u_sum(g, jnp.asarray(x)))
    want = np.asarray(refops.copy_u_sum(g, jnp.asarray(x)))
    assert np.isfinite(out).all()
    scale = np.abs(want).max()
    np.testing.assert_allclose(out, want, atol=2e-2 * scale)


def test_shipped_attention_plan_roundtrips():
    """The r4 AttentionPlan (nested SpmmPlan included) must survive the
    one-shot packed transfer field-for-field — the bench ships it this
    way before the fused GAT stages."""
    src, dst = _edges(n=400, e=3000, seed=3)
    g_host = build_graph(src, dst, 400, device=False).with_plans(
        device=False)
    assert g_host.smx is not None
    g = ship_packed(g_host)
    a, b = g_host.smx, g.smx
    assert (a.x, a.block_rows, a.num_blocks, a.e_orig) == \
        (b.x, b.block_rows, b.num_blocks, b.e_orig)
    for f in ("src_idx", "slot_edge", "edge_slot", "rec_lane", "rec_sub"):
        np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                      np.asarray(getattr(b, f)))
    np.testing.assert_array_equal(np.asarray(a.bwd.src_idx),
                                  np.asarray(b.bwd.src_idx))
