"""On-device neighbor sampler + sampled SAGE parity tests."""

import jax
import jax.numpy as jnp
import numpy as np

from glnn_tpu.graph.container import build_graph
from glnn_tpu.nn.models import Model
from glnn_tpu.sampling.sampler import frontier_caps, sample_blocks


def _graph(n=120, e=800, seed=0):
    rs = np.random.RandomState(seed)
    return build_graph(rs.randint(0, n, e), rs.randint(0, n, e), n)


def test_full_fanout_covers_all_neighbors():
    g = _graph()
    seeds = jnp.arange(16, dtype=jnp.int32)
    max_deg = int(np.asarray(g.in_degrees).max())
    blocks = sample_blocks(g, seeds, [max_deg], jax.random.PRNGKey(0))
    # per seed: valid count == true in-degree, neighbors == true set
    send = np.asarray(g.senders)
    recv = np.asarray(g.receivers)
    inp = np.asarray(blocks.input_nodes)
    nbr = np.asarray(blocks.nbr_local[0])
    val = np.asarray(blocks.valid[0])
    for i, s in enumerate(np.asarray(seeds)):
        true_nbrs = sorted(send[recv == s].tolist())
        got = sorted(inp[nbr[i][val[i]]].tolist())
        assert got == true_nbrs


def test_sampled_forward_matches_full_when_fanout_full():
    """With fanout >= max degree and eval mode, the block forward must
    equal the full-graph forward restricted to the seeds."""
    g = _graph()
    x = jnp.asarray(np.random.RandomState(1).randn(120, 16)
                    .astype(np.float32))
    model = Model(dict(model_name="SAGE", num_layers=2, hidden_dim=32,
                       label_dim=5, dropout_ratio=0.0, norm_type="none"))
    v = model.init(jax.random.PRNGKey(0), g, x)
    full = model.apply(v, g, x, training=False)[1]

    seeds = jnp.asarray([3, 50, 77, 119], jnp.int32)
    max_deg = int(np.asarray(g.in_degrees).max())
    blocks = sample_blocks(g, seeds, [max_deg, max_deg],
                           jax.random.PRNGKey(1))
    x_in = jnp.take(
        jnp.concatenate([x, jnp.zeros((1, 16))]), blocks.input_nodes, axis=0)
    sampled = model.apply(v, blocks, x_in, training=False)[1]
    np.testing.assert_allclose(sampled, full[np.asarray(seeds)], rtol=1e-4,
                               atol=1e-5)


def test_sampled_fanout_limits_neighbors():
    g = _graph()
    seeds = jnp.arange(32, dtype=jnp.int32)
    blocks = sample_blocks(g, seeds, [3], jax.random.PRNGKey(2))
    val = np.asarray(blocks.valid[0])
    deg = np.asarray(g.in_degrees)[np.asarray(seeds)]
    assert (val.sum(1) == np.minimum(deg, 3)).all()
    # sampled neighbors are genuine in-neighbors
    send, recv = np.asarray(g.senders), np.asarray(g.receivers)
    inp = np.asarray(blocks.input_nodes)
    nbr = np.asarray(blocks.nbr_local[0])
    for i, s in enumerate(np.asarray(seeds)):
        true_nbrs = set(send[recv == s].tolist())
        got = set(inp[nbr[i][val[i]]].tolist())
        assert got <= true_nbrs


def test_without_replacement_when_deg_exceeds_fanout():
    """DGL parity (/root/reference/train_and_eval.py:179-181): deg >
    fanout must draw a uniform k-subset WITHOUT replacement."""
    d, k = 50, 10
    src = np.arange(1, d + 1)            # node 0 has in-nbrs 1..50, once each
    dst = np.zeros(d, np.int64)
    g = build_graph(src, dst, d + 1)
    seeds = jnp.zeros((1,), jnp.int32)

    counts = np.zeros(d + 1, np.int64)
    for trial in range(200):
        blocks = sample_blocks(g, seeds, [k], jax.random.PRNGKey(trial))
        val = np.asarray(blocks.valid[0])[0]
        assert val.sum() == k
        inp = np.asarray(blocks.input_nodes)
        got = inp[np.asarray(blocks.nbr_local[0])[0][val]]
        assert len(set(got.tolist())) == k, "duplicate neighbors sampled"
        assert set(got.tolist()) <= set(range(1, d + 1))
        np.add.at(counts, got, 1)
    # uniformity: each neighbor expected 200*k/d = 40 times; loose 3-sigma
    freq = counts[1:]
    assert freq.min() > 15 and freq.max() < 75, freq


def test_take_all_parity_unchanged_by_floyd():
    """deg <= fanout still takes every neighbor exactly once."""
    d = 6
    g = build_graph(np.arange(1, d + 1), np.zeros(d, np.int64), d + 1)
    blocks = sample_blocks(g, jnp.zeros((1,), jnp.int32), [10],
                           jax.random.PRNGKey(0))
    val = np.asarray(blocks.valid[0])[0]
    inp = np.asarray(blocks.input_nodes)
    got = sorted(inp[np.asarray(blocks.nbr_local[0])[0][val]].tolist())
    assert got == list(range(1, d + 1))


def test_overflow_flag():
    g = _graph()
    seeds = jnp.arange(64, dtype=jnp.int32)
    tight = [8, 64]                              # far below needed
    blocks = sample_blocks(g, seeds, [5], jax.random.PRNGKey(3),
                           caps=tight[:1])
    assert bool(blocks.overflowed)


def test_ghost_seed_padding():
    g = _graph()
    seeds = jnp.asarray([1, 2, g.n_nodes, g.n_nodes], jnp.int32)
    blocks = sample_blocks(g, seeds, [4], jax.random.PRNGKey(4))
    val = np.asarray(blocks.valid[0])
    assert val[2:].sum() == 0                   # ghosts sample nothing
    assert np.asarray(blocks.out_real[0]).tolist() == [True, True, False,
                                                       False]


def test_sampled_epoch_learns(synth_small):
    from glnn_tpu.train import create_train_state, make_adam, make_eval_fn
    from glnn_tpu.train.sage_sampled import make_sage_sampled_epoch_fn
    from glnn_tpu.train.losses import accuracy

    g, labels, itr, iva, ite = synth_small
    G = g.to_device()
    feats = jnp.asarray(g.ndata["feat"])
    labels_d = jnp.asarray(labels)
    model = Model(dict(model_name="SAGE", num_layers=2, hidden_dim=32,
                       label_dim=5, dropout_ratio=0.0, norm_type="batch"))
    opt = make_adam(0.01, 0.0)
    state = create_train_state(model.init(jax.random.PRNGKey(0), G, feats),
                               opt)
    epoch_fn = make_sage_sampled_epoch_fn(model, opt, batch_size=64,
                                          fanouts=[5, 5])
    idx = jnp.asarray(itr)
    losses = []
    for ep in range(15):
        state, loss, ovf = epoch_fn(state, G, feats, labels_d, idx,
                                    jax.random.PRNGKey(ep))
        losses.append(float(loss))
        assert not bool(ovf)
    assert losses[-1] < losses[0] * 0.7

    out = make_eval_fn(model)(state.params, state.batch_stats, G, feats)
    acc = float(accuracy(out[np.asarray(ite)], labels_d[np.asarray(ite)]))
    assert acc > 0.8, f"sampled SAGE failed to learn: {acc}"


def test_masked_batchnorm_ignores_ghost_rows():
    import flax.linen as nn

    from glnn_tpu.nn.layers import BatchNorm1d

    rs = np.random.RandomState(0)
    x_real = rs.randn(20, 8).astype(np.float32)
    garbage = 100.0 * np.ones((4, 8), np.float32)
    x = jnp.asarray(np.vstack([x_real, garbage]))
    mask = jnp.asarray([True] * 20 + [False] * 4)

    bn = BatchNorm1d(use_running_average=False)
    v = bn.init(jax.random.PRNGKey(0), x, mask)
    y, newv = bn.apply(v, x, mask, mutable=["batch_stats"])

    import torch
    tb = torch.nn.BatchNorm1d(8)
    ty = tb(torch.from_numpy(x_real))
    np.testing.assert_allclose(np.asarray(y)[:20], ty.detach().numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(newv["batch_stats"]["mean"]),
                               tb.running_mean.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(newv["batch_stats"]["var"]),
                               tb.running_var.numpy(), rtol=1e-4, atol=1e-5)


def test_window_sampler_matches_floyd_on_bounded_degree():
    """method='window' shares the Floyd offsets and must be
    bit-identical to the element-gather tier whenever every degree is
    <= WINDOW_EXACT_DEG (=65)."""
    import jax

    from glnn_tpu.sampling.sampler import (WINDOW_EXACT_DEG,
                                           sample_blocks)

    rs = np.random.RandomState(5)
    n = 400
    src = rs.randint(0, n, 3000)
    dst = rs.randint(0, n, 3000)
    g = build_graph(src, dst, n)
    assert int(np.bincount(dst, minlength=n).max()) <= WINDOW_EXACT_DEG
    seeds = jnp.asarray(rs.randint(0, n, 64), jnp.int32)
    rng = jax.random.PRNGKey(9)
    for fanouts in [(3, 5), (15,)]:
        a = sample_blocks(g, seeds, fanouts, rng)
        b = sample_blocks(g, seeds, fanouts, rng, method="window")
        assert (np.asarray(a.input_nodes)
                == np.asarray(b.input_nodes)).all()
        for va, vb in zip(a.valid, b.valid):
            assert (np.asarray(va) == np.asarray(vb)).all()


def test_window_sampler_heavy_node_samples_own_neighbors():
    """Degrees past the window fold onto the node's OWN in-window
    edges: every sample must be a real in-neighbor OF THAT NODE. The
    review repro: an UNALIGNED hub (segment start % 64 != 0) under a
    plain window-width mod wrapped into the PREVIOUS node's edges
    (18% contamination); the per-node fold cap pins this."""
    import jax

    from glnn_tpu.sampling.sampler import sample_blocks

    rs = np.random.RandomState(6)
    n = 200
    hub = 97                      # unaligned segment start (dst-sorted)
    src = np.concatenate([rs.randint(0, n, 700),
                          rs.randint(0, n, 150)])
    dst = np.concatenate([rs.randint(0, n, 700),
                          np.full(150, hub, np.int64)])
    g = build_graph(src, dst, n)
    indptr = np.asarray(g.indptr)
    assert indptr[hub] % 64 != 0          # the repro needs misalignment
    assert indptr[hub + 1] - indptr[hub] > 65
    for seed in range(4):
        seeds = jnp.full((16,), hub, jnp.int32)
        blocks = sample_blocks(g, seeds, (7,), jax.random.PRNGKey(seed),
                               method="window")
        nbr = np.asarray(blocks.input_nodes)[16:]
        real_in = set(np.asarray(g.senders)[
            np.asarray(g.receivers) == hub].tolist())
        bad = [v for v in nbr.tolist() if v not in real_in and v != n]
        assert not bad, f"cross-node contamination: {bad[:5]}" 


def test_window1_table_bit_identical_to_floyd():
    """The r5 aligned 1-touch window table (Graph.with_window_table)
    produces bit-identical samples to the exact Floyd tier for every
    node with deg <= 64 (all nodes here)."""
    rs = np.random.RandomState(11)
    n, e = 500, 6000
    g = build_graph(rs.randint(0, n, e), rs.randint(0, n, e), n)
    deg = np.asarray(g.in_degrees)
    assert deg.max() <= 64
    gw = g.with_window_table()
    assert gw.win1.shape == (n + 1, 64)
    # ghost row is all-ghost
    assert (np.asarray(gw.win1)[n] == n).all()
    seeds = jnp.asarray(rs.randint(0, n, 64), jnp.int32)
    for s in range(3):
        rng = jax.random.PRNGKey(s)
        bf = sample_blocks(g, seeds, (5, 10), rng, method="floyd")
        bw = sample_blocks(gw, seeds, (5, 10), rng, method="window")
        assert np.array_equal(np.asarray(bf.input_nodes),
                              np.asarray(bw.input_nodes))


def test_window1_heavy_node_samples_own_neighbors():
    """Fold bias stays within the node's own first-64 edges."""
    rs = np.random.RandomState(12)
    n = 200
    hub = 53
    src = np.concatenate([rs.randint(0, n, 600),
                          rs.randint(0, n, 150)])
    dst = np.concatenate([rs.randint(0, n, 600),
                          np.full(150, hub, np.int64)])
    g = build_graph(src, dst, n).with_window_table()
    real_in = set(np.asarray(g.senders)[
        np.asarray(g.receivers) == hub].tolist())
    for seed in range(4):
        seeds = jnp.full((16,), hub, jnp.int32)
        blocks = sample_blocks(g, seeds, (7,), jax.random.PRNGKey(seed),
                               method="window")
        nbr = np.asarray(blocks.input_nodes)[16:]
        bad = [v for v in nbr.tolist() if v not in real_in and v != n]
        assert not bad, f"cross-node contamination: {bad[:5]}"


def test_sage_bf16_compute_dtype_epoch_close_to_f32():
    """compute_dtype=bfloat16 (r5): the sampled epoch runs with bf16
    frontier activations and tracks the f32 loss closely; params stay
    f32."""
    from glnn_tpu.nn.models import Model
    from glnn_tpu.train import create_train_state, make_adam
    from glnn_tpu.train.sage_sampled import make_sage_sampled_epoch_fn

    rs = np.random.RandomState(13)
    n, e = 400, 4000
    g = build_graph(rs.randint(0, n, e), rs.randint(0, n, e),
                    n).with_window_table()
    x = jnp.asarray(rs.randn(n, 32).astype(np.float32))
    labels = jnp.asarray(rs.randint(0, 5, n))
    itr = jnp.arange(200)
    opt = make_adam(0.01, 0.0)
    losses = {}
    for cd in ("float32", "bfloat16"):
        m = Model(dict(model_name="SAGE", num_layers=2, hidden_dim=64,
                       label_dim=5, dropout_ratio=0.0,
                       norm_type="batch", compute_dtype=cd))
        st = create_train_state(m.init(jax.random.PRNGKey(0), g, x), opt)
        ep = make_sage_sampled_epoch_fn(m, opt, 64, (3, 5),
                                        sampler_tier="window")
        st, loss, _ = ep(st, g, x, labels, itr, jax.random.PRNGKey(1))
        losses[cd] = float(loss)
        for p in jax.tree_util.tree_leaves(st.params):
            assert p.dtype == jnp.float32
    assert abs(losses["bfloat16"] - losses["float32"]) < 0.05 * (
        abs(losses["float32"]) + 1e-6)
