"""Hardware-gated tests (skipped on the CPU harness): properties of
the in-kernel hardware-PRNG attention dropout (ops/gat_pallas.py
_drop_weights seed mode), which interpret mode cannot execute
(prng_seed has no interpret lowering).

Run on the attached TPU with:  GLNN_TESTS_TPU=1 pytest tests/test_tpu_hw.py
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="in-kernel PRNG dropout needs compiled Pallas (TPU)")


def _graph(n=4096, e=40_000, seed=0):
    from glnn_tpu.graph.container import build_graph

    rs = np.random.RandomState(seed)
    return build_graph(rs.randint(0, n, e), rs.randint(0, n, e),
                       n).with_plans(softmax=True)


def _inputs(g, h=4, d=16):
    k = jax.random.PRNGKey(1)
    feat = jax.random.normal(k, (g.n_nodes, h, d), jnp.float32)
    al = jax.random.normal(jax.random.PRNGKey(2), (h, d)) * 0.3
    ar = jax.random.normal(jax.random.PRNGKey(3), (h, d)) * 0.3
    return feat, al, ar


def test_prng_dropout_deterministic_and_key_sensitive():
    from glnn_tpu.ops import gat_pallas as gp

    g = _graph()
    feat, al, ar = _inputs(g)
    f = jax.jit(lambda key: gp.gat_attention(
        g, feat, al, ar, drop_rate=0.5, drop_rng=key))
    a = np.asarray(f(jax.random.PRNGKey(7)))
    b = np.asarray(f(jax.random.PRNGKey(7)))
    c = np.asarray(f(jax.random.PRNGKey(8)))
    assert (a == b).all()
    assert (a != c).any()
    # grads deterministic too (fwd+bwd kernels regenerate the SAME mask)
    gfn = jax.jit(jax.grad(lambda ff, key: gp.gat_attention(
        g, ff, al, ar, drop_rate=0.5, drop_rng=key).sum()))
    ga = np.asarray(gfn(feat, jax.random.PRNGKey(7)))
    gb = np.asarray(gfn(feat, jax.random.PRNGKey(7)))
    assert (ga == gb).all()


def test_prng_dropout_mean_preserving():
    """Averaged over keys, dropped output approaches the no-drop
    output (masks are Bernoulli(keep)/keep per (slot, head))."""
    from glnn_tpu.ops import gat_pallas as gp

    g = _graph()
    feat, al, ar = _inputs(g)
    base = np.asarray(gp.gat_attention(g, feat, al, ar))
    f = jax.jit(lambda key: gp.gat_attention(
        g, feat, al, ar, drop_rate=0.3, drop_rng=key))
    acc = np.zeros_like(base)
    kk = 24
    for i in range(kk):
        acc += np.asarray(f(jax.random.PRNGKey(100 + i)))
    mean = acc / kk
    scale = np.abs(base).max()
    # loose statistical bound: per-element sigma ~ alpha-weighted
    assert np.abs(mean - base).mean() < 0.12 * scale
