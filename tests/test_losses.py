"""Loss parity vs torch (the reference's criteria are torch modules)."""

import numpy as np
import jax.numpy as jnp

from glnn_tpu.train.losses import (
    kl_div_batchmean_log_target,
    log_softmax,
    nll_loss,
)


def test_nll_matches_torch():
    import torch

    rs = np.random.RandomState(0)
    logits = rs.randn(32, 7).astype(np.float32)
    labels = rs.randint(0, 7, 32)

    t = torch.nn.NLLLoss()(
        torch.log_softmax(torch.from_numpy(logits), dim=1),
        torch.from_numpy(labels),
    ).item()
    j = float(nll_loss(log_softmax(jnp.asarray(logits)), jnp.asarray(labels)))
    assert abs(t - j) < 1e-5


def test_kl_matches_torch():
    import torch

    rs = np.random.RandomState(1)
    s_logits = rs.randn(16, 5).astype(np.float32)
    t_logits = rs.randn(16, 5).astype(np.float32)

    s_logp_t = torch.log_softmax(torch.from_numpy(s_logits), dim=1)
    t_logp_t = torch.log_softmax(torch.from_numpy(t_logits), dim=1)
    t = torch.nn.KLDivLoss(reduction="batchmean", log_target=True)(
        s_logp_t, t_logp_t
    ).item()

    j = float(kl_div_batchmean_log_target(
        log_softmax(jnp.asarray(s_logits)), log_softmax(jnp.asarray(t_logits))
    ))
    assert abs(t - j) < 1e-5


def test_adam_matches_torch():
    """One Adam step with coupled weight decay must match torch."""
    import torch

    from glnn_tpu.train.state import make_adam

    rs = np.random.RandomState(2)
    w0 = rs.randn(4, 3).astype(np.float32)
    grad = rs.randn(4, 3).astype(np.float32)

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.Adam([tw], lr=0.01, weight_decay=0.05)
    tw.grad = torch.from_numpy(grad.copy())
    opt.step()
    opt.step_result = tw.detach().numpy()

    jopt = make_adam(0.01, 0.05)
    params = {"w": jnp.asarray(w0)}
    state = jopt.init(params)
    updates, state = jopt.update({"w": jnp.asarray(grad)}, state, params)
    jw = np.asarray(params["w"] + updates["w"])
    np.testing.assert_allclose(jw, opt.step_result, rtol=1e-5, atol=1e-6)
