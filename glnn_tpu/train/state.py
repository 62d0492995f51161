"""Functional train state + torch-parity Adam.

torch.optim.Adam(lr, weight_decay) couples L2 into the gradient BEFORE
the moment updates (not AdamW); the optax chain below reproduces that:
add_decayed_weights -> scale_by_adam(eps=1e-8, b1=.9, b2=.999) ->
scale(-lr). (Reference construction: /root/reference/train_teacher.py:234-236.)
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax import struct


def make_adam(learning_rate: float, weight_decay: float) -> optax.GradientTransformation:
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    parts.append(optax.scale(-learning_rate))
    return optax.chain(*parts)


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any            # {} when the model has no BatchNorm
    opt_state: Any

    @property
    def variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v

    def snapshot(self):
        """Device-side copy of the learnable state — the analog of the
        reference's `copy.deepcopy(model.state_dict())` best-checkpoint
        (train_and_eval.py:262-266). JAX arrays are immutable, so just
        keeping the references is a faithful snapshot."""
        return (self.params, self.batch_stats)

    def restore(self, snap):
        params, batch_stats = snap
        return self.replace(params=params, batch_stats=batch_stats)


def create_train_state(variables, optimizer) -> TrainState:
    import jax.numpy as jnp

    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(params),
    )
