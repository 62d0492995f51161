"""Loss/metric primitives with the reference's numeric contracts.

* Teacher/hard-label loss: NLL over log-probs
  (`NLLLoss(log_softmax(logits))`, /root/reference/train_teacher.py:237,
  train_and_eval.py:21-22).
* Distill soft loss: `KLDivLoss(reduction="batchmean", log_target=True)`
  on student log-probs vs teacher log-probs — sum over classes of
  exp(t) * (t - s), averaged over the batch; NO temperature anywhere
  (/root/reference/train_student.py:279).
* Score: plain argmax accuracy (/root/reference/utils.py:151-156).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def log_softmax(logits: jax.Array) -> jax.Array:
    # always f32: reduced-precision compute tiers (SAGE compute_dtype
    # bfloat16) emit bf16 logits, but losses and the out.npz log-prob
    # contract stay full precision
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


def nll_loss(log_probs: jax.Array, labels: jax.Array) -> jax.Array:
    picked = jnp.take_along_axis(log_probs, labels[:, None], axis=-1)
    return -jnp.mean(picked)


def kl_div_batchmean_log_target(student_logp: jax.Array,
                                teacher_logp: jax.Array) -> jax.Array:
    per_elem = jnp.exp(teacher_logp) * (teacher_logp - student_logp)
    return jnp.sum(per_elem) / student_logp.shape[0]


def accuracy(log_probs: jax.Array, labels: jax.Array) -> jax.Array:
    return jnp.mean((jnp.argmax(log_probs, axis=-1) == labels).astype(jnp.float32))
