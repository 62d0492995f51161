"""Message-passing op surface with backend dispatch.

Tiers (same API, parity-tested against each other):
  a) refops  — XLA segment primitives (CPU-runnable oracle)
  b) pallas  — hand-written TPU kernels (ops/spmm_pallas.py)
  c) sharded — shard_map + halo exchange (distributed/)

`set_backend("xla"|"pallas")` flips the hot SpMM path globally;
individual call sites can also pass through explicitly.
"""

from glnn_tpu.ops import refops as _ref
from glnn_tpu.ops.refops import (
    copy_u_mean,
    edge_softmax,
    gather_src,
    gcn_norm_both,
    u_add_v,
    u_mul_e_sum,
)

_BACKEND = "xla"


def set_backend(name: str) -> None:
    global _BACKEND
    if name not in ("xla", "pallas"):
        raise ValueError(f"unknown ops backend {name!r}")
    _BACKEND = name


def get_backend() -> str:
    return _BACKEND


def copy_u_sum(g, x):
    if _BACKEND == "pallas":
        from glnn_tpu.ops import spmm_pallas

        if spmm_pallas.supported(g, x):
            return spmm_pallas.copy_u_sum(g, x)
    return _ref.copy_u_sum(g, x)


__all__ = [
    "copy_u_sum", "copy_u_mean", "u_mul_e_sum", "u_add_v",
    "edge_softmax", "gcn_norm_both", "gather_src",
    "set_backend", "get_backend",
]
