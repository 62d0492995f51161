"""Test harness: force the CPU backend with 8 virtual devices so
sharding/collective tests run without real multi-chip hardware
(SURVEY.md §4 strategy)."""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

# The axon TPU plugin registers itself via sitecustomize and overrides
# JAX_PLATFORMS; the config update below wins if applied before first use.
# GLNN_TESTS_TPU=1 keeps the real TPU backend instead, for the few
# hardware-gated tests (in-kernel PRNG dropout) that interpret mode
# cannot execute: `GLNN_TESTS_TPU=1 pytest tests/test_tpu_hw.py`.
if not os.environ.get("GLNN_TESTS_TPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from glnn_tpu.graph.datasets import load_synth_data


@pytest.fixture(scope="session")
def synth_small():
    """Noisy planted-partition graph where GNN > MLP."""
    g, labels, itr, iva, ite = load_synth_data(
        "synth-n512-c5-f32-d8-noise3.0", 0, 20, 30
    )
    return g, labels, itr, iva, ite


@pytest.fixture(scope="session")
def tiny_graph():
    """5-node hand-checkable graph (no self loops, directed)."""
    from glnn_tpu.graph.host import HostGraph

    src = np.array([0, 1, 2, 3, 4, 0, 2])
    dst = np.array([1, 2, 3, 4, 0, 2, 0])
    g = HostGraph(src, dst, 5)
    g.ndata["feat"] = np.arange(5 * 3, dtype=np.float32).reshape(5, 3)
    return g


def dense_adj(g):
    """Dense adjacency A[dst, src] view for oracle computations."""
    A = np.zeros((g.n_nodes, g.n_nodes), np.float32)
    for s, d in zip(g.src, g.dst):
        A[d, s] += 1.0
    return A
