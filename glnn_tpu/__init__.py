"""glnn_tpu — a TPU-native graph-less neural network (GLNN) framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
snap-research/graphless-neural-networks (ICLR'22): GNN teachers
(SAGE / GCN / GAT / APPNP) trained on node-classification graphs,
distilled into graph-free MLP students via soft-label KL.

Layering (bottom-up):
  graph/        static graph containers + host-side ingest pipeline
  ops/          message-passing kernels (XLA segment ops + Pallas TPU kernels)
  nn/           flax layers & model zoo (DGL-0.6.1-parity math)
  sampling/     on-device neighbor sampling (padded, fixed-shape blocks)
  train/        jitted train/eval steps + epoch runners (tran/ind/distill)
  distributed/  mesh construction, graph partitioning, halo-exchange SpMM
  utils/        seeding, config, logging, splits, evaluator, feature prop
  cli/          train_teacher / train_student entry points
"""

__version__ = "0.1.0"

from glnn_tpu.graph.container import Graph
from glnn_tpu.nn.models import Model

__all__ = ["Graph", "Model", "__version__"]
