from glnn_tpu.nn.models import MLP, SAGE, GCN, GAT, APPNP, Model
from glnn_tpu.nn.layers import (
    SAGEConvGCN, GraphConv, GATConv, appnp_propagate, make_norm,
)

__all__ = [
    "MLP", "SAGE", "GCN", "GAT", "APPNP", "Model",
    "SAGEConvGCN", "GraphConv", "GATConv", "appnp_propagate", "make_norm",
]
