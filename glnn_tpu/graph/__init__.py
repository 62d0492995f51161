from glnn_tpu.graph.container import Graph, build_graph, graph_from_csr
from glnn_tpu.graph.host import HostGraph
from glnn_tpu.graph.datasets import load_data, load_out_t

__all__ = [
    "Graph", "build_graph", "graph_from_csr", "HostGraph",
    "load_data", "load_out_t",
]
