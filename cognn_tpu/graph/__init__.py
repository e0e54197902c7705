from cognn_tpu.graph.io import (  # noqa: F401
    read_edge_list,
    read_partition_file,
    read_vertex_file,
    write_edge_list,
    write_partition_file,
    write_vertex_file,
)
from cognn_tpu.graph.partition import PartyGraph, build_party_graph  # noqa: F401
