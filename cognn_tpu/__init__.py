"""cognn_tpu — a TPU-native collaborative GNN message-passing framework.

Ground-up rebuild of the capabilities of InspiringGroup-Lab/CoGNN (CCS 2024):
vertex-centric Scatter-Gather-Apply GCN training and full-graph inference over a
multi-party edge-partitioned global graph, with the 2PC secret-sharing compute
layer re-expressed as vectorized integer JAX/Pallas kernels.

Layer map (mirrors SURVEY.md §1, rebuilt TPU-first):

  core/      fixed-point codec + additive secret-share algebra
             (replaces the external CryptoUtil/TaskUtil, reference
             `include/task/task.h`, README.md:88-108)
  graph/     partitioned graph container + IO
             (replaces `include/graph.h`, `include/graph_io_util.h`)
  ops/       Pallas/XLA hot kernels: segment-sum SpMM, fixed-point share
             matmul, masked conditional add (replaces SCIHarness /
             SecureAggregation / ObliviousMapper call surface)
  models/    GCN model math: CoGNN-Opt / CoGNN(unopt) / inference schedules
             (replaces `algo_kernels/vertex_centric/*/gcn.h`)
  engine/    GAS phase scheduler — the iteration loop — plus the device-mesh
             sharding / halo (mirror-vertex) exchange collectives
             (replaces `include/ss_vertex_centric_algo_kernel.h` and the
             `include/comm_sync.h` + `include/engine.h` channel mesh)
  mpc/       secret-shared execution mode over the same engine
  harness/   CLI + per-party entry points (replaces `include/harness.h`,
             `algo_kernels/common_harness/harness.cpp`)
  utils/     logging (`::<tag> took` spans), glibc rand for init parity
"""

__version__ = "0.1.0"

from cognn_tpu.config import GNNParam  # noqa: F401
