#!/usr/bin/env python
"""Vertex-centric graph analytics (pagerank / BFS / components / SSSP)
over a 2-party partitioned graph.

  python examples/analytics.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main():
    from cognn_tpu.engine import (
        AnalyticsEngine,
        bfs_program,
        build_device_plan,
        cc_program,
        pagerank_program,
    )
    from cognn_tpu.graph import build_party_graph
    from cognn_tpu.harness.datasets import synthetic_planetoid

    ds = synthetic_planetoid("cora_small")
    n = len(ds.features)
    vids = np.arange(n)
    tid = {v: v % 2 for v in range(n)}
    graphs = [build_party_graph(ds.src, ds.dst, None, tid, p, 2,
                                all_vids=vids) for p in range(2)]
    plan = build_device_plan(graphs)

    pr = AnalyticsEngine(plan, pagerank_program(num_vertices=n)).run(30)
    top = np.argsort(-np.asarray(pr).ravel())[:5]
    print("pagerank top-5 (party*V + idx):", top.tolist())

    bfs = AnalyticsEngine(plan, bfs_program((0, 0))).run(n)
    d = np.asarray(bfs)
    reach = d[d < 1e9]
    print(f"BFS from vid {graphs[0].local_vids[0]}: reached "
          f"{(d < 1e9).sum()} vertices, max hop {reach.max():.0f}")

    cc = AnalyticsEngine(plan, cc_program()).run(n)
    labels = np.asarray(cc)[np.asarray(plan.vertex_mask)]
    print(f"connected components: {len(np.unique(labels))}")

    # secret-shared execution of the same programs (the reference's
    # ss-pagerank/ss-bfs HE path, rebuilt on additive shares)
    from cognn_tpu.mpc.analytics import SSAnalyticsEngine

    ss_bfs = SSAnalyticsEngine(plan, "bfs", source=(0, 0)).run(n)
    match = np.allclose(np.minimum(np.asarray(bfs), 2.0**20),
                        np.minimum(ss_bfs, 2.0**20), atol=1e-3)
    print(f"secret-shared BFS == plaintext BFS: {match}")

    ss_pr = SSAnalyticsEngine(plan, "pagerank", num_vertices=n).run(30)
    err = np.abs(ss_pr - np.asarray(pr)).max()
    print(f"secret-shared pagerank max |err| vs plaintext: {err:.2e}")


if __name__ == "__main__":
    main()
