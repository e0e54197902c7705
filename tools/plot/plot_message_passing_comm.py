#!/usr/bin/env python
"""Analytic per-epoch message-passing communication model — reference
`tools/plot/plot_message_passing_comm.py:23-41` (the paper's Table 6).

Per-epoch bytes for n vertices, m directed edges, dimension sums Σd:
  adjacency-matrix baseline: 2 * 8 * Σd * (n^2 + n) / 2
  GraphSC:                   8 * Σd * 10 * (n + m)
  CoGNN:                     8 * Σd * (n + 5 m)
  CoGNN-Opt:                 same formula with hidden-space dims
Plus this framework's measured-shape model: halo mirror rows per epoch
(from the device plan) — what actually crosses ICI here.

  python tools/plot/plot_message_passing_comm.py --dataset cora [--parties 2]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="cora")
    ap.add_argument("--parties", type=int, default=2)
    args = ap.parse_args()

    from cognn_tpu.engine import build_device_plan
    from cognn_tpu.graph import build_party_graph
    from cognn_tpu.harness.datasets import synthetic_planetoid

    ds = synthetic_planetoid(args.dataset)
    p = ds.param
    n, m = p.num_samples, len(ds.src)
    # dims per GAS round: unopt {input,hidden,hidden}; opt hidden-space
    d_unopt = p.input_dim + 2 * p.hidden_dim
    d_opt = (2 * p.hidden_dim + 2 * p.num_labels + p.hidden_dim
             + p.hidden_dim)  # {h,l,0,l,h,h} (gcn.h:944-948)

    rows = [
        ("adjacency-matrix", 2 * 8 * d_unopt * (n * n + n) / 2),
        ("GraphSC", 8 * d_unopt * 10 * (n + m)),
        ("CoGNN", 8 * d_unopt * (n + 5 * m)),
        ("CoGNN-Opt", 8 * d_opt * (n + 5 * m)),
    ]
    print(f"{ds.name}: n={n} m={m} sum_dims unopt={d_unopt} opt={d_opt}")
    for name, b in rows:
        print(f"  {name:18s} {b/1e9:10.3f} GB/epoch (analytic, reference "
              f"model)")

    # this framework: halo mirror rows per aggregation phase
    vids = np.arange(len(ds.features))
    tid = {v: v % args.parties for v in range(len(vids))}
    graphs = [build_party_graph(ds.src, ds.dst, None, tid, q, args.parties,
                                all_vids=vids)
              for q in range(args.parties)]
    plan = build_device_plan(graphs)
    mirrors = int(plan.recv_mask.sum())
    per_epoch = mirrors * 4 * (2 * p.hidden_dim + 2 * p.num_labels)
    print(f"  {'cognn_tpu (halo)':18s} {per_epoch/1e9:10.3f} GB/epoch "
          f"({mirrors} mirror rows x 4 GAS phases, f32 hidden dims)")


if __name__ == "__main__":
    main()
