#!/usr/bin/env python
"""Inter-edge (cross-party) ratio per partition count — reference
`tools/plot/print_inter_edge_ratio.py` equivalent.

With the round-robin partition the reference reports Cora 0.51/0.68/0.76/0.81
at 2/3/4/5 parties (BASELINE.md); same computation here over any edge list +
partition files or the built-in synthetic datasets.

  python tools/plot/print_inter_edge_ratio.py --dataset cora
  python tools/plot/print_inter_edge_ratio.py --edge-file E --part-file P2 P3
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default=None)
    ap.add_argument("--edge-file", default=None)
    ap.add_argument("--part-file", nargs="*", default=[])
    ap.add_argument("--parties", type=int, nargs="+", default=[2, 3, 4, 5])
    args = ap.parse_args()

    if args.edge_file:
        from cognn_tpu.graph import read_edge_list, read_partition_file

        src, dst, _ = read_edge_list(args.edge_file)
        for pf in args.part_file:
            tidmap = read_partition_file(pf, 1 << 30)
            t = np.array([tidmap[int(v)] for v in src])
            u = np.array([tidmap[int(v)] for v in dst])
            ratio = float((t != u).mean())
            print(f"{pf}: inter-edge ratio {ratio:.2f} "
                  f"({(t != u).sum()}/{len(src)})")
    else:
        from cognn_tpu.harness.datasets import synthetic_planetoid

        ds = synthetic_planetoid(args.dataset or "cora")
        for p in args.parties:
            inter = (ds.src % p) != (ds.dst % p)
            print(f"{ds.name} {p} parties: inter-edge ratio "
                  f"{float(inter.mean()):.2f} ({inter.sum()}/{len(ds.src)})")


if __name__ == "__main__":
    main()
