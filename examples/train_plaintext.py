#!/usr/bin/env python
"""Minimal end-to-end: 2-party plaintext CoGNN-Opt training on synthetic Cora.

  python examples/train_plaintext.py [--parties 2] [--epochs 30]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parties", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--dataset", default="cora")
    args = ap.parse_args()

    from cognn_tpu.engine import GasEngine, build_device_plan
    from cognn_tpu.graph import build_party_graph
    from cognn_tpu.harness.datasets import synthetic_planetoid

    ds = synthetic_planetoid(args.dataset)
    n = len(ds.features)
    vids = np.arange(n)
    tid = ({v: v % args.parties for v in range(n)}
           if args.parties > 1 else None)
    graphs = []
    for p in range(args.parties):
        g = build_party_graph(ds.src, ds.dst, None, tid, p, args.parties,
                              all_vids=vids)
        g.set_vertex_data(vids, ds.features, ds.labels)
        graphs.append(g)

    engine = GasEngine(build_device_plan(graphs), ds.param, "opt")
    for e in range(args.epochs):
        m = engine.metrics_host(engine.run_epoch())
        if (e + 1) % 10 == 0 or e == 0:
            print(f"epoch {e+1:3d}: loss={m['loss'].mean():.4f} "
                  f"train={m['train_acc'].mean():.3f} "
                  f"test={m['test_acc'].mean():.3f} "
                  f"border_test={m['border_test_acc'].mean():.3f}")


if __name__ == "__main__":
    main()
