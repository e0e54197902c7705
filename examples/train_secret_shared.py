#!/usr/bin/env python
"""Secret-shared training: every embedding/weight an additive share pair in
Z_2^64 fixed point; compare against plaintext on the same graphs.

  python examples/train_secret_shared.py [--epochs 20]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--aggregation", default="auto",
                    choices=["auto", "sparse", "dense", "bcsr"],
                    help="OGA backend (auto = measured-best; the MXU "
                         "backends are bit-identical to sparse)")
    args = ap.parse_args()

    from cognn_tpu.engine import GasEngine, build_device_plan
    from cognn_tpu.graph import build_party_graph
    from cognn_tpu.harness.datasets import synthetic_planetoid
    from cognn_tpu.mpc import MpcGasEngine

    ds = synthetic_planetoid("cora_small")
    n = len(ds.features)
    vids = np.arange(n)
    tid = {v: v % 2 for v in range(n)}
    graphs = []
    for p in range(2):
        g = build_party_graph(ds.src, ds.dst, None, tid, p, 2, all_vids=vids)
        g.set_vertex_data(vids, ds.features, ds.labels)
        graphs.append(g)

    plain = GasEngine(build_device_plan(graphs), ds.param)
    mpc = MpcGasEngine(build_device_plan(graphs), ds.param,
                       aggregation=args.aggregation)
    mp = plain.metrics_host(plain.run_epochs(args.epochs))
    mm = mpc.metrics_host(mpc.run_epochs(args.epochs))
    print(f"plaintext:     loss={mp['loss'][0]:.4f} "
          f"test={mp['test_acc'].mean():.3f}")
    print(f"secret-shared: loss={mm['loss'][0]:.4f} "
          f"test={mm['test_acc'].mean():.3f}")
    w_sh = np.asarray(mpc.weights_sh[0])
    print(f"one weight SHARE (uniform noise, reveals nothing): "
          f"{w_sh[0, 0, 0, 0, :3]}")
    print(f"reconstructed weight:                              "
          f"{mpc.reveal_weights()[0][0, 0, :3]}")


if __name__ == "__main__":
    main()
