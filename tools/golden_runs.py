#!/usr/bin/env python
"""Golden accuracy runs (GOLDEN.md evidence).

90-epoch CoGNN-Opt training across party counts, plaintext and
secret-shared. Defaults to the synthetic statistics-matched Planetoid
datasets (deterministic, no egress); pass ``--planetoid-root DIR`` holding
real ``ind.<name>.*`` raw files to run the same matrix on real
Cora/CiteSeer/PubMed (reference accuracy claim: `README.md:226-235`).

  python tools/golden_runs.py [--planetoid-root DIR] [--epochs 90]
      [--scan] [--runs plaintext-1p:cora plaintext-2p:cora ...]
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from cognn_tpu.engine import GasEngine, build_device_plan  # noqa: E402
from cognn_tpu.graph import build_party_graph  # noqa: E402
from cognn_tpu.harness.datasets import (  # noqa: E402
    load_planetoid_raw,
    synthetic_planetoid,
)
from cognn_tpu.mpc import MpcGasEngine  # noqa: E402

DEFAULT_RUNS = [
    ("plaintext-1p", "cora", 1, False),
    ("plaintext-2p", "cora", 2, False),
    ("plaintext-4p", "cora", 4, False),
    ("mpc-2p", "cora", 2, True),
    ("plaintext-2p", "citeseer", 2, False),
    ("plaintext-4p", "pubmed", 4, False),
]


def graphs_for(ds, P):
    n = len(ds.features)
    vids = np.arange(n)
    tid = {v: v % P for v in range(n)} if P > 1 else None
    gs = []
    for p in range(P):
        g = build_party_graph(ds.src, ds.dst, None, tid, p, P, all_vids=vids)
        g.set_vertex_data(vids, ds.features, ds.labels)
        gs.append(g)
    return gs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--planetoid-root", default=None, metavar="DIR")
    ap.add_argument("--epochs", type=int, default=90)
    ap.add_argument("--scan", action="store_true",
                    help="run the whole loop as one lax.scan program")
    ap.add_argument("--out", default="golden.json")
    ap.add_argument("--runs", nargs="+", default=None,
                    help="subset as name:dataset[:mpc], e.g. mpc-2p:cora:mpc")
    args = ap.parse_args()

    runs = DEFAULT_RUNS
    if args.runs:
        runs = []
        for spec in args.runs:
            parts = spec.split(":")
            name, dataset = parts[0], parts[1]
            P = int(name.split("-")[-1].rstrip("p"))
            runs.append((name, dataset, P, "mpc" in parts[2:]))

    cache = {}

    def get_ds(dataset):
        if dataset not in cache:
            if args.planetoid_root:
                cache[dataset] = load_planetoid_raw(args.planetoid_root,
                                                    dataset)
                print(f"# real {dataset}: n={len(cache[dataset].features)} "
                      f"m={len(cache[dataset].src)}", flush=True)
            else:
                cache[dataset] = synthetic_planetoid(dataset)
        return cache[dataset]

    results = []
    for name, dataset, P, mpc in runs:
        t0 = time.time()
        ds = get_ds(dataset)
        gs = graphs_for(ds, P)
        plan = build_device_plan(gs, lane=128)
        eng = (MpcGasEngine if mpc else GasEngine)(plan, ds.param)
        m0 = eng.metrics_host(eng.run_epoch())
        compile_s = time.time() - t0
        t0 = time.time()
        if args.scan:
            m = eng.metrics_host(eng.run_epochs_scan(args.epochs - 1))
            m = {k: np.asarray(v)[:, -1] for k, v in m.items()}
        else:
            m = eng.metrics_host(eng.run_epochs(args.epochs - 1))
        train_s = time.time() - t0
        row = dict(name=name, dataset=dataset, parties=P,
                   epochs=args.epochs, mpc=mpc,
                   real_data=bool(args.planetoid_root),
                   loss=float(m["loss"].mean()),
                   full=float(m["full_acc"].mean()),
                   train=float(m["train_acc"].mean()),
                   test=float(m["test_acc"].mean()),
                   border_test=float(m["border_test_acc"].mean()),
                   compile_s=round(compile_s, 1), train_s=round(train_s, 2))
        print(json.dumps(row), flush=True)
        results.append(row)
    json.dump(results, open(args.out, "w"), indent=1)


if __name__ == "__main__":
    main()
