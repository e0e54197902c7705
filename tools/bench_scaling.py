#!/usr/bin/env python
"""Party-scaling benchmark: edges/s at 1..N parties on the available mesh.

The BASELINE north star: ">=80% edges/s scaling efficiency from 1 to 4 hosts
on 4-way-partitioned PubMed". With one real chip this measures the sharded
code path on whatever devices exist (8 virtual CPU devices in tests; a pod
slice in production — same program). The single-party run is the baseline;
efficiency = throughput(N) / (N * throughput(1) / 1) on the PARTITIONED
graph (fixed total work, more devices).

  JAX_PLATFORMS=cpu JAX_NUM_CPU_DEVICES=8 python tools/bench_scaling.py \
      --dataset pubmed --parties 1 2 4 8 --epochs 5
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="pubmed")
    ap.add_argument("--parties", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--epochs", type=int, default=5)
    args = ap.parse_args()

    import jax

    from cognn_tpu.engine import GasEngine, build_device_plan
    from cognn_tpu.graph import build_party_graph
    from cognn_tpu.harness.datasets import synthetic_planetoid

    ds = synthetic_planetoid(args.dataset)
    n = len(ds.features)
    vids = np.arange(n)
    E = len(ds.src)
    ndev = len(jax.devices())
    print(f"backend={jax.default_backend()} devices={ndev} "
          f"dataset={args.dataset} V={n} E={E}")
    if jax.default_backend() == "cpu":
        import os

        cores = os.cpu_count() or 1
        if ndev > cores:
            print(f"NOTE: {ndev} virtual devices on {cores} physical cores "
                  f"— efficiency numbers are NOT meaningful (oversubscribed);"
                  f" this validates the sharded code path only.")

    base = None
    results = []
    for P in args.parties:
        if P > ndev:
            print(f"P={P}: skipped (only {ndev} devices)")
            continue
        tid = {v: v % P for v in range(n)} if P > 1 else None
        graphs = []
        for p in range(P):
            g = build_party_graph(ds.src, ds.dst, None, tid, p, P,
                                  all_vids=vids)
            g.set_vertex_data(vids, ds.features, ds.labels)
            graphs.append(g)
        plan = build_device_plan(graphs, lane=128)
        if P == 1:
            eng = GasEngine(plan, ds.param, "opt")
        else:
            mesh = jax.make_mesh((P,), ("party",))
            eng = GasEngine(plan, ds.param, "opt", mode="sharded", mesh=mesh)
        eng.run_epoch()
        jax.block_until_ready(eng.weights)
        t0 = time.perf_counter()
        for _ in range(args.epochs):
            eng.run_epoch()
        jax.block_until_ready(eng.weights)
        dt = (time.perf_counter() - t0) / args.epochs
        thr = eng.epoch_layers * E / dt
        if base is None:
            base = thr
        eff = thr / base
        results.append({"parties": P, "epoch_s": dt,
                        "edge_iters_per_s": thr, "speedup_vs_1": eff})
        print(f"P={P}: epoch={dt*1e3:.2f} ms  {thr/1e6:.2f}M edge-iters/s  "
              f"speedup vs 1-party: {eff:.2f}x "
              f"(efficiency {eff/P*100:.0f}%)")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
