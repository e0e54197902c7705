"""Experiment: per-epoch time of the scan-compiled training loop by backend.

Usage: python tools/bench_epoch_scan.py [--agg sparse,dense] [--scan 64]
Chains scan dispatches until the wall window is honest (>= 0.5 s), same
methodology as bench.py.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--agg", default="sparse,dense")
    ap.add_argument("--scan", type=int, default=64)
    ap.add_argument("--dataset", default="cora")
    ap.add_argument("--parties", type=int, default=2)
    ap.add_argument("--mpc", action="store_true",
                    help="secret-shared engine (per-epoch dispatches, "
                         "phase-jit)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cognn_tpu.engine import GasEngine, build_device_plan
    from cognn_tpu.graph import build_party_graph
    from cognn_tpu.harness.datasets import synthetic_planetoid

    ds = synthetic_planetoid(args.dataset)
    n = len(ds.features)
    vids = np.arange(n)
    tid = {v: v % args.parties for v in range(n)}
    graphs = []
    for p in range(args.parties):
        g = build_party_graph(ds.src, ds.dst, None, tid, p, args.parties,
                              all_vids=vids)
        g.set_vertex_data(vids, ds.features, ds.labels)
        graphs.append(g)

    def hard_sync(x):
        return float(np.asarray(jnp.sum(x)))

    log(f"backend={jax.default_backend()} edges={len(ds.src)} "
        f"mpc={args.mpc}")
    for agg in args.agg.split(","):
        plan = build_device_plan(graphs, lane=128, dense=(agg == "dense"))
        if args.mpc:
            from cognn_tpu.mpc import MpcGasEngine

            eng = MpcGasEngine(plan, ds.param, "opt", aggregation=agg)
            sync_arr = lambda: eng.weights_sh[0]  # noqa: E731
            run = lambda: eng.run_epoch()  # noqa: E731
            per_call = 1
        else:
            eng = GasEngine(plan, ds.param, "opt", aggregation=agg)
            sync_arr = lambda: eng.weights[0]  # noqa: E731
            run = lambda: eng.run_epochs_scan(args.scan)  # noqa: E731
            per_call = args.scan
        t0 = time.perf_counter()
        m = run()
        hard_sync(sync_arr())
        log(f"[{agg}] compile+first call: {time.perf_counter() - t0:.2f}s")
        reps = 1
        while True:
            t0 = time.perf_counter()
            for _ in range(reps):
                m = run()
            hard_sync(sync_arr())
            dt = time.perf_counter() - t0
            if dt >= 0.5 or reps >= 512:
                break
            reps = min(512, max(reps * 2, int(reps * 0.6 / max(dt, 1e-6))))
        per_epoch = dt / (reps * per_call)
        eps = eng.epoch_layers * len(ds.src) / per_epoch
        loss = np.asarray(m["loss"])
        loss = loss[0, -1] if loss.ndim == 2 else loss[0]
        log(f"[{agg}] per-epoch {per_epoch*1e6:.0f} us  "
            f"({reps} x {per_call})  edge-iters/s {eps:.3g}  "
            f"loss={float(loss):.4f}")


if __name__ == "__main__":
    main()
