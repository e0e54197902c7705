"""Experiment: per-epoch time of the scan-compiled training loop by backend.

Usage: python tools/bench_epoch_scan.py [--agg sparse,dense,bcsr]
    [--scan 64] [--dataset pubmed] [--parties 4] [--mpc] [--reorder]
Chains scan dispatches until the wall window is honest (>= 0.5 s), same
methodology as bench.py. --mpc uses the scan-compiled secret-shared loop
(--mpc-phase for the per-epoch phase-dispatched loop instead). The
persistent compile cache makes re-runs skip the tunnel compile.
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
                    help="secret-shared engine, scan-compiled loop")
    ap.add_argument("--mpc-phase", action="store_true",
                    help="secret-shared engine, per-epoch phase dispatches")
    ap.add_argument("--reorder", action="store_true",
                    help="BFS-reorder vertices (bcsr block locality)")
    ap.add_argument("--forward", action="store_true",
                    help="benchmark the opt_inference forward pass "
                         "instead of training epochs")
    ap.add_argument("--variant", default="opt", choices=["opt", "unopt"],
                    help="training schedule (unopt = original CoGNN, "
                         "2L-phase epochs)")
    ap.add_argument("--epochs-budget", type=float, default=0.5,
                    help="minimum honest wall window in seconds")
    ap.add_argument("--no-hoist", action="store_true",
                    help="disable the mpc engines' loop-invariant layer-0 "
                         "hoists (reference-faithful unopt schedule)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        cache = Path(__file__).resolve().parent.parent / ".xla_cache"
        cache.mkdir(exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception as e:  # noqa: BLE001
        log(f"(compile cache unavailable: {e})")

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

    mpc = args.mpc or args.mpc_phase
    log(f"backend={jax.default_backend()} dataset={args.dataset} "
        f"P={args.parties} edges={len(ds.src)} mpc={mpc} "
        f"reorder={args.reorder}")
    for agg in args.agg.split(","):
        try:
            plan = build_device_plan(graphs, lane=128,
                                     dense=(agg == "dense"),
                                     reorder=args.reorder)
        except ValueError as e:
            log(f"[{agg}] skipped: {e}")
            continue
        variant = (args.variant + "_inference" if args.forward
                   else args.variant)
        if mpc:
            from cognn_tpu.mpc import MpcGasEngine

            if agg not in ("auto", "sparse", "dense", "bcsr"):
                log(f"[{agg}] skipped: mpc supports auto/sparse/dense/bcsr")
                continue
            eng = MpcGasEngine(plan, ds.param, variant, aggregation=agg,
                               hoist_agg=not args.no_hoist)
            sync_arr = lambda: eng.weights_sh[0]  # noqa: E731
            if args.forward:
                run = lambda: eng.forward()  # noqa: E731
                per_call = 1
            elif args.mpc_phase:
                run = lambda: eng.run_epoch()  # noqa: E731
                per_call = 1
            else:
                run = lambda: eng.run_epochs_scan(args.scan)  # noqa: E731
                per_call = args.scan
        else:
            eng = GasEngine(plan, ds.param, variant, aggregation=agg)
            sync_arr = lambda: eng.weights[0]  # noqa: E731
            if args.forward:
                run = lambda: eng.forward()  # noqa: E731
                per_call = 1
            else:
                run = lambda: eng.run_epochs_scan(args.scan)  # noqa: E731
                per_call = args.scan
        def sync(m):
            # forward: fetch from the pass's own output (weights don't
            # change); training: fetch updated weights
            hard_sync(m[0] if args.forward else sync_arr())

        t0 = time.perf_counter()
        m = run()
        sync(m)
        log(f"[{agg}] compile+first call: {time.perf_counter() - t0:.2f}s")
        reps = 1
        while True:
            t0 = time.perf_counter()
            for _ in range(reps):
                m = run()
            sync(m)
            dt = time.perf_counter() - t0
            if dt >= args.epochs_budget or reps >= 512:
                break
            reps = min(512, max(reps * 2,
                                int(reps * 1.2 * args.epochs_budget
                                    / max(dt, 1e-6))))
        per_epoch = dt / (reps * per_call)
        if args.forward:
            eps = eng.L * len(ds.src) / per_epoch
            log(f"[{agg}] forward pass {per_epoch*1e6:.0f} us  "
                f"({reps} x {per_call})  edge-iters/s {eps:.3g}")
            continue
        eps = eng.epoch_layers * len(ds.src) / per_epoch
        loss = np.asarray(m["loss"])
        loss = loss[0, -1] if loss.ndim == 2 else loss[0]
        log(f"[{agg}] per-epoch {per_epoch*1e6:.0f} us  "
            f"({reps} x {per_call})  edge-iters/s {eps:.3g}  "
            f"loss={float(loss):.4f}")


if __name__ == "__main__":
    main()
