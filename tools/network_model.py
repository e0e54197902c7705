#!/usr/bin/env python
"""Duration-vs-network model — the reference's Tables 1/2 counterpart.

The reference evaluates epoch duration under a simulated WAN grid
({200,400,1000,4000} Mbit x {0.15,1,10,20} ms via netns/tc,
`tools/tmp_run_cluster.py:23-29`, `tools/scripts/setup_network.sh:32-39`).
ICI is not a WAN, so we don't shape traffic; instead we PREDICT the epoch
duration of the sharded program on an interconnect with given
bandwidth/latency from three measured quantities:

    duration = compute + wire_bytes * 8 / bandwidth + rounds * latency

* compute: the measured stacked-epoch time on this machine (honest
  chained-dispatch timing, same discipline as tools/bench_epoch_scan.py),
  or an explicit --compute-ms (e.g. a GOLDEN.md TPU number).
* wire_bytes: per-party collective bytes of the sharded program, traced
  from its jaxpr (`engine/comm_model.py`, test-pinned).
* rounds: number of collective primitives per epoch — each is a
  latency-bound synchronization, the counterpart of the reference's
  interactive 2PC rounds (traced, test-pinned).

Emits a markdown grid per variant (opt / unopt / inference, plaintext or
--mpc) plus the GraphSC analytic comm row (bytes-only: the paper's Table-6
model gives no round count, so its prediction is a lower bound).

Usage:
  python tools/network_model.py --dataset cora --parties 2 \
      --variants opt,unopt [--mpc] [--compute-ms opt=0.62,unopt=8.81]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax  # noqa: E402

try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:  # noqa: BLE001
    pass

from run_cluster import (  # noqa: E402
    build_graphs, resolve_sharded_backend, traced_comm, _hard_sync)

from cognn_tpu.engine import GasEngine, build_device_plan  # noqa: E402
from cognn_tpu.engine.comm_model import (  # noqa: E402
    REFERENCE_BANDWIDTHS_MBIT, REFERENCE_LATENCIES_MS, duration_grid)
from cognn_tpu.harness.datasets import synthetic_planetoid  # noqa: E402


def measure_compute(ds, plan, variant, mpc, budget=0.5, hoist_agg=True):
    """Honest stacked per-epoch (or per-forward) seconds on this backend."""
    if mpc:
        from cognn_tpu.mpc import MpcGasEngine

        eng = MpcGasEngine(plan, ds.param, variant, hoist_agg=hoist_agg)
        sync = lambda: eng.weights_sh[0]  # noqa: E731
    else:
        eng = GasEngine(plan, ds.param, variant)
        sync = lambda: eng.weights[0]  # noqa: E731
    fwd = variant.endswith("inference")
    scan_n = 1 if fwd else 16

    def run():
        if fwd:
            return eng.forward()[1]
        eng.run_epochs_scan(scan_n)
        return sync()

    _hard_sync(run())  # compile
    reps = 1
    while True:
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run()
        _hard_sync(out)
        dt = time.perf_counter() - t0
        if dt >= budget or reps >= 4096:
            break
        reps = min(4096, max(reps * 2,
                             int(reps * 1.2 * budget / max(dt, 1e-6))))
    return dt / (reps * scan_n)


def fmt_s(x):
    return f"{x*1e3:.2f} ms" if x < 1 else f"{x:.3f} s"


def grid_markdown(title, compute_s, bytes_pe, rounds_pe):
    lines = [f"### {title}",
             f"compute {fmt_s(compute_s)}/epoch, "
             f"{bytes_pe/1e6:.3f} MB + {rounds_pe:.0f} collective rounds "
             "per party per epoch", "",
             "| latency \\ bandwidth | " +
             " | ".join(f"{bw} Mbit" for bw in REFERENCE_BANDWIDTHS_MBIT) +
             " |",
             "|---" * (len(REFERENCE_BANDWIDTHS_MBIT) + 1) + "|"]
    g = duration_grid(compute_s, bytes_pe, rounds_pe)
    for lat in REFERENCE_LATENCIES_MS:
        row = [f"| {lat} ms"]
        row += [fmt_s(g[(bw, lat)]) for bw in REFERENCE_BANDWIDTHS_MBIT]
        lines.append(" | ".join(row) + " |")
    lines.append("")
    return "\n".join(lines), g


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="cora")
    ap.add_argument("--parties", type=int, default=2)
    ap.add_argument("--variants", default="opt,unopt")
    ap.add_argument("--mpc", action="store_true")
    ap.add_argument("--aggregation", default="auto")
    ap.add_argument("--reorder", action="store_true")
    ap.add_argument("--compute-ms", default=None,
                    help="comma list variant=ms (skip live measurement; "
                         "use e.g. GOLDEN.md TPU epoch times)")
    ap.add_argument("--json", default=None, metavar="FILE",
                    help="also dump the grids as JSON")
    ap.add_argument("--planetoid-root", default=None)
    ap.add_argument("--faithful-unopt", action="store_true",
                    help="disable the mpc engines' loop-invariant agg(x0) "
                         "hoist for unopt variants, restoring the "
                         "reference-faithful per-epoch schedule (its "
                         "f-wide layer-0 halo ships EVERY epoch — the "
                         "paper's Tables 1/2 comparison)")
    args = ap.parse_args()

    if args.planetoid_root:
        from cognn_tpu.harness.datasets import load_planetoid_raw

        ds = load_planetoid_raw(args.planetoid_root, args.dataset)
    else:
        ds = synthetic_planetoid(args.dataset)
    compute_ms = {}
    if args.compute_ms:
        for kv in args.compute_ms.split(","):
            k, v = kv.split("=")
            compute_ms[k] = float(v)

    out_json = {"dataset": args.dataset, "parties": args.parties,
                "mpc": args.mpc, "grids": {}}
    graphs = build_graphs(ds, args.parties)
    plan = build_device_plan(graphs, reorder=args.reorder)
    for variant in args.variants.split(","):
        hoist = not (args.faithful_unopt and variant.startswith("unopt"))
        backend = resolve_sharded_backend(plan, args.mpc, args.aggregation,
                                          param=ds.param, variant=variant)
        comm = traced_comm(plan, ds.param, variant, args.mpc, args.parties,
                           backend, hoist_agg=hoist)
        if comm is None:
            print(f"[{variant}] comm tracing unavailable", file=sys.stderr)
            continue
        if variant in compute_ms:
            comp = compute_ms[variant] * 1e-3
            src = "provided"
        else:
            comp = measure_compute(ds, plan, variant, args.mpc,
                                   hoist_agg=hoist)
            src = f"measured on {jax.default_backend()}"
        title = (f"{args.dataset} {args.parties}p "
                 f"{'mpc' if args.mpc else 'plaintext'} {variant} "
                 f"[{backend} sharded; compute {src}"
                 + ("; faithful schedule" if not hoist else "") + "]")
        md, g = grid_markdown(title, comp, comm["bytes"]["total"],
                              comm["rounds"]["total"])
        print(md)
        out_json["grids"][variant] = {
            "backend": backend, "compute_s": comp, "compute_src": src,
            "bytes_per_epoch": comm["bytes"],
            "rounds_per_epoch": comm["rounds"],
            "durations": {f"{bw}Mbit/{lat}ms": v
                          for (bw, lat), v in g.items()}}

    # GraphSC analytic comparison row (paper Table 6: 8*sum_dims*10*(n+m)
    # bytes; no round model published -> bytes-only lower bound)
    p = ds.param
    sum_dims = p.input_dim + 2 * p.hidden_dim
    n, m = len(ds.features), len(ds.src)
    gsc_bytes = 8 * sum_dims * 10 * (n + m)
    print(f"### graphsc analytic (comparison): {gsc_bytes/1e6:.1f} MB/epoch"
          f" -> bandwidth term alone "
          + ", ".join(f"{bw} Mbit: {fmt_s(gsc_bytes*8/(bw*1e6))}"
                      for bw in REFERENCE_BANDWIDTHS_MBIT)
          + "  (no published round count; lower bound)")
    out_json["graphsc_analytic_bytes"] = gsc_bytes

    if args.json:
        Path(args.json).write_text(json.dumps(out_json, indent=1))
        print(f"\nwrote {args.json}")


if __name__ == "__main__":
    main()
