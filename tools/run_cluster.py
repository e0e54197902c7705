#!/usr/bin/env python
"""Experiment driver — reference `tools/tmp_run_cluster.py` equivalent.

Runs the paper's evaluation matrix on TPU (or CPU) and writes per-party logs
in the reference's naming scheme ``log/<setting>/gcn_test_<dataset>_<p>.log``
with the same grep-able lines (``::iteration took``, the accuracy block), so
the plot suite (tools/plot/) works on either framework's output. Where the
reference measures per-NIC bytes with psutil over its TCP mesh, we MEASURE
the sharded program's collective wire bytes by tracing its jaxpr
(`cognn_tpu.engine.comm_model`, correct for share width and backend halo
shape; pinned to hand-computed values by tests/test_comm.py) and write them
— alongside the closed-form analytic model — into
``comm/<setting>/<dataset>_<p>.comm``.

Evaluations (reference `tmp_run_cluster.py:263-448`):
  --smallest-cognn-efficiency   2-party cora, 2 epochs (the ~1 min check)
  --cognn-opt-accuracy          90-epoch training, parties 2..5
  --cognn-unopt-accuracy        same with the unopt (2L) schedule
  --cognn-opt-efficiency        scaler subsets 2s..5s, 1 epoch timing
  --cognn-opt-inference         forward-only
  --fedgnn                      FedAvg baseline (cross-party edges removed)
  --plaintext                   single-party global-graph baseline
Options: --mpc (secret-shared execution), --dataset, --epochs, --parties.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Enough virtual CPU devices for the comm-tracing mesh — must run before
# anything initializes a jax backend. Under the axon TPU hook this config
# breaks the plugin registration, so there tracing runs in a CPU
# subprocess instead (see traced_comm).
import os  # noqa: E402

import jax  # noqa: E402

_AXON_HOOK = bool(os.environ.get("PALLAS_AXON_POOL_IPS"))
if not _AXON_HOOK:
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:  # noqa: BLE001
        pass

from cognn_tpu.engine import GasEngine, build_device_plan  # noqa: E402
from cognn_tpu.graph import build_party_graph  # noqa: E402
from cognn_tpu.harness.datasets import (  # noqa: E402
    synthetic_planetoid,
    strip_cross_edges,
)


def build_graphs(ds, n_parties, fedgnn=False, tid=None):
    n = len(ds.features)
    vids = np.arange(n)
    if tid is None:
        tid = ({v: v % n_parties for v in range(n)}
               if n_parties > 1 else None)
    src, dst = ds.src, ds.dst
    if fedgnn and tid:
        src, dst = strip_cross_edges(src, dst, tid)
    graphs = []
    for p in range(n_parties):
        g = build_party_graph(src, dst, None, tid, p, n_parties,
                              all_vids=vids)
        g.set_vertex_data(vids, ds.features, ds.labels)
        graphs.append(g)
    return graphs


def resolve_sharded_backend(plan, mpc, aggregation, param=None,
                            variant="opt"):
    """The backend the SHARDED (multi-chip) deployment of this run would
    use: an explicit choice passes through; "auto" resolves with the
    sharded-TPU policy (the intended deployment target — tracing itself
    runs on a CPU mesh and executes no device code), including the
    aggregation-width VMEM veto when ``param`` is given."""
    if aggregation != "auto":
        return aggregation
    if mpc:
        from cognn_tpu.mpc.engine import _select_mpc_backend

        return _select_mpc_backend(plan, "sharded", backend="tpu",
                                   param=param, variant=variant)
    from cognn_tpu.engine.gas import select_backend

    return select_backend(plan, "sharded", backend="tpu", param=param,
                          variant=variant)


def _traced_comm_subprocess(ds, variant, mpc, n_parties, aggregation,
                            reorder, hoist_agg=True):
    """Trace in a fresh CPU-only subprocess (used when this process runs
    on the TPU, where the virtual-CPU-mesh config cannot be applied).
    Ships the dataset through a temp npz + param json."""
    import dataclasses
    import subprocess
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".npz", delete=False) as f:
        path = f.name
    try:
        np.savez(path, src=ds.src, dst=ds.dst, features=ds.features,
                 labels=ds.labels,
                 param=json.dumps(dataclasses.asdict(ds.param)),
                 name=ds.name,
                 cfg=json.dumps({"variant": variant, "mpc": mpc,
                                 "n_parties": n_parties,
                                 "aggregation": aggregation,
                                 "reorder": reorder,
                                 "hoist_agg": hoist_agg}))
        env = {**os.environ, "PALLAS_AXON_POOL_IPS": "",
               "JAX_PLATFORMS": "cpu",
               "JAX_NUM_CPU_DEVICES": str(max(8, n_parties))}
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--_trace-worker", path],
            capture_output=True, text=True, timeout=900, env=env)
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                return json.loads(line)
        print(f"(subprocess comm tracing failed: {out.stderr[-400:]})",
              file=sys.stderr)
        return None
    finally:
        os.unlink(path)


def _trace_worker(path):
    """--_trace-worker entry: load the shipped dataset, trace, print
    JSON."""
    from cognn_tpu.config import GNNParam
    from cognn_tpu.harness.datasets import Dataset

    data = np.load(path, allow_pickle=False)
    cfg = json.loads(str(data["cfg"]))
    param = GNNParam(**json.loads(str(data["param"])))
    ds = Dataset(name=str(data["name"]), src=data["src"], dst=data["dst"],
                 features=data["features"], labels=data["labels"],
                 param=param)
    graphs = build_graphs(ds, cfg["n_parties"])
    plan = build_device_plan(graphs, reorder=cfg["reorder"])
    res = traced_comm(plan, param, cfg["variant"], cfg["mpc"],
                      cfg["n_parties"], cfg["aggregation"], ds=None,
                      hoist_agg=cfg.get("hoist_agg", True))
    print(json.dumps(res))


def traced_comm(plan, param, variant, mpc, n_parties, aggregation,
                ds=None, reorder=False, hoist_agg=True):
    """Measured per-party collective bytes AND rounds per epoch: trace the
    SHARDED training program's jaxpr over a CPU device mesh (works even
    when the default backend is a single TPU chip — tracing runs no device
    code) with the backend the run is actually configured for. Falls back
    to a CPU subprocess (``ds`` provided) when this process cannot host
    the virtual CPU mesh (axon TPU hook), and to None without it."""
    import jax

    from cognn_tpu.engine.comm_model import engine_epoch_comm

    if n_parties < 2:
        return None
    try:
        cpus = jax.devices("cpu")
        if len(cpus) < n_parties:
            if ds is not None:
                return _traced_comm_subprocess(
                    ds, variant, mpc, n_parties, aggregation, reorder,
                    hoist_agg)
            return None
        mesh = jax.sharding.Mesh(np.array(cpus[:n_parties]), ("party",))
        if mpc:
            from cognn_tpu.mpc import MpcGasEngine

            eng = MpcGasEngine(plan, param, variant, mode="sharded",
                               mesh=mesh, aggregation=aggregation,
                               hoist_agg=hoist_agg)
        else:
            eng = GasEngine(plan, param, variant, mode="sharded", mesh=mesh,
                            aggregation=aggregation)
        kind = "forward" if variant.endswith("inference") else "epoch"
        return engine_epoch_comm(eng, kind)
    except Exception as e:  # noqa: BLE001
        print(f"(comm tracing unavailable: {e})", file=sys.stderr)
        return None


def _hard_sync(x):
    """Close a dispatch window with a data-dependent value fetch (the
    tunnel's block_until_ready returns early — CLAUDE.md)."""
    import jax.numpy as jnp

    return float(np.asarray(jnp.sum(jnp.asarray(x, jnp.float32))))


TIME_BUDGET_S = 0.5  # minimum honest wall window (chained dispatches)
MAX_TIMING_REPS = 4096


def run_training(ds, n_parties, epochs, variant, mpc, setting,
                 fedgnn=False, log_root=Path("log"), comm_root=Path("comm"),
                 aggregation="auto", reorder=False,
                 time_budget=TIME_BUDGET_S, tid_map=None):
    """One evaluation run: scan-compiled training (or a forward pass),
    honest chained-dispatch timing, reference-format per-epoch logs, and a
    backend-correct ``.comm`` payload.

    Timing discipline (the reference's logs ARE its profile,
    `README.md:238-250`; ours must be equally trustworthy on the tunneled
    TPU): the whole ``epochs``-epoch run is ONE ``run_epochs_scan``
    program; if its wall time is under ``time_budget`` the scan is
    re-issued (doubling reps) until the window is honest, and the
    per-epoch duration is window / (reps * epochs). The logged metrics
    come from the first scan — extra reps only advance weights."""
    import jax

    graphs = build_graphs(ds, n_parties, fedgnn=fedgnn, tid=tid_map)
    plan = build_device_plan(graphs, reorder=reorder)
    if mpc:
        from cognn_tpu.mpc import MpcGasEngine

        engine = MpcGasEngine(plan, ds.param, variant,
                              aggregation=aggregation)
        sync_arr = lambda: engine.weights_sh[0]  # noqa: E731
    else:
        engine = GasEngine(plan, ds.param, variant, aggregation=aggregation)
        sync_arr = lambda: engine.weights[0]  # noqa: E731

    logdir = log_root / setting
    logdir.mkdir(parents=True, exist_ok=True)
    logs = [open(logdir / f"gcn_test_{ds.name.lower()}_{p}.log", "w")
            for p in range(n_parties)]

    def emit(p, line):
        logs[p].write(line + "\n")

    epoch_layers = engine.epoch_layers
    if variant.endswith("inference"):
        z, prob, metrics = engine.forward()
        _hard_sync(prob)  # compile + first dispatch
        reps, dt = 1, 0.0
        while True:
            t0 = time.perf_counter()
            for _ in range(reps):
                z, prob, _ = engine.forward()
            _hard_sync(prob)
            dt = time.perf_counter() - t0
            if dt >= time_budget or reps >= MAX_TIMING_REPS:
                break
            reps = min(MAX_TIMING_REPS,
                       max(reps * 2,
                           int(reps * 1.2 * time_budget / max(dt, 1e-6))))
        per_fwd = dt / reps
        m = engine.metrics_host(metrics)
        n_phases = engine.L  # 2 schedule iterations per inference (L=2)
        for p in range(n_parties):
            for _ in range(n_phases):
                emit(p, f"::iteration took {per_fwd / n_phases:.6f}")
            _emit_metrics(emit, p, m, graphs[p])
    else:
        metrics = engine.run_epochs_scan(epochs)  # compile + trajectory
        _hard_sync(sync_arr())
        reps, dt = 1, 0.0
        while True:
            t0 = time.perf_counter()
            for _ in range(reps):
                engine.run_epochs_scan(epochs)
            _hard_sync(sync_arr())
            dt = time.perf_counter() - t0
            if dt >= time_budget or reps >= MAX_TIMING_REPS:
                break
            reps = min(MAX_TIMING_REPS,
                       max(reps * 2,
                           int(reps * 1.2 * time_budget / max(dt, 1e-6))))
        per_epoch = dt / (reps * epochs)
        m = engine.metrics_host(metrics)  # [P, epochs] per metric
        for e in range(epochs):
            me = {k: v[:, e] for k, v in m.items()}
            for p in range(n_parties):
                emit(p, f"tid-> {p}, iteration-> {(e + 1) * epoch_layers}")
                # one span per schedule iteration, as the reference logs
                for _ in range(epoch_layers):
                    emit(p, f"::iteration took "
                            f"{per_epoch / epoch_layers:.6f}")
                _emit_metrics(emit, p, me, graphs[p])
    for f in logs:
        f.close()

    commdir = comm_root / setting
    commdir.mkdir(parents=True, exist_ok=True)
    from cognn_tpu.engine.comm_model import (analytic_bytes_per_epoch,
                                             analytic_rounds_per_epoch)

    backend = resolve_sharded_backend(plan, mpc, aggregation,
                                      param=ds.param, variant=variant)
    analytic = analytic_bytes_per_epoch(plan, ds.param, variant, mpc=mpc,
                                        aggregation=backend)
    traced = traced_comm(plan, ds.param, variant, mpc, n_parties, backend,
                         ds=ds, reorder=reorder)
    per_epoch_b = (traced["bytes"] if traced else analytic)["total"]
    n_ep = 1 if variant.endswith("inference") else max(epochs, 1)
    total_mb = per_epoch_b * n_ep / 1e6
    payload = {"sent_MB": total_mb, "recv_MB": total_mb,
               "measured": traced is not None,
               # what the numbers DESCRIBE: per-party collective wire bytes
               # of the sharded (multi-party) program with this backend.
               # The run above executed mode=stacked (single chip); its
               # backend may differ (recorded as run_backend).
               "backend": backend,
               "mode": "sharded",
               "run_backend": engine.aggregation,
               "run_mode": engine.mode,
               "per_epoch_bytes": traced["bytes"] if traced else analytic,
               "per_epoch_rounds": (traced["rounds"] if traced else
                                    analytic_rounds_per_epoch(
                                        ds.param, variant, mpc=mpc)),
               "analytic_per_epoch_bytes": analytic}
    for p in range(n_parties):
        (commdir / f"{ds.name.lower()}_{p}.comm").write_text(
            json.dumps(payload) + "\n")
    return engine


def _emit_metrics(emit, p, m, graph):
    emit(p, "--------")
    emit(p, f"cross-entropy-loss = {m['loss'][p]:.6f}")
    emit(p, f"full set accuracy = {m['full_acc'][p]:.6f}")
    emit(p, f"training set accuracy = {m['train_acc'][p]:.6f}")
    emit(p, f"border training set accuracy = {m['border_train_acc'][p]:.6f}")
    emit(p, f"test set accuracy = {m['test_acc'][p]:.6f}")
    emit(p, f"border test set accuracy = {m['border_test_acc'][p]:.6f}")
    emit(p, f"the number of vertices is {graph.num_local}, the number of "
            f"border vertices is {int(m['num_border'][p])}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--_trace-worker", dest="trace_worker", default=None,
                    help=argparse.SUPPRESS)
    ap.add_argument("--smallest-cognn-efficiency", action="store_true")
    ap.add_argument("--cognn-opt-accuracy", action="store_true")
    ap.add_argument("--cognn-unopt-accuracy", action="store_true")
    ap.add_argument("--cognn-opt-efficiency", action="store_true")
    ap.add_argument("--cognn-opt-inference", action="store_true")
    ap.add_argument("--cognn-unopt-inference", action="store_true",
                    help="original-gcn forward run with maxIters=2 "
                         "(reference tmp_run_cluster.py:417-435)")
    ap.add_argument("--cognn-unopt-efficiency", action="store_true",
                    help="scaler subsets with the unopt (2L) schedule")
    ap.add_argument("--fedgnn", action="store_true")
    ap.add_argument("--graphsc", action="store_true",
                    help="emit the GraphSC baseline row of the evaluation "
                         "matrix (reference `tmp_run_cluster.py:153-199`). "
                         "GraphSC itself is a third-party system living "
                         "only in the paper's Docker image; this row is "
                         "its ANALYTIC per-epoch comm model (paper Table "
                         "6, 8*sum_dims*10*(n+m)) over the same scaler "
                         "subsets, marked model-derived — durations are "
                         "not fabricated")
    ap.add_argument("--plaintext", action="store_true")
    ap.add_argument("--all", dest="run_all", action="store_true",
                    help="run every evaluation (reference --all)")
    ap.add_argument("--mpc", action="store_true",
                    help="secret-shared execution for the cognn evals")
    ap.add_argument("--dataset", default="cora",
                    choices=["cora", "citeseer", "pubmed", "cora_small"])
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--parties", type=int, nargs="+", default=None)
    ap.add_argument("--aggregation", default="auto",
                    choices=["auto", "sparse", "dense", "bcsr"],
                    help="aggregation backend for the runs AND the traced "
                         "comm accounting (auto = measured-best per scale)")
    ap.add_argument("--reorder", action="store_true",
                    help="BFS-reorder local vertices (bcsr block locality)")
    ap.add_argument("--planetoid-root", default=None, metavar="DIR",
                    help="directory with real Planetoid raw files "
                         "(ind.<dataset>.*); falls back to the synthetic "
                         "statistics-matched generator when absent")
    args = ap.parse_args()

    if args.trace_worker:
        _trace_worker(args.trace_worker)
        return

    if args.run_all:
        for f in ("smallest_cognn_efficiency", "cognn_opt_accuracy",
                  "cognn_unopt_accuracy", "cognn_opt_efficiency",
                  "cognn_unopt_efficiency", "cognn_opt_inference",
                  "cognn_unopt_inference", "fedgnn", "graphsc",
                  "plaintext"):
            setattr(args, f, True)

    # persistent XLA compile cache: repeat driver runs skip the tunnel
    # compiles (the reference pairs each eval with a -no-preprocess rerun
    # that reuses OT material, `tmp_run_cluster.py:274-283`; our analog)
    try:
        cache = Path(__file__).resolve().parent.parent / ".xla_cache"
        cache.mkdir(exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception as e:  # noqa: BLE001
        print(f"(compile cache unavailable: {e})", file=sys.stderr)

    if args.planetoid_root:
        from cognn_tpu.harness.datasets import load_planetoid_raw

        ds = load_planetoid_raw(args.planetoid_root, args.dataset)
        print(f"loaded real {args.dataset}: n={len(ds.features)} "
              f"m={len(ds.src)} f={ds.param.input_dim}")
    else:
        ds = synthetic_planetoid(args.dataset)

    import functools

    run_training_cfg = functools.partial(
        run_training, aggregation=args.aggregation, reorder=args.reorder)
    # mpc evals write under their own setting roots, like the reference's
    # per-eval root paths (`tmp_run_cluster.py set_root_paths`)
    mpc_tag = "mpc_" if args.mpc else ""

    if args.smallest_cognn_efficiency:
        t0 = time.perf_counter()
        run_training_cfg(ds, 2, args.epochs or 2, "opt", args.mpc,
                         mpc_tag + "smallest_efficiency")
        print(f"smallest test took {time.perf_counter() - t0:.1f}s "
              f"(reference: ~1 min)")
    if args.cognn_opt_accuracy:
        for p in (args.parties or [2, 3, 4, 5]):
            run_training_cfg(ds, p, args.epochs or 90, "opt", args.mpc,
                             mpc_tag + f"opt_accuracy_{p}p")
            print(f"opt accuracy {p} parties done")
    if args.cognn_unopt_accuracy:
        for p in (args.parties or [2, 3, 4, 5]):
            run_training_cfg(ds, p, args.epochs or 90, "unopt", args.mpc,
                             mpc_tag + f"unopt_accuracy_{p}p")
            print(f"unopt accuracy {p} parties done")
    if args.cognn_opt_efficiency:
        from cognn_tpu.harness.datasets import scaler_subset

        for k in (args.parties or [2, 3, 4, 5]):
            # scaler subset ks (shared with transform_by_parts file
            # outputs: same shuffle/blocks/party labels — cannot drift)
            sub, tid = scaler_subset(ds, k)
            t0 = time.perf_counter()
            run_training_cfg(sub, k, args.epochs or 1, "opt", args.mpc,
                             mpc_tag + f"opt_efficiency_{k}s",
                             tid_map=tid)
            print(f"opt efficiency {k}s ({len(sub.features)} vertices, "
                  f"{k} parties): {time.perf_counter() - t0:.1f}s")
    if args.cognn_unopt_efficiency:
        from cognn_tpu.harness.datasets import scaler_subset

        for k in (args.parties or [2, 3, 4, 5]):
            sub, tid = scaler_subset(ds, k)
            t0 = time.perf_counter()
            run_training_cfg(sub, k, args.epochs or 1, "unopt", args.mpc,
                             mpc_tag + f"unopt_efficiency_{k}s",
                             tid_map=tid)
            print(f"unopt efficiency {k}s ({len(sub.features)} vertices, "
                  f"{k} parties): {time.perf_counter() - t0:.1f}s")
    if args.cognn_opt_inference:
        run_training_cfg(ds, 2, 1, "opt_inference", args.mpc,
                         mpc_tag + "opt_inference")
        print("inference done")
    if args.cognn_unopt_inference:
        run_training_cfg(ds, 2, 1, "unopt_inference", args.mpc,
                         mpc_tag + "unopt_inference")
        print("unopt inference done")
    if args.fedgnn:
        # one run per party count, like the reference's fed-gcn sweep
        # (`tmp_run_cluster.py:309-331`)
        for p in (args.parties or [2, 3, 4, 5]):
            run_training_cfg(ds, p, args.epochs or 90, "opt", False,
                             f"fedgnn_{p}p", fedgnn=True)
            print(f"fedgnn {p} parties done")
    if args.graphsc:
        # the reference's GraphSC eval sweeps scaler subsets ks with k
        # parties, 1 epoch = 4 iterations (`tmp_run_cluster.py:153-199`);
        # emit its analytic comm row per subset for the comparison plots
        from cognn_tpu.harness.datasets import scaler_subset

        p = ds.param
        sum_dims = p.input_dim + 2 * p.hidden_dim  # unopt-space dims
        for k in (args.parties or [2, 3, 4, 5]):
            sub, _ = scaler_subset(ds, k)
            keep_n, m_k = len(sub.features), len(sub.src)
            per_epoch = 8 * sum_dims * 10 * (keep_n + m_k)
            commdir = Path("comm") / f"graphsc_{k}s"
            commdir.mkdir(parents=True, exist_ok=True)
            payload = {"sent_MB": per_epoch / 1e6,
                       "recv_MB": per_epoch / 1e6,
                       "measured": False, "model": "graphsc-analytic",
                       "n": keep_n, "m": m_k, "sum_dims": sum_dims}
            for q in range(k):
                (commdir / f"{ds.name.lower()}_{q}.comm").write_text(
                    json.dumps(payload) + "\n")
            print(f"graphsc model {k}s: n={keep_n} m={m_k} "
                  f"{per_epoch/1e9:.3f} GB/epoch (analytic)")
    if args.plaintext:
        run_training_cfg(ds, 1, args.epochs or 90, "opt", False,
                         "plaintext")
        print("plaintext done")


if __name__ == "__main__":
    main()
