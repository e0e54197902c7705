"""Benchmark: CoGNN-Opt training epoch throughput in edge-iterations/s.

Prints ONE JSON line:
  {"metric": "edge_iters_per_s", "value": N, "unit": "edge-iters/s",
   "vs_baseline": N / 5300, "secondary": {...}}

Baseline: the reference's smallest documented run — 2-party Cora "2s",
12 schedule iterations over 10,556 directed edges in 23.9 s of iteration time
≈ 5.3k edge-iterations/s (BASELINE.md "Implied edge throughput"). We use the
same accounting: value = schedule_iterations × directed_edges / wall_seconds
for plaintext CoGNN-Opt training epochs, 2 parties, Cora-scale graph, on one
TPU chip. The measured configuration is the fast path at this scale: dense
(flat-adjacency MXU) aggregation + the scan-compiled training loop
(GasEngine.run_epochs_scan); falls back to the sparse backend if the dense
plan fails.

``secondary`` carries the SECRET-SHARED epoch throughput (mpc Cora 2p,
same graph, same chained-window discipline) — the framework's actual
differentiator, and the apples-to-apples row against the reference's 2PC
pipeline (which only runs secret-shared). One JSON object on one line
keeps the driver contract; extra context lines go to stderr.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_EDGE_ITERS_PER_S = 5300.0
ATTEMPT_TIMEOUT_S = 540  # two engines' tunnel compiles + timed windows
MAX_ATTEMPTS = 3
SCAN = 64  # epochs per compiled lax.scan dispatch


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _device_healthy(timeout_s: float = 240.0) -> bool:
    """Probe the accelerator with a tiny op under a watchdog (the tunneled
    chip can wedge; better an explicit record than a hung bench)."""
    import threading

    import jax
    import jax.numpy as jnp

    ok = []

    def probe():
        try:
            jax.block_until_ready(jnp.ones(8).sum())
            ok.append(True)
        except Exception:  # noqa: BLE001
            pass

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(ok)


def main():
    import jax

    # persistent compile cache: driver re-runs skip the tunnel compile
    try:
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".xla_cache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception as e:  # noqa: BLE001
        log(f"(compile cache unavailable: {e})")

    if not _device_healthy():
        log("ERROR: accelerator unreachable (device probe timed out); "
            "emitting value 0 so the round records the outage")
        print(json.dumps({"metric": "edge_iters_per_s", "value": 0,
                          "unit": "edge-iters/s", "vs_baseline": 0}))
        return

    from cognn_tpu.engine import GasEngine, build_device_plan
    from cognn_tpu.graph import build_party_graph
    from cognn_tpu.harness.datasets import synthetic_planetoid

    name = "cora"
    n_parties = 2
    ds = synthetic_planetoid(name)
    n = len(ds.features)
    vids = np.arange(n)
    tid = {v: v % n_parties for v in range(n)}
    graphs = []
    for p in range(n_parties):
        g = build_party_graph(ds.src, ds.dst, None, tid, p, n_parties,
                              all_vids=vids)
        g.set_vertex_data(vids, ds.features, ds.labels)
        graphs.append(g)
    try:
        plan = build_device_plan(graphs, lane=128, dense=True)
        engine = GasEngine(plan, ds.param, "opt", aggregation="dense")
        agg = "dense"
    except Exception as e:  # noqa: BLE001
        log(f"dense plan failed ({e}); falling back to sparse")
        plan = build_device_plan(graphs, lane=128)
        engine = GasEngine(plan, ds.param, "opt")
        agg = "sparse"
    num_edges = len(ds.src)
    iters_per_epoch = engine.epoch_layers  # 6 (2 fwd + 4 bwd)

    log(f"backend={jax.default_backend()} agg={agg} edges={num_edges} "
        f"V_pad={plan.V} E_loc_pad={plan.E_loc} M_pad={plan.M}")

    import jax.numpy as jnp

    def hard_sync(x):
        """Fetch a concrete scalar derived from x. block_until_ready through
        the axon tunnel can return long before the device finishes (measured
        945x early on a 1 GB-stream kernel); transferring an actual value
        cannot complete early."""
        return float(np.asarray(jnp.sum(x)))

    # warmup / compile: the whole training loop is one lax.scan program
    t0 = time.perf_counter()
    engine.run_epochs_scan(SCAN)
    hard_sync(engine.weights[0])
    log(f"compile+first scan({SCAN}): {time.perf_counter() - t0:.2f}s")

    # timed epochs: chain data-dependent scan dispatches and close the window
    # with a value fetch; grow the chain until the window holds >= 0.5 s.
    def timed_epochs(eng, sync_arr):
        reps, dt, m = 1, 0.0, None
        while True:
            t0 = time.perf_counter()
            for _ in range(reps):
                m = eng.run_epochs_scan(SCAN)
            hard_sync(sync_arr())
            dt = time.perf_counter() - t0
            if dt >= 0.5 or reps >= 1024:
                break
            reps = min(1024, max(reps * 2,
                                 int(reps * 0.6 / max(dt, 1e-6))))
            log(f"window {dt*1e3:.0f} ms too short for honest tunnel "
                f"timing; retrying with {reps} chained scan({SCAN}) "
                "dispatches")
        return dt / (reps * SCAN), m

    per_epoch, m = timed_epochs(engine, lambda: engine.weights[0])
    value = iters_per_epoch * num_edges / per_epoch
    m_last = {k: np.asarray(v)[:, -1] for k, v in m.items()}
    log(f"epoch time: {per_epoch*1e6:.1f} us  "
        f"loss={float(m_last['loss'][0]):.4f} "
        f"train_acc={float(m_last['train_acc'][0]):.3f}")

    # secondary metric: the SECRET-SHARED epoch (the differentiator; the
    # reference pipeline only runs secret-shared, so this is the
    # apples-to-apples comparison against the same 5.3k baseline)
    secondary = {"metric": "mpc_edge_iters_per_s", "value": 0,
                 "unit": "edge-iters/s", "vs_baseline": 0}
    try:
        from cognn_tpu.mpc import MpcGasEngine

        mpc = MpcGasEngine(plan, ds.param, "opt", aggregation="auto")
        log(f"mpc agg={mpc.aggregation}")
        t0 = time.perf_counter()
        mpc.run_epochs_scan(SCAN)
        hard_sync(mpc.proto.reveal(mpc.weights_sh[0]))
        log(f"mpc compile+first scan({SCAN}): "
            f"{time.perf_counter() - t0:.2f}s")
        per_mpc, mm = timed_epochs(
            mpc, lambda: mpc.proto.reveal(mpc.weights_sh[0]))
        mpc_val = iters_per_epoch * num_edges / per_mpc
        mm_last = np.asarray(mm["loss"])[:, -1]
        log(f"mpc epoch time: {per_mpc*1e6:.1f} us  "
            f"loss={float(mm_last[0]):.4f}")
        secondary = {
            "metric": "mpc_edge_iters_per_s",
            "value": round(mpc_val, 1),
            "unit": "edge-iters/s",
            "vs_baseline": round(mpc_val / BASELINE_EDGE_ITERS_PER_S, 1),
        }
    except Exception as e:  # noqa: BLE001
        log(f"mpc secondary metric failed: {e!r}")

    print(json.dumps({
        "metric": "edge_iters_per_s",
        "value": round(value, 1),
        "unit": "edge-iters/s",
        "vs_baseline": round(value / BASELINE_EDGE_ITERS_PER_S, 1),
        "secondary": secondary,
    }))


def supervised_main():
    """Run the measurement in a worker subprocess with timeout + retries:
    a wedged dispatch (lost tunnel reply) hangs its process forever, but the
    device itself stays healthy for a fresh process."""
    for attempt in range(MAX_ATTEMPTS):
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker"],
                capture_output=True, text=True, timeout=ATTEMPT_TIMEOUT_S)
        except subprocess.TimeoutExpired:
            log(f"attempt {attempt + 1}: worker timed out (wedged dispatch);"
                " retrying in a fresh process")
            continue
        sys.stderr.write(out.stderr)
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                print(line)
                return
        log(f"attempt {attempt + 1}: no result (exit {out.returncode})")
    log("ERROR: all attempts failed; emitting 0")
    print(json.dumps({"metric": "edge_iters_per_s", "value": 0,
                      "unit": "edge-iters/s", "vs_baseline": 0}))


if __name__ == "__main__":
    if "--worker" in sys.argv:
        main()
    else:
        supervised_main()
