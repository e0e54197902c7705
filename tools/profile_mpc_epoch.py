#!/usr/bin/env python
"""Per-phase device-time breakdown of the secret-shared epoch from a
jax.profiler trace — the op-level truth the chained micro-harness cannot
give (it misreports cheap elementwise ops; CLAUDE.md).

Captures a device trace around chained `run_epochs_scan` dispatches, then
parses the XPlane protobuf and attributes device time to the engine's
`jax.named_scope` tags (pre_scatter_matmul / vector_scale /
oga_scatter_gather / sign_mask / trunc_reshare / apply_prediction /
apply_weight_mean), mapping them onto the reference's per-phase span tag
set (`ss_vertex_centric_algo_kernel.h:745-897`):

    PreScatterComp       <- pre_scatter_matmul(+_prepped) + vector_scale
    Scatter+Merge+Gather <- oga_scatter_gather (the OGA is ONE fused
                            MXU/segment pipeline here, deliberately)
    Apply_computation    <- sign_mask + apply_prediction + apply_weight_mean
    (trunc_reshare nests inside the phases; reported separately too)

Usage:
  python tools/profile_mpc_epoch.py [--dataset cora] [--parties 2]
      [--agg auto] [--variant opt] [--scan 64] [--reps 2]
      [--outdir /tmp/jaxtrace] [--dump] [--breakdown-log PATH]

--dump prints raw plane/line/event names (schema exploration).
--breakdown-log writes `::<tag> took <s>` per-epoch lines in the driver
log format so tools/plot/plot_duration_breakdown_and_comm.py renders the
phase table (Tables 7-12 role).
"""

import argparse
import sys
import time
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_engine(dataset, parties, agg, variant):
    from cognn_tpu.engine import build_device_plan
    from cognn_tpu.graph import build_party_graph
    from cognn_tpu.harness.datasets import synthetic_planetoid
    from cognn_tpu.mpc import MpcGasEngine

    ds = synthetic_planetoid(dataset)
    n = len(ds.features)
    vids = np.arange(n)
    tid = {v: v % parties for v in range(n)}
    graphs = []
    for p in range(parties):
        g = build_party_graph(ds.src, ds.dst, None, tid, p, parties,
                              all_vids=vids)
        g.set_vertex_data(vids, ds.features, ds.labels)
        graphs.append(g)
    reorder = dataset == "pubmed"
    plan = build_device_plan(graphs, lane=128, reorder=reorder)
    eng = MpcGasEngine(plan, ds.param, variant, aggregation=agg)
    return ds, eng


# fine-grained buckets by the SOURCE function each HLO op's metadata
# points at (innermost jax call site — the TPU trace carries exact
# file:line attribution; jax named_scope paths get truncated out of the
# profiler's tf_op string, so source is the reliable signal)
_FILE_RULES = {
    "pallas_spmm.py": "oga", "bcsr.py": "oga",
    "intmatmul.py": "matmul",
    "ring.py": "ring-helpers", "fixedpoint.py": "ring-helpers",
    "glibc_rand.py": "other",
}
_FUNC_RULES = {  # (file, function) overrides, mpc/engine.py + protocol.py
    ("engine.py", "_dense_agg_shares"): "oga",
    ("engine.py", "_dense_agg_shares_i8"): "oga",
    ("engine.py", "_bcsr_agg_shares"): "oga",
    ("engine.py", "_segment_sum_shares"): "oga",
    ("engine.py", "_aggregate_impl"): "oga",
    ("engine.py", "_expand_byte_planes"): "oga",
    ("engine.py", "_recombine_byte_planes"): "oga",
    ("engine.py", "_shift64_u32"): "oga",
    ("engine.py", "one"): "oga",
    ("engine.py", "one_chunk"): "oga",
    ("engine.py", "take"): "oga",
    ("engine.py", "scatter_one"): "oga",
    ("engine.py", "_ring_psum_shares"): "apply",
    ("engine.py", "_weight_mean"): "apply",
    ("engine.py", "_predict_apply"): "apply",
    ("engine.py", "_epochs_scan_body"): "scan-overhead",
    ("engine.py", "step"): "scan-overhead",
    ("engine.py", "run_epochs_scan"): "scan-overhead",
    ("protocol.py", "matmul"): "matmul",
    ("protocol.py", "matmul_prepped"): "matmul",
    ("protocol.py", "prep_matmul_a"): "matmul",
    ("protocol.py", "scale_rows"): "scale",
    ("protocol.py", "scale_const"): "apply",
    ("protocol.py", "sign_mask"): "nonlinear",
    ("protocol.py", "_sign_mask_bitdecomp"): "nonlinear",
    ("protocol.py", "mask_mul"): "nonlinear",
    ("protocol.py", "relu"): "nonlinear",
    ("protocol.py", "softmax_pred"): "apply",
    ("protocol.py", "reveal"): "apply",
    ("protocol.py", "share"): "apply",
    ("protocol.py", "reshare"): "trunc-reshare",
    ("protocol.py", "trunc"): "trunc-reshare",
    ("protocol.py", "_trunc_ring"): "trunc-reshare",
    ("protocol.py", "reconstruct_ring"): "reconstruct",
    ("protocol.py", "add"): "share-linear",
    ("protocol.py", "sub"): "share-linear",
    ("gas.py", "_metrics"): "apply",
}

# mapping onto the reference's per-phase span-tag table
# (`ss_vertex_centric_algo_kernel.h:745-897`). The OGA here is ONE fused
# scatter/premerge/halo/gather pipeline (deliberately); trunc/reshare,
# reconstruct, PRNG and u32 limb helpers are SHARED share-arithmetic that
# the reference buries inside each 2PC phase — reported as their own row.
REF_TAGS = {
    "PreScatterComp": ("matmul", "scale"),
    "Scatter_Merge_Gather": ("oga",),
    "Apply_computation": ("apply", "nonlinear"),
    "shared_share_arith": ("trunc-reshare", "reconstruct", "prng",
                          "ring-helpers", "share-linear"),
}


def _build_line_map():
    """{abs file path: sorted [(start, end, funcname)]} for the cognn_tpu
    modules the trace's `source` stats point at (AST walk picks up nested
    local functions too; innermost-enclosing wins)."""
    import ast

    import cognn_tpu

    root = Path(cognn_tpu.__file__).resolve().parent
    out = {}
    for py in root.rglob("*.py"):
        try:
            tree = ast.parse(py.read_text())
        except SyntaxError:
            continue
        spans = []

        def walk(node):
            for child in ast.iter_child_nodes(node):
                if isinstance(child, (ast.FunctionDef,
                                      ast.AsyncFunctionDef)):
                    spans.append((child.lineno, child.end_lineno,
                                  child.name))
                walk(child)

        walk(tree)
        # innermost-enclosing = smallest span containing the line; sort by
        # size so the first hit wins
        spans.sort(key=lambda s: s[1] - s[0])
        out[str(py)] = spans
    return out


def _classify(source: str, cat: str, line_map) -> str:
    if not source:
        return "prng" if cat == "rng-bit-generator" else \
            f"<other:{cat or 'unknown'}>"
    path, _, lineno = source.partition(":")
    try:
        lineno = int(lineno.split(":")[0])
    except ValueError:
        lineno = 0
    fname = Path(path).name
    func = None
    for s, e, name in line_map.get(path, ()):
        if s <= lineno <= e:
            func = name
            break
    if func and (fname, func) in _FUNC_RULES:
        return _FUNC_RULES[(fname, func)]
    if fname in _FILE_RULES:
        return _FILE_RULES[fname]
    return f"<other:{fname}:{func or lineno}>"


def parse_trace(outdir: Path, dump: bool):
    """-> (plane_name, {scope or '<other>/<category>': ps}, total_ps).

    Walks the accelerator plane's "XLA Ops" line; each event's metadata
    carries a ``tf_op`` stat with the full jax scope path (named_scope
    tags included) plus ``hlo_category`` — scope attribution is exact, and
    unmatched time is bucketed by HLO category for visibility."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    pbs = sorted(outdir.rglob("*.xplane.pb"),
                 key=lambda p: p.stat().st_mtime)
    if not pbs:
        raise SystemExit(f"no .xplane.pb under {outdir}")
    space = xplane_pb2.XSpace()
    space.ParseFromString(pbs[-1].read_bytes())

    line_map = _build_line_map()
    planes = [p for p in space.planes
              if "TPU" in p.name or "GPU" in p.name] or list(space.planes)
    best = None
    for plane in planes:
        stat_names = {i: m.name for i, m in plane.stat_metadata.items()}

        def meta_info(meta):
            source, cat = "", ""
            for st in meta.stats:
                sname = stat_names.get(st.metadata_id, "")
                val = (st.str_value if st.HasField("str_value")
                       else stat_names.get(st.ref_value, "")
                       if st.HasField("ref_value") else "")
                if sname == "source":
                    source = str(val)
                elif sname == "hlo_category":
                    cat = str(val)
            return source, cat

        ev_info = {i: meta_info(m)
                   for i, m in plane.event_metadata.items()}
        by_scope = defaultdict(int)
        total = 0
        nevents = 0
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                nevents += 1
                source, cat = ev_info.get(ev.metadata_id, ("", ""))
                if cat in ("while", "conditional", "call"):
                    continue  # control-flow wrappers OVERLAP their children
                dur = ev.duration_ps
                bucket = _classify(source, cat, line_map)
                total += dur
                by_scope[bucket] += dur
                if dump and nevents <= 30:
                    log(f"    ev src={source[:80]!r} cat={cat} -> "
                        f"{bucket} dur_ps={dur}")
        if dump:
            log(f"plane {plane.name!r}: {nevents} XLA-op events, "
                f"total {total/1e6:.1f} us (control-flow wrappers "
                "excluded)")
        matched_ps = sum(v for k, v in by_scope.items()
                         if not k.startswith("<other"))
        if best is None or matched_ps > best[3]:
            best = (plane.name, dict(by_scope), total, matched_ps)
    return best[0], best[1], best[2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="cora")
    ap.add_argument("--parties", type=int, default=2)
    ap.add_argument("--agg", default="auto")
    ap.add_argument("--variant", default="opt")
    ap.add_argument("--scan", type=int, default=64)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--outdir", default="/tmp/jaxtrace")
    ap.add_argument("--dump", action="store_true")
    ap.add_argument("--parse-only", action="store_true",
                    help="re-parse an existing trace in --outdir (no "
                         "device run; epochs = --reps * --scan)")
    ap.add_argument("--breakdown-log", default=None,
                    help="write ::<tag> took lines (driver log format)")
    args = ap.parse_args()

    if args.parse_only:
        n_epochs = args.reps * args.scan
        plane, by_scope, total = parse_trace(Path(args.outdir), args.dump)
        report(plane, by_scope, total, n_epochs, args.breakdown_log)
        return

    import jax
    import jax.numpy as jnp

    try:
        cache = Path(__file__).resolve().parent.parent / ".xla_cache"
        cache.mkdir(exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception as e:  # noqa: BLE001
        log(f"(compile cache unavailable: {e})")

    ds, eng = build_engine(args.dataset, args.parties, args.agg,
                           args.variant)
    log(f"backend={jax.default_backend()} {args.dataset} "
        f"P={args.parties} agg={eng.aggregation} variant={args.variant}")

    def sync():
        return float(np.asarray(jnp.sum(
            eng.weights_sh[0][0, 0].astype(jnp.float32))))

    t0 = time.perf_counter()
    eng.run_epochs_scan(args.scan)
    sync()
    log(f"compile+first scan({args.scan}): {time.perf_counter()-t0:.2f}s")

    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    t0 = time.perf_counter()
    with jax.profiler.trace(str(outdir)):
        for _ in range(args.reps):
            eng.run_epochs_scan(args.scan)
        sync()
    wall = time.perf_counter() - t0
    n_epochs = args.reps * args.scan
    log(f"traced {n_epochs} epochs in {wall:.2f}s wall "
        f"({wall/n_epochs*1e6:.1f} us/epoch incl. host)")

    plane, by_scope, total = parse_trace(outdir, args.dump)
    report(plane, by_scope, total, n_epochs, args.breakdown_log)


def report(plane, by_scope, total, n_epochs, breakdown_log):
    print(f"# trace plane: {plane}")
    print(f"# {n_epochs} epochs; device total "
          f"{total/1e12/n_epochs*1e6:.1f} us/epoch")
    width = max(len(k) for k in by_scope)
    print(f"{'scope':<{width}}  us/epoch  share")
    for k, v in sorted(by_scope.items(), key=lambda kv: -kv[1]):
        print(f"{k:<{width}}  {v/1e12/n_epochs*1e6:8.2f}  "
              f"{v/total*100:5.1f}%")
    print()
    print("reference-tag mapping (ss_…h:745-897):")
    for tag, scopes in REF_TAGS.items():
        ps = sum(by_scope.get(s, 0) for s in scopes)
        print(f"  ::{tag} took {ps/1e12/n_epochs:.6f}")
    if breakdown_log:
        with open(breakdown_log, "w") as f:
            for tag, scopes in REF_TAGS.items():
                ps = sum(by_scope.get(s, 0) for s in scopes)
                f.write(f"::{tag} took {ps/1e12/n_epochs:.6f}\n")
            other = sum(v for k, v in by_scope.items()
                        if k.startswith("<other"))
            f.write(f"::other_device took {other/1e12/n_epochs:.6f}\n")
        log(f"wrote {breakdown_log}")


if __name__ == "__main__":
    main()
