#!/usr/bin/env python
"""Aggregation-kernel microbenchmark: Pallas BCSR SpMM vs XLA take+segsum.

The north-star op (BASELINE.json: "SpMM/SDDMM speed-of-light per chip").
Reports single-dispatch latency (honest, no async amortization) and the HBM
roofline for the block stream.

  python tools/bench_spmm.py [--v 32768] [--e 131072] [--d 16] [--band 2048]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--v", type=int, default=1 << 15)
    ap.add_argument("--e", type=int, default=1 << 17)
    ap.add_argument("--d", type=int, default=16)
    ap.add_argument("--band", type=int, default=2048,
                    help="edge locality band (models BFS-reordered graphs)")
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--tiled", action="store_true",
                    help="also run the supertiled deep-streaming variant")
    ap.add_argument("--g", type=str, default="8",
                    help="blocks per grid step (comma-separated sweep)")
    ap.add_argument("--skip-base", action="store_true",
                    help="skip the one-block-per-step base kernel")
    ap.add_argument("--merged", type=str, default="",
                    help="comma-separated G sweep for the merged-K "
                         "same-destination variant")
    ap.add_argument("--c", type=int, default=16, help="src supertile blocks")
    ap.add_argument("--split", type=str, default="1",
                    help="comma-separated K-split sweep for --merged "
                         "(independent sub-dots per step -> multiple MXUs)")
    ap.add_argument("--skip-xla", action="store_true")
    ap.add_argument("--lane-layout", action="store_true",
                    help="tiled variant: dynamic lane slicing instead of "
                         "block-major 3D tiles")
    ap.add_argument("--chain", type=int, default=0,
                    help="time N data-dependent chained dispatches inside "
                         "one jit (defeats the tunnel's async-dispatch "
                         "timing artifact on sub-ms kernels)")
    ap.add_argument("--dense-probe", type=str, default="",
                    help="comma-separated M sweep: measure raw MXU A-stream "
                         "consumption for [M,K]x[K,128] dense dots (the "
                         "hardware ceiling the SpMM kernels chase)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        cache = Path(__file__).resolve().parent.parent / ".xla_cache"
        cache.mkdir(exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception as e:  # noqa: BLE001
        print(f"(compile cache unavailable: {e})", file=sys.stderr)

    if args.dense_probe:
        # What rate can the MXU consume a streamed contraction operand at,
        # as a function of LHS rows M? A_stream GB/s here bounds every
        # BCSR variant (they all feed A through the MXU as RHS rows).
        K = 1 << 16
        a_big = jnp.asarray(
            np.random.default_rng(1).normal(size=(K, 128)), jnp.bfloat16)
        for M in (int(s) for s in args.dense_probe.split(",")):
            h = jnp.asarray(np.random.default_rng(2).normal(size=(M, K)),
                            jnp.bfloat16)

            @jax.jit
            def probe(h, a, n=args.chain or 64):
                def body(_, carry):
                    h, acc = carry
                    o = jax.lax.dot_general(
                        h, a, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    # data dependence: fold output back into h cheaply
                    return (h + o[:, :1].astype(h.dtype) * 1e-30, acc + o)
                return jax.lax.fori_loop(
                    0, n, body, (h, jnp.zeros((h.shape[0], 128))))[1]

            jax.block_until_ready(probe(h, a_big))
            t0 = time.perf_counter()
            r = probe(h, a_big)
            float(np.asarray(jnp.sum(r)))
            dt = time.perf_counter() - t0
            n = args.chain or 64
            gb = n * K * 128 * 2 / 1e9
            if dt < 0.5:
                print(f"  WARNING: window {dt*1e3:.0f} ms < 500 ms")
            print(f"dense probe M={M:4d}: A-stream {gb/dt:.0f} GB/s  "
                  f"({dt/n*1e6:.0f} us per K={K} dot)", flush=True)
        return

    from cognn_tpu.ops.bcsr import build_bcsr
    from cognn_tpu.ops.pallas_spmm import PallasSpmm

    rng = np.random.default_rng(0)
    V, E, D = args.v, args.e, args.d
    src = rng.integers(0, V, E)
    dst = (src + rng.integers(-args.band, args.band, E)) % V
    m = build_bcsr(src, dst, V, V)
    mb = m.nnzb * 128 * 128 * 2 / 1e6  # bf16 stream
    print(f"backend={jax.default_backend()} V={V} E={E} D={D} "
          f"nnzb={m.nnzb} A-stream={mb:.0f} MB (bf16)")

    ht0 = rng.normal(size=(D, m.n_src_blocks * 128)).astype(np.float32)
    x = jnp.asarray(ht0)
    k = None
    if not args.skip_base:
        k = PallasSpmm(m)
        jax.block_until_ready(k(x))  # compile

    def timeit(fn):
        """min-of-reps wall time for one logical application of fn."""
        if args.chain:
            # n data-dependent applications in ONE program (fori_loop, so
            # the chain compiles once instead of unrolling n Pallas calls):
            # the device must run them back to back, so per-call time =
            # total / n (defeats sub-ms readiness misreporting through the
            # tunnel)
            n = args.chain

            @jax.jit
            def chained_fn(kern, h0):
                # kern rides in as a pytree ARGUMENT: closure-capturing it
                # would embed the GB-scale block stream as HLO constants,
                # which the remote-compile transport rejects (HTTP 413)
                def body(_, h):
                    o = kern(h)
                    return h + o[:, : h.shape[1]] * 1e-30
                return jax.lax.fori_loop(0, n, body, h0)

            def chained():
                return chained_fn(fn, x)

            jax.block_until_ready(chained())
            # grand window ended by a VALUE FETCH: through the axon tunnel
            # block_until_ready can return before the device finishes even
            # with hundreds of chained dispatches queued (we measured an
            # impossible 4.8 TB/s that way). Fetching a concrete scalar off
            # the final chain link cannot complete early — the bytes must
            # exist — so the window is bounded below by real device time.
            t0 = time.perf_counter()
            last = None
            for _ in range(args.reps):
                last = chained()
            float(np.asarray(jnp.sum(last)))  # hard sync
            total = time.perf_counter() - t0
            if total < 0.5:
                print(f"  WARNING: window {total*1e3:.0f} ms < 500 ms — "
                      "raise --chain for an honest number", flush=True)
            return total / (args.reps * n)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(x))
            times.append(time.perf_counter() - t0)
        return min(times)

    ref_cache = []

    def check(kernel, tag):
        """rel err of kernel(x) vs a float64 numpy scatter-add oracle —
        independent of the base kernel so --skip-base still validates."""
        if not ref_cache:
            U = np.zeros((V, D))
            np.add.at(U, dst, ht0.astype(np.float64).T[:V][src])
            ref_cache.append(U)
        got = np.asarray(kernel(x)).T[:V]
        rel = (np.abs(got - ref_cache[0]).max()
               / max(np.abs(ref_cache[0]).max(), 1e-9))
        print(f"  {tag} vs numpy rel err {rel:.2e} "
              "(bf16 operand rounding)", flush=True)

    if k is not None:
        t = timeit(k)
        print(f"pallas bcsr_spmm: {t*1e3:.3f} ms  {E/t/1e9:.2f} Gedge/s  "
              f"(roofline {mb/819:.3f} ms @819GB/s)", flush=True)
        check(k, "base")
    else:
        t = None
        print(f"(base kernel skipped; roofline {mb/819:.3f} ms @819GB/s)",
              flush=True)

    if args.tiled:
        from cognn_tpu.ops.pallas_spmm import PallasSpmmTiled

        for g in (int(s) for s in args.g.split(",")):
            kt = PallasSpmmTiled(m, G=g, C=args.c, Cd=args.c,
                                 block_major=not args.lane_layout)
            ng = len(np.asarray(kt.first))
            jax.block_until_ready(kt(x))  # compile
            tt = timeit(kt)
            pad_mb = ng * g * 128 * 128 * 2 / 1e6
            vs = f"  -> {t/tt:.2f}x vs base" if t is not None else ""
            print(f"pallas tiled(G={g},C={args.c}): {tt*1e3:.3f} ms  "
                  f"{E/tt/1e9:.2f} Gedge/s  stream={pad_mb:.0f} MB "
                  f"(pad {pad_mb/mb - 1:+.0%}){vs}", flush=True)
            check(kt, f"tiled(G={g})")

    if args.merged:
        from cognn_tpu.ops.pallas_spmm import PallasSpmmMerged

        for g in (int(s) for s in args.merged.split(",")):
            for sp in (int(s) for s in args.split.split(",")):
                if g % sp:
                    continue
                km = PallasSpmmMerged(m, G=g, C=args.c, Cd=args.c, split=sp)
                jax.block_until_ready(km(x))  # compile
                tm = timeit(km)
                pad_mb = km.n_groups * g * 128 * 128 * 2 / 1e6
                vs = f"  -> {t/tm:.2f}x vs base" if t is not None else ""
                print(f"pallas merged(G={g},S={sp},C={args.c}): "
                      f"{tm*1e3:.3f} ms  {E/tm/1e9:.2f} Gedge/s  "
                      f"stream={pad_mb:.0f} MB  eff-BW "
                      f"{pad_mb/1e3/tm:.0f} GB/s "
                      f"(pad {pad_mb/mb - 1:+.0%}){vs}", flush=True)
                check(km, f"merged(G={g},S={sp})")

    if args.skip_xla:
        return

    order = np.argsort(dst, kind="stable")
    src_j = jnp.asarray(src[order].astype(np.int32))
    seg_j = jnp.asarray(dst[order].astype(np.int32))
    H = jnp.asarray(ht0.T[:V])

    @jax.jit
    def xla_segsum(H):
        return jax.ops.segment_sum(H[src_j], seg_j, num_segments=V,
                                   indices_are_sorted=True)

    jax.block_until_ready(xla_segsum(H))
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        jax.block_until_ready(xla_segsum(H))
        times.append(time.perf_counter() - t0)
    t2 = min(times)
    vs = f"  -> pallas speedup {t2/t:.1f}x" if t is not None else ""
    print(f"xla take+segsum:  {t2*1e3:.3f} ms  {E/t2/1e9:.2f} Gedge/s{vs}")

    # SDDMM companion (per-edge scores over the same block structure)
    from cognn_tpu.ops.pallas_sddmm import PallasSddmm

    sd = PallasSddmm(m)
    jax.block_until_ready(sd(x, x))
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        jax.block_until_ready(sd(x, x))
        times.append(time.perf_counter() - t0)
    t3 = min(times)
    print(f"pallas sddmm:     {t3*1e3:.3f} ms  {E/t3/1e9:.2f} Gedge/s")


if __name__ == "__main__":
    main()
