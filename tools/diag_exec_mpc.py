#!/usr/bin/env python
"""Component-level DEVICE-TIME breakdown of the secret-shared epoch.

Times each mpc building block under a chained fori_loop (data-dependent
chain inside one program — the honest discipline for sub-ms kernels
through the tunnel), so the 0.62 ms Cora mpc epoch can be attributed:
share matmul (f=1433 vs hidden), public scale + truncation, byte-plane
dense aggregation, nonlinearities, prediction.

Usage: python tools/diag_exec_mpc.py [dataset] [agg] [chain]
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    dataset = sys.argv[1] if len(sys.argv) > 1 else "cora"
    agg = sys.argv[2] if len(sys.argv) > 2 else "dense"
    chain = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    from cognn_tpu.engine import build_device_plan
    from cognn_tpu.graph import build_party_graph
    from cognn_tpu.harness.datasets import synthetic_planetoid
    from cognn_tpu.mpc import MpcGasEngine
    from cognn_tpu.mpc.engine import _MpcComm

    ds = synthetic_planetoid(dataset)
    n = len(ds.features)
    vids = np.arange(n)
    tid = {v: v % 2 for v in range(n)}
    graphs = []
    for p in range(2):
        g = build_party_graph(ds.src, ds.dst, None, tid, p, 2,
                              all_vids=vids)
        g.set_vertex_data(vids, ds.features, ds.labels)
        graphs.append(g)
    plan = build_device_plan(graphs, lane=128)
    eng = MpcGasEngine(plan, ds.param, "opt", aggregation=agg)
    comm = _MpcComm()
    proto = eng.proto
    print(f"backend={jax.default_backend()} {dataset} agg={agg} "
          f"chain={chain}", flush=True)

    def timeit(name, fn, tmpl, reps=4):
        """fn: (key, x) -> y with y.shape == x.shape (chainable)."""
        @jax.jit
        def chained(key, x, arr, n0):
            def body(i, carry):
                key, x = carry
                key, k = jax.random.split(key)
                y = fn(k, x, arr, n0)
                # fold y back into x to force the chain
                return (key, y)
            return jax.lax.fori_loop(0, chain, body, (key, x))[1]

        key = jax.random.key(1)
        out = chained(key, tmpl, eng.arr, eng.n0_fp)
        float(np.asarray(jnp.sum(out[0, 0].astype(jnp.float32))))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = chained(key, tmpl, eng.arr, eng.n0_fp)
        float(np.asarray(jnp.sum(out[0, 0].astype(jnp.float32))))
        dt = (time.perf_counter() - t0) / (reps * chain)
        if (time.perf_counter() - t0) < 0.4:
            print(f"  (short window — rerun with larger chain)")
        print(f"{name}: {dt*1e6:.1f} us", flush=True)
        return dt

    S, L = 2, 2
    P, V = 2, plan.V
    f, h, c = ds.param.input_dim, ds.param.hidden_dim, ds.param.num_labels
    x_f = eng.x0_sh  # [2, L, P, V, f]
    x_h = jnp.zeros((S, L, P, V, h), jnp.uint32)
    w1 = eng.weights_sh[0]  # [.., f, h]

    # chainable wrappers (output folded to input shape where needed)
    def mm_f(k, x, arr, n0):  # [V,f]@[f,h] -> pad back to f columns
        y = eng._pmatmul(k, x, w1)  # [.., V, h]
        return x.at[..., :h].set(y)

    def mm_h(k, x, arr, n0):
        w = jnp.zeros((S, L, P, h, h), jnp.uint32)
        return eng._pmatmul(k, x, w)

    def scale(k, x, arr, n0):
        return eng._scale_rows(k, x, n0)

    def aggr(k, x, arr, n0):
        return eng._aggregate(comm, k, arr, n0, x, True)

    def relu(k, x, arr, n0):
        return proto.mask_mul(x, proto.sign_mask(x))

    def pred(k, x, arr, n0):
        y_hot = jax.nn.one_hot(arr.labels, c, dtype=jnp.float32)
        prob, pm = proto.softmax_pred(k, x[..., :c], y_hot)
        return x.at[..., :c].set(pm)

    timeit("pmatmul f=%d -> h" % f, mm_f, x_f)
    timeit("pmatmul h -> h", mm_h, x_h)
    timeit("scale_rows (h)", scale, x_h)
    timeit(f"aggregate {agg} (h)", aggr, x_h)
    timeit("relu mask (h)", relu, x_h)
    timeit("softmax_pred", pred, x_h)

    # whole-epoch scan for reference
    t0 = time.perf_counter()
    m = eng.run_epochs_scan(64)
    float(np.asarray(jnp.sum(eng.weights_sh[0][0, 0].astype(jnp.float32))))
    t0 = time.perf_counter()
    reps = 0
    while time.perf_counter() - t0 < 1.0:
        eng.run_epochs_scan(64)
        reps += 1
    float(np.asarray(jnp.sum(eng.weights_sh[0][0, 0].astype(jnp.float32))))
    dt = (time.perf_counter() - t0) / (reps * 64)
    print(f"full epoch (scan64): {dt*1e6:.1f} us", flush=True)


if __name__ == "__main__":
    main()
