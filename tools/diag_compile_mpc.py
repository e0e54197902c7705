#!/usr/bin/env python
"""Diagnose WHERE the mpc first-compile time goes at CiteSeer scale.

GOLDEN r3: CiteSeer mpc dense scan-epoch first compile = 998 s through the
remote-compile tunnel. This times the trace/lower/compile of each
sub-program (share matmul at f=3703, public scale, byte-plane aggregation,
full forward phase, epoch, scan) so the fix targets the real cost.

Run on TPU:  nohup python tools/diag_compile_mpc.py > /tmp/diag.log 2>&1 &
(no persistent cache — measures true compile)
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    dataset = sys.argv[1] if len(sys.argv) > 1 else "citeseer"
    agg = sys.argv[2] if len(sys.argv) > 2 else "dense"
    from cognn_tpu.engine import build_device_plan
    from cognn_tpu.graph import build_party_graph
    from cognn_tpu.harness.datasets import synthetic_planetoid
    from cognn_tpu.mpc import MpcGasEngine
    from cognn_tpu.mpc.engine import _MpcComm

    print(f"backend={jax.default_backend()} dataset={dataset} agg={agg}",
          flush=True)
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
    t0 = time.perf_counter()
    eng = MpcGasEngine(plan, ds.param, "opt", aggregation=agg)
    print(f"engine init {time.perf_counter()-t0:.1f}s", flush=True)

    def t(name, fn, *args):
        t0 = time.perf_counter()
        low = jax.jit(fn).lower(*args)
        t1 = time.perf_counter()
        try:
            nops = low.compiler_ir("hlo").as_hlo_module().to_string()
            size = len(nops)
        except Exception:  # noqa: BLE001
            size = -1
        low.compile()
        t2 = time.perf_counter()
        print(f"{name}: lower {t1-t0:.1f}s  hlo {size/1e6:.1f} MB  "
              f"compile {t2-t1:.1f}s", flush=True)

    key = jax.random.key(0)
    comm = _MpcComm()
    D_hidden = ds.param.hidden_dim
    S, Lb, P, V = 2, 2, 2, plan.V
    sh_hid = jnp.zeros((S, Lb, P, V, D_hidden), jnp.uint32)

    t("pmatmul [V,f]x[f,h] f=%d" % ds.param.input_dim,
      lambda k, a, b: eng._pmatmul(k, a, b),
      key, eng.x0_sh, eng.weights_sh[0])
    t("scale_rows hidden",
      lambda k, a, n0: eng._scale_rows(k, a, n0), key, sh_hid, eng.n0_fp)
    t("aggregate hidden",
      lambda k, arr, a, n0: eng._aggregate(comm, k, arr, n0, a, True),
      key, eng.arr, sh_hid, eng.n0_fp)
    t("fwd phase l=0 (matmul+agg+relu)",
      lambda k, arr, a, w, n0: eng._j_fwd[(True, False)].__wrapped__(
          k, 0, arr, n0, a, w),
      key, eng.arr, eng.x0_sh, eng.weights_sh[0], eng.n0_fp)
    t("epoch (3L phases)",
      lambda k, arr, w, x, n0, it: eng._epoch_body(comm, k, arr, w, x, n0,
                                                   it),
      key, eng.arr, eng.weights_sh, eng.x0_sh, eng.n0_fp,
      eng.inv_train_fp)
    t("scan(8) epochs",
      lambda k, arr, w, x, n0, it: eng._epochs_scan_body(
          8, comm, k, arr, w, x, n0, it),
      key, eng.arr, eng.weights_sh, eng.x0_sh, eng.n0_fp,
      eng.inv_train_fp)


if __name__ == "__main__":
    main()
