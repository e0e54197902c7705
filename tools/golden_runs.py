import sys, time, json
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
import numpy as np
from cognn_tpu.engine import GasEngine, build_device_plan
from cognn_tpu.graph import build_party_graph
from cognn_tpu.harness.datasets import synthetic_planetoid
from cognn_tpu.mpc import MpcGasEngine

def graphs_for(ds, P):
    n = len(ds.features); vids = np.arange(n)
    tid = {v: v % P for v in range(n)} if P > 1 else None
    gs = []
    for p in range(P):
        g = build_party_graph(ds.src, ds.dst, None, tid, p, P, all_vids=vids)
        g.set_vertex_data(vids, ds.features, ds.labels)
        gs.append(g)
    return gs

results = []
def run(name, dataset, P, epochs, mpc=False):
    t0 = time.time()
    ds = synthetic_planetoid(dataset)
    gs = graphs_for(ds, P)
    plan = build_device_plan(gs, lane=128)
    eng = (MpcGasEngine if mpc else GasEngine)(plan, ds.param)
    m0 = eng.metrics_host(eng.run_epoch())
    compile_s = time.time() - t0
    t0 = time.time()
    m = eng.metrics_host(eng.run_epochs(epochs - 1))
    train_s = time.time() - t0
    row = dict(name=name, dataset=dataset, parties=P, epochs=epochs, mpc=mpc,
               loss=float(m["loss"].mean()), full=float(m["full_acc"].mean()),
               train=float(m["train_acc"].mean()), test=float(m["test_acc"].mean()),
               border_test=float(m["border_test_acc"].mean()),
               compile_s=round(compile_s,1), train_s=round(train_s,2))
    print(json.dumps(row), flush=True)
    results.append(row)

run("plaintext-1p", "cora", 1, 90)
run("plaintext-2p", "cora", 2, 90)
run("plaintext-4p", "cora", 4, 90)
run("mpc-2p", "cora", 2, 90, mpc=True)
run("plaintext-2p", "citeseer", 2, 90)
run("plaintext-4p", "pubmed", 4, 90)
json.dump(results, open("golden.json", "w"), indent=1)
