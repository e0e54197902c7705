"""Oracle tests.

Key properties:
  * single-tile forward == independent dense-matrix GCN with the reference's
    quirky normalization (norm0; deferred scales; epoch-boundary skip)
  * partitioned N-party run == single-tile run (forward activations and
    training trajectory), for N in {2, 4} — the reference's correctness claim
  * dummy-padding modes agree when no vertex is isolated
  * training decreases loss / increases accuracy on a learnable synthetic task
"""

import numpy as np
import pytest

from cognn_tpu.config import GNNParam
from cognn_tpu.graph import build_party_graph
from cognn_tpu.models.oracle import GasOracle, norm0, softmax
from cognn_tpu.utils.glibc_rand import glorot_init

RNG = np.random.default_rng(3)


def make_dataset(n=40, m=150, d=8, c=3, seed=5, with_isolated=True,
                 homophily=0.0):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, c, n)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    if homophily > 0:
        # keep mostly same-label edges so aggregation helps (GCN-friendly)
        same = labels[src] == labels[dst]
        keep &= same | (rng.random(m) > homophily)
    if with_isolated:
        # make the last two vertices isolated
        keep &= (src < n - 2) & (dst < n - 2)
    src, dst = src[keep], dst[keep]
    key = src * n + dst
    _, idx = np.unique(key, return_index=True)
    src, dst = src[idx], dst[idx]
    # undirected (reference datasets are); dedupe after symmetrization
    src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
    key = src * n + dst
    _, idx = np.unique(key, return_index=True)
    src, dst = src[idx], dst[idx]
    # learnable features: label signal + noise
    feats = rng.normal(size=(n, d)) * 0.3
    feats[np.arange(n), labels % d] += 2.0
    return src, dst, feats, labels


def make_param(n, d, c, layers=2, hidden=8, lr=0.5):
    return GNNParam(num_layers=layers, num_labels=c, input_dim=d,
                    hidden_dim=hidden, num_samples=n, num_edges=0,
                    learning_rate=lr, train_ratio=0.5, val_ratio=0.2,
                    test_ratio=0.3)


def build_parties(src, dst, feats, labels, n_parties):
    n = len(feats)
    vids = np.arange(n)
    tid = None if n_parties == 1 else {v: v % n_parties for v in range(n)}
    graphs = []
    for p in range(n_parties):
        g = build_party_graph(src, dst, None, tid, p, n_parties,
                              all_vids=vids)
        g.set_vertex_data(vids, feats, labels)
        graphs.append(g)
    return graphs


def dense_forward(src, dst, feats, in_deg, weights):
    """Independent dense implementation of the opt forward schedule."""
    n = len(feats)
    A = np.zeros((n, n))
    A[dst, src] = 1.0  # agg[v] += H[u] for edge u->v
    n_load = np.power(in_deg + 1.0, -0.5)
    n0 = norm0(in_deg)
    H = feats * n_load[:, None]
    # layer 0: matmul, aggregate (self + in-neighbors), dest scale
    Z0 = ((np.eye(n) + A) @ (H @ weights[0])) * n0[:, None]
    H1 = np.maximum(Z0, 0.0)
    # layer 1: matmul, source scale, aggregate, dest scale
    Z1 = ((np.eye(n) + A) @ ((H1 @ weights[1]) * n0[:, None])) * n0[:, None]
    return softmax(Z1)


class TestSingleTile:
    def test_forward_matches_dense(self):
        src, dst, feats, labels = make_dataset()
        n, d, c = len(feats), feats.shape[1], labels.max() + 1
        param = make_param(n, d, c)
        graphs = build_parties(src, dst, feats, labels, 1)
        o = GasOracle(graphs, param, "opt")
        o.run(2)  # forward only
        dense_p = dense_forward(src, dst, feats,
                                graphs[0].in_deg.astype(float),
                                o.parties[0].weights)
        got_p = softmax(o.parties[0].z[1])
        np.testing.assert_allclose(got_p, dense_p, atol=1e-10)

    def test_inference_variant_matches_opt_forward(self):
        src, dst, feats, labels = make_dataset()
        param = make_param(len(feats), feats.shape[1], labels.max() + 1)
        g1 = build_parties(src, dst, feats, labels, 1)
        g2 = build_parties(src, dst, feats, labels, 1)
        a = GasOracle(g1, param, "opt")
        b = GasOracle(g2, param, "opt_inference")
        a.run(2)
        b.run(2)
        np.testing.assert_allclose(a.parties[0].z[1], b.parties[0].z[1])

    def test_training_learns(self):
        src, dst, feats, labels = make_dataset(with_isolated=False,
                                               homophily=0.9)
        param = make_param(len(feats), feats.shape[1], labels.max() + 1)
        o = GasOracle(build_parties(src, dst, feats, labels, 1), param, "opt")
        o.run_epochs(30)
        first, last = o.metrics[0], o.metrics[-1]
        assert last.loss < first.loss
        assert last.train_acc > 0.8
        assert last.full_acc > first.full_acc

    def test_unopt_training_learns(self):
        src, dst, feats, labels = make_dataset(with_isolated=False,
                                               homophily=0.9)
        param = make_param(len(feats), feats.shape[1], labels.max() + 1)
        o = GasOracle(build_parties(src, dst, feats, labels, 1), param,
                      "unopt")
        o.run_epochs(30)
        assert o.metrics[-1].loss < o.metrics[0].loss
        assert o.metrics[-1].train_acc > 0.8


class TestPartitionConsistency:
    @pytest.mark.parametrize("n_parties", [2, 4])
    @pytest.mark.parametrize("variant", ["opt", "unopt"])
    def test_forward_prediction_matches_single(self, n_parties, variant):
        """Partitioned forward == global forward (per-vertex logits)."""
        src, dst, feats, labels = make_dataset(n=48, m=300)
        param = make_param(len(feats), feats.shape[1], labels.max() + 1)
        single = GasOracle(build_parties(src, dst, feats, labels, 1),
                           param, variant)
        multi = GasOracle(build_parties(src, dst, feats, labels, n_parties),
                          param, variant)
        single.run(2)
        multi.run(2)
        zs = single.parties[0].z[1]
        # reassemble multi-party logits into global vid order
        for p in range(n_parties):
            g = multi.graphs[p]
            zp = multi.parties[p].z[1]
            sel = np.searchsorted(single.graphs[0].local_vids, g.local_vids)
            np.testing.assert_allclose(zp, zs[sel], atol=1e-9,
                                       err_msg=f"party {p}")

    def test_dummy_mode_equivalence(self):
        """pow2 padding vs no-dummy mode agree when nothing is isolated
        (dummies contribute the aggregation identity)."""
        src, dst, feats, labels = make_dataset(with_isolated=False)
        n = len(feats)
        vids = np.arange(n)
        param = make_param(n, feats.shape[1], labels.max() + 1)
        tid = {v: v % 2 for v in range(n)}
        runs = []
        for ndm in (False, True):
            graphs = []
            for p in range(2):
                g = build_party_graph(src, dst, None, tid, p, 2,
                                      no_dummy_edge=ndm, all_vids=vids)
                g.set_vertex_data(vids, feats, labels)
                graphs.append(g)
            # isolated-vertex check: no local vertex without local in-edge
            o = GasOracle(graphs, param, "opt")
            o.run_epochs(2)
            runs.append(o)
        for p in range(2):
            np.testing.assert_allclose(runs[0].parties[p].weights[0],
                                       runs[1].parties[p].weights[0])

    def test_multi_party_weights_stay_synced(self):
        src, dst, feats, labels = make_dataset(n=48, m=300)
        param = make_param(len(feats), feats.shape[1], labels.max() + 1)
        o = GasOracle(build_parties(src, dst, feats, labels, 3), param, "opt")
        o.run_epochs(3)
        for layer in range(2):
            for p in range(1, 3):
                np.testing.assert_allclose(o.parties[p].weights[layer],
                                           o.parties[0].weights[layer])


class TestGoldenRegression:
    """Pin recorded GOLDEN.md numbers (CPU f32 deterministic) to catch
    semantic drift in the schedule implementation."""

    def test_cora_2p_30_epochs(self):
        from cognn_tpu.engine import GasEngine, build_device_plan
        from cognn_tpu.harness.datasets import synthetic_planetoid

        ds = synthetic_planetoid("cora")
        n = len(ds.features)
        vids = np.arange(n)
        tid = {v: v % 2 for v in range(n)}
        graphs = []
        for p in range(2):
            g = build_party_graph(ds.src, ds.dst, None, tid, p, 2,
                                  all_vids=vids)
            g.set_vertex_data(vids, ds.features, ds.labels)
            graphs.append(g)
        eng = GasEngine(build_device_plan(graphs, lane=128), ds.param)
        m = GasEngine.metrics_host(eng.run_epochs(30))
        # trajectory point en route to the GOLDEN.md 90-epoch values
        assert m["test_acc"].mean() > 0.85
        assert m["border_test_acc"].mean() > 0.85
        assert m["loss"].mean() < 0.55
