"""Planetoid raw-format loader: round-trip against locally generated
``ind.*`` fixtures (the on-disk format of the reference's dataset source,
PyG Planetoid; `tools/data_transform.py:29-65`). No network egress: the
fixtures are written by the test in the exact pickle/index format."""

import pickle

import numpy as np
import pytest

scipy_sparse = pytest.importorskip("scipy.sparse")

from cognn_tpu.harness.datasets import load_planetoid_raw  # noqa: E402

RNG = np.random.default_rng(7)


def _write_fixtures(root, name, n, f, c, test_ids, edges, feats, labels):
    """Write ind.<name>.{x,tx,allx,y,ty,ally,graph,test.index} for a ground
    truth (feats, labels, edges). ``test_ids`` come last in id space;
    ids inside [min,max] missing from test_ids are gap nodes (zero rows,
    the CiteSeer quirk)."""
    lo = int(min(test_ids))
    allx = scipy_sparse.csr_matrix(feats[:lo])
    y_oh = np.eye(c)[labels]
    ally = y_oh[:lo]
    # disk order of tx rows is the (shuffled) test.index order
    tx = scipy_sparse.csr_matrix(feats[test_ids])
    ty = y_oh[test_ids]
    x = allx[:5]
    yy = ally[:5]
    graph = {}
    for u, v in zip(*edges):
        graph.setdefault(int(u), []).append(int(v))
        graph.setdefault(int(v), []).append(int(u))
    for which, obj in [("x", x), ("tx", tx), ("allx", allx), ("y", yy),
                      ("ty", ty), ("ally", ally), ("graph", graph)]:
        with open(root / f"ind.{name}.{which}", "wb") as fh:
            pickle.dump(obj, fh)
    (root / f"ind.{name}.test.index").write_text(
        "\n".join(str(i) for i in test_ids) + "\n")


def _ground_truth(n, f, c, gap_ids=()):
    feats = RNG.random((n, f))
    labels = RNG.integers(1, c, n)  # label 0 reserved for gap rows
    for g in gap_ids:
        feats[g] = 0.0
        labels[g] = 0  # argmax of a zero one-hot row
    m = 60
    src = RNG.integers(0, n, m)
    dst = (src + 1 + RNG.integers(0, n - 1, m)) % n  # no self loops
    return feats, labels, (src, dst)


def _expected_edges(src, dst):
    pairs = {(int(u), int(v)) for u, v in zip(src, dst)}
    pairs |= {(v, u) for u, v in pairs}
    return sorted(pairs)


@pytest.mark.parametrize("gapped", [False, True])
def test_round_trip(tmp_path, gapped):
    n, f, c = 30, 12, 3
    if gapped:
        test_ids = np.array([22, 23, 25, 26, 28, 29])
        gap_ids = (24, 27)
    else:
        test_ids = np.arange(22, 30)
        gap_ids = ()
    feats, labels, (src, dst) = _ground_truth(n, f, c, gap_ids)
    # edges must not touch gap nodes (they are absent from real data too)
    keep = ~(np.isin(src, gap_ids) | np.isin(dst, gap_ids))
    src, dst = src[keep], dst[keep]
    disk_order = RNG.permutation(test_ids)  # shuffled test.index
    _write_fixtures(tmp_path, "cora", n, f, c, disk_order, (src, dst),
                    feats, labels)
    ds = load_planetoid_raw(tmp_path, "cora")
    np.testing.assert_allclose(ds.features, feats)
    np.testing.assert_array_equal(ds.labels, labels)
    assert list(zip(ds.src, ds.dst)) == _expected_edges(src, dst)
    assert ds.param.num_samples == n
    assert ds.param.input_dim == f
    assert ds.param.num_labels == c
    assert ds.param.num_edges == len(ds.src)


def test_loaded_dataset_trains(tmp_path):
    """Raw-loaded data flows through the full pipeline: file transform +
    2-party plan + one training epoch."""
    n, f, c = 30, 12, 3
    feats, labels, (src, dst) = _ground_truth(n, f, c)
    _write_fixtures(tmp_path, "cora", n, f, c, np.arange(22, 30),
                    (src, dst), feats, labels)
    ds = load_planetoid_raw(tmp_path, "cora")

    from cognn_tpu.engine import GasEngine, build_device_plan
    from cognn_tpu.graph import build_party_graph
    from cognn_tpu.harness.datasets import transform

    transform(ds, tmp_path / "out", partitions=(2,))
    assert (tmp_path / "out/cora.vertex.preprocessed").exists()

    vids = np.arange(n)
    tid = {v: v % 2 for v in range(n)}
    graphs = []
    for p in range(2):
        g = build_party_graph(ds.src, ds.dst, None, tid, p, 2, all_vids=vids)
        g.set_vertex_data(vids, ds.features, ds.labels)
        graphs.append(g)
    eng = GasEngine(build_device_plan(graphs), ds.param)
    m = GasEngine.metrics_host(eng.run_epoch())
    assert np.all(np.isfinite(m["loss"]))


def test_scaler_subset_matches_files(tmp_path):
    """The in-memory scaler_subset (driver path) and transform_by_parts
    (file path) are the same computation — vertices, edges, and block
    partition labels round-trip identically (VERDICT r3 hygiene: the
    scaler files and in-memory subsets cannot drift)."""
    import numpy as np

    from cognn_tpu.graph import (read_edge_list, read_partition_file,
                                 read_vertex_file)
    from cognn_tpu.harness.datasets import (scaler_subset, synthetic_planetoid,
                                            transform_by_parts)

    ds = synthetic_planetoid("cora_small")
    transform_by_parts(ds, tmp_path, num_parts=4)
    for k in (2, 3, 4):
        sub, tid = scaler_subset(ds, k, num_parts=4)
        d = tmp_path / f"{k}s"
        vid, feats, labels = read_vertex_file(
            d / "cora_small.vertex.preprocessed", ds.param.input_dim)
        np.testing.assert_array_equal(feats, sub.features)
        np.testing.assert_array_equal(labels, sub.labels)
        src, dst, _ = read_edge_list(d / "cora_small.edge.preprocessed")
        np.testing.assert_array_equal(np.sort(src * 10**6 + dst),
                                      np.sort(sub.src * 10**6 + sub.dst))
        part = read_partition_file(d / "cora_small.part.preprocessed", k)
        assert part == tid
