"""Graph-analytics kernels vs plain numpy references, incl. partitioned."""

import numpy as np
import pytest

from cognn_tpu.engine import build_device_plan
from cognn_tpu.engine.analytics import (
    AnalyticsEngine,
    bfs_program,
    cc_program,
    pagerank_program,
    sssp_program,
)
from cognn_tpu.graph import build_party_graph

RNG = np.random.default_rng(4)


def build(n_parties, n=40, m=160, weights=None, seed=4):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    key = src * n + dst
    _, idx = np.unique(key, return_index=True)
    src, dst = src[idx], dst[idx]
    w = (rng.uniform(0.5, 2.0, len(src)) if weights else None)
    vids = np.arange(n)
    tid = {v: v % n_parties for v in range(n)} if n_parties > 1 else None
    graphs = [build_party_graph(src, dst, w, tid, p, n_parties,
                                all_vids=vids)
              for p in range(n_parties)]
    return src, dst, w, graphs


def to_global(plan, graphs, h):
    """[P, V] party-stacked values -> [n] global (by vid)."""
    n = sum(g.num_local for g in graphs)
    out = np.zeros(n)
    for p, g in enumerate(graphs):
        out[g.local_vids] = np.asarray(h[p][: g.num_local])
    return out


@pytest.mark.parametrize("n_parties", [1, 3])
def test_pagerank(n_parties):
    src, dst, _, graphs = build(n_parties)
    n = 40
    plan = build_device_plan(graphs)
    eng = AnalyticsEngine(plan, pagerank_program(num_vertices=n))
    h = eng.run(30)
    got = to_global(plan, graphs, h)
    # numpy reference
    out_deg = np.bincount(src, minlength=n).astype(float)
    x = np.full(n, 1.0 / n)
    for _ in range(30):
        contrib = np.zeros(n)
        np.add.at(contrib, dst, x[src] / np.maximum(out_deg[src], 1.0))
        x = 0.15 / n + 0.85 * contrib
    np.testing.assert_allclose(got, x, atol=1e-5)


@pytest.mark.parametrize("n_parties", [1, 2])
def test_bfs(n_parties):
    src, dst, _, graphs = build(n_parties)
    n = 40
    plan = build_device_plan(graphs)
    # source = global vid 0: find its (party, local idx)
    p0 = next(p for p, g in enumerate(graphs) if 0 in g.local_vids)
    i0 = int(np.searchsorted(graphs[p0].local_vids, 0))
    eng = AnalyticsEngine(plan, bfs_program((p0, i0)))
    h = eng.run(n)
    got = to_global(plan, graphs, h)
    # numpy BFS
    INF = 3.0e38
    dist = np.full(n, INF)
    dist[0] = 0
    for _ in range(n):
        nd = dist.copy()
        np.minimum.at(nd, dst, dist[src] + 1)
        dist = np.minimum(dist, nd)
    np.testing.assert_allclose(np.minimum(got, 1e9),
                               np.minimum(dist, 1e9), atol=1e-3)


def test_sssp_weighted():
    src, dst, w, graphs = build(2, weights=True)
    n = 40
    plan = build_device_plan(graphs)
    p0 = next(p for p, g in enumerate(graphs) if 0 in g.local_vids)
    i0 = int(np.searchsorted(graphs[p0].local_vids, 0))
    eng = AnalyticsEngine(plan, sssp_program((p0, i0)))
    h = eng.run(n)
    got = to_global(plan, graphs, h)
    INF = 3.0e38
    dist = np.full(n, INF)
    dist[0] = 0
    for _ in range(n):
        nd = dist.copy()
        np.minimum.at(nd, dst, dist[src] + w)
        dist = np.minimum(dist, nd)
    np.testing.assert_allclose(np.minimum(got, 1e9),
                               np.minimum(dist, 1e9), rtol=1e-5)


@pytest.mark.parametrize("n_parties", [1, 2])
def test_cc(n_parties):
    src, dst, _, graphs = build(n_parties, m=60)  # sparse -> multiple comps
    n = 40
    # make undirected so components are well-defined under min-propagation
    src2 = np.concatenate([src, dst])
    dst2 = np.concatenate([dst, src])
    vids = np.arange(n)
    tid = {v: v % n_parties for v in range(n)} if n_parties > 1 else None
    graphs = [build_party_graph(src2, dst2, None, tid, p, n_parties,
                                all_vids=vids)
              for p in range(n_parties)]
    plan = build_device_plan(graphs)
    eng = AnalyticsEngine(plan, cc_program())
    h = eng.run(n)
    got = to_global(plan, graphs, h)
    # same component -> same label
    for u, v in zip(src2, dst2):
        assert got[u] == got[v]
    # number of distinct labels == number of components (union-find)
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in zip(src2, dst2):
        parent[find(u)] = find(v)
    n_comp = len({find(i) for i in range(n)})
    assert len(np.unique(got)) == n_comp
