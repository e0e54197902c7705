"""Secret-shared analytics vs the plaintext AnalyticsEngine (parity contract).

bfs/cc/sssp are exact in fixed point (no truncation anywhere on the MIN
path), so they must match the plaintext engine to weight-quantization
precision; pagerank carries one truncation per scale and matches to ~1e-3.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cognn_tpu.core.fixedpoint import FixedPointSpec
from cognn_tpu.engine import build_device_plan
from cognn_tpu.engine.analytics import (
    AnalyticsEngine,
    bfs_program,
    cc_program,
    pagerank_program,
    sssp_program,
)
from cognn_tpu.mpc.analytics import SS_INF, SSAnalyticsEngine
from cognn_tpu.mpc.protocol import Protocol

from test_analytics import build, to_global


# ---------------------------------------------------------------------------
# primitive: shared comparison / min / segmented min
# ---------------------------------------------------------------------------


def test_protocol_minimum_and_less():
    proto = Protocol()
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(1)
    a = rng.uniform(-100, 100, (64,)).astype(np.float32)
    b = rng.uniform(-100, 100, (64,)).astype(np.float32)
    b[:8] = a[:8]  # equal values: min must pick one of them, mask False
    ka, kb = jax.random.split(key)
    a_sh = proto.share(ka, jnp.asarray(a))
    b_sh = proto.share(kb, jnp.asarray(b))
    less = np.asarray(proto.less_mask(a_sh, b_sh))
    np.testing.assert_array_equal(less, a < b)
    got = np.asarray(proto.reveal(proto.minimum(a_sh, b_sh)))
    np.testing.assert_allclose(got, np.minimum(a, b), atol=2e-4)


def test_protocol_add_public():
    proto = Protocol()
    from cognn_tpu.core.fixedpoint import fp_encode_ring

    key = jax.random.PRNGKey(3)
    x = np.linspace(-5, 5, 32).astype(np.float32)
    sh = proto.share(key, jnp.asarray(x))
    pub = jnp.asarray(fp_encode_ring(2.5, proto.fp))[:, None]
    got = np.asarray(proto.reveal(proto.add_public(sh, pub)))
    np.testing.assert_allclose(got, x + 2.5, atol=2e-4)


# ---------------------------------------------------------------------------
# end-to-end parity with the plaintext analytics engine
# ---------------------------------------------------------------------------


def _clip(x):
    # plaintext INF is 3e38, share-space INF is 2^20: compare clipped
    return np.minimum(x, SS_INF)


@pytest.mark.parametrize("n_parties", [1, 3])
def test_ss_pagerank(n_parties):
    src, dst, _, graphs = build(n_parties)
    n = 40
    plan = build_device_plan(graphs)
    plain = AnalyticsEngine(plan, pagerank_program(num_vertices=n)).run(20)
    proto = Protocol(fp=FixedPointSpec(frac_bits=24))
    ss = SSAnalyticsEngine(plan, "pagerank", num_vertices=n, proto=proto)
    got = ss.run(20)
    np.testing.assert_allclose(to_global(plan, graphs, got),
                               to_global(plan, graphs, plain), atol=2e-3)


@pytest.mark.parametrize("n_parties", [1, 2])
def test_ss_bfs(n_parties):
    src, dst, _, graphs = build(n_parties)
    plan = build_device_plan(graphs)
    p0 = next(p for p, g in enumerate(graphs) if 0 in g.local_vids)
    i0 = int(np.searchsorted(graphs[p0].local_vids, 0))
    plain = AnalyticsEngine(plan, bfs_program((p0, i0))).run(12)
    ss = SSAnalyticsEngine(plan, "bfs", source=(p0, i0))
    got = ss.run(12)
    np.testing.assert_allclose(_clip(to_global(plan, graphs, got)),
                               _clip(to_global(plan, graphs, plain)),
                               atol=1e-3)


def test_ss_sssp_weighted():
    src, dst, w, graphs = build(2, weights=True)
    plan = build_device_plan(graphs)
    p0 = next(p for p, g in enumerate(graphs) if 0 in g.local_vids)
    i0 = int(np.searchsorted(graphs[p0].local_vids, 0))
    plain = AnalyticsEngine(plan, sssp_program((p0, i0))).run(15)
    ss = SSAnalyticsEngine(plan, "sssp", source=(p0, i0))
    got = ss.run(15)
    np.testing.assert_allclose(_clip(to_global(plan, graphs, got)),
                               _clip(to_global(plan, graphs, plain)),
                               atol=2e-3)


@pytest.mark.parametrize("n_parties", [1, 2])
def test_ss_cc(n_parties):
    src, dst, _, graphs = build(n_parties, m=60)
    n = 40
    src2 = np.concatenate([src, dst])
    dst2 = np.concatenate([dst, src])
    vids = np.arange(n)
    from cognn_tpu.graph import build_party_graph

    tid = {v: v % n_parties for v in range(n)} if n_parties > 1 else None
    graphs = [build_party_graph(src2, dst2, None, tid, p, n_parties,
                                all_vids=vids)
              for p in range(n_parties)]
    plan = build_device_plan(graphs)
    ss = SSAnalyticsEngine(plan, "cc")
    got = to_global(plan, graphs, ss.run(n))
    for u, v in zip(src2, dst2):
        assert got[u] == got[v]
