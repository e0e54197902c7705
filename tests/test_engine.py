"""Jitted GAS engine vs the float64 oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cognn_tpu.config import GNNParam
from cognn_tpu.engine import GasEngine, build_device_plan
from cognn_tpu.models.oracle import GasOracle

from test_oracle import build_parties, make_dataset, make_param


def setup(n_parties, variant="opt", n=48, m=300, lr=0.5):
    src, dst, feats, labels = make_dataset(n=n, m=m, homophily=0.7)
    param = make_param(n, feats.shape[1], labels.max() + 1, lr=lr)
    graphs = build_parties(src, dst, feats, labels, n_parties)
    oracle = GasOracle(
        [g for g in build_parties(src, dst, feats, labels, n_parties)],
        param, variant)
    plan = build_device_plan(graphs)
    engine = GasEngine(plan, param, variant)
    return engine, oracle, graphs


def assert_engine_matches_oracle(engine, oracle, graphs, atol):
    for p, g in enumerate(graphs):
        n = g.num_local
        for l in range(engine.L):
            np.testing.assert_allclose(
                np.asarray(engine.weights[l][p]),
                oracle.parties[p].weights[l], atol=atol,
                err_msg=f"party {p} layer {l}")


@pytest.mark.parametrize("n_parties", [1, 2, 4])
@pytest.mark.parametrize("variant", ["opt", "unopt"])
def test_epoch_matches_oracle(n_parties, variant):
    engine, oracle, graphs = setup(n_parties, variant)
    m = engine.run_epochs(2)
    oracle.run_epochs(2)
    assert_engine_matches_oracle(engine, oracle, graphs, atol=5e-4)
    om = oracle.metrics[-1]
    np.testing.assert_allclose(float(m["loss"][0]), om.loss, atol=1e-3)
    np.testing.assert_allclose(float(m["train_acc"][0]), om.train_acc,
                               atol=1e-6)
    np.testing.assert_allclose(float(m["border_test_acc"][0]),
                               om.border_test_acc, atol=1e-6)
    assert int(m["num_border"][0]) == om.num_border


@pytest.mark.parametrize("mode", ["stacked", "sharded"])
def test_scan_epochs_match_loop(mode):
    """run_epochs_scan(n) (one lax.scan program) == n run_epoch dispatches."""
    if mode == "sharded" and len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    src, dst, feats, labels = make_dataset(n=48, m=300, homophily=0.7)
    param = make_param(48, feats.shape[1], labels.max() + 1)
    graphs = build_parties(src, dst, feats, labels, 2)
    kw = {}
    if mode == "sharded":
        kw = dict(mode="sharded", mesh=jax.make_mesh((2,), ("party",)))
    loop = GasEngine(build_device_plan(graphs), param, "opt")
    scan = GasEngine(build_device_plan(graphs), param, "opt", **kw)
    m_loop = loop.run_epochs(3)
    m_scan = scan.run_epochs_scan(3)
    for l in range(2):
        np.testing.assert_allclose(np.asarray(scan.weights[l]),
                                   np.asarray(loop.weights[l]), atol=1e-5)
    for k in m_loop:
        np.testing.assert_allclose(np.asarray(m_scan[k])[:, -1],
                                   np.asarray(m_loop[k]), atol=1e-5,
                                   err_msg=k)
    assert np.asarray(m_scan["loss"]).shape == (2, 3)


def test_forward_matches_oracle():
    engine, oracle, graphs = setup(2)
    z, prob, metrics = engine.forward()
    oracle.run(2)
    for p, g in enumerate(graphs):
        n = g.num_local
        np.testing.assert_allclose(np.asarray(z[p][:n]),
                                   oracle.parties[p].z[1], atol=2e-5)


def test_longer_training_tracks_oracle():
    engine, oracle, graphs = setup(2, lr=1.0)
    engine.run_epochs(10)
    oracle.run_epochs(10)
    # f32 drift accumulates; loose tolerance on weights
    assert_engine_matches_oracle(engine, oracle, graphs, atol=5e-3)


def test_sharded_matches_stacked():
    """shard_map over a party mesh == stacked single-program execution."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    src, dst, feats, labels = make_dataset(n=48, m=300, homophily=0.7)
    param = make_param(48, feats.shape[1], labels.max() + 1)
    graphs = build_parties(src, dst, feats, labels, 4)
    stacked = GasEngine(build_device_plan(graphs), param, "opt")
    mesh = jax.make_mesh((4,), ("party",))
    sharded = GasEngine(build_device_plan(graphs), param, "opt",
                        mode="sharded", mesh=mesh)
    ms = stacked.run_epochs(2)
    mh = sharded.run_epochs(2)
    for l in range(2):
        np.testing.assert_allclose(np.asarray(sharded.weights[l]),
                                   np.asarray(stacked.weights[l]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mh["loss"]),
                               np.asarray(ms["loss"]), atol=1e-5)


@pytest.mark.parametrize("aggregation", ["dense", "bcsr"])
def test_sharded_backends_match_stacked(aggregation):
    """Sharded dense / Pallas-BCSR aggregation == stacked sparse."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    src, dst, feats, labels = make_dataset(n=48, m=300, homophily=0.7)
    param = make_param(48, feats.shape[1], labels.max() + 1)
    graphs = build_parties(src, dst, feats, labels, 4)
    stacked = GasEngine(build_device_plan(graphs), param, "opt",
                        aggregation="sparse")
    mesh = jax.make_mesh((4,), ("party",))
    plan = build_device_plan(graphs, dense=(aggregation == "dense"))
    sharded = GasEngine(plan, param, "opt", mode="sharded", mesh=mesh,
                        aggregation=aggregation)
    ms = stacked.run_epochs(2)
    mh = sharded.run_epochs(2)
    # bcsr streams A blocks in bf16 (same as the stacked backend, which the
    # ops tests bound at rel 5e-3); dense is exact f32
    atol = 1e-5 if aggregation == "dense" else 1e-3
    for l in range(2):
        np.testing.assert_allclose(np.asarray(sharded.weights[l]),
                                   np.asarray(stacked.weights[l]), atol=atol)
    np.testing.assert_allclose(np.asarray(mh["loss"]),
                               np.asarray(ms["loss"]), atol=atol)


def test_sharded_supertiled_bcsr_matches_stacked():
    """The sharded bcsr backend's supertiled-kernel variant (auto-picked
    at PubMed scale via BCSR_TILED_NNZB) matches stacked sparse."""
    from unittest import mock

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    src, dst, feats, labels = make_dataset(n=48, m=300, homophily=0.7)
    param = make_param(48, feats.shape[1], labels.max() + 1)
    graphs = build_parties(src, dst, feats, labels, 2)
    stacked = GasEngine(build_device_plan(graphs), param, "opt",
                        aggregation="sparse")
    mesh = jax.make_mesh((2,), ("party",))
    with mock.patch("cognn_tpu.engine.gas.BCSR_TILED_NNZB", 1):
        sharded = GasEngine(build_device_plan(graphs), param, "opt",
                            mode="sharded", mesh=mesh, aggregation="bcsr")
    assert sharded._bcsr_blocks[0] == "tiled"
    assert "bcsr_t_vals" in sharded._agg_data
    ms = stacked.run_epochs(2)
    mh = sharded.run_epochs(2)
    for l in range(2):
        np.testing.assert_allclose(np.asarray(sharded.weights[l]),
                                   np.asarray(stacked.weights[l]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(mh["loss"]),
                               np.asarray(ms["loss"]), atol=1e-3)


@pytest.mark.parametrize("variant", ["opt", "unopt"])
def test_three_layer_gcn(variant):
    """L=3 generalization (the reference hardcodes 2 layers in its init;
    the schedule math generalizes and our engines support any L)."""
    src, dst, feats, labels = make_dataset(n=48, m=300, homophily=0.7)
    param = make_param(48, feats.shape[1], labels.max() + 1, layers=3)
    graphs = build_parties(src, dst, feats, labels, 2)
    oracle = GasOracle(build_parties(src, dst, feats, labels, 2), param,
                       variant)
    engine = GasEngine(build_device_plan(graphs), param, variant)
    assert engine.epoch_layers == (9 if variant == "opt" else 6)
    m = engine.run_epochs(2)
    oracle.run_epochs(2)
    for p in range(2):
        for l in range(3):
            np.testing.assert_allclose(
                np.asarray(engine.weights[l][p]),
                oracle.parties[p].weights[l], atol=1e-3,
                err_msg=f"party {p} layer {l}")
