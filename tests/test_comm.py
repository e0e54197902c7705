"""Communication accounting: traced collective bytes == analytic model.

The reference measures per-NIC bytes with psutil (`tmp_run_cluster.py:
77-103`); our measured equivalent walks the sharded programs' jaxprs. These
tests pin the closed-form model to the traced truth (and hand-computed
values) so the `.comm` files written by tools/run_cluster.py are honest.
"""

import jax
import numpy as np
import pytest

from cognn_tpu.engine import GasEngine, build_device_plan
from cognn_tpu.engine.comm_model import (
    analytic_bytes_per_epoch,
    engine_epoch_bytes,
    traced_collective_bytes,
)
from cognn_tpu.mpc import MpcGasEngine

from test_oracle import build_parties, make_dataset, make_param


def _setup(n_parties, mpc, variant="opt"):
    src, dst, feats, labels = make_dataset(n=40, m=220, homophily=0.7)
    param = make_param(40, feats.shape[1], labels.max() + 1)
    graphs = build_parties(src, dst, feats, labels, n_parties)
    plan = build_device_plan(graphs)
    mesh = jax.make_mesh((n_parties,), ("party",))
    if mpc:
        eng = MpcGasEngine(plan, param, variant, mode="sharded", mesh=mesh)
    else:
        eng = GasEngine(plan, param, variant, mode="sharded", mesh=mesh)
    return plan, param, eng


@pytest.mark.parametrize("n_parties", [2, 4])
@pytest.mark.parametrize("variant", ["opt", "unopt"])
def test_plaintext_traced_matches_analytic(n_parties, variant):
    if len(jax.devices()) < n_parties:
        pytest.skip("needs devices")
    plan, param, eng = _setup(n_parties, mpc=False, variant=variant)
    traced = engine_epoch_bytes(eng)
    analytic = analytic_bytes_per_epoch(plan, param, variant)
    for k in ("all_to_all", "psum", "total"):
        np.testing.assert_allclose(traced[k], analytic[k], rtol=1e-9,
                                   err_msg=k)


def test_mpc_traced_matches_analytic_and_hand_computed():
    """2-party mpc: traced == analytic == hand-computed formula (VERDICT r2
    item 6 — the analytic model previously undercounted mpc 4x)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs devices")
    plan, param, eng = _setup(2, mpc=True)
    traced = engine_epoch_bytes(eng)
    analytic = analytic_bytes_per_epoch(plan, param, "opt", mpc=True,
                                        limbs=2)
    for k in ("all_to_all", "psum", "total"):
        np.testing.assert_allclose(traced[k], analytic[k], rtol=1e-9,
                                   err_msg=k)
    # hand computation: halo ships 2 shares x 2 limbs x uint32 = 16 B/elem,
    # (P-1) * M rows per peer per aggregation phase, phase widths
    # [hidden, labels, labels, hidden]; the weight share all-reduce rides
    # 2 shares x 2 limbs x 2 sixteen-bit planes of int32 = 32 B/elem at
    # ring factor 2*(P-1)/P.
    P, M = plan.num_parties, plan.M
    dims = param.layer_dims
    hidden, labels = dims[1], dims[2]
    halo = sum((P - 1) * M * d * 16 for d in (hidden, labels, labels,
                                              hidden))
    w_elems = dims[0] * dims[1] + dims[1] * dims[2]
    wavg = 2 * (P - 1) / P * w_elems * 32
    np.testing.assert_allclose(traced["all_to_all"], halo, rtol=1e-9)
    np.testing.assert_allclose(traced["psum"], wavg, rtol=1e-9)


@pytest.mark.parametrize("mpc", [False, True])
@pytest.mark.parametrize("variant", ["opt", "unopt"])
def test_traced_rounds_match_analytic(mpc, variant):
    """Collective ROUND counts (the latency axis of the duration-vs-network
    model, reference Tables 1/2): traced == analytic == hand-computed."""
    if len(jax.devices()) < 2:
        pytest.skip("needs devices")
    from cognn_tpu.engine.comm_model import (analytic_rounds_per_epoch,
                                             engine_epoch_comm)

    plan, param, eng = _setup(2, mpc=mpc, variant=variant)
    traced = engine_epoch_comm(eng)["rounds"]
    analytic = analytic_rounds_per_epoch(param, variant, mpc=mpc, limbs=2)
    for k in ("all_to_all", "psum", "total"):
        np.testing.assert_allclose(traced[k], analytic[k], err_msg=k)
    # hand computation, L=2 layers: one halo all_to_all per GAS aggregation
    # (opt epoch: 3L-2 = 4 aggregations; unopt: L fwd + L-1 bwd = 3, minus
    # the hoisted layer-0 agg(x0) in mpc engines -> 2); one weight average
    # per layer per epoch = 2, each riding 1 pmean psum in plaintext or
    # 2 shares x 2 limbs x 2 planes = 8 psums in share space.
    exp_a2a = 4 if variant == "opt" else (2 if mpc else 3)
    exp_psum = 2 * (8 if mpc else 1)
    assert traced["all_to_all"] == exp_a2a
    assert traced["psum"] == exp_psum
    if mpc and variant == "unopt":
        # reference-faithful schedule (hoist disabled): layer-0 agg back
        from cognn_tpu.mpc import MpcGasEngine

        mesh = jax.make_mesh((2,), ("party",))
        faithful = MpcGasEngine(plan, param, variant, mode="sharded",
                                mesh=mesh, hoist_agg=False)
        tf_ = engine_epoch_comm(faithful)["rounds"]
        af = analytic_rounds_per_epoch(param, variant, mpc=True, limbs=2,
                                       hoist_agg=False)
        assert tf_["all_to_all"] == af["all_to_all"] == 3


def test_duration_grid_reference_shape():
    """The predicted-duration grid covers the reference's bandwidth/latency
    matrix (`tmp_run_cluster.py:23-29`) and decomposes as
    compute + bytes/bw + rounds*latency."""
    from cognn_tpu.engine.comm_model import (REFERENCE_BANDWIDTHS_MBIT,
                                             REFERENCE_LATENCIES_MS,
                                             duration_grid)

    grid = duration_grid(compute_s=0.01, bytes_per_epoch=5e6,
                         rounds_per_epoch=20)
    assert len(grid) == 16
    assert set(bw for bw, _ in grid) == set(REFERENCE_BANDWIDTHS_MBIT)
    assert set(lat for _, lat in grid) == set(REFERENCE_LATENCIES_MS)
    np.testing.assert_allclose(
        grid[(400, 10.0)], 0.01 + 5e6 * 8 / 400e6 + 20 * 10e-3)
    # monotone: more bandwidth never hurts, more latency never helps
    assert grid[(4000, 0.15)] == min(grid.values())
    assert grid[(200, 20.0)] == max(grid.values())


def test_scan_loop_bytes_scale_with_epochs():
    """The jaxpr walk multiplies scan bodies by trip count: a 7-epoch
    scan-compiled loop accounts exactly 7x one epoch."""
    if len(jax.devices()) < 2:
        pytest.skip("needs devices")
    plan, param, eng = _setup(2, mpc=False)
    one = engine_epoch_bytes(eng)

    fn = eng._build_sharded(lambda comm, arr, w, x0, agg:
                            eng._epochs_body(comm, 7, arr, w, x0, agg))
    seven = traced_collective_bytes(
        lambda *a: fn(*a), eng.arr, eng.weights, eng.x0, eng._agg_data,
        axis_size=2)
    np.testing.assert_allclose(seven["total"], 7 * one["total"], rtol=1e-9)
