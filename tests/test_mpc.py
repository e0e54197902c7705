"""Secret-shared engine vs plaintext: the CoGNN parity contract.

The reference's correctness claim is that secret-shared CoGNN-Opt training
matches plaintext GCN (SURVEY.md §4.2). Here: MpcGasEngine (uint64 additive
shares, fixed-point int kernels) must track the float64 oracle within
fixed-point tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cognn_tpu.engine import GasEngine, build_device_plan
from cognn_tpu.models.oracle import GasOracle
from cognn_tpu.mpc import MpcGasEngine, Protocol
from cognn_tpu.core.fixedpoint import FixedPointSpec

from test_oracle import build_parties, make_dataset, make_param

RNG = np.random.default_rng(21)


class TestProtocol:
    def test_share_reveal_roundtrip(self):
        proto = Protocol()
        x = jnp.asarray(RNG.uniform(-50, 50, (7, 5)), jnp.float32)
        sh = proto.share(jax.random.key(0), x)
        np.testing.assert_allclose(np.asarray(proto.reveal(sh)), np.asarray(x),
                                   atol=2e-4)
        # individual shares look uniform (no plaintext leakage in high limb)
        assert len(np.unique(np.asarray(sh[0, 1]))) > 30

    def test_linear_ops(self):
        proto = Protocol()
        k = jax.random.key(1)
        x = jnp.asarray(RNG.uniform(-5, 5, (8, 4)), jnp.float32)
        y = jnp.asarray(RNG.uniform(-5, 5, (8, 4)), jnp.float32)
        sx = proto.share(jax.random.fold_in(k, 0), x)
        sy = proto.share(jax.random.fold_in(k, 1), y)
        np.testing.assert_allclose(np.asarray(proto.reveal(proto.add(sx, sy))),
                                   np.asarray(x + y), atol=5e-4)
        np.testing.assert_allclose(np.asarray(proto.reveal(proto.sub(sx, sy))),
                                   np.asarray(x - y), atol=5e-4)
        mask = jnp.asarray(RNG.integers(0, 2, (8, 4)), bool)
        np.testing.assert_allclose(
            np.asarray(proto.reveal(proto.mask_mul(sx, mask))),
            np.asarray(jnp.where(mask, x, 0)), atol=5e-4)

    def test_matmul(self):
        proto = Protocol()
        k = jax.random.key(2)
        a = jnp.asarray(RNG.uniform(-2, 2, (6, 9)), jnp.float32)
        b = jnp.asarray(RNG.uniform(-2, 2, (9, 4)), jnp.float32)
        sa = proto.share(jax.random.fold_in(k, 0), a)
        sb = proto.share(jax.random.fold_in(k, 1), b)
        out = proto.reveal(proto.matmul(jax.random.fold_in(k, 2), sa, sb))
        np.testing.assert_allclose(np.asarray(out), np.asarray(a @ b),
                                   atol=1e-2)

    def test_relu(self):
        proto = Protocol()
        x = jnp.asarray(RNG.uniform(-3, 3, (32,)), jnp.float32)
        sh = proto.share(jax.random.key(3), x)
        got = proto.reveal(proto.relu(sh))
        np.testing.assert_allclose(np.asarray(got),
                                   np.maximum(np.asarray(x), 0), atol=2e-4)

    @pytest.mark.parametrize("mode", ["exact", "probabilistic"])
    def test_truncation_modes(self, mode):
        proto = Protocol(truncation=mode)
        x = jnp.asarray(RNG.uniform(-4, 4, (64,)), jnp.float32)
        sh = proto.share(jax.random.key(4), x)
        got = proto.reveal(proto.scale_const(jax.random.key(5), sh, 0.5))
        atol = 2e-4 if mode == "exact" else 2e-3
        np.testing.assert_allclose(np.asarray(got), 0.5 * np.asarray(x),
                                   atol=atol)


class TestMpcEngine:
    @pytest.mark.parametrize("n_parties", [1, 2])
    def test_forward_matches_plaintext(self, n_parties):
        src, dst, feats, labels = make_dataset(n=32, m=160, homophily=0.7)
        param = make_param(32, feats.shape[1], labels.max() + 1)
        graphs = build_parties(src, dst, feats, labels, n_parties)
        plain = GasEngine(build_device_plan(graphs), param)
        mpc = MpcGasEngine(build_device_plan(graphs), param)
        zp, _, _ = plain.forward()
        zm, _, _ = mpc.forward()
        np.testing.assert_allclose(np.asarray(zm), np.asarray(zp), atol=2e-2)

    def test_epoch_tracks_oracle(self):
        src, dst, feats, labels = make_dataset(n=32, m=160, homophily=0.7)
        param = make_param(32, feats.shape[1], labels.max() + 1)
        graphs = build_parties(src, dst, feats, labels, 2)
        oracle = GasOracle(build_parties(src, dst, feats, labels, 2), param)
        mpc = MpcGasEngine(build_device_plan(graphs), param)
        m = mpc.run_epochs(2)
        oracle.run_epochs(2)
        for l in range(2):
            w = mpc.reveal_weights()[l]
            for p in range(2):
                np.testing.assert_allclose(
                    w[p], oracle.parties[p].weights[l], atol=5e-3,
                    err_msg=f"party {p} layer {l}")
        om = oracle.metrics[-1]
        np.testing.assert_allclose(float(np.asarray(m["loss"])[0]), om.loss,
                                   atol=5e-2)
        assert int(np.asarray(m["num_border"])[0]) == om.num_border

    def test_training_learns(self):
        src, dst, feats, labels = make_dataset(n=32, m=200, homophily=0.9,
                                               with_isolated=False)
        param = make_param(32, feats.shape[1], labels.max() + 1, lr=1.0)
        graphs = build_parties(src, dst, feats, labels, 2)
        mpc = MpcGasEngine(build_device_plan(graphs), param)
        first = MpcGasEngine.metrics_host(mpc.run_epoch())
        last = MpcGasEngine.metrics_host(mpc.run_epochs(15))
        assert last["loss"][0] < first["loss"][0]
        assert last["train_acc"].mean() > 0.7


def test_dense_mpc_aggregation_matches_sparse():
    """The dense byte-plane MXU share aggregation is an exact ring sum of
    the same values as the sparse OGA path -> bit-identical training."""
    src, dst, feats, labels = make_dataset(n=32, m=160, homophily=0.7)
    param = make_param(32, feats.shape[1], labels.max() + 1)
    graphs = build_parties(src, dst, feats, labels, 2)
    sparse = MpcGasEngine(build_device_plan(graphs), param)
    dense = MpcGasEngine(build_device_plan(graphs, dense=True), param,
                         aggregation="dense")
    ms = sparse.metrics_host(sparse.run_epochs(2))
    md = dense.metrics_host(dense.run_epochs(2))
    np.testing.assert_array_equal(md["loss"], ms["loss"])
    for l in range(2):
        np.testing.assert_array_equal(dense.reveal_weights()[l],
                                      sparse.reveal_weights()[l])


@pytest.mark.parametrize("n_parties", [1, 3])
def test_bcsr_mpc_aggregation_matches_sparse(n_parties):
    """The block-sparse byte-plane MXU share aggregation (the mpc
    PubMed-scale path) is an exact ring sum of the same values as the
    sparse OGA -> bit-identical training."""
    src, dst, feats, labels = make_dataset(n=40, m=200, homophily=0.7)
    param = make_param(40, feats.shape[1], labels.max() + 1)
    graphs = build_parties(src, dst, feats, labels, n_parties)
    sparse = MpcGasEngine(build_device_plan(graphs), param)
    bcsr = MpcGasEngine(build_device_plan(graphs), param,
                        aggregation="bcsr")
    ms = sparse.metrics_host(sparse.run_epochs(2))
    mb = bcsr.metrics_host(bcsr.run_epochs(2))
    np.testing.assert_array_equal(mb["loss"], ms["loss"])
    for l in range(2):
        np.testing.assert_array_equal(bcsr.reveal_weights()[l],
                                      sparse.reveal_weights()[l])


def test_supertiled_bcsr_mpc_matches_sparse():
    """The byte-plane share aggregation stays EXACT (bit-identical) on the
    supertiled kernel variant the auto-pick uses at PubMed scale."""
    from unittest import mock

    from cognn_tpu.ops.pallas_spmm import PallasSpmmTiled

    src, dst, feats, labels = make_dataset(n=40, m=200, homophily=0.7)
    param = make_param(40, feats.shape[1], labels.max() + 1)
    graphs = build_parties(src, dst, feats, labels, 2)
    sparse = MpcGasEngine(build_device_plan(graphs), param)
    with mock.patch("cognn_tpu.engine.gas.BCSR_TILED_NNZB", 1):
        tiled = MpcGasEngine(build_device_plan(graphs), param,
                             aggregation="bcsr")
    assert isinstance(tiled.arr.agg["bcsr_kernel"], PallasSpmmTiled)
    ms = sparse.metrics_host(sparse.run_epochs(2))
    mt = tiled.metrics_host(tiled.run_epochs(2))
    np.testing.assert_array_equal(mt["loss"], ms["loss"])
    for l in range(2):
        np.testing.assert_array_equal(tiled.reveal_weights()[l],
                                      sparse.reveal_weights()[l])


def test_dense_mpc_total_indeg_guard():
    """A destination whose TOTAL in-edge count (all source parties
    combined) reaches 2^24/255 must be rejected at dense init: the
    byte-plane f32 accumulation would silently lose mantissa bits. The
    per-party 2^15 cap does not catch this (ADVICE r2)."""
    n_src = 258  # 258 * 256 = 66048 > 2^24 / 255 = 65793
    src = np.repeat(np.arange(1, n_src + 1), 256)
    dst = np.zeros_like(src)
    n = n_src + 1
    rng = np.random.default_rng(3)
    feats = rng.random((n, 4))
    labels = rng.integers(0, 3, n)
    param = make_param(n, 4, 3)
    graphs = build_parties(src, dst, feats, labels, 1)
    with pytest.raises(ValueError, match="2\\^24"):
        MpcGasEngine(build_device_plan(graphs), param, aggregation="dense")


@pytest.mark.parametrize("tiled", [False, True])
def test_sharded_bcsr_mpc_matches_stacked_sparse(tiled):
    """Sharded (multi-chip) byte-plane block-sparse share aggregation —
    per-party SpMM partial sums -> ring recombine -> halo -> ring-add —
    is an exact ring sum: bit-identical to stacked sparse training. Both
    kernel variants (one-block and supertiled) covered."""
    from unittest import mock

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    src, dst, feats, labels = make_dataset(n=40, m=200, homophily=0.7)
    param = make_param(40, feats.shape[1], labels.max() + 1)
    graphs = build_parties(src, dst, feats, labels, 2)
    stacked = MpcGasEngine(build_device_plan(graphs), param)
    mesh = jax.make_mesh((2,), ("party",))
    threshold = 1 if tiled else 10**9
    with mock.patch("cognn_tpu.engine.gas.BCSR_TILED_NNZB", threshold):
        sharded = MpcGasEngine(build_device_plan(graphs), param,
                               mode="sharded", mesh=mesh,
                               aggregation="bcsr")
    assert (sharded._bcsr_sharded_meta[0] == "tiled") == tiled
    ms = stacked.metrics_host(stacked.run_epochs(2))
    mh = sharded.metrics_host(sharded.run_epochs(2))
    np.testing.assert_array_equal(mh["loss"], ms["loss"])
    for l in range(2):
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(sharded.reveal_weights()[l])),
            stacked.reveal_weights()[l])


def test_mpc_auto_backend_selection():
    """aggregation='auto' resolves to the measured-best backend under the
    byte-plane exactness guards: sparse off-TPU / sharded, dense under
    budget on TPU, bcsr above it."""
    from unittest import mock

    from cognn_tpu.mpc.engine import _select_mpc_backend

    src, dst, feats, labels = make_dataset(n=32, m=160, homophily=0.7)
    param = make_param(32, feats.shape[1], labels.max() + 1)
    graphs = build_parties(src, dst, feats, labels, 2)
    plan = build_device_plan(graphs)
    assert _select_mpc_backend(plan, "stacked") == "sparse"  # CPU backend
    assert _select_mpc_backend(plan, "sharded") == "sparse"
    with mock.patch.object(jax, "default_backend", lambda: "tpu"):
        assert _select_mpc_backend(plan, "stacked") == "dense"
        # sharded on TPU: per-party bcsr under the byte-plane guards
        assert _select_mpc_backend(plan, "sharded") == "bcsr"
        with mock.patch("cognn_tpu.engine.plan.DENSE_ADJ_BUDGET", 1):
            assert _select_mpc_backend(plan, "stacked") == "bcsr"
    assert _select_mpc_backend(plan, "sharded", backend="tpu") == "bcsr"
    # engine accepts "auto" and resolves it (and it is now the DEFAULT,
    # aligned with GasEngine — VERDICT r3 weak #2)
    e = MpcGasEngine(plan, param)
    assert e.aggregation == "sparse"


def test_sharded_mpc_matches_stacked():
    """Multi-device secret-shared training == stacked (bit-identical)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    src, dst, feats, labels = make_dataset(n=32, m=160, homophily=0.7)
    param = make_param(32, feats.shape[1], labels.max() + 1)
    graphs = build_parties(src, dst, feats, labels, 4)
    stacked = MpcGasEngine(build_device_plan(graphs), param)
    mesh = jax.make_mesh((4,), ("party",))
    sharded = MpcGasEngine(build_device_plan(graphs), param,
                           mode="sharded", mesh=mesh)
    ms = stacked.metrics_host(stacked.run_epochs(2))
    mh = sharded.metrics_host(sharded.run_epochs(2))
    np.testing.assert_array_equal(mh["loss"], ms["loss"])
    for l in range(2):
        np.testing.assert_array_equal(sharded.reveal_weights()[l],
                                      stacked.reveal_weights()[l])


def test_unopt_mpc_tracks_oracle():
    src, dst, feats, labels = make_dataset(n=32, m=160, homophily=0.7)
    param = make_param(32, feats.shape[1], labels.max() + 1)
    graphs = build_parties(src, dst, feats, labels, 2)
    oracle = GasOracle(build_parties(src, dst, feats, labels, 2), param,
                       "unopt")
    mpc = MpcGasEngine(build_device_plan(graphs), param, "unopt")
    m = mpc.run_epochs(2)
    oracle.run_epochs(2)
    for l in range(2):
        w = mpc.reveal_weights()[l]
        for p in range(2):
            np.testing.assert_allclose(w[p], oracle.parties[p].weights[l],
                                       atol=5e-3)
    om = oracle.metrics[-1]
    np.testing.assert_allclose(float(np.asarray(m["loss"])[0]), om.loss,
                               atol=5e-2)


def test_three_layer_mpc_tracks_oracle():
    src, dst, feats, labels = make_dataset(n=32, m=160, homophily=0.7)
    param = make_param(32, feats.shape[1], labels.max() + 1, layers=3)
    graphs = build_parties(src, dst, feats, labels, 2)
    oracle = GasOracle(build_parties(src, dst, feats, labels, 2), param)
    mpc = MpcGasEngine(build_device_plan(graphs), param)
    mpc.run_epochs(1)
    oracle.run_epochs(1)
    for l in range(3):
        w = mpc.reveal_weights()[l]
        for p in range(2):
            np.testing.assert_allclose(w[p], oracle.parties[p].weights[l],
                                       atol=5e-3)


def test_phase_compile_mode_matches_epoch():
    """compile_mode='phase' (many small jits) == whole-epoch jit: with exact
    truncation the value path is deterministic regardless of share
    randomness, so revealed weights match exactly."""
    src, dst, feats, labels = make_dataset(n=32, m=160, homophily=0.7)
    param = make_param(32, feats.shape[1], labels.max() + 1)
    graphs = build_parties(src, dst, feats, labels, 2)
    a = MpcGasEngine(build_device_plan(graphs), param, compile_mode="epoch")
    b = MpcGasEngine(build_device_plan(graphs), param, compile_mode="phase")
    ma = a.metrics_host(a.run_epochs(2))
    mb = b.metrics_host(b.run_epochs(2))
    np.testing.assert_allclose(mb["loss"], ma["loss"], atol=1e-6)
    for l in range(2):
        np.testing.assert_allclose(b.reveal_weights()[l],
                                   a.reveal_weights()[l], atol=1e-6)


@pytest.mark.parametrize("variant", ["opt", "unopt"])
def test_scan_epochs_match_phased(variant):
    """run_epochs_scan (whole training loop as one lax.scan program) ==
    the phase-dispatched loop, exactly in value space (exact truncation)."""
    src, dst, feats, labels = make_dataset(n=32, m=160, homophily=0.7)
    param = make_param(32, feats.shape[1], labels.max() + 1)
    graphs = build_parties(src, dst, feats, labels, 2)
    a = MpcGasEngine(build_device_plan(graphs), param, variant,
                     compile_mode="phase")
    b = MpcGasEngine(build_device_plan(graphs), param, variant,
                     compile_mode="phase")
    ma = a.metrics_host(a.run_epochs(3))
    mb = b.metrics_host(b.run_epochs_scan(3))
    np.testing.assert_allclose(np.asarray(mb["loss"])[:, -1], ma["loss"],
                               atol=1e-6)
    for l in range(2):
        np.testing.assert_allclose(b.reveal_weights()[l],
                                   a.reveal_weights()[l], atol=1e-6)


def test_scan_epochs_sharded_matches_stacked():
    """Sharded scan-compiled secret-shared training == stacked scan."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    src, dst, feats, labels = make_dataset(n=32, m=160, homophily=0.7)
    param = make_param(32, feats.shape[1], labels.max() + 1)
    graphs = build_parties(src, dst, feats, labels, 2)
    stacked = MpcGasEngine(build_device_plan(graphs), param)
    mesh = jax.make_mesh((2,), ("party",))
    sharded = MpcGasEngine(build_device_plan(graphs), param,
                           mode="sharded", mesh=mesh)
    ms = stacked.metrics_host(stacked.run_epochs_scan(2))
    mh = sharded.metrics_host(sharded.run_epochs_scan(2))
    np.testing.assert_allclose(np.asarray(mh["loss"]),
                               np.asarray(ms["loss"]), atol=1e-6)
    for l in range(2):
        np.testing.assert_allclose(sharded.reveal_weights()[l],
                                   stacked.reveal_weights()[l], atol=1e-6)


def test_phase_compile_mode_matches_epoch_unopt():
    """Same parity pin for the unopt (CoGNN / ss-gcn) 2L-phase schedule."""
    src, dst, feats, labels = make_dataset(n=32, m=160, homophily=0.7)
    param = make_param(32, feats.shape[1], labels.max() + 1)
    graphs = build_parties(src, dst, feats, labels, 2)
    a = MpcGasEngine(build_device_plan(graphs), param, "unopt",
                     compile_mode="epoch")
    b = MpcGasEngine(build_device_plan(graphs), param, "unopt",
                     compile_mode="phase")
    ma = a.metrics_host(a.run_epochs(2))
    mb = b.metrics_host(b.run_epochs(2))
    np.testing.assert_allclose(mb["loss"], ma["loss"], atol=1e-6)
    for l in range(2):
        np.testing.assert_allclose(b.reveal_weights()[l],
                                   a.reveal_weights()[l], atol=1e-6)


def test_prng_impl_value_independent():
    """Exact truncation makes revealed values key-INDEPENDENT: an engine
    using the rbg (hardware counter) share-mask PRNG — the TPU training
    default, r4 — produces bit-identical metrics and revealed weights to
    the threefry default."""
    src, dst, feats, labels = make_dataset(n=32, m=160, homophily=0.7)
    param = make_param(32, feats.shape[1], labels.max() + 1)
    graphs = build_parties(src, dst, feats, labels, 2)
    e_tf = MpcGasEngine(build_device_plan(graphs), param, prng_impl=None)
    e_rbg = MpcGasEngine(build_device_plan(graphs), param, prng_impl="rbg")
    m_tf = e_tf.metrics_host(e_tf.run_epochs(2))
    m_rbg = e_rbg.metrics_host(e_rbg.run_epochs(2))
    np.testing.assert_array_equal(m_tf["loss"], m_rbg["loss"])
    for l in range(2):
        np.testing.assert_array_equal(e_tf.reveal_weights()[l],
                                      e_rbg.reveal_weights()[l])


def test_matmul_prepped_bit_identical():
    """matmul with the A side precomputed (the hoisted loop-invariant x0
    prep, r5) is bit-identical to the direct path for the same key — both
    for the 24-dot small kernel and the general 36-dot kernel."""
    k = jax.random.key(7)
    a = jnp.asarray(RNG.uniform(-2, 2, (6, 70)), jnp.float32)
    b = jnp.asarray(RNG.uniform(-2, 2, (70, 4)), jnp.float32)
    for path in ("small", "full"):
        proto = Protocol(matmul_path=path)
        sa = proto.share(jax.random.fold_in(k, 0), a)
        sb = proto.share(jax.random.fold_in(k, 1), b)
        direct = proto.matmul(jax.random.fold_in(k, 2), sa, sb)
        prepped = proto.matmul_prepped(jax.random.fold_in(k, 2),
                                       proto.prep_matmul_a(sa), sb)
        np.testing.assert_array_equal(np.asarray(prepped),
                                      np.asarray(direct), err_msg=path)


def test_x0_prep_wired_into_engines():
    """Every engine variant carries the hoisted loop-invariant layer-0
    prep as plan-array arguments: opt preps static x0 itself (fwd matmul +
    bwd weight gradient); unopt additionally hoists the full-width
    aggregation agg(x0) — its layer-0 matmul operand — as ah0."""
    src, dst, feats, labels = make_dataset(n=32, m=160, homophily=0.7)
    param = make_param(32, feats.shape[1], labels.max() + 1)
    graphs = build_parties(src, dst, feats, labels, 2)
    opt = MpcGasEngine(build_device_plan(graphs), param)
    assert set(opt.arr.x0p) == {"fwd", "bwd"}
    inf = MpcGasEngine(build_device_plan(graphs), param, "opt_inference")
    assert set(inf.arr.x0p) == {"fwd"}
    unopt = MpcGasEngine(build_device_plan(graphs), param, "unopt")
    assert set(unopt.arr.x0p) == {"ah0", "fwd", "bwd"}
    uinf = MpcGasEngine(build_device_plan(graphs), param,
                        "unopt_inference")
    assert set(uinf.arr.x0p) == {"ah0", "fwd"}


def test_d_tiled_bcsr_mpc_matches_sparse():
    """Wide-width byte-plane bcsr aggregation past the supertile VMEM
    budget (r5) is bit-identical to the sparse OGA — the unopt
    full-input-width schedule exercises the call-level feature chunking
    on BOTH kernel variants (supertiled and one-block; a kernel-internal
    row-tile grid is unsound on TPU — ops/pallas_spmm.py)."""
    from unittest import mock

    from cognn_tpu.ops.pallas_spmm import PallasSpmm, PallasSpmmTiled

    src, dst, feats, labels = make_dataset(n=40, m=200, d=10,
                                           homophily=0.7)
    param = make_param(40, feats.shape[1], labels.max() + 1)
    graphs = build_parties(src, dst, feats, labels, 2)
    sparse = MpcGasEngine(build_device_plan(graphs), param, "unopt")
    ms = sparse.metrics_host(sparse.run_epochs(2))
    with mock.patch("cognn_tpu.engine.gas.VMEM_TILE_BUDGET", 128 << 10), \
            mock.patch("cognn_tpu.engine.gas.BCSR_TILED_NNZB", 1):
        tiled = MpcGasEngine(build_device_plan(graphs), param, "unopt",
                             aggregation="bcsr")
    kern = tiled.arr.agg["bcsr_kernel"]
    assert isinstance(kern, PallasSpmmTiled)
    assert tiled._agg_d_tile == 2  # call-level chunks (C >= 8 floor)
    mt = tiled.metrics_host(tiled.run_epochs(2))
    np.testing.assert_array_equal(mt["loss"], ms["loss"])
    for l in range(2):
        np.testing.assert_array_equal(tiled.reveal_weights()[l],
                                      sparse.reveal_weights()[l])
    # one-block kernel (small nnzb): call-level feature chunking
    with mock.patch("cognn_tpu.engine.gas.VMEM_TILE_BUDGET", 128 << 10):
        chunked = MpcGasEngine(build_device_plan(graphs), param, "unopt",
                               aggregation="bcsr")
    assert isinstance(chunked.arr.agg["bcsr_kernel"], PallasSpmm)
    assert chunked._agg_d_tile == 2
    mc = chunked.metrics_host(chunked.run_epochs(2))
    np.testing.assert_array_equal(mc["loss"], ms["loss"])


def test_d_tiled_sharded_bcsr_matches_stacked():
    """The sharded twin of the D-tiled byte-plane path (per-party partial
    sums -> ring -> halo -> ring-add) stays bit-identical under chunking."""
    from unittest import mock

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    src, dst, feats, labels = make_dataset(n=40, m=200, d=10,
                                           homophily=0.7)
    param = make_param(40, feats.shape[1], labels.max() + 1)
    graphs = build_parties(src, dst, feats, labels, 2)
    stacked = MpcGasEngine(build_device_plan(graphs), param, "unopt")
    mesh = jax.make_mesh((2,), ("party",))
    with mock.patch("cognn_tpu.engine.gas.VMEM_TILE_BUDGET", 128 << 10), \
            mock.patch("cognn_tpu.engine.gas.BCSR_TILED_NNZB", 1):
        sharded = MpcGasEngine(build_device_plan(graphs), param, "unopt",
                               mode="sharded", mesh=mesh,
                               aggregation="bcsr")
    assert sharded._agg_d_tile == 2
    assert sharded._bcsr_sharded_meta[0] == "tiled"  # chunked tiled path
    ms = stacked.metrics_host(stacked.run_epochs(2))
    mh = sharded.metrics_host(sharded.run_epochs(2))
    np.testing.assert_array_equal(mh["loss"], ms["loss"])
    for l in range(2):
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(sharded.reveal_weights()[l])),
            stacked.reveal_weights()[l])


@pytest.mark.parametrize("n_parties", [3, 5])
def test_sharded_mpc_odd_party_counts(n_parties):
    """Sharded == stacked parity at non-power-of-two party counts (the
    reference evaluates 2-5 parties, `tmp_run_cluster.py:268`)."""
    if len(jax.devices()) < n_parties:
        pytest.skip(f"needs >= {n_parties} devices")
    src, dst, feats, labels = make_dataset(n=40, m=200, homophily=0.7)
    param = make_param(40, feats.shape[1], labels.max() + 1)
    graphs = build_parties(src, dst, feats, labels, n_parties)
    stacked = MpcGasEngine(build_device_plan(graphs), param)
    mesh = jax.make_mesh((n_parties,), ("party",))
    sharded = MpcGasEngine(build_device_plan(graphs), param,
                           mode="sharded", mesh=mesh)
    ms = stacked.metrics_host(stacked.run_epochs(2))
    mh = sharded.metrics_host(sharded.run_epochs(2))
    np.testing.assert_array_equal(mh["loss"], ms["loss"])
    for l in range(2):
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(sharded.reveal_weights()[l])),
            stacked.reveal_weights()[l])


def test_bitdecomp_sign_mask_matches_reconstruct():
    """nonlinear='bitdecomp' extracts the sign via the limb carry circuit
    on the two shares WITHOUT materializing x = a + b; the mask must be
    bit-identical to the reconstruct path — including exact zeros and the
    most-negative encodings — for both ring widths."""
    from cognn_tpu.core.fixedpoint import FixedPointSpec
    from cognn_tpu.core.ring import RING32, RING64

    for spec in (FixedPointSpec(), FixedPointSpec(ring=RING32, frac_bits=8)):
        rec = Protocol(spec)
        bd = Protocol(spec, nonlinear="bitdecomp")
        x = jnp.asarray(
            np.concatenate([RNG.uniform(-50, 50, 200),
                            np.zeros(8), [-2e-5, 2e-5, -1e9, 1e9]]),
            jnp.float32)
        for seed in range(3):
            sh = rec.share(jax.random.key(seed), x)
            np.testing.assert_array_equal(
                np.asarray(bd.sign_mask(sh)),
                np.asarray(rec.sign_mask(sh)),
                err_msg=f"bits={spec.ring.bits} seed={seed}")
            # MIN family rides the same comparison
            sh2 = rec.share(jax.random.key(100 + seed), -x)
            np.testing.assert_array_equal(
                np.asarray(bd.minimum(sh, sh2)[0]),
                np.asarray(rec.minimum(sh, sh2)[0]))


def test_bitdecomp_engine_training_matches_reconstruct():
    """An engine running every sign/comparison in bitdecomp mode trains
    bit-identically to the reconstruct default (same keys -> same shares)."""
    src, dst, feats, labels = make_dataset(n=32, m=160, homophily=0.7)
    param = make_param(32, feats.shape[1], labels.max() + 1)
    graphs = build_parties(src, dst, feats, labels, 2)
    a = MpcGasEngine(build_device_plan(graphs), param)
    b = MpcGasEngine(build_device_plan(graphs), param,
                     nonlinear="bitdecomp")
    ma = a.metrics_host(a.run_epochs(2))
    mb = b.metrics_host(b.run_epochs(2))
    np.testing.assert_array_equal(mb["loss"], ma["loss"])
    for l in range(2):
        np.testing.assert_array_equal(b.reveal_weights()[l],
                                      a.reveal_weights()[l])


def test_sharded_dense_mpc_matches_stacked_sparse():
    """Sharded dense byte-plane share aggregation (r5 — was an explicit
    stacked-only raise): per-party [V x P*V] MXU matmul -> ring -> halo ->
    ring-add, bit-identical to stacked sparse training."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    src, dst, feats, labels = make_dataset(n=40, m=200, homophily=0.7)
    param = make_param(40, feats.shape[1], labels.max() + 1)
    graphs = build_parties(src, dst, feats, labels, 2)
    stacked = MpcGasEngine(build_device_plan(graphs), param)
    mesh = jax.make_mesh((2,), ("party",))
    sharded = MpcGasEngine(build_device_plan(graphs), param,
                           mode="sharded", mesh=mesh, aggregation="dense")
    assert "dense_rows_i8" in sharded.arr.agg  # r5 int8 MXU default
    ms = stacked.metrics_host(stacked.run_epochs(2))
    mh = sharded.metrics_host(sharded.run_epochs(2))
    np.testing.assert_array_equal(mh["loss"], ms["loss"])
    for l in range(2):
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(sharded.reveal_weights()[l])),
            stacked.reveal_weights()[l])


def test_high_multiplicity_dense_falls_back_to_bf16():
    """Edge multiplicity > 127 exceeds s8 counts: the dense share
    aggregation falls back to the bf16 byte-plane path (guarded by the
    f32-mantissa bound) and stays bit-identical to sparse."""
    src, dst, feats, labels = make_dataset(n=32, m=160, homophily=0.7)
    # duplicate one edge 200x (multiplicity 201 > 127, still <= 256)
    src = np.concatenate([src, np.full(200, src[0])])
    dst = np.concatenate([dst, np.full(200, dst[0])])
    param = make_param(32, feats.shape[1], labels.max() + 1)
    graphs = build_parties(src, dst, feats, labels, 2)
    sparse = MpcGasEngine(build_device_plan(graphs), param)
    dense = MpcGasEngine(build_device_plan(graphs, dense=True), param,
                         aggregation="dense")
    assert "flat_adj_bf16" in dense.arr.agg
    ms = sparse.metrics_host(sparse.run_epochs(2))
    md = dense.metrics_host(dense.run_epochs(2))
    np.testing.assert_array_equal(md["loss"], ms["loss"])


def test_bcsr_i8_vals_match_sparse():
    """int8-vals bcsr share aggregation (s8 planes with -128 offset +
    static colsum correction) is bit-identical to sparse — both kernel
    variants (interpret mode; TPU enable gated on _BCSR_I8)."""
    from unittest import mock

    src, dst, feats, labels = make_dataset(n=40, m=200, homophily=0.7)
    param = make_param(40, feats.shape[1], labels.max() + 1)
    graphs = build_parties(src, dst, feats, labels, 2)
    sparse = MpcGasEngine(build_device_plan(graphs), param)
    ms = sparse.metrics_host(sparse.run_epochs(2))
    import cognn_tpu.mpc.engine as eng_mod

    for tiled_thresh in (10**9, 1):
        with mock.patch.object(eng_mod, "_BCSR_I8", True), \
                mock.patch("cognn_tpu.engine.gas.BCSR_TILED_NNZB",
                           tiled_thresh):
            e = MpcGasEngine(build_device_plan(graphs), param,
                             aggregation="bcsr")
        assert "bcsr_colsum_i32" in e.arr.agg
        assert e.arr.agg["bcsr_kernel"].vals.dtype == jnp.int8
        me = e.metrics_host(e.run_epochs(2))
        np.testing.assert_array_equal(me["loss"], ms["loss"])
        for l in range(2):
            np.testing.assert_array_equal(e.reveal_weights()[l],
                                          sparse.reveal_weights()[l])
