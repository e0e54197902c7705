"""Hot-op tests: dense vs sparse aggregation; exact ring matmul."""

import jax.numpy as jnp
import numpy as np
import pytest

from cognn_tpu.config import GNNParam
from cognn_tpu.engine import GasEngine, build_device_plan
from cognn_tpu.ops.intmatmul import ring_matmul, ring_matmul_np
from cognn_tpu.core.ring import ring_from_u64, ring_to_u64

from test_oracle import build_parties, make_dataset, make_param

RNG = np.random.default_rng(11)


class TestDenseAggregation:
    @pytest.mark.parametrize("n_parties", [1, 3])
    def test_dense_equals_sparse(self, n_parties):
        src, dst, feats, labels = make_dataset(n=48, m=300, homophily=0.7)
        param = make_param(48, feats.shape[1], labels.max() + 1)
        graphs = build_parties(src, dst, feats, labels, n_parties)
        e_dense = GasEngine(build_device_plan(graphs, dense=True), param,
                            aggregation="dense")
        e_sparse = GasEngine(build_device_plan(graphs, dense=False), param)
        assert "flat_adj" in e_dense._agg_data
        assert "flat_adj" not in e_sparse._agg_data
        md = GasEngine.metrics_host(e_dense.run_epochs(3))
        ms = GasEngine.metrics_host(e_sparse.run_epochs(3))
        np.testing.assert_allclose(md["loss"], ms["loss"], atol=1e-5)
        for l in range(2):
            np.testing.assert_allclose(np.asarray(e_dense.weights[l]),
                                       np.asarray(e_sparse.weights[l]),
                                       atol=1e-5)

    def test_dense_opt_in(self):
        src, dst, feats, labels = make_dataset(n=48, m=300)
        graphs = build_parties(src, dst, feats, labels, 1)
        assert build_device_plan(graphs).dense_adj is None  # dense is opt-in

    def test_dense_from_sparse_plan(self):
        """aggregation='dense' derives the flat adjacency from the index
        plan when the plan was not built with dense=True."""
        src, dst, feats, labels = make_dataset(n=48, m=300, homophily=0.7)
        param = make_param(48, feats.shape[1], labels.max() + 1)
        graphs = build_parties(src, dst, feats, labels, 2)
        from cognn_tpu.engine.gas import flat_dense_adjacency

        plan_d = build_device_plan(graphs, dense=True)
        plan_s = build_device_plan(graphs)
        np.testing.assert_array_equal(flat_dense_adjacency(plan_d),
                                      flat_dense_adjacency(plan_s))
        e1 = GasEngine(plan_d, param, aggregation="dense")
        e2 = GasEngine(plan_s, param, aggregation="dense")
        m1 = GasEngine.metrics_host(e1.run_epochs(2))
        m2 = GasEngine.metrics_host(e2.run_epochs(2))
        np.testing.assert_array_equal(m1["loss"], m2["loss"])

    def test_auto_backend_policy(self, monkeypatch):
        """auto -> sparse off-TPU; on TPU dense under budget, else bcsr."""
        import types

        from cognn_tpu.engine import gas as gas_mod
        from cognn_tpu.engine.plan import DENSE_ADJ_BUDGET

        small = types.SimpleNamespace(num_parties=2, V=128)
        big_v = int(np.sqrt(DENSE_ADJ_BUDGET)) + 1
        big = types.SimpleNamespace(num_parties=1, V=big_v)
        assert gas_mod.select_backend(small, "stacked") == "sparse"  # CPU
        assert gas_mod.select_backend(small, "sharded") == "sparse"
        monkeypatch.setattr(gas_mod.jax, "default_backend", lambda: "tpu")
        assert gas_mod.select_backend(small, "stacked") == "dense"
        assert gas_mod.select_backend(big, "stacked") == "bcsr"
        # sharded on TPU picks the per-party bcsr SpMM (MULTIHOST.md path)
        assert gas_mod.select_backend(small, "sharded") == "bcsr"
        # explicit backend override resolves without touching the platform
        assert gas_mod.select_backend(small, "sharded",
                                      backend="tpu") == "bcsr"
        assert gas_mod.select_backend(small, "stacked",
                                      backend="cpu") == "sparse"

    def test_auto_backend_width_veto(self):
        """bcsr supertiles must fit VMEM for the variant's aggregation
        width: unopt message-passes at full input width, so wide-feature
        datasets veto bcsr -> sparse (the opt schedule stays in hidden
        space and keeps bcsr)."""
        import types

        from cognn_tpu.engine import gas as gas_mod
        from cognn_tpu.engine.plan import DENSE_ADJ_BUDGET

        big_v = int(np.sqrt(DENSE_ADJ_BUDGET)) + 1
        big = types.SimpleNamespace(num_parties=1, V=big_v)
        wide = make_param(64, 3703, 6, hidden=16)  # citeseer-ish widths
        assert gas_mod.select_backend(big, "stacked", backend="tpu",
                                      param=wide, variant="opt") == "bcsr"
        assert gas_mod.select_backend(big, "stacked", backend="tpu",
                                      param=wide,
                                      variant="unopt") == "sparse"
        assert gas_mod.select_backend(big, "sharded", backend="tpu",
                                      param=wide,
                                      variant="unopt_inference") == "sparse"
        # supertile extent formula reproduces the TPU-validated configs
        assert gas_mod.bcsr_supertile_c(16) == 128
        assert gas_mod.bcsr_supertile_c(256) == 16
        assert gas_mod.bcsr_supertile_c(8000) == 0
        # byte-plane widths (2 shares x 2 limbs x 4 planes x W) hit the
        # veto much earlier in mpc: pubmed unopt (W=500) is infeasible,
        # the opt hidden width (W=16) keeps the r3-validated C=16
        assert gas_mod.bcsr_supertile_c(2 * 2 * 4 * 500) == 0
        assert gas_mod.bcsr_supertile_c(2 * 2 * 4 * 16) == 16


class TestRingMatmul:
    @pytest.mark.parametrize("bits", [32, 64])
    def test_random_exact(self, bits):
        N, K, M = 17, 33, 9
        a = RNG.integers(0, 1 << 64, (N, K), dtype=np.uint64)
        b = RNG.integers(0, 1 << 64, (K, M), dtype=np.uint64)
        mask = np.uint64((1 << bits) - 1) if bits < 64 else np.uint64(2**64 - 1)
        a &= mask
        b &= mask
        from cognn_tpu.core.ring import RingSpec

        spec = RingSpec(bits)
        got = ring_to_u64(np.asarray(ring_matmul(
            jnp.asarray(ring_from_u64(a, spec)),
            jnp.asarray(ring_from_u64(b, spec)), bits=bits)), spec)
        expect = ring_matmul_np(a, b, bits=bits)
        np.testing.assert_array_equal(got, expect)

    def test_share_space_product(self):
        """(X0+X1)(W0+W1) mod 2^64 equals plaintext fixed-point product."""
        from cognn_tpu.core import (FixedPointSpec, fp_decode, fp_encode,
                                    share_merge_np, share_split_np)

        spec = FixedPointSpec()
        X = RNG.uniform(-2, 2, (8, 5))
        W = RNG.uniform(-1, 1, (5, 3))
        x_s0, x_s1 = share_split_np(fp_encode(X, spec), RNG)
        w_s0, w_s1 = share_split_np(fp_encode(W, spec), RNG)
        x_rec = share_merge_np(x_s0, x_s1)
        w_rec = share_merge_np(w_s0, w_s1)
        got = ring_to_u64(np.asarray(ring_matmul(
            jnp.asarray(ring_from_u64(x_rec)),
            jnp.asarray(ring_from_u64(w_rec)))))
        # result has 2f fractional bits; decode accordingly
        dec = fp_decode(got, FixedPointSpec(frac_bits=32))
        np.testing.assert_allclose(dec, X @ W, atol=1e-3)

    def test_k_blocking(self):
        """K > block size path."""
        import cognn_tpu.ops.intmatmul as im

        old = im._MAX_K
        im._MAX_K = 16
        try:
            a = RNG.integers(0, 1 << 64, (4, 50), dtype=np.uint64)
            b = RNG.integers(0, 1 << 64, (50, 4), dtype=np.uint64)
            got = ring_to_u64(np.asarray(im.ring_matmul.__wrapped__(
                jnp.asarray(ring_from_u64(a)), jnp.asarray(ring_from_u64(b)),
                64)))
            np.testing.assert_array_equal(got, ring_matmul_np(a, b))
        finally:
            im._MAX_K = old


class TestBcsrAggregationBackend:
    @pytest.mark.parametrize("n_parties", [1, 3])
    def test_bcsr_engine_matches_sparse(self, n_parties):
        src, dst, feats, labels = make_dataset(n=48, m=300, homophily=0.7)
        param = make_param(48, feats.shape[1], labels.max() + 1)
        graphs = build_parties(src, dst, feats, labels, n_parties)
        e_sparse = GasEngine(build_device_plan(graphs), param)
        e_bcsr = GasEngine(build_device_plan(graphs), param,
                           aggregation="bcsr")
        zs, _, _ = e_sparse.forward()
        zb, _, _ = e_bcsr.forward()
        rel = np.abs(np.asarray(zb) - np.asarray(zs)).max() / (
            np.abs(np.asarray(zs)).max())
        assert rel < 5e-3  # bf16 operand rounding in the kernel

    def test_supertiled_engine_path_matches_sparse(self):
        """Force the supertiled kernel variant (the nnzb>=BCSR_TILED_NNZB
        auto-pick used at PubMed scale) through the engine in interpret
        mode and pin it against the sparse backend."""
        from unittest import mock

        from cognn_tpu.ops.pallas_spmm import PallasSpmmTiled

        src, dst, feats, labels = make_dataset(n=48, m=300, homophily=0.7)
        param = make_param(48, feats.shape[1], labels.max() + 1)
        graphs = build_parties(src, dst, feats, labels, 2)
        e_sparse = GasEngine(build_device_plan(graphs), param)
        with mock.patch("cognn_tpu.engine.gas.BCSR_TILED_NNZB", 1):
            e_tiled = GasEngine(build_device_plan(graphs), param,
                                aggregation="bcsr")
        assert isinstance(e_tiled._agg_data["bcsr_kernel"], PallasSpmmTiled)
        zs, _, _ = e_sparse.forward()
        zt, _, _ = e_tiled.forward()
        rel = np.abs(np.asarray(zt) - np.asarray(zs)).max() / (
            np.abs(np.asarray(zs)).max())
        assert rel < 5e-3  # bf16 operand rounding in the kernel


class TestReorder:
    @pytest.mark.parametrize("n_parties", [1, 2])
    def test_reorder_preserves_semantics(self, n_parties):
        """BFS-reordered plan trains identically (weights + metrics)."""
        src, dst, feats, labels = make_dataset(n=48, m=300, homophily=0.7)
        param = make_param(48, feats.shape[1], labels.max() + 1)
        graphs = build_parties(src, dst, feats, labels, n_parties)
        base = GasEngine(build_device_plan(graphs), param)
        reord = GasEngine(build_device_plan(graphs, reorder=True), param)
        mb = GasEngine.metrics_host(base.run_epochs(3))
        mr = GasEngine.metrics_host(reord.run_epochs(3))
        np.testing.assert_allclose(mr["loss"], mb["loss"], atol=1e-5)
        np.testing.assert_allclose(mr["train_acc"], mb["train_acc"])
        np.testing.assert_allclose(mr["border_test_acc"],
                                   mb["border_test_acc"])
        for l in range(2):
            np.testing.assert_allclose(np.asarray(reord.weights[l]),
                                       np.asarray(base.weights[l]),
                                       atol=1e-5)

    def test_reorder_bcsr_backend(self):
        src, dst, feats, labels = make_dataset(n=48, m=300, homophily=0.7)
        param = make_param(48, feats.shape[1], labels.max() + 1)
        graphs = build_parties(src, dst, feats, labels, 2)
        base = GasEngine(build_device_plan(graphs), param)
        reord = GasEngine(build_device_plan(graphs, reorder=True), param,
                          aggregation="bcsr")
        zb, _, _ = base.forward()
        mb = GasEngine.metrics_host(base._forward(base.arr, base.weights,
                                                  base.x0)[2])
        mr = GasEngine.metrics_host(reord.forward()[2])
        np.testing.assert_allclose(mr["loss"], mb["loss"], atol=1e-3)
        np.testing.assert_allclose(mr["full_acc"], mb["full_acc"])


class TestSmallMatmul:
    def test_small_operand_exact(self):
        from cognn_tpu.ops.intmatmul import ring_matmul_small

        a = RNG.integers(-2**31, 2**31, (13, 37)).astype(np.int64
                                                         ).astype(np.uint64)
        b = RNG.integers(-2**31, 2**31, (37, 9)).astype(np.int64
                                                        ).astype(np.uint64)
        got = ring_to_u64(np.asarray(ring_matmul_small(
            jnp.asarray(ring_from_u64(a)), jnp.asarray(ring_from_u64(b)))))
        np.testing.assert_array_equal(got, ring_matmul_np(a, b))

    def test_k_blocked(self):
        import cognn_tpu.ops.intmatmul as im

        old = im._MAX_K
        im._MAX_K = 16
        try:
            a = RNG.integers(-2**30, 2**30, (4, 50)).astype(np.int64
                                                            ).astype(np.uint64)
            b = RNG.integers(-2**30, 2**30, (50, 4)).astype(np.int64
                                                            ).astype(np.uint64)
            got = ring_to_u64(np.asarray(im.ring_matmul_small.__wrapped__(
                jnp.asarray(ring_from_u64(a)),
                jnp.asarray(ring_from_u64(b)))))
            np.testing.assert_array_equal(got, ring_matmul_np(a, b))
        finally:
            im._MAX_K = old
