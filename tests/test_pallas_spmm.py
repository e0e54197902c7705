"""BCSR structure + Pallas SpMM kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cognn_tpu.ops.bcsr import (
    BLOCK,
    bcsr_spmm_reference,
    build_bcsr,
    reorder_for_locality,
)
from cognn_tpu.ops.pallas_spmm import PallasSpmm

RNG = np.random.default_rng(17)


def random_edges(V, E, band=None):
    src = RNG.integers(0, V, E)
    if band:
        dst = (src + RNG.integers(-band, band, E)) % V
    else:
        dst = RNG.integers(0, V, E)
    return src, dst


class TestBcsr:
    def test_structure(self):
        src, dst = random_edges(300, 1000)
        m = build_bcsr(src, dst, 300, 300)
        assert m.n_src_blocks == m.n_dst_blocks == 3
        # sorted by (bj, bi)
        key = m.bj.astype(np.int64) * m.n_src_blocks + m.bi
        assert (np.diff(key) > 0).all()
        # total mass == number of edges
        assert m.vals.sum() == 1000

    def test_duplicate_edges_accumulate(self):
        m = build_bcsr([0, 0], [1, 1], 2, 2)
        assert m.vals[0, 0, 1] == 2.0

    def test_reference_matches_direct(self):
        src, dst = random_edges(200, 800)
        m = build_bcsr(src, dst, 200, 200)
        ht = RNG.normal(size=(8, m.n_src_blocks * BLOCK))
        ref = bcsr_spmm_reference(m, ht)
        U = np.zeros((200, 8))
        np.add.at(U, dst, ht.T[:200][src])
        np.testing.assert_allclose(ref.T[:200], U, atol=1e-9)

    def test_reorder_is_permutation(self):
        src, dst = random_edges(100, 300)
        perm = reorder_for_locality(src, dst, 100)
        assert sorted(perm.tolist()) == list(range(100))


class TestPallasSpmm:
    @pytest.mark.parametrize("V,E,D", [(512, 4096, 16), (300, 900, 8)])
    def test_matches_reference(self, V, E, D):
        src, dst = random_edges(V, E)
        m = build_bcsr(src, dst, V, V)
        ht = RNG.normal(size=(D, m.n_src_blocks * BLOCK)).astype(np.float32)
        k = PallasSpmm(m, interpret=True)
        got = np.asarray(k(jnp.asarray(ht)))
        ref = bcsr_spmm_reference(m, ht)
        rel = np.abs(got - ref).max() / np.abs(ref).max()
        assert rel < 5e-3  # bf16 operand rounding

    @pytest.mark.parametrize("block_major", [True, False])
    @pytest.mark.parametrize("G,C", [(4, 2), (8, 4)])
    def test_tiled_matches_reference(self, block_major, G, C):
        from cognn_tpu.ops.pallas_spmm import PallasSpmmTiled

        V, E, D = 1024, 4096, 16
        src, dst = random_edges(V, E, band=256)
        m = build_bcsr(src, dst, V, V)
        ht = RNG.normal(size=(D, m.n_src_blocks * BLOCK)).astype(np.float32)
        k = PallasSpmmTiled(m, G=G, C=C, Cd=C, block_major=block_major,
                            interpret=True)
        got = np.asarray(k(jnp.asarray(ht)))
        ref = bcsr_spmm_reference(m, ht)
        rel = np.abs(got - ref).max() / np.abs(ref).max()
        assert rel < 5e-3

    def test_tiled_covers_empty_dst_chunks(self):
        from cognn_tpu.ops.pallas_spmm import PallasSpmmTiled

        # all edges land in dst block 0: higher chunks must come out zero
        src = RNG.integers(0, 1024, 200)
        dst = RNG.integers(0, 64, 200)
        m = build_bcsr(src, dst, 1024, 1024)
        ht = RNG.normal(size=(8, m.n_src_blocks * BLOCK)).astype(np.float32)
        k = PallasSpmmTiled(m, G=4, C=2, Cd=2, interpret=True)
        got = np.asarray(k(jnp.asarray(ht)))
        assert np.abs(got[:, 128:]).max() == 0.0

    @pytest.mark.parametrize("G,C", [(4, 2), (8, 4), (3, 4)])
    def test_merged_matches_reference(self, G, C):
        from cognn_tpu.ops.pallas_spmm import PallasSpmmMerged

        V, E, D = 1024, 4096, 16
        src, dst = random_edges(V, E, band=256)
        m = build_bcsr(src, dst, V, V)
        ht = RNG.normal(size=(D, m.n_src_blocks * BLOCK)).astype(np.float32)
        k = PallasSpmmMerged(m, G=G, C=C, Cd=C, interpret=True)
        got = np.asarray(k(jnp.asarray(ht)))
        ref = bcsr_spmm_reference(m, ht)
        rel = np.abs(got - ref).max() / np.abs(ref).max()
        assert rel < 5e-3

    def test_merged_covers_empty_dst_chunks(self):
        from cognn_tpu.ops.pallas_spmm import PallasSpmmMerged

        src = RNG.integers(0, 1024, 200)
        dst = RNG.integers(0, 64, 200)
        m = build_bcsr(src, dst, 1024, 1024)
        ht = RNG.normal(size=(8, m.n_src_blocks * BLOCK)).astype(np.float32)
        k = PallasSpmmMerged(m, G=4, C=2, Cd=2, interpret=True)
        got = np.asarray(k(jnp.asarray(ht)))
        assert np.abs(got[:, 128:]).max() == 0.0

    def test_empty_graph_all_variants(self):
        # nnzb == 0: every variant must still emit zeroed coverage blocks
        # (ADVICE r1: merged/tiled used to IndexError on an empty run loop)
        from cognn_tpu.ops.pallas_spmm import PallasSpmmMerged, PallasSpmmTiled

        m = build_bcsr(np.zeros(0, np.int64), np.zeros(0, np.int64), 256, 256)
        assert m.nnzb == 0
        ht = RNG.normal(size=(8, m.n_src_blocks * BLOCK)).astype(np.float32)
        for k in (PallasSpmm(m, interpret=True),
                  PallasSpmmTiled(m, G=4, C=2, Cd=2, interpret=True),
                  PallasSpmmMerged(m, G=4, C=2, Cd=2, interpret=True)):
            got = np.asarray(k(jnp.asarray(ht)))
            assert got.shape == (8, m.n_dst_blocks * BLOCK)
            assert np.abs(got).max() == 0.0

    @pytest.mark.skipif(jax.default_backend() != "tpu",
                        reason="Mosaic lowering check needs a real chip "
                               "(COGNN_TPU_TEST_TPU=1)")
    def test_merged_tpu_lowering_parity(self):
        # ADVICE r1: the merged kernel's in-kernel lane-axis concatenate and
        # [G,128,128]->[G*128,128] reshape are Mosaic lowerings with no
        # TPU-mode coverage elsewhere; run compiled (not interpret) here.
        from cognn_tpu.ops.pallas_spmm import PallasSpmmMerged

        V, E, D = 1024, 4096, 16
        src, dst = random_edges(V, E, band=256)
        m = build_bcsr(src, dst, V, V)
        ht = RNG.normal(size=(D, m.n_src_blocks * BLOCK)).astype(np.float32)
        k = PallasSpmmMerged(m, G=4, C=4, Cd=4, interpret=False)
        got = np.asarray(k(jnp.asarray(ht)))
        ref = bcsr_spmm_reference(m, ht)
        rel = np.abs(got - ref).max() / np.abs(ref).max()
        assert rel < 5e-3

    def test_empty_dst_blocks_zeroed(self):
        # all edges target block 0; higher dst blocks must come out zero
        src = RNG.integers(0, 512, 100)
        dst = RNG.integers(0, 64, 100)
        m = build_bcsr(src, dst, 512, 512)
        ht = RNG.normal(size=(8, m.n_src_blocks * BLOCK)).astype(np.float32)
        k = PallasSpmm(m, interpret=True)
        got = np.asarray(k(jnp.asarray(ht)))
        assert np.abs(got[:, 128:]).max() == 0.0


class TestPallasSddmm:
    def test_matches_reference(self):
        from cognn_tpu.ops.pallas_sddmm import PallasSddmm, sddmm_reference

        V, E, D = 512, 3000, 16
        src, dst = random_edges(V, E)
        # dedupe (block values must be 0/1 for the mask semantics)
        key = src * V + dst
        _, idx = np.unique(key, return_index=True)
        src, dst = src[idx], dst[idx]
        m = build_bcsr(src, dst, V, V)
        A = RNG.normal(size=(V, D)).astype(np.float32)
        B = RNG.normal(size=(V, D)).astype(np.float32)
        pad = m.n_src_blocks * BLOCK
        at = np.zeros((D, pad), np.float32)
        bt = np.zeros((D, pad), np.float32)
        at[:, :V] = A.T
        bt[:, :V] = B.T
        k = PallasSddmm(m, interpret=True)
        blocks = np.asarray(k(jnp.asarray(at), jnp.asarray(bt)))
        got = np.asarray(k.edge_scores(blocks, src, dst))
        ref = np.asarray(sddmm_reference(src, dst, A, B))
        rel = np.abs(got - ref).max() / np.abs(ref).max()
        assert rel < 5e-3
        # non-edge positions are masked to zero
        zb = blocks[0].copy()
        i, j = m.bi[0], m.bj[0]
        pattern = np.zeros((BLOCK, BLOCK), bool)
        sel = (src // BLOCK == i) & (dst // BLOCK == j)
        pattern[src[sel] % BLOCK, dst[sel] % BLOCK] = True
        assert np.abs(zb[~pattern]).max() == 0.0
