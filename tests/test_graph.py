"""Graph layer tests: IO round-trip, partition construction, padding."""

import numpy as np
import pytest

from cognn_tpu.graph import (
    build_party_graph,
    read_edge_list,
    read_partition_file,
    read_vertex_file,
    write_edge_list,
    write_partition_file,
    write_vertex_file,
)
from cognn_tpu.graph.partition import next_pow2

RNG = np.random.default_rng(7)


def random_graph(n=30, m=120, seed=7):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    # dedupe
    key = src * n + dst
    _, idx = np.unique(key, return_index=True)
    return src[idx], dst[idx]


def test_next_pow2():
    assert [next_pow2(i) for i in range(9)] == [1, 1, 2, 4, 4, 8, 8, 8, 8]


def test_io_roundtrip(tmp_path):
    src, dst = random_graph()
    write_edge_list(tmp_path / "e.txt", src, dst)
    s2, d2, w2 = read_edge_list(tmp_path / "e.txt")
    np.testing.assert_array_equal(s2, src)
    np.testing.assert_array_equal(d2, dst)
    assert np.all(w2 == 1.0)

    vids = np.arange(30)
    feats = RNG.normal(size=(30, 5))
    labels = RNG.integers(0, 3, 30)
    write_vertex_file(tmp_path / "v.txt", vids, feats, labels)
    v2, f2, l2 = read_vertex_file(tmp_path / "v.txt", 5)
    np.testing.assert_array_equal(v2, vids)
    np.testing.assert_allclose(f2, feats, atol=1e-6)
    np.testing.assert_array_equal(l2, labels)

    part = {int(v): int(v) % 2 for v in vids}
    write_partition_file(tmp_path / "p.txt", part)
    assert read_partition_file(tmp_path / "p.txt", 2) == part


def test_undirected_doubles_edges(tmp_path):
    write_edge_list(tmp_path / "e.txt", [0, 1], [1, 2])
    s, d, w = read_edge_list(tmp_path / "e.txt", undirected=True)
    assert len(s) == 4
    assert set(zip(s.tolist(), d.tolist())) == {(0, 1), (1, 2), (1, 0), (2, 1)}


def test_vertex_file_wrong_dim(tmp_path):
    write_vertex_file(tmp_path / "v.txt", [0], np.zeros((1, 3)), [1])
    with pytest.raises(ValueError):
        read_vertex_file(tmp_path / "v.txt", 5)


class TestPartition:
    def test_single_tile_degrees(self):
        src = np.array([0, 0, 1, 2, 3])
        dst = np.array([1, 2, 2, 3, 0])
        g = build_party_graph(src, dst, None, None, 0, 1,
                              all_vids=np.arange(5))
        assert g.num_local == 5
        np.testing.assert_array_equal(g.in_deg, [1, 1, 2, 1, 0])
        np.testing.assert_array_equal(g.out_deg, [2, 1, 1, 1, 0])
        assert not g.border.any()
        blk = g.blocks[0]
        # pow2 padding: deg-1 dsts get 1 slot, deg-2 dst gets 2, isolated 1
        assert blk.num_segments == 5
        # vertex 4 (isolated): one dummy self slot
        slots4 = blk.seg_id == 4
        assert slots4.sum() == 1 and blk.dummy[slots4].all()
        assert blk.src_local[slots4][0] == 4

    def test_pow2_padding(self):
        # vertex 0 has 3 in-edges -> padded to 4
        src = np.array([1, 2, 3])
        dst = np.array([0, 0, 0])
        g = build_party_graph(src, dst, None, None, 0, 1)
        blk = g.blocks[0]
        s0 = blk.seg_id == 0
        assert s0.sum() == 4
        assert blk.dummy[s0].sum() == 1
        # dummy src is the destination itself (ss_…h:370)
        assert blk.src_local[s0][blk.dummy[s0]][0] == 0

    def test_no_dummy_mode_degree_bump(self):
        src = np.array([0])
        dst = np.array([1])
        g = build_party_graph(src, dst, None, None, 0, 1, no_dummy_edge=True,
                              all_vids=np.arange(3))
        # vertex 0 and 2 have no in-edge -> +1 in/out deg, one dummy slot
        np.testing.assert_array_equal(g.in_deg, [1, 1, 1])
        np.testing.assert_array_equal(g.out_deg, [2, 0, 1])
        blk = g.blocks[0]
        assert (blk.seg_id == 0).sum() == 1 and blk.dummy[blk.seg_id == 0].all()

    def test_two_party_structure(self):
        src, dst = random_graph(20, 80)
        tid = {v: v % 2 for v in range(20)}
        g0 = build_party_graph(src, dst, None, tid, 0, 2)
        g1 = build_party_graph(src, dst, None, tid, 1, 2)
        assert g0.num_local + g1.num_local == 20
        # mirror symmetry: g0's mirrors into tile 1 == g1's recv list from 0
        m01 = g0.blocks[1].mirror_vids
        np.testing.assert_array_equal(
            g1.local_vids[g1.recv_target_local[0]], m01)
        # gather_dummy consistency
        gd = g1.gather_dummy[0]
        assert (~gd).sum() == len(m01)
        # border: endpoints of cross edges marked at their own tile
        cross_src = src[(src % 2 == 0) & (dst % 2 == 1)]
        for v in cross_src:
            assert g0.border[np.searchsorted(g0.local_vids, v)]
        # real slot count conservation: every edge appears exactly once
        total_real = sum((~g.blocks[t].dummy).sum()
                        for g in (g0, g1) for t in range(2))
        assert total_real == len(src)

    def test_set_vertex_data_reorders(self):
        src, dst = random_graph(10, 30)
        g = build_party_graph(src, dst, None, None, 0, 1,
                              all_vids=np.arange(10))
        vid = np.arange(10)[::-1]
        feats = np.arange(10, dtype=float)[::-1][:, None] * np.ones((1, 3))
        labels = np.arange(10)[::-1] % 2
        g.set_vertex_data(vid, feats, labels)
        np.testing.assert_allclose(g.features[:, 0], np.arange(10, dtype=float))
