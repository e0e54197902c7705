"""Block-sparse (BCSR) adjacency structure for the Pallas SpMM kernel.

XLA's row-gather + scatter segment-sum on TPU is DMA-descriptor-bound
(~15 ns/row regardless of row width — measured ~0.06 Gedge/s), two orders of
magnitude off the HBM roofline. The TPU-native answer is to make aggregation
MXU work: tile the (src, dst) adjacency into dense 128x128 blocks, keep only
nonzero blocks, and accumulate U^T = H^T A block-by-block — each block one
[D,128] x [128,128] matmul. The transposed layout puts the (small) feature
dim in sublanes and vertices in lanes, so hidden dims 16/3 map natively.

Block count scales with edge locality; ``reorder_for_locality`` provides a
BFS-style vertex reordering (the reference keeps a ``reorderedIndex`` per
vertex too, `graph.h`) that typically shrinks nnz blocks severalfold.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

BLOCK = 128


@dataclasses.dataclass
class BcsrMatrix:
    """Nonzero 128x128 blocks of a [V_src, V_dst] edge-count matrix,
    sorted by (dst_block, src_block) so consecutive grid steps that share a
    destination block accumulate in VMEM."""

    bi: np.ndarray  # int32[nnzb] src block index
    bj: np.ndarray  # int32[nnzb] dst block index
    vals: np.ndarray  # f32[nnzb, BLOCK, BLOCK]
    n_src_blocks: int
    n_dst_blocks: int

    @property
    def nnzb(self) -> int:
        return len(self.bi)


def build_bcsr(src_idx: np.ndarray, dst_idx: np.ndarray, n_src: int,
               n_dst: int, weights: Optional[np.ndarray] = None,
               dtype=np.float32) -> BcsrMatrix:
    """Edge list (duplicates accumulate) -> BCSR blocks."""
    src_idx = np.asarray(src_idx, np.int64)
    dst_idx = np.asarray(dst_idx, np.int64)
    w = np.ones(len(src_idx)) if weights is None else weights
    nsb = -(-n_src // BLOCK)
    ndb = -(-n_dst // BLOCK)
    bi_e = src_idx // BLOCK
    bj_e = dst_idx // BLOCK
    key = bj_e * nsb + bi_e
    order = np.argsort(key, kind="stable")
    uniq, inverse = np.unique(key[order], return_inverse=True)
    nnzb = len(uniq)
    vals = np.zeros((nnzb, BLOCK, BLOCK), dtype)
    np.add.at(vals, (inverse, src_idx[order] % BLOCK, dst_idx[order] % BLOCK),
              w[order])
    return BcsrMatrix(
        bi=(uniq % nsb).astype(np.int32),
        bj=(uniq // nsb).astype(np.int32),
        vals=vals,
        n_src_blocks=nsb,
        n_dst_blocks=ndb,
    )


def reorder_for_locality(src: np.ndarray, dst: np.ndarray,
                         n: int) -> np.ndarray:
    """BFS-order permutation: perm[new] = old. Clusters neighborhoods into
    nearby indices so adjacency blocks densify."""
    order = []
    seen = np.zeros(n, bool)
    adj: dict = {}
    for u, v in zip(src, dst):
        adj.setdefault(int(u), []).append(int(v))
    deg = np.bincount(src, minlength=n)
    for seed in np.argsort(-deg):
        if seen[seed]:
            continue
        stack = [int(seed)]
        seen[seed] = True
        while stack:
            u = stack.pop(0)
            order.append(u)
            for v in adj.get(u, ()):  # noqa: B905
                if not seen[v]:
                    seen[v] = True
                    stack.append(v)
    return np.array(order, np.int64)


def bcsr_spmm_reference(m: BcsrMatrix, ht: np.ndarray) -> np.ndarray:
    """numpy oracle: out^T[D, n_dst_blocks*B] = H^T A."""
    D = ht.shape[0]
    out = np.zeros((D, m.n_dst_blocks * BLOCK), ht.dtype)
    for k in range(m.nnzb):
        i, j = m.bi[k], m.bj[k]
        out[:, j * BLOCK:(j + 1) * BLOCK] += (
            ht[:, i * BLOCK:(i + 1) * BLOCK] @ m.vals[k])
    return out
