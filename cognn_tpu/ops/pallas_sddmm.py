"""Pallas TPU kernel: block-sparse SDDMM (sampled dense-dense matmul).

The SpMM companion (BASELINE.json: "Pallas kernels for segment-sum
SpMM/SDDMM"): per-edge scores s_(u,v) = <A_u, B_v> computed only where the
adjacency has an edge — the attention-score / edge-feature primitive for
GAT-style models over the same BCSR structure as `pallas_spmm`.

One grid step per nonzero adjacency block:

    S[k] = At[:, bi_k]^T @ Bt[:, bj_k]   (masked by the block's edge pattern)

Inputs use the transposed [D, V] layout (feature dim in sublanes). Output is
block-dense [nnzb, 128, 128]; `edge_scores` extracts per-edge values.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cognn_tpu.ops.bcsr import BLOCK, BcsrMatrix


def _kernel(bi_ref, bj_ref, at_ref, bt_ref, mask_ref, out_ref):
    s = jax.lax.dot_general(
        at_ref[...], bt_ref[...],
        (((0,), (0,)), ((), ())),  # contract the feature axis
        preferred_element_type=out_ref.dtype,
    )
    out_ref[0] = s * (mask_ref[0] != 0).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _sddmm_call(bi, bj, at, bt, mask, interpret: bool = False):
    D = at.shape[0]
    nnzb = mask.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # bi, bj
        grid=(nnzb,),
        in_specs=[
            pl.BlockSpec((D, BLOCK), lambda k, bi, bj: (0, bi[k])),
            pl.BlockSpec((D, BLOCK), lambda k, bi, bj: (0, bj[k])),
            pl.BlockSpec((1, BLOCK, BLOCK), lambda k, bi, bj: (k, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BLOCK, BLOCK),
                               lambda k, bi, bj: (k, 0, 0)),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nnzb, BLOCK, BLOCK), at.dtype),
        interpret=interpret,
    )(bi, bj, at, bt, mask)


class PallasSddmm:
    """Bound SDDMM for a fixed BCSR structure."""

    def __init__(self, m: BcsrMatrix, interpret: bool | None = None):
        self.m = m
        self.bi = jnp.asarray(m.bi)
        self.bj = jnp.asarray(m.bj)
        self.mask = jnp.asarray(m.vals, jnp.bfloat16)
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret

    def __call__(self, at: jnp.ndarray, bt: jnp.ndarray) -> jnp.ndarray:
        """at, bt: [D, n_blocks*BLOCK] -> block scores [nnzb, 128, 128]."""
        return _sddmm_call(self.bi, self.bj, at, bt, self.mask,
                           self.interpret)

    def edge_scores(self, blocks: jnp.ndarray, src: np.ndarray,
                    dst: np.ndarray) -> jnp.ndarray:
        """Extract per-edge scores from block-dense output."""
        nsb = self.m.n_src_blocks
        key = (dst // BLOCK) * nsb + (src // BLOCK)
        uniq = (self.m.bj.astype(np.int64) * nsb + self.m.bi)
        block_of = np.searchsorted(uniq, key)
        return blocks[block_of, src % BLOCK, dst % BLOCK]


def sddmm_reference(src, dst, A, B):
    """jnp/numpy reference: per-edge <A_src, B_dst>."""
    return (A[src] * B[dst]).sum(-1)
