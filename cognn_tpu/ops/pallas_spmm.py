"""Pallas TPU kernel: block-sparse SpMM for neighborhood aggregation.

Computes U^T = H^T A over the BCSR blocks of `cognn_tpu.ops.bcsr` — the
MXU-native replacement for gather + segment-sum (the reference's OGA hot
path, SURVEY.md §3.4 "hot loops"). One grid step per nonzero block:

    out[:, bj] (+)= ht[:, bi] @ A_block          # [D,128] x [128,128]

Blocks arrive sorted by destination block, so Pallas's revisiting-output
pattern keeps the [D, 128] accumulator resident in VMEM until bj changes
(zero-initialized on first visit via the prefetched change flags).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cognn_tpu.ops.bcsr import BLOCK, BcsrMatrix


def _kernel(first_ref, bi_ref, bj_ref, ht_ref, a_ref, out_ref):
    k = pl.program_id(0)

    @pl.when(first_ref[k] == 1)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += jax.lax.dot_general(
        ht_ref[...].astype(a_ref.dtype), a_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=out_ref.dtype,
    )


@functools.partial(jax.jit, static_argnames=("n_dst_blocks", "interpret"))
def _spmm_call(first, bi, bj, ht, vals, n_dst_blocks: int,
               interpret: bool = False):
    D = ht.shape[0]
    nnzb = vals.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # first, bi, bj
        grid=(nnzb,),
        in_specs=[
            pl.BlockSpec((D, BLOCK), lambda k, first, bi, bj: (0, bi[k])),
            pl.BlockSpec((1, BLOCK, BLOCK),
                         lambda k, first, bi, bj: (k, 0, 0)),
        ],
        out_specs=pl.BlockSpec((D, BLOCK),
                               lambda k, first, bi, bj: (0, bj[k])),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((D, n_dst_blocks * BLOCK), ht.dtype),
        interpret=interpret,
    )(first, bi, bj, ht, vals)


class PallasSpmm:
    """Bound kernel for a fixed BCSR structure (static per device plan)."""

    def __init__(self, m: BcsrMatrix, interpret: bool | None = None):
        self.m = m
        bi, bj, vals = m.bi, m.bj, m.vals
        # every destination block must be visited at least once so its output
        # tile gets initialized; append zero blocks for uncovered bj
        missing = np.setdiff1d(np.arange(m.n_dst_blocks, dtype=np.int32),
                               np.unique(bj))
        if len(missing):
            bi = np.concatenate([bi, np.zeros(len(missing), np.int32)])
            bj = np.concatenate([bj, missing])
            vals = np.concatenate(
                [vals, np.zeros((len(missing), BLOCK, BLOCK), vals.dtype)])
            order = np.argsort(bj, kind="stable")
            bi, bj, vals = bi[order], bj[order], vals[order]
        first = np.ones(len(bj), np.int32)
        first[1:] = (bj[1:] != bj[:-1]).astype(np.int32)
        self.first = jnp.asarray(first)
        self.bi = jnp.asarray(bi)
        self.bj = jnp.asarray(bj)
        # A entries are small integer edge counts — exact in bf16, and the
        # stream of A blocks dominates kernel bandwidth, so halve it.
        self.vals = jnp.asarray(vals, jnp.bfloat16)
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret
        self.n_dst_blocks = m.n_dst_blocks

    def __call__(self, ht: jnp.ndarray) -> jnp.ndarray:
        """ht: [D, n_src_blocks*BLOCK] -> [D, n_dst_blocks*BLOCK].

        D must be a multiple of 8 (f32 sublane tile)."""
        assert ht.shape[1] == self.m.n_src_blocks * BLOCK, ht.shape
        return _spmm_call(self.first, self.bi, self.bj, ht, self.vals,
                          self.n_dst_blocks, self.interpret)
