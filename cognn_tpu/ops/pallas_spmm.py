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
    od = jnp.int32 if ht.dtype == jnp.int8 else ht.dtype
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((D, n_dst_blocks * BLOCK), od),
        interpret=interpret,
    )(first, bi, bj, ht, vals)


def _register_kernel_pytree(cls, data_attrs, meta_attrs):
    """Register a bound-kernel class as a pytree: the device operand arrays
    are leaves, the static layout ints are aux data. This lets callers pass
    a kernel INTO jit-compiled functions as an argument — closure-capturing
    it instead embeds the (possibly GB-scale) block stream as constants in
    the serialized HLO, which the remote-compile transport rejects."""

    def flatten(k):
        return tuple(getattr(k, a) for a in data_attrs), \
            tuple(getattr(k, a) for a in meta_attrs)

    def unflatten(meta, data):
        k = object.__new__(cls)
        for a, v in zip(data_attrs, data):
            setattr(k, a, v)
        for a, v in zip(meta_attrs, meta):
            setattr(k, a, v)
        k.m = None  # host-side structure doesn't survive tracing
        return k

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)


class PallasSpmm:
    """Bound kernel for a fixed BCSR structure (static per device plan)."""

    def __init__(self, m: BcsrMatrix, interpret: bool | None = None,
                 vals_dtype=jnp.bfloat16):
        self.m = m
        self.n_src_blocks = m.n_src_blocks
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
        # A entries are small integer edge counts — exact in bf16 (and in
        # int8 when <= 127); the A-block stream dominates kernel
        # bandwidth, so the narrowest exact dtype wins.
        self.vals = jnp.asarray(vals, vals_dtype)
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret
        self.n_dst_blocks = m.n_dst_blocks

    def __call__(self, ht: jnp.ndarray) -> jnp.ndarray:
        """ht: [D, n_src_blocks*BLOCK] -> [D, n_dst_blocks*BLOCK].

        D must be a multiple of 8 (f32 sublane tile)."""
        assert ht.shape[1] == self.n_src_blocks * BLOCK, ht.shape
        return _spmm_call(self.first, self.bi, self.bj, ht, self.vals,
                          self.n_dst_blocks, self.interpret)


_register_kernel_pytree(PallasSpmm, ("first", "bi", "bj", "vals"),
                        ("n_src_blocks", "n_dst_blocks", "interpret"))


# ---------------------------------------------------------------------------
# Supertiled variant: deep-streamed A blocks
# ---------------------------------------------------------------------------
#
# The one-block-per-grid-step kernel above issues a 32 KB (bf16) DMA per
# step; at >1 GB A streams the pipeline is DMA-latency-bound (~5x off the
# HBM roofline). This variant groups G consecutive blocks of one
# (dst-chunk, src-chunk) supertile into a single grid step, so the A stream
# moves in G*32 KB chunks while the ht source chunk [D, C*128] and the out
# destination chunk [D, Cd*128] stay resident in VMEM; sub-block routing
# inside the chunk uses prefetched local indices with dynamic 128-aligned
# slices.


def _tiled_kernel(G, block_major):
    def kernel(first_ref, oi_ref, hi_ref, bil_ref, bjl_ref,
               ht_ref, a_ref, out_ref):
        g = pl.program_id(0)

        @pl.when(first_ref[g] == 1)
        def _init():
            out_ref[...] = jnp.zeros_like(out_ref)

        for k in range(G):  # unrolled: G MXU dots per A-stream chunk
            col = bil_ref[g * G + k]
            row = bjl_ref[g * G + k]
            if block_major:
                # [C, D, B] / [Cd, D, B] tiles: sub-block select is a cheap
                # leading-axis address offset, not a cross-lane shift
                hs = ht_ref[col]
                prod = jax.lax.dot_general(
                    hs.astype(a_ref.dtype), a_ref[k],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=out_ref.dtype)
                out_ref[row] += prod
            else:
                hs = ht_ref[:, pl.ds(col * BLOCK, BLOCK)]
                prod = jax.lax.dot_general(
                    hs.astype(a_ref.dtype), a_ref[k],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=out_ref.dtype)
                out_ref[:, pl.ds(row * BLOCK, BLOCK)] += prod

    return kernel


@functools.partial(jax.jit, static_argnames=("G", "C", "Cd", "n_dst_chunks",
                                             "block_major", "interpret"))
def _tiled_call(first, oi, hi, bil, bjl, ht, vals, G: int, C: int, Cd: int,
                n_dst_chunks: int, block_major: bool = True,
                interpret: bool = False):
    n_groups = len(first)
    if block_major:
        D = ht.shape[1]  # ht: [n_src_chunks*C, D, BLOCK]
        in_ht = pl.BlockSpec((C, D, BLOCK),
                             lambda g, first, oi, hi, bil, bjl: (hi[g], 0, 0))
        out_spec = pl.BlockSpec(
            (Cd, D, BLOCK), lambda g, first, oi, hi, bil, bjl: (oi[g], 0, 0))
        out_shape = jax.ShapeDtypeStruct(
            (n_dst_chunks * Cd, D, BLOCK),
            jnp.int32 if ht.dtype == jnp.int8 else ht.dtype)
    else:
        D = ht.shape[0]  # ht: [D, n_src_chunks*C*BLOCK]
        in_ht = pl.BlockSpec((D, C * BLOCK),
                             lambda g, first, oi, hi, bil, bjl: (0, hi[g]))
        out_spec = pl.BlockSpec(
            (D, Cd * BLOCK), lambda g, first, oi, hi, bil, bjl: (0, oi[g]))
        out_shape = jax.ShapeDtypeStruct(
            (D, n_dst_chunks * Cd * BLOCK),
            jnp.int32 if ht.dtype == jnp.int8 else ht.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,  # first, oi, hi, bil, bjl
        grid=(n_groups,),
        in_specs=[
            in_ht,
            pl.BlockSpec((G, BLOCK, BLOCK),
                         lambda g, first, oi, hi, bil, bjl: (g, 0, 0)),
        ],
        out_specs=out_spec,
    )
    return pl.pallas_call(
        _tiled_kernel(G, block_major),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(first, oi, hi, bil, bjl, ht, vals)


class PallasSpmmTiled:
    """Supertiled bound kernel (same math as :class:`PallasSpmm`).

    ``G``: A blocks streamed per grid step; ``C``/``Cd``: source/destination
    supertile extents in 128-blocks. Zero-block padding cost is one partial
    group per nonempty supertile.

    Wide RHS (rows past the supertile VMEM budget) must be chunked at the
    CALL level (callers slice the row axis; `mpc/engine._bcsr_agg_shares`
    d_tile). A kernel-internal 2D (group, row-tile) grid was tried in r5
    and is UNSOUND on real TPUs: revisiting an output block index after
    leaving it reads UNDEFINED VMEM (Pallas only zero-fills/fetches out
    tiles per the revisiting-output pattern — each destination must be
    ONE contiguous run of grid steps; interpret mode hides this). It
    silently corrupted PubMed unopt-mpc training (loss 4.6 vs 0.05)."""

    def __init__(self, m: BcsrMatrix, G: int = 8, C: int = 16, Cd: int = 16,
                 block_major: bool = True, interpret: bool | None = None,
                 vals_dtype=jnp.bfloat16):
        self._vals_dtype = vals_dtype
        self.m, self.G, self.C, self.Cd = m, G, C, Cd
        self.block_major = block_major
        self.n_src_blocks, self.n_dst_blocks = m.n_src_blocks, m.n_dst_blocks
        nsc = -(-m.n_src_blocks // C)
        ndc = -(-m.n_dst_blocks // Cd)
        self.n_src_chunks, self.n_dst_chunks = nsc, ndc
        bic = m.bi // C
        bjc = m.bj // Cd
        order = np.lexsort((m.bi, m.bj, bic, bjc))
        bi, bj, vals = m.bi[order], m.bj[order], m.vals[order]
        bic, bjc = bic[order], bjc[order]
        cell = bjc.astype(np.int64) * nsc + bic
        firsts, ois, his, bils, bjls, vgroups = [], [], [], [], [], []
        seen_dst = np.zeros(ndc, bool)
        zero_block = np.zeros((BLOCK, BLOCK), vals.dtype)

        def emit(run_bi, run_bj, run_vals, oi, hi):
            pad = (-len(run_bi)) % G
            bil = np.concatenate([run_bi % C, np.zeros(pad, np.int32)])
            bjl = np.concatenate([run_bj % Cd, np.zeros(pad, np.int32)])
            v = np.concatenate([run_vals] + [zero_block[None]] * pad) \
                if pad else run_vals
            ng = len(bil) // G
            firsts.extend([1 if (not seen_dst[oi]) and i == 0 else 0
                           for i in range(ng)])
            seen_dst[oi] = True
            ois.extend([oi] * ng)
            his.extend([hi] * ng)
            bils.append(bil.astype(np.int32))
            bjls.append(bjl.astype(np.int32))
            vgroups.append(v)

        if len(cell):  # nnzb==0: only the coverage groups below emit
            starts = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]])
            bounds = np.r_[starts, len(cell)]
            for s, e in zip(bounds[:-1], bounds[1:]):
                emit(bi[s:e], bj[s:e], vals[s:e], int(bjc[s]), int(bic[s]))
        for j in np.flatnonzero(~seen_dst):  # uncovered out supertiles
            emit(np.zeros(1, np.int32), np.zeros(1, np.int32),
                 zero_block[None], int(j), 0)
        # groups must stay sorted by destination supertile for the
        # revisiting-output accumulation; emits above follow the lexsort
        # except the coverage groups appended last -> resort stably by oi
        ois = np.asarray(ois, np.int32)
        resort = np.argsort(ois, kind="stable")
        firsts = np.asarray(firsts, np.int32)[resort]
        his = np.asarray(his, np.int32)[resort]
        bil2 = np.concatenate(bils).reshape(-1, G)[resort].reshape(-1)
        bjl2 = np.concatenate(bjls).reshape(-1, G)[resort].reshape(-1)
        v2 = np.concatenate(vgroups).reshape(-1, G, BLOCK, BLOCK)[resort]
        self.first = jnp.asarray(firsts)
        self.oi = jnp.asarray(ois[resort])
        self.hi = jnp.asarray(his)
        self.bil = jnp.asarray(bil2)
        self.bjl = jnp.asarray(bjl2)
        self.vals = jnp.asarray(v2.reshape(-1, BLOCK, BLOCK),
                                getattr(self, "_vals_dtype", jnp.bfloat16))
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret

    def __call__(self, ht: jnp.ndarray) -> jnp.ndarray:
        """ht: [D, n_src_blocks*BLOCK] -> [D, n_dst_blocks*BLOCK]."""
        assert ht.shape[1] == self.n_src_blocks * BLOCK, ht.shape
        D = ht.shape[0]
        pad = self.n_src_chunks * self.C * BLOCK - ht.shape[1]
        if pad:
            ht = jnp.pad(ht, ((0, 0), (0, pad)))
        if self.block_major:
            ht3 = ht.reshape(D, -1, BLOCK).swapaxes(0, 1)
            out3 = _tiled_call(self.first, self.oi, self.hi, self.bil,
                               self.bjl, ht3, self.vals, self.G, self.C,
                               self.Cd, self.n_dst_chunks, True,
                               self.interpret)
            out = out3.swapaxes(0, 1).reshape(D, -1)
        else:
            out = _tiled_call(self.first, self.oi, self.hi, self.bil,
                              self.bjl, ht, self.vals, self.G, self.C,
                              self.Cd, self.n_dst_chunks, False,
                              self.interpret)
        return out[:, : self.n_dst_blocks * BLOCK]


_register_kernel_pytree(
    PallasSpmmTiled, ("first", "oi", "hi", "bil", "bjl", "vals"),
    ("G", "C", "Cd", "block_major", "n_src_blocks", "n_dst_blocks",
     "n_src_chunks", "n_dst_chunks", "interpret"))


# ---------------------------------------------------------------------------
# Merged-K variant: one wide MXU dot per group of same-destination blocks
# ---------------------------------------------------------------------------
#
# At hidden-dim widths (D=16) a [D,128]x[128,128] dot is mostly MXU pipeline
# latency: the supertiled kernel above amortizes the per-step DMA but still
# issues G tiny K=128 dots per step, so large A streams run compute-issue
# bound (~5x off the HBM roofline). Since blocks within a supertile cell
# arrive sorted by destination block, runs sharing one destination can be
# contracted in a SINGLE [D, G*128] x [G*128, 128] dot: concatenate the G
# source tiles along the contraction axis and reshape the A chunk to
# [G*128, 128] — same math as summing the G block products (the reference's
# OGA merge, `optimize-gcn/gcn.h:309-342`, is an ADD over per-edge partial
# updates; K-merging is that ADD fused into MXU accumulation).


def _merged_kernel(G, S=1):
    """One grid step = S independent [D, Gs*128] x [Gs*128, 128] sub-dots
    (Gs = G // S) summed into the destination tile. A single K=G*128 dot
    ingests A at one 128-lane row per MXU cycle — about half the HBM rate —
    so splitting K into S independent contractions lets the compiler
    schedule them onto the TensorCore's multiple MXUs concurrently."""
    Gs = G // S

    def kernel(first_ref, oi_ref, hi_ref, row_ref, bil_ref,
               ht_ref, a_ref, out_ref):
        g = pl.program_id(0)

        @pl.when(first_ref[g] == 1)
        def _init():
            out_ref[...] = jnp.zeros_like(out_ref)

        parts = []
        for s in range(S):
            hs = jnp.concatenate(
                [ht_ref[bil_ref[g * G + s * Gs + k]] for k in range(Gs)],
                axis=1)
            a = a_ref[s * Gs:(s + 1) * Gs].reshape(Gs * BLOCK, BLOCK)
            parts.append(jax.lax.dot_general(
                hs.astype(a.dtype), a, (((1,), (0,)), ((), ())),
                preferred_element_type=out_ref.dtype))
        out_ref[row_ref[g]] += functools.reduce(jnp.add, parts)

    return kernel


@functools.partial(jax.jit, static_argnames=("G", "C", "Cd", "n_dst_chunks",
                                             "S", "interpret"))
def _merged_call(first, oi, hi, row, bil, ht, vals, G: int, C: int, Cd: int,
                 n_dst_chunks: int, S: int = 1, interpret: bool = False):
    n_groups = len(first)
    D = ht.shape[1]  # ht: [n_src_chunks*C, D, BLOCK] block-major
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,  # first, oi, hi, row, bil
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((C, D, BLOCK),
                         lambda g, first, oi, hi, row, bil: (hi[g], 0, 0)),
            pl.BlockSpec((G, BLOCK, BLOCK),
                         lambda g, first, oi, hi, row, bil: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (Cd, D, BLOCK), lambda g, first, oi, hi, row, bil: (oi[g], 0, 0)),
    )
    return pl.pallas_call(
        _merged_kernel(G, S),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_dst_chunks * Cd, D, BLOCK),
                                       ht.dtype),
        interpret=interpret,
    )(first, oi, hi, row, bil, ht, vals)


class PallasSpmmMerged:
    """Same-destination block-merged bound kernel (same math as
    :class:`PallasSpmm`). Groups of ``G`` blocks sharing one destination
    block become one K=G*128 MXU contraction; padding cost is one partial
    group per (cell, destination-block) run."""

    def __init__(self, m: BcsrMatrix, G: int = 8, C: int = 16, Cd: int = 16,
                 split: int = 1, interpret: bool | None = None):
        if G % split:
            raise ValueError(f"split {split} must divide G {G}")
        self.m, self.G, self.C, self.Cd = m, G, C, Cd
        self.split = split
        self.n_src_blocks, self.n_dst_blocks = m.n_src_blocks, m.n_dst_blocks
        nsc = -(-m.n_src_blocks // C)
        ndc = -(-m.n_dst_blocks // Cd)
        self.n_src_chunks, self.n_dst_chunks = nsc, ndc
        bic = m.bi // C
        bjc = m.bj // Cd
        order = np.lexsort((m.bi, m.bj, bic, bjc))
        bi, bj, vals = m.bi[order], m.bj[order], m.vals[order]
        bic, bjc = bic[order], bjc[order]
        # runs of identical (dst chunk, src chunk, dst block): within-cell
        # entries are bj-sorted by the lexsort above
        run_key = (bjc.astype(np.int64) * nsc + bic) * m.n_dst_blocks + bj
        firsts, ois, his, rows, bils, vgroups = [], [], [], [], [], []
        seen_dst = np.zeros(ndc, bool)
        zero_block = np.zeros((BLOCK, BLOCK), vals.dtype)

        def emit(run_bi, run_bj0, run_vals, oi, hi):
            pad = (-len(run_bi)) % G
            bil = np.concatenate([run_bi % C, np.zeros(pad, np.int32)])
            v = np.concatenate([run_vals] + [zero_block[None]] * pad) \
                if pad else run_vals
            ng = len(bil) // G
            firsts.extend([1 if (not seen_dst[oi]) and i == 0 else 0
                           for i in range(ng)])
            seen_dst[oi] = True
            ois.extend([oi] * ng)
            his.extend([hi] * ng)
            rows.extend([run_bj0 % self.Cd] * ng)
            bils.append(bil.astype(np.int32))
            vgroups.append(v)

        if len(run_key):  # nnzb==0: only the coverage groups below emit
            starts = np.flatnonzero(np.r_[True, run_key[1:] != run_key[:-1]])
            bounds = np.r_[starts, len(run_key)]
            for s, e in zip(bounds[:-1], bounds[1:]):
                emit(bi[s:e], int(bj[s]), vals[s:e], int(bjc[s]),
                     int(bic[s]))
        for j in np.flatnonzero(~seen_dst):  # uncovered out supertiles
            emit(np.zeros(1, np.int32), j * self.Cd, zero_block[None],
                 int(j), 0)
        # revisiting-output accumulation needs groups sorted by dst chunk
        ois = np.asarray(ois, np.int32)
        resort = np.argsort(ois, kind="stable")
        self.first = jnp.asarray(np.asarray(firsts, np.int32)[resort])
        self.oi = jnp.asarray(ois[resort])
        self.hi = jnp.asarray(np.asarray(his, np.int32)[resort])
        self.row = jnp.asarray(np.asarray(rows, np.int32)[resort])
        bil2 = np.concatenate(bils).reshape(-1, G)[resort].reshape(-1)
        self.bil = jnp.asarray(bil2)
        v2 = np.concatenate(vgroups).reshape(-1, G, BLOCK, BLOCK)[resort]
        self.vals = jnp.asarray(v2.reshape(-1, BLOCK, BLOCK), jnp.bfloat16)
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret

    @property
    def n_groups(self) -> int:
        return len(self.first)

    def __call__(self, ht: jnp.ndarray) -> jnp.ndarray:
        """ht: [D, n_src_blocks*BLOCK] -> [D, n_dst_blocks*BLOCK]."""
        assert ht.shape[1] == self.n_src_blocks * BLOCK, ht.shape
        D = ht.shape[0]
        pad = self.n_src_chunks * self.C * BLOCK - ht.shape[1]
        if pad:
            ht = jnp.pad(ht, ((0, 0), (0, pad)))
        ht3 = ht.reshape(D, -1, BLOCK).swapaxes(0, 1)
        out3 = _merged_call(self.first, self.oi, self.hi, self.row, self.bil,
                            ht3, self.vals, self.G, self.C, self.Cd,
                            self.n_dst_chunks, self.split, self.interpret)
        out = out3.swapaxes(0, 1).reshape(D, -1)
        return out[:, : self.n_dst_blocks * BLOCK]


_register_kernel_pytree(
    PallasSpmmMerged, ("first", "oi", "hi", "row", "bil", "vals"),
    ("G", "C", "Cd", "split", "n_src_blocks", "n_dst_blocks",
     "n_src_chunks", "n_dst_chunks", "interpret"))
