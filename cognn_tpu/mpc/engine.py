"""Secret-shared GAS engine — the CoGNN capability proper, TPU-native.

Runs the same CoGNN-Opt / inference schedules as `cognn_tpu.engine.gas`, but
with every vertex embedding and weight an additive share pair in Z_{2^64}
fixed point (`cognn_tpu.mpc.protocol`). The structure mirrors the reference's
secret-shared iteration (`ss_vertex_centric_algo_kernel.h:680-910` +
`optimize-gcn/gcn.h`):

  * PreScatter: shared matmul H·W (exact mod-2^64 MXU kernel) + public
    normalizer scale with truncation
  * Scatter/OGA: share-space gather + carry-free segment aggregation
    (linear — never reconstructs, like the prefix-network ADD)
  * halo exchange: share rows shipped between parties (stacked transpose;
    collective in sharded mode — future)
  * Gather: conditional share addition under the public dummy masks
  * Apply: ReLU via sign-mask multiply; prediction via reconstruct-softmax;
    backward matmuls + gradient scale + SGD on weight shares; cross-party
    weight-share averaging

State layout: uint32[2(share), L(limb), P(party), ...].
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from cognn_tpu.config import GNNParam
from cognn_tpu.core.fixedpoint import FixedPointSpec
from cognn_tpu.core.ring import ring_add
from cognn_tpu.engine.gas import GasEngine, _plan_arrays, norm0
from cognn_tpu.engine.plan import DevicePlan, set_split
from cognn_tpu.mpc.protocol import Protocol
from cognn_tpu.utils.glibc_rand import glorot_init

_U32 = jnp.uint32

# guards the sparse share aggregation against a deterministic XLA/TPU
# fusion miscompile (see the forensic note in `_aggregate_impl`); flipped
# only by tools/repro_tpu_fusion_bug.py
_SPARSE_AGG_BARRIER = True

# int8 vals for the Pallas bcsr share kernels (halves the A stream).
# Validated on a real v5e (r5): PubMed 4p mpc epoch 5.00 -> 3.32 ms,
# bit-convergent (loss 0.068 over 256 scan epochs) — Mosaic s8 matmuls
# are good. COGNN_BCSR_I8=0 restores the bf16 vals for A/B comparison.
import os as _os  # noqa: E402

_BCSR_I8 = _os.environ.get("COGNN_BCSR_I8", "1") == "1"


def _select_mpc_backend(plan: DevicePlan, mode: str,
                        backend: str | None = None,
                        param: GNNParam | None = None,
                        variant: str = "opt",
                        limbs: int = 2) -> str:
    """``aggregation="auto"`` policy for the secret-shared engine — the
    plaintext `select_backend` policy constrained by the byte-plane
    exactness guards (edge multiplicity <= 256 and 255 * max total
    in-edges < 2^24; outside them only the carry-free sparse OGA is
    exact). In sharded mode each party's f32 partial sums recombine to
    ring BEFORE the cross-party ring-add, so the mantissa bound applies
    per SOURCE party (the same guard the bcsr init enforces). Measured
    (GOLDEN.md, one v5e): scan-compiled mpc Cora epochs sparse 5.5 ms /
    bcsr 0.87 ms / dense 0.62 ms; PubMed 4p sparse 75.9 ms / bcsr
    6.25 ms."""
    if backend is None:
        backend = jax.default_backend()
    if backend != "tpu":
        return "sparse"
    from cognn_tpu.engine.gas import (_party_edges, agg_width,
                                      bcsr_supertile_c)
    from cognn_tpu.engine.plan import DENSE_ADJ_BUDGET

    def bcsr_ok():
        # byte-plane RHS = 2 shares x limbs x 4 planes x width rows. Wide
        # widths (unopt full-input-space message passing) no longer veto
        # bcsr: the engine D-tiles the feature axis (`gas.bcsr_d_tile`) so
        # every kernel call's supertiles stay VMEM-legal; infeasible only
        # if even ONE feature's plane rows cannot fit (never at the 64-bit
        # ring's 16 planes).
        if param is None:
            return True
        from cognn_tpu.engine.gas import BCSR_MIN_C

        return bcsr_supertile_c(2 * limbs * 4) >= BCSR_MIN_C

    P, V = plan.num_parties, plan.V
    mult = 0
    max_in_party = 0  # per-source-party destination in-edge max
    dst_all = []
    for p in range(P):
        s, d = _party_edges(plan, p)
        if not len(d):
            continue
        dst_all.append(d)
        pair = (p * V + s) * np.int64(P * V) + d
        mult = max(mult, int(np.unique(pair, return_counts=True)[1].max()))
        max_in_party = max(max_in_party, int(np.bincount(d).max()))
    if mult > 256:
        return "sparse"
    if mode != "stacked":
        # sharded bcsr: guards per source party
        if max_in_party * 255 >= (1 << 24) or not bcsr_ok():
            return "sparse"
        return "bcsr"
    max_in = (int(np.bincount(np.concatenate(dst_all)).max())
              if dst_all else 0)
    if max_in * 255 >= (1 << 24):
        return "sparse"
    if P * P * V * V <= DENSE_ADJ_BUDGET:
        return "dense"
    return "bcsr" if bcsr_ok() else "sparse"


def _plane_rows(planes: int, width: int):
    """RHS row count to size the byte-plane SpMM kernel for, with D-tiling
    when the full ``planes * width`` RHS blows the supertile VMEM budget
    (wide unopt / full-input-space aggregation). Returns (rows, d_tile);
    d_tile None means the whole width rides one kernel call."""
    from cognn_tpu.engine.gas import (BCSR_MIN_C, bcsr_d_tile,
                                      bcsr_supertile_c)

    if bcsr_supertile_c(planes * width) >= BCSR_MIN_C:
        return planes * width, None
    dt = bcsr_d_tile(planes, width)
    return planes * dt, dt


def _mpc_agg_width(param: GNNParam, variant: str, hoist_agg: bool) -> int:
    """Maximum feature width any PER-EPOCH share aggregation runs at. With
    the layer-0 agg(x0) hoisted out of the unopt schedule (the default),
    the epochs only aggregate in hidden/label space — the kernel should be
    supertiled for THOSE widths (the same C-extent config as opt), not for
    the full input width the hoisted aggregation no longer uses."""
    from cognn_tpu.engine.comm_model import _variant_agg_dims

    dims = _variant_agg_dims(param.layer_dims, variant, mpc=True,
                             hoist_agg=hoist_agg)
    if not dims:
        return param.layer_dims[-1]
    return max(dims)


def _segment_sum_shares(sh: jnp.ndarray, seg: jnp.ndarray,
                        num_segments: int) -> jnp.ndarray:
    """Exact mod-2^64 segment sum of share rows, carry-free on TPU.

    sh: uint32[2, L, E, D]; decomposes each 32-bit limb into two 16-bit
    planes, segment-sums the planes in int32 (exact while max segment size
    < 2^15), then recombines with carry propagation. This is the OGA
    (SecureAggregation prefix-network ADD) replacement for share payloads.
    """
    S, L, E, D = sh.shape
    out = None
    for s in range(S):
        acc = None
        for l in range(L):
            word = sh[s, l]
            for p_i, plane in enumerate((word & _U32(0xFFFF),
                                         word >> _U32(16))):
                psum = jax.ops.segment_sum(
                    plane.astype(jnp.int32), seg, num_segments=num_segments,
                    indices_are_sorted=True)  # < 2^31
                weight = 32 * l + 16 * p_i
                term = _shift64_u32(psum.astype(_U32), weight, L)
                acc = term if acc is None else ring_add(
                    _spec_for(L), acc, term)
        out = acc[None] if out is None else jnp.concatenate([out, acc[None]])
    return out


def _spec_for(L):
    from cognn_tpu.core.ring import RING32, RING64

    return RING64 if L == 2 else RING32


def _shift64_u32(p: jnp.ndarray, s: int, L: int) -> jnp.ndarray:
    """uint32 value -> ring limbs of (p << s) mod 2^(32L)."""
    if L == 1:
        return (p << _U32(s))[None] if s else p[None]
    if s == 0:
        return jnp.stack([p, jnp.zeros_like(p)])
    if s < 32:
        return jnp.stack([p << _U32(s), p >> _U32(32 - s)])
    return jnp.stack([jnp.zeros_like(p), p << _U32(s - 32)])


def _dense_agg_shares(adj_bf16: jnp.ndarray, sh_flat: jnp.ndarray
                      ) -> jnp.ndarray:
    """Exact mod-2^(32L) share aggregation upd = A^T @ sh on the MXU.

    adj_bf16: [Vsrc, Vdst] small-integer edge counts (bf16-exact);
    sh_flat: uint32 [S, L, Vsrc, D]. Each 32-bit limb splits into four byte
    planes; all S*L*4 planes ride ONE bf16 matmul with f32 accumulation
    (exact while 255 * a destination's TOTAL in-edge count over all source
    parties < 2^24 — validated against the flattened adjacency column sums
    at dense init), then recombine with carries.
    This is the dense-MXU OGA: the entire scatter/premerge/halo/gather
    pipeline of `_aggregate` as one matrix product, the share-space twin of
    the plaintext engine's dense backend (SecureAggregation ADD,
    `optimize-gcn/gcn.h:309-342`)."""
    S, L, V, D = sh_flat.shape
    rhs = _expand_byte_planes(sh_flat, jnp.bfloat16).T  # [V, S*L*4*D]
    out = jax.lax.dot_general(adj_bf16, rhs, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return _recombine_byte_planes(out.reshape(out.shape[0], S * L * 4, D),
                                  S, L)


def _expand_byte_planes(sh_flat: jnp.ndarray, dtype) -> jnp.ndarray:
    """uint32 shares [S, L, V, D] -> plane-major rows [S*L*4*D, V]: each
    32-bit limb split into four byte planes (values <= 255, exact in bf16
    and f32). ``dtype=jnp.int8`` applies a -128 offset (s8 MXU operand;
    callers correct with the static +128*colsum(A) identity)."""
    S, L, V, D = sh_flat.shape
    i8 = dtype == jnp.int8
    planes = []
    for s in range(S):
        for l in range(L):
            word = sh_flat[s, l]
            for b in range(4):
                p = ((word >> _U32(8 * b)) & _U32(0xFF)).astype(jnp.int32)
                planes.append((p - 128).astype(jnp.int8) if i8
                              else p.astype(dtype))
    return jnp.concatenate(planes, axis=-1).T


def _recombine_byte_planes(out_t: jnp.ndarray, S: int, L: int
                           ) -> jnp.ndarray:
    """Inverse of `_expand_byte_planes` after an f32-exact linear op:
    out_t [Vdst, S*L*4, D] f32 -> ring shares [S, L, Vdst, D] u32, with
    carry propagation."""
    out_t = out_t.astype(_U32)
    acc = [None] * S
    for s in range(S):
        for l in range(L):
            for b in range(4):
                term = _shift64_u32(out_t[:, (s * L + l) * 4 + b],
                                    32 * l + 8 * b, L)
                acc[s] = term if acc[s] is None else ring_add(
                    _spec_for(L), acc[s], term)
    return jnp.stack(acc)


def _dense_agg_shares_i8(adj_i8: jnp.ndarray, colsum_i32: jnp.ndarray,
                         sh_flat: jnp.ndarray) -> jnp.ndarray:
    """`_dense_agg_shares` on the int8 MXU path: HALF the adjacency stream
    (the dominant traffic of the dense OGA) and a LOOSER exactness bound
    (s32 accumulate: indeg * 255 < 2^31 vs the f32-mantissa 2^24).
    Requires edge multiplicity <= 127 (s8 counts). Planes ride with a
    -128 offset; A^T@x = A^T@(x-128) + 128*colsum(A) with the static
    column-sum vector."""
    S, L, V, D = sh_flat.shape
    rhs = _expand_byte_planes(sh_flat, jnp.int8).T  # [V, S*L*4*D] s8
    out = jax.lax.dot_general(adj_i8, rhs, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    out = out + 128 * colsum_i32[:, None]  # nonneg ints < 2^31: u32-exact
    return _recombine_byte_planes(
        out.reshape(out.shape[0], S * L * 4, D), S, L)


def _bcsr_agg_shares(kern, sh_flat: jnp.ndarray,
                     d_tile: int | None = None,
                     colsum_i32: jnp.ndarray | None = None) -> jnp.ndarray:
    """Exact mod-2^(32L) share aggregation upd = A^T @ sh on the Pallas
    block-sparse SpMM — the dense byte-plane trick (`_dense_agg_shares`)
    at block-sparse scale (PubMed-class graphs where the flat (P·V)^2
    adjacency cannot be held). All S*L*4 byte planes ride one kernel call
    as stacked f32 rows (the kernel casts to bf16 internally — exact for
    planes <= 255 — and accumulates in f32, exact under the 2^24 total
    in-edge guard checked at init), then recombine with carries.

    ``d_tile``: when the full S*L*4*D plane RHS would blow the supertile
    VMEM budget (wide unopt widths), chunk the FEATURE axis into d_tile
    columns per kernel call — the A block stream repeats per chunk, but
    the MXU path stays legal at any width (vs the two-orders-slower
    sparse fallback it replaces)."""
    from cognn_tpu.ops.bcsr import BLOCK

    S, L, V, D = sh_flat.shape
    if d_tile is not None and D > d_tile:
        pad = (-D) % d_tile
        padded = jnp.pad(sh_flat, ((0, 0),) * 3 + ((0, pad),))
        outs = [
            _bcsr_agg_shares(kern, padded[..., d0:d0 + d_tile],
                             colsum_i32=colsum_i32)
            for d0 in range(0, D + pad, d_tile)
        ]
        return jnp.concatenate(outs, axis=-1)[..., :D]
    i8 = colsum_i32 is not None
    ht = _expand_byte_planes(sh_flat,
                             jnp.int8 if i8 else jnp.float32)
    width = kern.n_src_blocks * BLOCK
    if width != V:
        ht = jnp.pad(ht, ((0, 0), (0, width - V)))
    out = kern(ht)[:, :V]  # exact: f32 under the 2^24 guard, s32 under 2^31
    if i8:
        # planes rode with a -128 offset: A@x = A@(x-128) + 128*colsum(A)
        out = out + 128 * colsum_i32[None, :]
    return _recombine_byte_planes(out.T.reshape(V, S * L * 4, D), S, L)


def _ring_psum_shares(sh: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Exact mod-2^64 sum of share tensors across a mesh axis, carry-free:
    16-bit planes -> int32 psum -> recombine (valid for < 2^15 parties)."""
    S, L = sh.shape[:2]
    outs = []
    for s_i in range(S):
        acc = None
        for l in range(L):
            word = sh[s_i, l]
            for p_i, plane in enumerate((word & _U32(0xFFFF),
                                         word >> _U32(16))):
                tot = jax.lax.psum(plane.astype(jnp.int32), axis_name)
                term = _shift64_u32(tot.astype(_U32), 32 * l + 16 * p_i, L)
                acc = term if acc is None else ring_add(
                    _spec_for(L), acc, term)
        outs.append(acc)
    return jnp.stack(outs)


class _MpcComm:
    """Stacked-mode exchange (party axis = axis 2 of share tensors)."""

    def halo(self, send):  # [2, L, Pl, Pglobal, M, D]
        return jnp.swapaxes(send, 2, 3)

    def weight_total(self, proto, w_sh, n_parties):
        total = w_sh[:, :, 0]
        for p in range(1, w_sh.shape[2]):
            total = proto.add(total, w_sh[:, :, p])
        return total[:, :, None]


class _MpcShardedComm:
    """Sharded-mode exchange (axis name "party"; local party axis len 1)."""

    def halo(self, send):
        out = jax.lax.all_to_all(send, "party", split_axis=3, concat_axis=2)
        return jnp.swapaxes(out, 2, 3)

    def weight_total(self, proto, w_sh, n_parties):
        return _ring_psum_shares(w_sh, "party")


def _check_segment_widths(plan: DevicePlan) -> None:
    """_segment_sum_shares sums 16-bit planes in int32: exact only while
    every destination's slot count stays below 2^15."""
    for name, seg, trash in (("loc", plan.loc_seg, plan.V),
                             ("rem", plan.rem_seg,
                              plan.num_parties * plan.M)):
        for p in range(plan.num_parties):
            real = seg[p][seg[p] < trash]
            if real.size and np.bincount(real).max() >= (1 << 15):
                raise ValueError(
                    f"party {p} {name} segment of {np.bincount(real).max()} "
                    "slots overflows the carry-free share segment-sum "
                    "(max 2^15-1 slots per destination)")


class MpcGasEngine:
    """Secret-shared GAS engine (variants: opt, opt_inference).

    ``mode``: "stacked" (one device, parties batched) or "sharded" (party
    axis over mesh axis "party" — multi-chip secret-shared training).
    """

    def __init__(self, plan: DevicePlan, param: GNNParam,
                 variant: str = "opt",
                 fp: FixedPointSpec | None = None,
                 truncation: str = "exact", seed: int = 42,
                 prng_seed: int = 0, mode: str = "stacked",
                 mesh=None, compile_mode: str = "phase",
                 aggregation: str = "auto", prng_impl: str = "auto",
                 nonlinear: str = "reconstruct", hoist_agg: bool = True):
        if variant not in ("opt", "opt_inference", "unopt",
                           "unopt_inference"):
            raise ValueError(variant)
        set_split(plan, param.train_ratio, param.val_ratio)
        if aggregation == "auto":
            aggregation = _select_mpc_backend(
                plan, mode, param=param, variant=variant,
                limbs=(fp or FixedPointSpec()).ring.limbs)
        self._bcsr_sharded_meta = None
        self._agg_d_tile = None
        if aggregation == "dense":
            from cognn_tpu.engine.gas import flat_dense_adjacency

            flat = flat_dense_adjacency(plan)
            if flat.max() > 256:
                raise ValueError("edge multiplicity > 256 breaks bf16 "
                                 "exactness of the dense share aggregation")
            if mode != "stacked":
                # sharded dense: each party owns its [V x P*V] source-row
                # slab; its partial sums recombine to ring BEFORE the
                # cross-party ring-add (halo), so the accumulation bound
                # applies per SOURCE party — the dense twin of the
                # sharded bcsr path
                Pn, Vn = plan.num_parties, plan.V
                rows = flat.reshape(Pn, Vn, Pn * Vn)
                max_in = float(rows.sum(axis=1).max())
                if flat.max() <= 127 and max_in * 255 < (1 << 31):
                    # int8 MXU path: half the adjacency stream, s32-exact
                    agg_operands = {
                        "dense_rows_i8": jnp.asarray(rows, jnp.int8),
                        "dense_colsum_i32": jnp.asarray(
                            rows.sum(axis=1), jnp.int32)}  # [P, P*V]
                elif max_in * 255 < (1 << 24):
                    agg_operands = {"dense_rows_bf16": jnp.asarray(
                        rows, jnp.bfloat16)}
                else:
                    raise ValueError(
                        f"a party sends {int(max_in)} in-edges to one "
                        "destination; 255 * count >= 2^24 overflows the "
                        "f32 mantissa (use aggregation='sparse')")
            else:
                # accumulation exactness is over the TOTAL in-edge count
                # of a destination, ALL source parties combined
                # (_check_segment_widths caps counts per source party
                # only) — validate the flattened column sums. int8 MXU
                # (mult <= 127, s32 accumulate < 2^31) preferred: half
                # the adjacency stream AND a looser bound than the bf16
                # path's f32 mantissa (2^24).
                max_in = float(flat.sum(axis=0).max())
                if flat.max() <= 127 and max_in * 255 < (1 << 31):
                    agg_operands = {
                        "flat_adj_i8": jnp.asarray(flat, jnp.int8),
                        "flat_colsum_i32": jnp.asarray(
                            flat.sum(axis=0), jnp.int32)}
                elif max_in * 255 < (1 << 24):
                    agg_operands = {
                        "flat_adj_bf16": jnp.asarray(flat, jnp.bfloat16)}
                else:
                    raise ValueError(
                        f"a destination accumulates {int(max_in)} "
                        "in-edges across all parties; 255 * count >= 2^24 "
                        "overflows the f32 mantissa in the dense "
                        "byte-plane share aggregation (use "
                        "aggregation='sparse')")
        elif aggregation == "bcsr":
            from cognn_tpu.engine.gas import _party_edges
            from cognn_tpu.ops.bcsr import build_bcsr

            Pn, Vn = plan.num_parties, plan.V
            srcs, dsts = [], []
            for p in range(Pn):
                s, d = _party_edges(plan, p)
                srcs.append(p * Vn + s)
                dsts.append(d)
            dsts_all = np.concatenate(dsts)
            if mode == "sharded":
                # per-party [V x P*V] kernels; each party's f32 partial
                # sums recombine to ring BEFORE the cross-party ring-add,
                # so the mantissa bound applies per SOURCE party
                for p in range(Pn):
                    if not len(dsts[p]):
                        continue
                    max_in = int(np.bincount(dsts[p]).max())
                    if max_in * 255 >= (1 << 24):
                        raise ValueError(
                            f"party {p} sends {max_in} in-edges to one "
                            "destination; 255 * count >= 2^24 overflows "
                            "the f32 mantissa (use 'sparse')")
                    pair = srcs[p] * np.int64(Pn * Vn) + dsts[p]
                    if int(np.unique(pair, return_counts=True)[1].max()) \
                            > 256:
                        raise ValueError(
                            "edge multiplicity > 256 breaks bf16 exactness "
                            "of the bcsr share aggregation")
                from cognn_tpu.engine.gas import (_build_bcsr_sharded,
                                                  agg_width)

                planes = 2 * (fp or FixedPointSpec()).ring.limbs * 4
                rows, self._agg_d_tile = _plane_rows(
                    planes, _mpc_agg_width(param, variant, hoist_agg))
                agg_operands, self._bcsr_sharded_meta = \
                    _build_bcsr_sharded(plan, rows)
            else:
                m = build_bcsr(np.concatenate(srcs), dsts_all,
                               Pn * Vn, Pn * Vn)
                max_in = (int(np.bincount(dsts_all).max())
                          if len(dsts_all) else 0)
                mult = int(m.vals.max()) if m.nnzb else 0
                # int8 vals (mult <= 127, s32 accumulate < 2^31) halve the
                # dominant A-block stream vs bf16 AND loosen the bound
                # past the f32 mantissa; planes then ride s8 with a -128
                # offset corrected by the static column sums
                i8_ok = (_BCSR_I8 and mult <= 127
                         and max_in * 255 < (1 << 31))
                if not i8_ok:
                    if mult > 256:
                        raise ValueError(
                            "edge multiplicity > 256 breaks bf16 "
                            "exactness of the bcsr share aggregation")
                    if max_in * 255 >= (1 << 24):
                        raise ValueError(
                            f"a destination accumulates {max_in} "
                            "in-edges; 255 * count >= 2^24 overflows the "
                            "f32 mantissa in the bcsr byte-plane share "
                            "aggregation (use 'sparse')")
                from cognn_tpu.engine.gas import _pick_bcsr_kernel

                planes = 2 * (fp or FixedPointSpec()).ring.limbs * 4
                rows, dt = _plane_rows(
                    planes, _mpc_agg_width(param, variant, hoist_agg))
                kern = _pick_bcsr_kernel(
                    m, rows,
                    vals_dtype=jnp.int8 if i8_ok else jnp.bfloat16)
                # wide RHS rows are chunked at the CALL level (a
                # kernel-internal 2D row-tile grid is unsound on TPU —
                # see the note in ops/pallas_spmm.py)
                self._agg_d_tile = dt
                agg_operands = {"bcsr_kernel": kern}
                if i8_ok:
                    agg_operands["bcsr_colsum_i32"] = jnp.asarray(
                        np.bincount(dsts_all, minlength=Pn * Vn
                                    )[:Pn * Vn], jnp.int32)
        elif aggregation == "sparse":
            agg_operands = {}
        else:
            raise ValueError(aggregation)
        self.aggregation = aggregation
        self.plan = plan
        self.param = param
        self.variant = variant
        self.proto = Protocol(fp or FixedPointSpec(), truncation,
                              nonlinear=nonlinear)
        self.L = param.num_layers
        self.P = plan.num_parties
        self.epoch_layers = (3 if variant.startswith("opt") else 2) * self.L
        self.arr = _plan_arrays(plan, jnp.float32)
        self.arr = dataclasses.replace(self.arr, agg=agg_operands)
        _check_segment_widths(plan)
        # Share-randomness PRNG. "auto" picks the hardware counter PRNG
        # (XLA RngBitGenerator) on TPU for TRAINING variants —
        # reshare/trunc generate ~100 MB of random per wide layer, and rbg
        # cuts the scan-compiled mpc Cora epoch 543 -> 450 us. Inference
        # variants keep threefry: rbg costs per-DISPATCH (measured 2.8 ->
        # 10.1 ms/forward back-to-back), which single-forward serving pays
        # but amortized training scans never see. Off-TPU stays threefry
        # for bit-stable goldens. Exact-truncation values are
        # key-independent, so oracle parity is unaffected; the sanctioned
        # reconstruct-and-mask threat model (README "Numeric modes")
        # accepts a counter PRG for share masks.
        if prng_impl == "auto":
            prng_impl = ("rbg" if jax.default_backend() == "tpu"
                         and not variant.endswith("inference") else None)
        self._key = (jax.random.key(prng_seed, impl=prng_impl)
                     if prng_impl else jax.random.key(prng_seed))
        self.mode = mode
        self.mesh = mesh
        if mode == "sharded" and mesh is None:
            raise ValueError("sharded mode requires a mesh")

        # share the pre-normalized features and Glorot weights
        self._key, k1 = jax.random.split(self._key)
        self.x0_sh = self.proto.share(k1, jnp.asarray(plan.features,
                                                      jnp.float32))
        dims = param.layer_dims
        self.weights_sh: List[jnp.ndarray] = []
        for i in range(self.L):
            self._key, k = jax.random.split(self._key)
            w = jnp.broadcast_to(
                jnp.asarray(glorot_init(dims[i], dims[i + 1], seed),
                            jnp.float32),
                (self.P, dims[i], dims[i + 1]))
            self.weights_sh.append(self.proto.share(k, w))

        # public fixed-point normalizer vectors (norm0 quirk preserved)
        n0 = norm0(jnp.asarray(plan.in_deg, jnp.float32))
        self.n0_fp = self.proto.encode_public(n0)  # [L, P, V]
        # per-party gradient scale 1/trainSetSize (gcn.h:667-676)
        self.inv_train_fp = self.proto.encode_public(
            1.0 / jnp.asarray(plan.train_n, jnp.float32))  # [L, P]

        # Hoist the loop-invariant x0 matmul prep out of the epoch scan:
        # the opt schedule's only full-feature-width matmuls are layer-0
        # forward (x0 @ W0) and its weight gradient (x0^T @ g) — both with
        # the STATIC feature matrix as the A operand. Reconstructing +
        # byte-limb-decomposing f-wide x0 inside every scan iteration was
        # the dominant loop-invariant cost of the wide-feature mpc epoch
        # (CiteSeer f=3703); prep once here, ride programs as arguments
        # (never closure constants — remote-compile transport limit).
        prep = jax.jit(jax.vmap(self.proto.prep_matmul_a,
                                in_axes=2, out_axes=0))
        if variant in ("opt", "opt_inference"):
            x0p = {"fwd": prep(self.x0_sh)}
            if variant == "opt":
                x0p["bwd"] = prep(jnp.swapaxes(self.x0_sh, -1, -2))
            self.arr = dataclasses.replace(self.arr, x0p=x0p)
        elif hoist_agg:
            # unopt (original-gcn) hoists MORE: its layer-0 aggregation
            # Â·x0 runs in the FULL input width (`original-gcn/
            # gcn.h:243-251`) on the static feature shares — at PubMed
            # scale that one aggregation is an MXU-flop-floor ~54 ms of
            # byte-plane SpMM per epoch. agg(x0) is loop-invariant
            # (values; exact truncation is key-independent), so compute it
            # once here — the same preprocess-once-reuse the reference's
            # `-n` flag institutionalizes — and prep its A-side for the
            # layer-0 matmul/weight-gradient like the opt x0 prep.
            # NOTE this also removes the layer-0 f-wide halo collective
            # from every epoch (comm accounting: `comm_model.py`
            # hoist_agg); ``hoist_agg=False`` restores the
            # reference-faithful per-epoch schedule for paper-parity
            # comm/duration tables.
            k_ah0, _ = jax.random.split(jax.random.key(0))
            # one-time computation -> use the sparse OGA regardless of the
            # configured backend (all backends are bit-identical,
            # test-pinned): no wide byte-plane kernel compile for a
            # single use, and the CPU comm-trace workers skip minutes of
            # interpret-mode Pallas
            meta_save = self._bcsr_sharded_meta
            self._bcsr_sharded_meta = None
            try:
                ah0 = jax.jit(
                    lambda arr, x0, n0, k: self._aggregate(
                        _MpcComm(), k, arr, n0, x0, dest_scale=True)
                )(dataclasses.replace(self.arr, agg={}), self.x0_sh,
                  self.n0_fp, k_ah0)
            finally:
                self._bcsr_sharded_meta = meta_save
            # party-LEADING leaves (the sharded placement shards axis 0)
            x0p = {"ah0": jnp.moveaxis(ah0, 2, 0), "fwd": prep(ah0)}
            if variant == "unopt":
                x0p["bwd"] = prep(jnp.swapaxes(ah0, -1, -2))
            self.arr = dataclasses.replace(self.arr, x0p=x0p)

        self.compile_mode = compile_mode
        self._epochs_scan_cache: dict = {}
        if mode == "sharded":
            self._epoch = self._build_sharded(self._epoch_body)
            self._forward = self._build_sharded(self._forward_body)
            self._place_sharded()
        elif compile_mode == "phase":
            if variant.startswith("unopt"):
                self._build_phase_jits_unopt()
                self._epoch = self._epoch_phased_unopt
            else:
                self._build_phase_jits()
                self._epoch = self._epoch_phased
            self._forward = jax.jit(
                functools.partial(self._forward_body, _MpcComm()))
        else:
            comm = _MpcComm()
            self._epoch = jax.jit(functools.partial(self._epoch_body, comm))
            self._forward = jax.jit(
                functools.partial(self._forward_body, comm))

    # ------------------------------------------------------------------
    # phase-jit compile mode (default for stacked): the whole-epoch HLO
    # (limb arithmetic unrolled over 3L phases) takes ~16 min to compile on
    # the tunneled TPU. Instead compile ONE program per schedule phase
    # (forward layer / backward-first half / backward-second half, 3L
    # dispatches per epoch for opt) — each fuses its matmul + scale +
    # aggregation + nonlinearity, and derives its PRNG key inside the
    # program (fold_in on a phase id arg), so the host issues no tiny
    # split/mask dispatches between phases. compile_mode="epoch" keeps the
    # single-program path (the only option under shard_map). A parity test
    # pins phased == whole-epoch results (exact truncation is
    # key-independent in value space).
    # ------------------------------------------------------------------
    def _build_phase_jits(self):
        comm = _MpcComm()
        proto = self.proto

        def fwd_layer(key, pid, arr, n0, h, w, *, first, last):
            key = jax.random.fold_in(key, pid)
            k1, k2, k3, k4 = jax.random.split(key, 4)
            if first and "fwd" in arr.x0p:
                h = self._pmatmul_prepped(k1, arr.x0p["fwd"], w)
            else:
                h = self._pmatmul(k1, h, w)
            if not first:
                h = self._scale_rows(k2, h, n0)
            h = self._aggregate(comm, k3, arr, n0, h, True)
            if last:
                return self._predict_apply(k4, arr, h)  # (pm_sh, metrics)
            m = proto.sign_mask(h)
            return proto.mask_mul(h, m), m

        def bwd_first(key, pid, arr, n0, h, w, zmask, *, do_agg, agg_scale,
                      do_mask):
            key = jax.random.fold_in(key, pid)
            k1, k2, k3 = jax.random.split(key, 3)
            if do_agg:
                hs = self._scale_rows(k2, h, n0)
                h = self._aggregate(comm, k3, arr, n0, hs, agg_scale)
            if do_mask:
                h = proto.mask_mul(h, zmask)
            g = self._pmatmul(k1, h, jnp.swapaxes(w, -1, -2))
            return h, g

        def bwd_second(key, pid, arr, n0, h, h_in, w, inv, *, do_agg,
                       agg_scale, use_x0p):
            key = jax.random.fold_in(key, pid)
            k2, k3, k4, k5, k6, k7 = jax.random.split(key, 6)
            if do_agg:
                hs = self._scale_rows(k2, h, n0)
                h = self._aggregate(comm, k3, arr, n0, hs, agg_scale)
            if use_x0p:
                d = self._pmatmul_prepped(k4, arr.x0p["bwd"], h)
            else:
                d = self._pmatmul(k4, jnp.swapaxes(h_in, -1, -2), h)
            d = proto.scale_rows(k5, d, inv[..., None, None])
            step = proto.scale_const(k6, d, float(self.param.learning_rate))
            w = proto.sub(w, step)
            return self._weight_mean(comm, k7, w)

        self._j_fwd = {
            (first, last): jax.jit(
                functools.partial(fwd_layer, first=first, last=last))
            for first in (False, True) for last in (False, True)}
        self._j_bwd1 = {
            (da, asc, dm): jax.jit(functools.partial(
                bwd_first, do_agg=da, agg_scale=asc, do_mask=dm))
            for da in (False, True) for asc in (False, True)
            for dm in (False, True)}
        self._j_bwd2 = {
            (da, asc, ux): jax.jit(functools.partial(
                bwd_second, do_agg=da, agg_scale=asc, use_x0p=ux))
            for da in (False, True) for asc in (False, True)
            for ux in (False, True)}

    def _build_phase_jits_unopt(self):
        """Per-phase programs for the CoGNN (unopt / ss) 2L-phase schedule —
        same motivation as `_build_phase_jits` (original-gcn `gcn.h:440-631`:
        aggregate-then-matmul forward, fused per-layer backward)."""
        comm = _MpcComm()
        proto = self.proto

        def fwd_u(key, pid, arr, n0, h, w, *, first, last):
            key = jax.random.fold_in(key, pid)
            k1, k2, k3, k4 = jax.random.split(key, 4)
            if first and "ah0" in arr.x0p:
                ah = jnp.moveaxis(arr.x0p["ah0"], 0, 2)
                zz = self._pmatmul_prepped(k3, arr.x0p["fwd"], w)
            else:
                if not first:
                    h = self._scale_rows(k1, h, n0)
                ah = self._aggregate(comm, k2, arr, n0, h, True)
                zz = self._pmatmul(k3, ah, w)
            if last:
                pm_sh, metrics = self._predict_apply(k4, arr, zz)
                return ah, pm_sh, metrics
            m = proto.sign_mask(zz)
            return ah, proto.mask_mul(zz, m), m

        def bwd_u(key, pid, arr, n0, h, ah, w, zmask, inv, *, do_mask,
                  do_agg_after, agg_scale, use_x0p):
            key = jax.random.fold_in(key, pid)
            k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 7)
            if do_mask:
                h = proto.mask_mul(h, zmask)
            g = self._pmatmul(k1, h, jnp.swapaxes(w, -1, -2))
            if use_x0p:
                d = self._pmatmul_prepped(k2, arr.x0p["bwd"], h)
            else:
                d = self._pmatmul(k2, jnp.swapaxes(ah, -1, -2), h)
            d = proto.scale_rows(k3, d, inv[..., None, None])
            step = proto.scale_const(k4, d, float(self.param.learning_rate))
            w = proto.sub(w, step)
            w = self._weight_mean(comm, k7, w)
            h = g
            if do_agg_after:
                h = self._scale_rows(k5, h, n0)
                h = self._aggregate(comm, k6, arr, n0, h,
                                    dest_scale=agg_scale)
            return h, w

        self._j_fwd_u = {
            (first, last): jax.jit(
                functools.partial(fwd_u, first=first, last=last))
            for first in (False, True) for last in (False, True)}
        self._j_bwd_u = {
            (dm, da, asc, ux): jax.jit(functools.partial(
                bwd_u, do_mask=dm, do_agg_after=da, agg_scale=asc,
                use_x0p=ux))
            for dm in (False, True) for da in (False, True)
            for asc in (False, True) for ux in (False, True)}

    def _epoch_phased_unopt(self, key, arr, weights_sh, x0_sh, n0_fp,
                            inv_train_fp):
        L = self.L
        weights_sh = list(weights_sh)
        h = x0_sh
        ah = [None] * L
        z_mask = [None] * L
        metrics = None
        for l in range(L):
            fwd = self._j_fwd_u[(l == 0, l == L - 1)]
            if l == L - 1:
                ah[l], h, metrics = fwd(key, l, arr, n0_fp, h, weights_sh[l])
            else:
                ah[l], h, z_mask[l] = fwd(key, l, arr, n0_fp, h,
                                          weights_sh[l])
        for kk, l in enumerate(reversed(range(L))):
            do_mask = (l != L - 1)
            do_agg_after = (l > 0)
            agg_scale = (L + kk + 2) != 2 * L
            use_x0p = (l == 0 and "bwd" in arr.x0p)
            h, weights_sh[l] = self._j_bwd_u[(do_mask, do_agg_after,
                                              agg_scale, use_x0p)](
                key, L + kk, arr, n0_fp, h, ah[l], weights_sh[l],
                z_mask[l] if do_mask else None, inv_train_fp)
        return weights_sh, metrics

    def _epoch_phased(self, key, arr, weights_sh, x0_sh, n0_fp,
                      inv_train_fp):
        L = self.L
        weights_sh = list(weights_sh)
        h = x0_sh
        h_in = [None] * L
        z_mask = [None] * L
        metrics = None
        for l in range(L):
            h_in[l] = h
            fwd = self._j_fwd[(l == 0, l == L - 1)]
            if l == L - 1:
                h, metrics = fwd(key, l, arr, n0_fp, h, weights_sh[l])
            else:
                h, z_mask[l] = fwd(key, l, arr, n0_fp, h, weights_sh[l])
        g = None
        for phase in range(L, 3 * L):
            l = L - 1 - (phase - L) // 2
            first = ((phase - L) % 2 == 0)
            do_agg = (phase % L != 0)
            agg_scale = (phase + 1) != 3 * L
            if first:
                do_mask = (l != L - 1)
                h, g = self._j_bwd1[(do_agg, agg_scale, do_mask)](
                    key, phase, arr, n0_fp, h, weights_sh[l],
                    z_mask[l] if do_mask else None)
            else:
                use_x0p = (l == 0 and "bwd" in arr.x0p)
                weights_sh[l] = self._j_bwd2[(do_agg, agg_scale, use_x0p)](
                    key, phase, arr, n0_fp, h, h_in[l], weights_sh[l],
                    inv_train_fp)
                h = g
        return weights_sh, metrics

    def _place_sharded(self):
        """device_put inputs with their party shardings (multi-process)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        m = self.mesh
        arr_sh = NamedSharding(m, P("party"))
        sh_sh = NamedSharding(m, P(None, None, "party"))
        fp_sh = NamedSharding(m, P(None, "party"))
        self.arr = jax.tree.map(lambda a: jax.device_put(a, arr_sh), self.arr)
        self.x0_sh = jax.device_put(self.x0_sh, sh_sh)
        self.weights_sh = [jax.device_put(w, sh_sh) for w in self.weights_sh]
        self.n0_fp = jax.device_put(self.n0_fp, fp_sh)
        self.inv_train_fp = jax.device_put(self.inv_train_fp, fp_sh)

    def _build_sharded(self, body):
        from jax.sharding import PartitionSpec as P

        comm = _MpcShardedComm()
        arr_spec = jax.tree.map(lambda _: P("party"), self.arr)
        sh_spec = P(None, None, "party")  # [2, L, P, ...]
        fp_spec = P(None, "party")  # [L, P, ...] public fixed-point consts
        # inputs reduced to bare shape/dtype so already-placed arrays don't
        # leak shardings into the stacked-_MpcComm trace (see _out_tree in
        # engine/gas.py; matters when building programs after placement)
        abstract = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(jnp.shape(a), a.dtype),
            (self._key, self.arr, self.weights_sh, self.x0_sh,
             self.n0_fp, self.inv_train_fp))
        outs = jax.eval_shape(functools.partial(body, _MpcComm()), *abstract)
        out_specs = jax.tree.map(
            lambda x: sh_spec if (hasattr(x, "dtype")
                                  and x.dtype == jnp.uint32) else P("party"),
            outs)
        fn = jax.shard_map(
            functools.partial(body, comm), mesh=self.mesh,
            in_specs=(P(), arr_spec, [sh_spec] * self.L, sh_spec,
                      fp_spec, fp_spec),
            out_specs=out_specs,
            check_vma=False,
        )
        return jax.jit(fn)

    # ------------------------------------------------------------------
    # named_scope tags ride into XLA op metadata so jax.profiler device
    # traces attribute per-phase time (tools/profile_mpc_epoch.py maps them
    # onto the reference's span tag set, ss_…h:745-897)
    def _pmatmul(self, key, a_sh, b_sh):
        """Per-party shared matmul: a [2,L,Pl,N,K] @ b [2,L,Pl,K,M]."""
        with jax.named_scope("pre_scatter_matmul"):
            keys = jax.random.split(key, a_sh.shape[2])
            return jax.vmap(self.proto.matmul,
                            in_axes=(0, 2, 2), out_axes=2)(keys, a_sh, b_sh)

    def _pmatmul_prepped(self, key, prep_a, b_sh):
        """Per-party shared matmul with the A side precomputed at engine
        init (party-LEADING prep leaves vs b [2,L,Pl,K,M]) — bit-identical
        to ``_pmatmul`` on the operand the prep was taken from."""
        with jax.named_scope("pre_scatter_matmul_prepped"):
            keys = jax.random.split(key, b_sh.shape[2])
            return jax.vmap(self.proto.matmul_prepped,
                            in_axes=(0, 0, 2), out_axes=2)(keys, prep_a,
                                                           b_sh)

    def _scale_rows(self, key, sh, scalars_fp):
        """sh [2,L,Pl,V,D] * public fp scalars [L,Pl,V] (broadcast over D)."""
        with jax.named_scope("vector_scale"):
            return self.proto.scale_rows(key, sh, scalars_fp[..., None])

    # ------------------------------------------------------------------
    def _aggregate(self, comm, key, arr, n0_fp, sh, dest_scale: bool):
        """Share-space Â application (scatter -> OGA -> halo -> gather)."""
        with jax.named_scope("oga_scatter_gather"):
            return self._aggregate_impl(comm, key, arr, n0_fp, sh,
                                        dest_scale)

    def _aggregate_impl(self, comm, key, arr, n0_fp, sh, dest_scale: bool):
        plan = self.plan
        V, M, P = plan.V, plan.M, plan.num_parties
        D = sh.shape[-1]

        if self._bcsr_sharded_meta is not None:
            # sharded MXU path: each party runs its own [V x P*V] byte-plane
            # block-sparse SpMM (f32-exact per SOURCE party, guard at init),
            # recombines to ring, ships per-peer V-row chunks over the halo
            # collective, and ring-adds the P partial share sums — the
            # multi-chip twin of the stacked `_bcsr_agg_shares`.
            from cognn_tpu.ops.bcsr import BLOCK
            from cognn_tpu.ops.pallas_spmm import _spmm_call, _tiled_call

            S, L = sh.shape[:2]
            Pl = sh.shape[2]
            interp = jax.default_backend() != "tpu"
            meta = self._bcsr_sharded_meta

            def one(i):
                dt = self._agg_d_tile
                if dt is not None and D > dt:
                    # call-level feature chunking (same scheme as
                    # _bcsr_agg_shares; a kernel-internal row-tile grid
                    # is unsound on TPU — ops/pallas_spmm.py)
                    pad = (-D) % dt
                    padded = jnp.pad(sh[:, :, i],
                                     ((0, 0),) * 2 + ((0, 0), (0, pad)))
                    outs = [one_chunk(padded[..., d0:d0 + dt], i)
                            for d0 in range(0, D + pad, dt)]
                    return jnp.concatenate(outs, axis=-1)[..., :D]
                return one_chunk(sh[:, :, i], i)

            def one_chunk(sh_i, i):
                ht = _expand_byte_planes(sh_i, jnp.float32)
                Dc = sh_i.shape[-1]
                Dp = ht.shape[0]  # S*L*4*Dc, a multiple of 8
                if meta[0] == "tiled":
                    _, G, C, Cd, nsc, ndc, nsb, ndb = meta
                    ht_p = jnp.pad(ht, ((0, 0), (0, nsc * C * BLOCK - V)))
                    ht3 = ht_p.reshape(Dp, -1, BLOCK).swapaxes(0, 1)
                    out3 = _tiled_call(arr.agg["bcsr_t_first"][i],
                                       arr.agg["bcsr_t_oi"][i],
                                       arr.agg["bcsr_t_hi"][i],
                                       arr.agg["bcsr_t_bil"][i],
                                       arr.agg["bcsr_t_bjl"][i], ht3,
                                       arr.agg["bcsr_t_vals"][i],
                                       G, C, Cd, ndc, True, interp)
                    out = out3.swapaxes(0, 1).reshape(Dp, -1)[:, :P * V]
                else:
                    _, nsb, ndb = meta
                    ht_p = jnp.pad(ht, ((0, 0), (0, nsb * BLOCK - V)))
                    out = _spmm_call(arr.agg["bcsr_first"][i],
                                     arr.agg["bcsr_bi"][i],
                                     arr.agg["bcsr_bj"][i], ht_p,
                                     arr.agg["bcsr_vals"][i], ndb,
                                     interp)[:, :P * V]
                return _recombine_byte_planes(
                    out.T.reshape(P * V, S * L * 4, Dc), S, L)

            upd = jnp.stack([one(i) for i in range(Pl)], axis=2)
            send = upd.reshape(S, L, Pl, P, V, D)
            recv = comm.halo(send)  # [S, L, Pl, P, V, D]
            total = recv[:, :, :, 0]
            for j in range(1, P):
                total = self.proto.add(total, recv[:, :, :, j])
            agg = self.proto.add(sh, total)
            if dest_scale:
                key, k = jax.random.split(key)
                agg = self._scale_rows(k, agg, n0_fp)
            return agg

        if "dense_rows_bf16" in arr.agg or "dense_rows_i8" in arr.agg:
            # sharded dense MXU path: party-local [V x P*V] byte-plane
            # matmul (exactness guarded per SOURCE party at init) -> ring
            # recombine -> halo -> ring-add — the dense twin of the
            # sharded bcsr path above
            S, L = sh.shape[:2]
            Pl = sh.shape[2]
            if "dense_rows_i8" in arr.agg:
                upd = jnp.stack(
                    [_dense_agg_shares_i8(arr.agg["dense_rows_i8"][i],
                                          arr.agg["dense_colsum_i32"][i],
                                          sh[:, :, i])
                     for i in range(Pl)], axis=2)
            else:
                upd = jnp.stack(
                    [_dense_agg_shares(arr.agg["dense_rows_bf16"][i],
                                       sh[:, :, i]) for i in range(Pl)],
                    axis=2)  # [S, L, Pl, P*V, D]
            send = upd.reshape(S, L, Pl, P, V, D)
            recv = comm.halo(send)
            total = recv[:, :, :, 0]
            for j in range(1, P):
                total = self.proto.add(total, recv[:, :, :, j])
            agg = self.proto.add(sh, total)
            if dest_scale:
                key, k = jax.random.split(key)
                agg = self._scale_rows(k, agg, n0_fp)
            return agg

        if arr.agg:
            # MXU paths: the whole pipeline is one exact byte-plane matmul
            # (dense flat adjacency) or one block-sparse Pallas SpMM over
            # the flattened (party, vertex) axis
            S, L = sh.shape[:2]
            flat = sh.reshape(S, L, P * V, D)
            if "flat_adj_i8" in arr.agg:
                upd = _dense_agg_shares_i8(arr.agg["flat_adj_i8"],
                                           arr.agg["flat_colsum_i32"],
                                           flat)
            elif "flat_adj_bf16" in arr.agg:
                upd = _dense_agg_shares(arr.agg["flat_adj_bf16"], flat)
            else:
                upd = _bcsr_agg_shares(arr.agg["bcsr_kernel"], flat,
                                       self._agg_d_tile,
                                       arr.agg.get("bcsr_colsum_i32"))
            agg = self.proto.add(sh, upd.reshape(sh.shape))
            if dest_scale:
                key, k = jax.random.split(key)
                agg = self._scale_rows(k, agg, n0_fp)
            return agg

        def take(h_p, idx_p):  # h [2,L,V,D] idx [E] -> [2,L,E,D]
            return h_p[:, :, idx_p]

        # local slots
        lvals = jax.vmap(take, in_axes=(2, 0), out_axes=2)(sh, arr.loc_src)
        lvals = lvals * arr.loc_valid.astype(_U32)[None, None, :, :, None]
        loc_upd = jax.vmap(
            lambda v, s: _segment_sum_shares(v, s, V + 1),
            in_axes=(2, 0), out_axes=2)(lvals, arr.loc_seg)[:, :, :, :V]

        # remote slots -> per-destination-party mirror rows
        rvals = jax.vmap(take, in_axes=(2, 0), out_axes=2)(sh, arr.rem_src)
        rvals = rvals * arr.rem_valid.astype(_U32)[None, None, :, :, None]
        send = jax.vmap(
            lambda v, s: _segment_sum_shares(v, s, P * M + 1),
            in_axes=(2, 0), out_axes=2)(rvals, arr.rem_seg)[:, :, :, :P * M]
        send = send.reshape(*send.shape[:2], -1, P, M, D)

        # halo exchange: recv[:, :, me, i] = send[:, :, i, me]
        # (mirror-update shipping, ss_…h:1089-1100)
        recv = comm.halo(send)

        # scatter mirror rows into local order (unique targets per pair ->
        # no accumulation, raw u32 scatter is exact)
        def scatter_one(rows, tgt, mask):  # rows [2,L,M,D]
            tgt = jnp.where(mask, tgt, V)
            base = jnp.zeros((2, rows.shape[1], V + 1, D), _U32)
            rows = rows * mask.astype(_U32)[None, None, :, None]
            return base.at[:, :, tgt].set(rows)[:, :, :V]

        recv_r = jnp.moveaxis(recv, (2, 3), (0, 1))  # [P, Pfrom, 2, L, M, D]
        rem_upd = jax.vmap(jax.vmap(scatter_one))(
            recv_r, arr.recv_target, arr.recv_mask)  # [P, Pfrom, 2, L, V, D]
        rem_upd = jnp.moveaxis(rem_upd, (0, 1), (2, 3))  # [2, L, P, Pfrom, V, D]

        # gather: base + masked adds (cond-vector-addition on shares)
        agg = self.proto.add(
            sh,
            loc_upd * arr.gather_ok_self.astype(_U32)[None, None, :, :, None])
        for i in range(P):
            upd_i = rem_upd[:, :, :, i]
            upd_i = upd_i * arr.gather_ok_from[:, i].astype(_U32)[
                None, None, :, :, None]
            agg = self.proto.add(agg, upd_i)

        if dest_scale:
            key, k = jax.random.split(key)
            agg = self._scale_rows(k, agg, n0_fp)
        # XLA/TPU miscompile guard: without this barrier, fusing the sparse
        # share aggregation (u32 plane segment-sums + gathers + scatters +
        # truncation) with downstream ops produces corrupted reconstructions
        # on TPU at Planetoid scale (deterministic; revealed z jumps from
        # ~0.3 to ~2^31). Reproduced 2026-08: the identical program with
        # per-step reveals — or with this barrier — is correct; CPU is
        # always correct; the dense-matmul aggregation path is unaffected;
        # placing the barrier BEFORE the dest-scale is NOT sufficient. The
        # barrier only blocks cross-boundary fusion; it costs nothing
        # measurable and the parity tests pin sparse == dense bit-exactly.
        # Standalone repro: tools/repro_tpu_fusion_bug.py (flips the flag
        # below so the workaround can be re-validated after an XLA bump
        # and reported upstream). Re-validated 2026-08-21 on the v5e: the
        # barrier-off program is now ALSO correct in this jaxlib — the
        # barrier stays as zero-cost insurance; retire it only after the
        # repro passes on the deployment jaxlib too.
        if _SPARSE_AGG_BARRIER:
            return jax.lax.optimization_barrier(agg)
        return agg

    # ------------------------------------------------------------------
    def _predict_apply(self, key, arr, z_sh):
        with jax.named_scope("apply_prediction"):
            y_hot = jax.nn.one_hot(arr.labels, self.param.layer_dims[-1],
                                   dtype=jnp.float32)
            prob, pm_sh = self.proto.softmax_pred(key, z_sh, y_hot)
            # zero gradients outside the local train split (gcn.h:636-641)
            pm_sh = self.proto.mask_mul(pm_sh, arr.train_mask[..., None])
            helper = GasEngine._metrics
            metrics = helper(self, arr, prob)  # plaintext metric defs
            return pm_sh, metrics

    # ------------------------------------------------------------------
    def _forward_body(self, comm, key, arr, weights_sh, x0_sh, n0_fp,
                      inv_train_fp):
        """L forward phases in share space. ``unopt_inference`` runs the
        original-gcn schedule (aggregate in input width, then matmul —
        reference `tmp_run_cluster.py:417-435`); opt variants matmul into
        hidden width first."""
        h = x0_sh
        z_last = None
        unopt = self.variant.startswith("unopt")
        for l in range(self.L):
            key, k1, k2 = jax.random.split(key, 3)
            if unopt:
                if l == 0 and "ah0" in arr.x0p:
                    h = self._pmatmul_prepped(k1, arr.x0p["fwd"],
                                              weights_sh[l])
                else:
                    if l != 0:
                        h = self._scale_rows(k2, h, n0_fp)
                    key, k3 = jax.random.split(key)
                    h = self._aggregate(comm, k3, arr, n0_fp, h,
                                        dest_scale=True)
                    h = self._pmatmul(k1, h, weights_sh[l])
            else:
                if l == 0 and "fwd" in arr.x0p:
                    h = self._pmatmul_prepped(k1, arr.x0p["fwd"],
                                              weights_sh[l])
                else:
                    h = self._pmatmul(k1, h, weights_sh[l])
                if l != 0:
                    h = self._scale_rows(k2, h, n0_fp)
                key, k3 = jax.random.split(key)
                h = self._aggregate(comm, k3, arr, n0_fp, h,
                                    dest_scale=True)
            z_last = h
            if l != self.L - 1:
                h = self.proto.relu(h)
        prob = jax.nn.softmax(self.proto.reveal(z_last), axis=-1)
        metrics = GasEngine._metrics(self, arr, prob)
        return self.proto.reveal(z_last), prob, metrics

    # ------------------------------------------------------------------
    def _epoch_body(self, comm, key, arr, weights_sh, x0_sh, n0_fp,
                    inv_train_fp):
        if self.variant.startswith("unopt"):
            return self._epoch_unopt(comm, key, arr, weights_sh, x0_sh,
                                     n0_fp, inv_train_fp)
        return self._epoch_opt(comm, key, arr, weights_sh, x0_sh, n0_fp,
                               inv_train_fp)

    def _epoch_opt(self, comm, key, arr, weights_sh, x0_sh, n0_fp,
                   inv_train_fp):
        L, P = self.L, self.P
        proto = self.proto
        weights_sh = list(weights_sh)
        h = x0_sh
        h_in: List[jnp.ndarray] = [None] * L
        z_mask: List[jnp.ndarray] = [None] * L
        metrics = None

        for l in range(L):
            h_in[l] = h
            key, k1, k2, k3 = jax.random.split(key, 4)
            if l == 0 and "fwd" in arr.x0p:
                h = self._pmatmul_prepped(k1, arr.x0p["fwd"], weights_sh[l])
            else:
                h = self._pmatmul(k1, h, weights_sh[l])
            if l != 0:
                h = self._scale_rows(k2, h, n0_fp)
            h = self._aggregate(comm, k3, arr, n0_fp, h, dest_scale=True)
            if l != L - 1:
                z_mask[l] = proto.sign_mask(h)
                h = proto.mask_mul(h, z_mask[l])
            else:
                key, k4 = jax.random.split(key)
                h, metrics = self._predict_apply(k4, arr, h)

        # backward per-iteration (see gas.py _epoch_opt for the schedule)
        g = None
        for phase in range(L, 3 * L):
            key, k1, k2, k3, k4, k5, k6 = jax.random.split(key, 7)
            l = L - 1 - (phase - L) // 2
            first = ((phase - L) % 2 == 0)
            if phase % L != 0:
                hs = self._scale_rows(k2, h, n0_fp)
                agg_scale = (phase + 1) != 3 * L
                h = self._aggregate(comm, k3, arr, n0_fp, hs,
                                    dest_scale=agg_scale)
            if first:
                if l != L - 1:
                    h = proto.mask_mul(h, z_mask[l])
                wT = jnp.swapaxes(weights_sh[l], -1, -2)
                g = self._pmatmul(k1, h, wT)
            else:
                if l == 0 and "bwd" in arr.x0p:
                    d = self._pmatmul_prepped(k4, arr.x0p["bwd"], h)
                else:
                    hT = jnp.swapaxes(h_in[l], -1, -2)
                    d = self._pmatmul(k4, hT, h)
                # per-party gradient scale 1/train_n, SGD (gcn.h:667-678)
                d = proto.scale_rows(k5, d, inv_train_fp[..., None, None])
                step = proto.scale_const(k6, d,
                                         float(self.param.learning_rate))
                weights_sh[l] = proto.sub(weights_sh[l], step)
                weights_sh[l] = self._weight_mean(comm, key, weights_sh[l])
                h = g
        return weights_sh, metrics

    def _epoch_unopt(self, comm, key, arr, weights_sh, x0_sh, n0_fp,
                     inv_train_fp):
        """CoGNN (original-gcn) 2L-phase epoch in share space — aggregation
        before the matmul, fused per-layer backward (original-gcn
        `gcn.h:440-631`; normalization note in models/oracle.py)."""
        L = self.L
        proto = self.proto
        weights_sh = list(weights_sh)
        h = x0_sh
        ah: list = [None] * L
        z_mask: list = [None] * L
        metrics = None

        for l in range(L):
            key, k1, k2, k3 = jax.random.split(key, 4)
            if l == 0 and "ah0" in arr.x0p:
                # hoisted loop-invariant agg(x0) + prepped A side
                h = jnp.moveaxis(arr.x0p["ah0"], 0, 2)
                ah[l] = h
                zz = self._pmatmul_prepped(k3, arr.x0p["fwd"],
                                           weights_sh[l])
            else:
                if l != 0:
                    h = self._scale_rows(k1, h, n0_fp)
                h = self._aggregate(comm, k2, arr, n0_fp, h,
                                    dest_scale=True)
                ah[l] = h
                zz = self._pmatmul(k3, h, weights_sh[l])
            if l != L - 1:
                z_mask[l] = proto.sign_mask(zz)
                h = proto.mask_mul(zz, z_mask[l])
            else:
                key, k4 = jax.random.split(key)
                h, metrics = self._predict_apply(k4, arr, zz)

        for kk, l in enumerate(reversed(range(L))):
            key, k1, k2, k3, k4, k5, k6 = jax.random.split(key, 7)
            if l != L - 1:
                h = proto.mask_mul(h, z_mask[l])
            wT = jnp.swapaxes(weights_sh[l], -1, -2)
            g = self._pmatmul(k1, h, wT)
            if l == 0 and "bwd" in arr.x0p:
                d = self._pmatmul_prepped(k2, arr.x0p["bwd"], h)
            else:
                ahT = jnp.swapaxes(ah[l], -1, -2)
                d = self._pmatmul(k2, ahT, h)
            d = proto.scale_rows(k3, d, inv_train_fp[..., None, None])
            step = proto.scale_const(k4, d, float(self.param.learning_rate))
            weights_sh[l] = proto.sub(weights_sh[l], step)
            weights_sh[l] = self._weight_mean(comm, key, weights_sh[l])
            h = g
            if l > 0:
                h = self._scale_rows(k5, h, n0_fp)
                last_phase = (L + kk + 2) == 2 * L
                h = self._aggregate(comm, k6, arr, n0_fp, h,
                                    dest_scale=not last_phase)
        return weights_sh, metrics

    def _epochs_scan_body(self, n, comm, key, arr, weights_sh, x0_sh, n0_fp,
                          inv_train_fp):
        """``n`` secret-shared epochs as ONE compiled ``lax.scan`` — same
        motivation as ``GasEngine.run_epochs_scan``: the 3L (opt) / 2L
        (unopt) phase programs of an epoch otherwise dispatch from the host
        (a 90-epoch accuracy run pays ~270 dispatches); under scan the whole
        training loop is a single device program (the reference's
        per-iteration loop, `ss_…h:239-248`, compiled away). The PRNG key
        rides the carry so every epoch's share randomness stays fresh."""
        def step(carry, _):
            key, ws = carry
            key, k = jax.random.split(key)
            ws, metrics = self._epoch_body(comm, k, arr, ws, x0_sh, n0_fp,
                                           inv_train_fp)
            return (key, ws), metrics

        (key, ws), metrics = jax.lax.scan(
            step, (key, list(weights_sh)), None, length=n)
        metrics = jax.tree.map(lambda m: jnp.moveaxis(m, 0, 1), metrics)
        return ws, metrics

    def run_epochs_scan(self, n: int):
        """Run ``n`` epochs in one compiled program. Works in every mode
        (stacked or sharded) and with either compile_mode — the scan program
        is compiled separately from the per-epoch/phase programs (one
        compile per distinct ``n``, bounded cache). Returns per-epoch
        metrics shaped [P, n]."""
        fn = self._epochs_scan_cache.get(n)
        if fn is None:
            body = functools.partial(self._epochs_scan_body, n)
            if self.mode == "sharded":
                fn = self._build_sharded(body)
            else:
                fn = jax.jit(functools.partial(body, _MpcComm()))
            while len(self._epochs_scan_cache) >= 8:
                self._epochs_scan_cache.pop(
                    next(iter(self._epochs_scan_cache)))
            self._epochs_scan_cache[n] = fn
        self._key, k = jax.random.split(self._key)
        self.weights_sh, metrics = fn(k, self.arr, self.weights_sh,
                                      self.x0_sh, self.n0_fp,
                                      self.inv_train_fp)
        return metrics

    def _weight_mean(self, comm, key, w_sh):
        """Cross-party share-sum + public 1/P scale (gcn.h:747-802)."""
        if self.P == 1:
            return w_sh
        with jax.named_scope("apply_weight_mean"):
            total = comm.weight_total(self.proto, w_sh, self.P)
            key, k = jax.random.split(key)
            mean = self.proto.scale_const(k, total, 1.0 / self.P)
            return jnp.broadcast_to(mean, w_sh.shape)

    # ------------------------------------------------------------------
    def run_epoch(self):
        self._key, k = jax.random.split(self._key)
        self.weights_sh, metrics = self._epoch(
            k, self.arr, self.weights_sh, self.x0_sh, self.n0_fp,
            self.inv_train_fp)
        return metrics

    def run_epochs(self, n: int):
        metrics = None
        for _ in range(n):
            metrics = self.run_epoch()
        return metrics

    def forward(self):
        self._key, k = jax.random.split(self._key)
        return self._forward(k, self.arr, self.weights_sh, self.x0_sh,
                             self.n0_fp, self.inv_train_fp)

    def reveal_weights(self) -> List[np.ndarray]:
        return [np.asarray(self.proto.reveal(w)) for w in self.weights_sh]

    metrics_host = staticmethod(GasEngine.metrics_host)
    metrics_local = staticmethod(GasEngine.metrics_local)
