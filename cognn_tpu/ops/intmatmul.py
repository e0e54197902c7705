"""Exact integer matmul mod 2^64 / 2^32 on the MXU.

The TPU-native replacement for SCI's 2PC fixed-point tensor matmul
(``sci::twoPartyGCNMatMul``, reference call sites `optimize-gcn/gcn.h:233,
665,671,710` — SURVEY.md §2.3 "SCIHarness"): secret-shared fixed-point values
live in Z_{2^64}; the share-space product (X0+X1)·(W0+W1) reduces to ONE exact
matmul mod 2^64 of ring elements, followed by truncation and re-sharing
(`cognn_tpu.mpc`).

TPUs have no 64-bit integer datapath, so we decompose each ring element into
eight 8-bit limbs and compute the 36 limb-pair products with weight < 64 bits
as int8 MXU dots (s8 x s8 -> s32). int8 holds [-128, 127], so limbs are
offset by -128 and the products corrected with row/column sums (the standard
quantization zero-point identity):

    sum_k (a'+128)(b'+128) = sum a'b' + 128*rowsum(a') + 128*colsum(b')
                             + 128^2 * K

Safety: |corrected product| <= 255^2 * K, exact in int32 for K <= 32768;
larger K is blocked.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cognn_tpu.core.ring import _add_carry

_U32 = jnp.uint32
_MAX_K = 32768


def _to_limbs8(x_limbs32: jnp.ndarray, n8: int) -> jnp.ndarray:
    """uint32 limb array [L32, ...] -> 8-bit limbs [n8, ...] (int32 0..255)."""
    outs = []
    for i in range(n8):
        word = x_limbs32[i // 4]
        sh = _U32(8 * (i % 4))
        outs.append(((word >> sh) & _U32(0xFF)).astype(jnp.int32))
    return jnp.stack(outs)


def _shift64(p: jnp.ndarray, s: int) -> jnp.ndarray:
    """uint32 value -> (lo, hi) of p << s (s in [0, 64))."""
    p = p.astype(_U32)
    if s == 0:
        return jnp.stack([p, jnp.zeros_like(p)])
    if s < 32:
        return jnp.stack([p << _U32(s), p >> _U32(32 - s)])
    return jnp.stack([jnp.zeros_like(p), p << _U32(s - 32)])


@functools.partial(jax.jit, static_argnames=("bits",))
def ring_matmul(a_limbs: jnp.ndarray, b_limbs: jnp.ndarray,
                bits: int = 64) -> jnp.ndarray:
    """Exact A @ B mod 2^bits.

    a_limbs: uint32 [L32, N, K]; b_limbs: uint32 [L32, K, M];
    returns uint32 [L32, N, M]. L32 = bits // 32.
    """
    n8 = bits // 8
    K = a_limbs.shape[-1]
    A8 = _to_limbs8(a_limbs, n8)  # [n8, N, K] int32 in 0..255
    B8 = _to_limbs8(b_limbs, n8)  # [n8, K, M]

    nblocks = max(1, -(-K // _MAX_K))
    acc = None
    for blk in range(nblocks):
        k0, k1 = blk * _MAX_K, min(K, (blk + 1) * _MAX_K)
        Ka = k1 - k0
        Ab = (A8[..., k0:k1] - 128).astype(jnp.int8)
        Bb = (B8[:, k0:k1, :] - 128).astype(jnp.int8)
        rs = jnp.sum(Ab.astype(jnp.int32), axis=-1)  # [n8, N]
        cs = jnp.sum(Bb.astype(jnp.int32), axis=-2)  # [n8, M]
        const = jnp.int32(128 * 128 * Ka)
        # ALL B limb planes ride one wide RHS [Ka, n8*M]: each A plane is
        # then streamed from HBM ONCE (n8 dots total instead of the naive
        # n8*(n8+1)/2), and a narrow M (hidden=16) packs n8*M=128 output
        # lanes instead of wasting 7/8 of the MXU tile. Measured (v5e,
        # CiteSeer f=3703 share matmuls): the epoch's matmul cost is
        # A-stream-bound, so fewer A reads dominate the wasted i+j>=n8
        # products this also computes.
        M = Bb.shape[-1]
        Bcat = jnp.moveaxis(Bb, 0, 1).reshape(Ka, n8 * M)
        for i in range(n8):
            dots = jax.lax.dot_general(
                Ab[i], Bcat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)  # [N, n8*M]
            dots = dots.reshape(dots.shape[0], n8, M)
            for j in range(n8 - i):
                p = (dots[:, j] + 128 * rs[i][:, None]
                     + 128 * cs[j][None, :] + const)
                contrib = _shift64(p, 8 * (i + j))  # (lo, hi) uint32
                acc = contrib if acc is None else _ring_add2(acc, contrib)
    if bits == 32:
        return acc[:1]
    return acc


def _ring_add2(a, b):
    lo, c = _add_carry(a[0], b[0])
    return jnp.stack([lo, a[1] + b[1] + c])


def _ring_sub2(a, b):
    lo = a[0] - b[0]
    borrow = (a[0] < b[0]).astype(_U32)
    return jnp.stack([lo, a[1] - b[1] - borrow])


def prep_a_small(a_limbs: jnp.ndarray):
    """Precompute the A-side decomposition of :func:`ring_matmul_small`.

    For a LOOP-INVARIANT A operand (the GCN's static feature matrix x0 in
    the layer-0 forward ``x0 @ W`` and weight-gradient ``x0^T @ g`` matmuls,
    `optimize-gcn/gcn.h:233,665`), the reconstruct + byte-limb decompose +
    row-sum work depends only on A and can be hoisted out of the training
    scan: compute it once per engine, ride it through compiled programs as
    an ARGUMENT pytree, and re-use it every epoch. Returns a list (one
    entry per K-block) of dicts {Ab int8 [4,N,Kb], rs int32 [4,N],
    sa int8 [N,Kb], sa_sum int32 [N,1]}.
    """
    lo_a, hi_a = a_limbs[0], a_limbs[1]
    K = lo_a.shape[-1]
    A8 = _to_limbs8(lo_a[None], 4)  # [4, N, K]
    sa = (hi_a >> _U32(31)).astype(jnp.int8)  # sign bits (hi is 0 or ~0)
    blocks = []
    nblocks = max(1, -(-K // _MAX_K))
    for blk in range(nblocks):
        k0, k1 = blk * _MAX_K, min(K, (blk + 1) * _MAX_K)
        Ab = (A8[..., k0:k1] - 128).astype(jnp.int8)
        sa_blk = sa[..., k0:k1]
        blocks.append({
            "Ab": Ab,
            "rs": jnp.sum(Ab.astype(jnp.int32), axis=-1),
            "sa": sa_blk,
            "sa_sum": 128 * jnp.sum(sa_blk.astype(jnp.int32),
                                    axis=-1)[:, None],
        })
    return blocks


def ring_matmul_small_prepped(prep_a, b_limbs: jnp.ndarray) -> jnp.ndarray:
    """:func:`ring_matmul_small` with the A side precomputed by
    :func:`prep_a_small` (bit-identical result)."""
    lo_b, hi_b = b_limbs[0], b_limbs[1]
    B8 = _to_limbs8(lo_b[None], 4)  # [4, K, M]
    sb = (hi_b >> _U32(31)).astype(jnp.int8)

    acc = None
    corr = None  # mod 2^32 correction: sum lo_a*s_b + s_a*lo_b
    k0 = 0
    for blkd in prep_a:
        Ab, rs = blkd["Ab"], blkd["rs"]
        sa_blk, sa_sum = blkd["sa"], blkd["sa_sum"]
        Ka = Ab.shape[-1]
        k1 = k0 + Ka
        Bb = (B8[:, k0:k1, :] - 128).astype(jnp.int8)
        cs = jnp.sum(Bb.astype(jnp.int32), axis=-2)
        const = jnp.int32(128 * 128 * Ka)
        sb_blk = sb[k0:k1]
        k0 = k1
        # One wide RHS [Ka, 4M+M]: the 4 B limb planes plus the B sign
        # column — each A limb plane is streamed from HBM ONCE and serves
        # all its products (4 main + its li sign term); with M=hidden=16
        # the 5M=80 output columns pack one MXU lane tile instead of 16+8
        # separate 16-lane dots. A-stream-bound at GCN shapes (f=3703).
        M = Bb.shape[-1]
        Bcat = jnp.concatenate(
            [jnp.moveaxis(Bb, 0, 1).reshape(Ka, 4 * M), sb_blk], axis=-1)
        sb_sum = 128 * jnp.sum(sb_blk.astype(jnp.int32), axis=0)[None, :]
        for i in range(4):
            dots = jax.lax.dot_general(
                Ab[i], Bcat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)  # [N, 5M]
            for j in range(4):
                p = (dots[:, j * M:(j + 1) * M] + 128 * rs[i][:, None]
                     + 128 * cs[j][None, :] + const)
                contrib = _shift64(p, 8 * (i + j))
                acc = contrib if acc is None else _ring_add2(acc, contrib)
            li = dots[:, 4 * M:] + sb_sum  # == A8[i] @ sb
            term = li.astype(_U32) << _U32(8 * i)
            corr = term if corr is None else corr + term
        # s_a against all 4 B limb planes in one dot
        rj_all = jax.lax.dot_general(
            sa_blk, Bcat[:, :4 * M], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)  # [N, 4M]
        for i in range(4):
            rj = rj_all[:, i * M:(i + 1) * M] + sa_sum
            corr = corr + (rj.astype(_U32) << _U32(8 * i))
    # subtract 2^32 * corr (mod 2^64): only the hi limb is affected
    hi = acc[1] - corr
    return jnp.stack([acc[0], hi])


@jax.jit
def ring_matmul_small(a_limbs: jnp.ndarray, b_limbs: jnp.ndarray
                      ) -> jnp.ndarray:
    """Exact A @ B mod 2^64 for SMALL operands: both matrices' signed values
    must fit int32 (|x| < 2^31 — e.g. reconstructed fixed-point activations,
    NOT uniformly random shares). Exploits sign-extension structure:

        x mod 2^64 = lo_x + 2^32 * (-s_x)    with s_x = sign bit

        sum x*w = sum full64(lo_x * lo_w)
                  - 2^32 * (sum lo_x * s_w + sum s_x * lo_w)   (mod 2^64)

    16 low-product int8 dots + 8 sign-mask dots = 24 MXU dots (vs 36 for the
    general kernel). Used by the MPC protocol's reconstruct-side matmuls.
    """
    return ring_matmul_small_prepped(prep_a_small(a_limbs), b_limbs)


# ---------------------------------------------------------------------------
# numpy oracle for tests
# ---------------------------------------------------------------------------


def ring_matmul_np(a_u64: np.ndarray, b_u64: np.ndarray,
                   bits: int = 64) -> np.ndarray:
    """Wrapping uint64 matmul (numpy does modular arithmetic natively)."""
    with np.errstate(over="ignore"):
        out = np.zeros((a_u64.shape[0], b_u64.shape[1]), np.uint64)
        for k in range(a_u64.shape[1]):
            out += a_u64[:, k][:, None] * b_u64[k][None, :]
    if bits == 32:
        out &= np.uint64(0xFFFFFFFF)
    return out
