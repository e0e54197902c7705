"""Integer ring (mod 2^32 / 2^64) arithmetic on TPU-friendly uint32 limbs.

Replaces the share-algebra portion of the reference's external CryptoUtil /
TaskUtil (SURVEY.md §2.3; reference call sites `task/task.h:331-912`,
`optimize-gcn/gcn.h:70-96`). The reference works in Z_{2^64} with uint64;
TPUs have no native 64-bit integer datapath, so a ring element here is a
``uint32`` array with a **leading limb axis**:

    shape (L, *dims)   with  L = ring_bits // 32   (limb 0 = least significant)

All ops are pure jnp and lower cleanly inside jit/pallas on both CPU and TPU.
numpy <-> uint64 converters are provided for host-side code and tests.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class RingSpec:
    bits: int  # 32 or 64

    @property
    def limbs(self) -> int:
        return self.bits // 32

    @property
    def mask(self) -> int:
        return (1 << self.bits) - 1


RING64 = RingSpec(64)
RING32 = RingSpec(32)

_U32 = jnp.uint32


def ring_zeros(spec: RingSpec, shape) -> Array:
    return jnp.zeros((spec.limbs, *shape), dtype=_U32)


def ring_from_u64(x: np.ndarray, spec: RingSpec = RING64) -> np.ndarray:
    """numpy uint64 -> limb representation (host side)."""
    x = np.asarray(x, dtype=np.uint64)
    if spec.limbs == 1:
        return (x & np.uint64(0xFFFFFFFF)).astype(np.uint32)[None]
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (x >> np.uint64(32)).astype(np.uint32)
    return np.stack([lo, hi], axis=0)


def ring_to_u64(limbs: np.ndarray, spec: RingSpec = RING64) -> np.ndarray:
    """limb representation -> numpy uint64 (host side)."""
    limbs = np.asarray(limbs)
    if spec.limbs == 1:
        return limbs[0].astype(np.uint64)
    return limbs[0].astype(np.uint64) | (limbs[1].astype(np.uint64) << np.uint64(32))


# ---------------------------------------------------------------------------
# Elementwise ring ops (jnp; shapes (L, ...))
# ---------------------------------------------------------------------------


def _add_carry(a: Array, b: Array):
    """uint32 add with carry-out (carry computed branch-free)."""
    s = a + b  # wraps mod 2^32
    carry = (s < a).astype(_U32)
    return s, carry


def ring_add(spec: RingSpec, a: Array, b: Array) -> Array:
    if spec.limbs == 1:
        return a + b
    lo, c = _add_carry(a[0], b[0])
    hi = a[1] + b[1] + c
    return jnp.stack([lo, hi])


def ring_neg(spec: RingSpec, a: Array) -> Array:
    if spec.limbs == 1:
        return jnp.zeros_like(a) - a
    # two's complement: ~a + 1; carry out of the low limb iff a[0] == 0
    lo = ~a[0] + _U32(1)
    carry = (a[0] == 0).astype(_U32)
    hi = ~a[1] + carry
    return jnp.stack([lo, hi])


def ring_sub(spec: RingSpec, a: Array, b: Array) -> Array:
    if spec.limbs == 1:
        return a - b
    lo = a[0] - b[0]
    borrow = (a[0] < b[0]).astype(_U32)
    hi = a[1] - b[1] - borrow
    return jnp.stack([lo, hi])


def _mul32_full(a: Array, b: Array):
    """Full 32x32 -> 64 multiply using 16-bit halves; returns (lo32, hi32)."""
    a0 = a & _U32(0xFFFF)
    a1 = a >> _U32(16)
    b0 = b & _U32(0xFFFF)
    b1 = b >> _U32(16)
    p00 = a0 * b0  # < 2^32, exact in uint32
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    # lo = p00 + ((p01 + p10) << 16)  with carries into hi
    mid, c_mid = _add_carry(p01, p10)  # mid < 2^32 (+carry)
    mid_lo = mid << _U32(16)
    mid_hi = (mid >> _U32(16)) | (c_mid << _U32(16))
    lo, c_lo = _add_carry(p00, mid_lo)
    hi = p11 + mid_hi + c_lo
    return lo, hi


def ring_mul(spec: RingSpec, a: Array, b: Array) -> Array:
    """Elementwise product mod 2^bits."""
    if spec.limbs == 1:
        return a * b
    lo, hi_carry = _mul32_full(a[0], b[0])
    hi = hi_carry + a[0] * b[1] + a[1] * b[0]  # mod 2^32 for the top limb
    return jnp.stack([lo, hi])


def ring_scalar(spec: RingSpec, value: int) -> Array:
    """Python int -> ring scalar of shape (L,) (broadcastable via indexing)."""
    value &= spec.mask
    if spec.limbs == 1:
        return jnp.array([value], dtype=_U32)
    return jnp.array([value & 0xFFFFFFFF, value >> 32], dtype=_U32)


def ring_mul_scalar(spec: RingSpec, a: Array, value: int) -> Array:
    """a * public python-int scalar, mod 2^bits."""
    value &= spec.mask
    if spec.limbs == 1:
        return a * _U32(value & 0xFFFFFFFF)
    b_lo = _U32(value & 0xFFFFFFFF)
    b_hi = _U32(value >> 32)
    lo, hi_carry = _mul32_full(a[0], jnp.broadcast_to(b_lo, a[0].shape))
    hi = hi_carry + a[0] * b_hi + a[1] * b_lo
    return jnp.stack([lo, hi])


# ---------------------------------------------------------------------------
# Signed interpretation / shifts (for fixed-point truncation)
# ---------------------------------------------------------------------------


def ring_arith_shift_right(spec: RingSpec, a: Array, f: int) -> Array:
    """Arithmetic shift right of the two's-complement value by f bits."""
    if f == 0:
        return a
    if spec.limbs == 1:
        return (a.astype(jnp.int32) >> f).astype(_U32)
    assert 0 < f < 32, "fractional bits must be in (0, 32) for ring64"
    lo = (a[0] >> _U32(f)) | (a[1] << _U32(32 - f))
    hi = (a[1].astype(jnp.int32) >> f).astype(_U32)
    return jnp.stack([lo, hi])


def ring_to_f32(spec: RingSpec, a: Array, f: int) -> Array:
    """Signed fixed-point ring value -> float32 (24-bit relative precision).

    Uses a centered low limb (int32 reinterpret + carry into the high limb)
    so small-magnitude values decode exactly instead of via catastrophic
    cancellation of two ~2^32 float terms."""
    if spec.limbs == 1:
        return a.astype(jnp.int32).astype(jnp.float32) / np.float32(2.0**f)
    lo_signed = a[0].astype(jnp.int32)  # two's-complement reinterpret
    carry = (lo_signed < 0).astype(jnp.int32)  # lo >= 2^31 borrowed 2^32
    hi_adj = (a[1].astype(jnp.int32) + carry).astype(jnp.float32)
    return (hi_adj * np.float32(2.0**32)
            + lo_signed.astype(jnp.float32)) / np.float32(2.0**f)


def ring_from_f32(spec: RingSpec, x: Array, f: int) -> Array:
    """float32 -> signed fixed-point ring value (truncation toward zero,
    matching C's static_cast<int64>)."""
    scaled = x * np.float32(2.0**f)
    trunc = jnp.trunc(scaled)
    if spec.limbs == 1:
        return trunc.astype(jnp.int32).astype(_U32)[None]
    # float32 -> 64-bit two's complement via hi/lo split
    neg = trunc < 0
    mag = jnp.abs(trunc)
    hi_f = jnp.floor(mag / np.float32(2.0**32))
    lo_f = mag - hi_f * np.float32(2.0**32)
    lo = lo_f.astype(jnp.uint32)
    hi = hi_f.astype(jnp.uint32)
    pos = jnp.stack([lo, hi])
    return jnp.where(neg[None], ring_neg(RING64, pos), pos)
