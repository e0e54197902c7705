"""Fixed-point codec over the share ring.

Replaces the external ``CryptoUtil::encodeDoubleAsFixedPoint`` /
``decodeFixedPointAs*`` surface (SURVEY.md §2.3; used at ~21 sites in the
reference's gcn.h, e.g. `optimize-gcn/gcn.h:191,676-678`). Encoding matches C
semantics: ``(int64)(x * 2^f)`` — truncation toward zero — stored as a
two's-complement ring element.

The fractional bit count ``f`` is the reference's ``SCALER_BIT_LENGTH``
(an external Task-Worker constant there; a config knob here, default 16).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from cognn_tpu.core.ring import RingSpec, RING64


@dataclasses.dataclass(frozen=True)
class FixedPointSpec:
    ring: RingSpec = RING64
    frac_bits: int = 16

    @property
    def scale(self) -> int:
        return 1 << self.frac_bits


DEFAULT_FP = FixedPointSpec()


def fp_encode(x, spec: FixedPointSpec = DEFAULT_FP) -> np.ndarray:
    """double -> uint64 ring value (numpy, host side)."""
    x = np.asarray(x, dtype=np.float64)
    fixed = np.trunc(x * spec.scale).astype(np.int64)  # C cast semantics
    return fixed.astype(np.uint64) & np.uint64(spec.ring.mask)


def fp_decode(u, spec: FixedPointSpec = DEFAULT_FP) -> np.ndarray:
    """uint64 ring value -> double (numpy, host side)."""
    u = np.asarray(u, dtype=np.uint64)
    if spec.ring.bits == 64:
        signed = u.astype(np.int64)
    else:
        signed = u.astype(np.uint32).astype(np.int32)
    return signed.astype(np.float64) / spec.scale


def fp_encode_ring(x, spec: FixedPointSpec = DEFAULT_FP) -> np.ndarray:
    """double -> limb representation (L, ...) uint32 (numpy, host side)."""
    from cognn_tpu.core.ring import ring_from_u64

    return ring_from_u64(fp_encode(x, spec), spec.ring)


def fp_decode_ring(limbs, spec: FixedPointSpec = DEFAULT_FP) -> np.ndarray:
    """limb representation -> double (numpy, host side)."""
    from cognn_tpu.core.ring import ring_to_u64

    return fp_decode(ring_to_u64(limbs, spec.ring), spec)
