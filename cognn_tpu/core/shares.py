"""Additive secret sharing over Z_{2^bits}.

Replaces ``CryptoUtil::intoShares`` / ``mergeShareAsDouble`` /
``splitRandomShareFromCipherEntry`` (SURVEY.md §2.3; reference call sites
`optimize-gcn/gcn.h:70,80,96`): a value x splits into (r, x - r) with r
uniform in the ring; merge is addition mod 2^bits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cognn_tpu.core.ring import RingSpec, RING64, ring_add, ring_sub


# ---------------------------------------------------------------------------
# Device side (limb representation, jnp)
# ---------------------------------------------------------------------------


def share_split(key: jax.Array, x_limbs: jnp.ndarray, spec: RingSpec = RING64):
    """x -> (share0, share1) with share0 uniform; x must be (L, ...) limbs."""
    r = jax.random.bits(key, shape=x_limbs.shape, dtype=jnp.uint32)
    return r, ring_sub(spec, x_limbs, r)


def share_merge(spec: RingSpec, s0: jnp.ndarray, s1: jnp.ndarray) -> jnp.ndarray:
    return ring_add(spec, s0, s1)


# ---------------------------------------------------------------------------
# Host side (uint64 numpy)
# ---------------------------------------------------------------------------


def share_split_np(x_u64: np.ndarray, rng: np.random.Generator,
                   spec: RingSpec = RING64):
    x_u64 = np.asarray(x_u64, dtype=np.uint64)
    r = rng.integers(0, 1 << 64, size=x_u64.shape, dtype=np.uint64)
    if spec.bits < 64:
        r &= np.uint64(spec.mask)
    return r, (x_u64 - r) & np.uint64(spec.mask)


def share_merge_np(s0: np.ndarray, s1: np.ndarray,
                   spec: RingSpec = RING64) -> np.ndarray:
    return (np.asarray(s0, np.uint64) + np.asarray(s1, np.uint64)) & np.uint64(spec.mask)
