"""Secret-shared fixed-point tensor protocol — the TPU-native 2PC layer.

Replaces the reference's external SCI-SilentOT surface (SURVEY.md §2.3
"SCIHarness": ``twoPartyGCNMatMul/VectorScale/CondVectorAddition/Relu/
ForwardNNPredictionWithoutWeight/MatrixScale/ApplyGradient/BackwardNN*``) with
vectorized integer kernels over additive shares in Z_{2^64}.

Representation: a share tensor is ``uint32[2, L, *dims]`` — axis 0 is the
share index (party/delegate pair), axis 1 the 32-bit limb (L = ring_bits/32).
All LINEAR ops (add, conditional add, segment aggregation, halo shipping)
act sharewise and never reconstruct — exactly the algebra the reference's OGA
and cond-add use. Multiplicative ops (matmul by shared weights, fixed-point
scaling) reconstruct INSIDE the compiled program, compute with the exact
mod-2^64 MXU kernel (`cognn_tpu.ops.intmatmul`), truncate, and re-share with
fresh PRNG randomness — mathematically identical to the reference's
Beaver-triple 2PC results with faithful truncation. Nonlinear ops (ReLU sign,
softmax) reconstruct-and-mask, as SURVEY.md §7.3 sanctions for the TPU threat
model (obliviousness-by-padding retained; cryptographic 2-party separation
replaced by the mesh's physical co-location).

A ``truncation="probabilistic"`` mode matches the cheaper local-truncation
protocol (SecureML-style): shares are shifted locally, admitting the
well-known off-by-one / wrap error with probability ~|x|/2^(bits-f).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cognn_tpu.core.fixedpoint import FixedPointSpec
from cognn_tpu.core.ring import (
    RingSpec,
    ring_add,
    ring_arith_shift_right,
    ring_from_f32,
    ring_mul,
    ring_neg,
    ring_sub,
    ring_to_f32,
)
from cognn_tpu.ops.intmatmul import ring_matmul

_U32 = jnp.uint32


@dataclasses.dataclass
class Protocol:
    """Stateless op collection bound to a fixed-point spec."""

    fp: FixedPointSpec = dataclasses.field(default_factory=FixedPointSpec)
    truncation: str = "exact"  # "exact" | "probabilistic"
    # "small" exploits |reconstructed value| < 2^31 (true for fixed-point
    # activations at f<=16) — 24 MXU dots instead of 36; "full" is the
    # general kernel valid for any 64-bit operands.
    matmul_path: str = "small"  # "small" | "full"
    # Sign/comparison extraction mode. "reconstruct" forms x = a + b and
    # reads its sign bit (SURVEY.md §7.3's sanctioned reveal). "bitdecomp"
    # never materializes x: it derives ONLY the sign via a limb-level
    # carry circuit on the two shares (the MSB of a+b from the carry into
    # the top bit — the share-space analogue of the reference's
    # interactive 2PC comparison, `sci::twoPartyGCNRelu`,
    # `optimize-gcn/gcn.h:549`; MIN payloads `task/task.h:11-32`).
    nonlinear: str = "reconstruct"  # "reconstruct" | "bitdecomp"

    @property
    def ring(self) -> RingSpec:
        return self.fp.ring

    @property
    def f(self) -> int:
        return self.fp.frac_bits

    # -- share creation / reconstruction (device side) ------------------
    def share(self, key: jax.Array, x_f32: jnp.ndarray) -> jnp.ndarray:
        """float32 -> uint32[2, L, ...] share tensor."""
        enc = ring_from_f32(self.ring, x_f32, self.f)
        r = jax.random.bits(key, shape=enc.shape, dtype=_U32)
        return jnp.stack([r, ring_sub(self.ring, enc, r)])

    def reshare(self, key: jax.Array, ring_val: jnp.ndarray) -> jnp.ndarray:
        r = jax.random.bits(key, shape=ring_val.shape, dtype=_U32)
        return jnp.stack([r, ring_sub(self.ring, ring_val, r)])

    def reconstruct_ring(self, sh: jnp.ndarray) -> jnp.ndarray:
        return ring_add(self.ring, sh[0], sh[1])

    def reveal(self, sh: jnp.ndarray) -> jnp.ndarray:
        """-> float32 plaintext (sci::getPlainShareVecVec equivalent)."""
        return ring_to_f32(self.ring, self.reconstruct_ring(sh), self.f)

    # -- linear ops (sharewise; never reconstruct) ----------------------
    def add(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return jax.vmap(lambda x, y: ring_add(self.ring, x, y))(a, b)

    def sub(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return jax.vmap(lambda x, y: ring_sub(self.ring, x, y))(a, b)

    def zeros(self, shape) -> jnp.ndarray:
        return jnp.zeros((2, self.ring.limbs, *shape), _U32)

    def mask_mul(self, sh: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        """Multiply by a public 0/1 mask (broadcast over share/limb axes) —
        the conditional in twoPartyGCNCondVectorAddition (gcn.h:456-463)."""
        return sh * mask.astype(_U32)[None, None]

    # -- truncation -----------------------------------------------------
    def _trunc_ring(self, key: jax.Array, val: jnp.ndarray,
                    shift: int) -> jnp.ndarray:
        with jax.named_scope("trunc_reshare"):
            t = ring_arith_shift_right(self.ring, val, shift)
            return self.reshare(key, t)

    def trunc(self, key: jax.Array, sh: jnp.ndarray,
              shift: int | None = None) -> jnp.ndarray:
        shift = self.f if shift is None else shift
        if self.truncation == "probabilistic":
            s0 = ring_arith_shift_right(self.ring, sh[0], shift)
            s1 = ring_neg(self.ring, ring_arith_shift_right(
                self.ring, ring_neg(self.ring, sh[1]), shift))
            return jnp.stack([s0, s1])
        return self._trunc_ring(key, self.reconstruct_ring(sh), shift)

    # -- multiplicative ops ---------------------------------------------
    def matmul(self, key: jax.Array, a_sh: jnp.ndarray,
               b_sh: jnp.ndarray) -> jnp.ndarray:
        """Shared [N,K] @ shared [K,M] -> shared [N,M], f-bit scale
        (sci::twoPartyGCNMatMul equivalent)."""
        a = self.reconstruct_ring(a_sh)
        b = self.reconstruct_ring(b_sh)
        if self.matmul_path == "small" and self.ring.bits == 64:
            from cognn_tpu.ops.intmatmul import ring_matmul_small

            prod = ring_matmul_small(a, b)  # 2f scale
        else:
            prod = ring_matmul(a, b, bits=self.ring.bits)
        return self._trunc_ring(key, prod, self.f)

    @property
    def _small_path(self) -> bool:
        return self.matmul_path == "small" and self.ring.bits == 64

    def prep_matmul_a(self, a_sh: jnp.ndarray):
        """Precompute the A-side of :meth:`matmul` for a LOOP-INVARIANT
        shared operand (the static feature matrix x0 in the layer-0 forward
        / weight-gradient matmuls, `optimize-gcn/gcn.h:233,665`): the
        reconstruct + byte-limb decomposition runs once per engine instead
        of inside every epoch of the training scan. The returned pytree
        rides compiled programs as an argument; :meth:`matmul_prepped`
        consumes it and is bit-identical to :meth:`matmul`."""
        a = self.reconstruct_ring(a_sh)
        if self._small_path:
            from cognn_tpu.ops.intmatmul import prep_a_small

            return prep_a_small(a)
        return a  # still hoists the reconstruct for the general kernel

    def matmul_prepped(self, key: jax.Array, prep_a,
                       b_sh: jnp.ndarray) -> jnp.ndarray:
        """:meth:`matmul` with the A side precomputed by
        :meth:`prep_matmul_a` (same kernel, bit-identical shares for the
        same key)."""
        b = self.reconstruct_ring(b_sh)
        if self._small_path:
            from cognn_tpu.ops.intmatmul import ring_matmul_small_prepped

            prod = ring_matmul_small_prepped(prep_a, b)
        else:
            prod = ring_matmul(prep_a, b, bits=self.ring.bits)
        return self._trunc_ring(key, prod, self.f)

    def scale_rows(self, key: jax.Array, sh: jnp.ndarray,
                   scalars_fp: jnp.ndarray) -> jnp.ndarray:
        """Row-wise multiply by public fixed-point scalars [..., 1 broadcast]
        (sci::twoPartyGCNVectorScale equivalent; scalars_fp is uint32[L,...]
        broadcastable against the value dims)."""
        prod = jax.vmap(lambda s: ring_mul(self.ring, s, scalars_fp))(sh)
        return self.trunc(key, prod)

    def scale_const(self, key: jax.Array, sh: jnp.ndarray,
                    c: float) -> jnp.ndarray:
        """Multiply by a public float constant via its fixed-point encoding
        (sci::twoPartyGCNMatrixScale: c encoded as uint64(c * 2^f))."""
        enc = int(np.uint64(np.int64(np.trunc(c * self.fp.scale))))
        from cognn_tpu.core.ring import ring_mul_scalar

        prod = jax.vmap(lambda s: ring_mul_scalar(self.ring, s, enc))(sh)
        return self.trunc(key, prod)

    # -- nonlinear ops (reconstruct-and-mask) ---------------------------
    def sign_mask(self, sh: jnp.ndarray) -> jnp.ndarray:
        """Public 0/1 mask of (x > 0); mode per ``nonlinear``."""
        with jax.named_scope("sign_mask"):
            if self.nonlinear == "bitdecomp":
                return self._sign_mask_bitdecomp(sh)
            rec = self.reconstruct_ring(sh)
            hi = rec[-1].astype(jnp.int32)
            nonneg = hi >= 0
            nonzero = jnp.logical_or(rec[0] != 0, rec[-1] != 0) if \
                self.ring.limbs > 1 else rec[0] != 0
            return jnp.logical_and(nonneg, nonzero)

    def _sign_mask_bitdecomp(self, sh: jnp.ndarray) -> jnp.ndarray:
        """(x > 0) without materializing x = a + b: the MSB of the sum is
        msb(a) XOR msb(b) XOR carry-into-the-top-bit, and that carry is a
        limb-level carry chain over the low bits of the two shares — a
        bit-decomposition of the sum that extracts ONLY the sign. The zero
        test is a == -b, likewise share-local. Bit-identical to the
        reconstruct path (pinned by tests/test_mpc.py)."""
        a, b = sh[0], sh[1]
        L = self.ring.limbs
        top = _U32(0x7FFFFFFF)
        # carry chain through the non-top limbs of a + b
        c = None
        for l in range(L - 1):
            s1 = a[l] + b[l]
            c1 = s1 < a[l]
            if c is None:
                c, s = c1, s1
            else:
                s = s1 + c.astype(_U32)
                c = jnp.logical_or(c1, s < s1)
        # carry INTO the top bit: low 31 bits of the top limbs + carry-in
        t = (a[L - 1] & top) + (b[L - 1] & top)
        if c is not None:
            t = t + c.astype(_U32)
        c_top = t >> _U32(31)
        msb = (a[L - 1] >> _U32(31)) ^ (b[L - 1] >> _U32(31)) ^ c_top
        nonneg = msb == 0
        # x == 0  <=>  a == -b (two's complement negation, limbwise)
        nb = ring_neg(self.ring, b)
        zero = a[0] == nb[0]
        for l in range(1, L):
            zero = jnp.logical_and(zero, a[l] == nb[l])
        return jnp.logical_and(nonneg, jnp.logical_not(zero))

    def relu(self, sh: jnp.ndarray) -> jnp.ndarray:
        """x * (x > 0) — mask multiply keeps shares linear, no truncation
        (sci::twoPartyGCNRelu equivalent)."""
        return self.mask_mul(sh, self.sign_mask(sh))

    # -- comparison / MIN family ------------------------------------------
    # The reference routes analytic MIN combines through its HE payload path
    # (DECRYPT_MIN_WITH_PARENT / MIN_WITH_PARENT, `task/task.h:11-32`) whose
    # comparison is an interactive 2PC millionaires' step. Here it is the
    # same reconstruct-and-mask sign test as relu (SURVEY.md §7.3 trade).
    def less_mask(self, a_sh: jnp.ndarray, b_sh: jnp.ndarray) -> jnp.ndarray:
        """Public 0/1 mask of (a < b): sign test on b - a."""
        return self.sign_mask(self.sub(b_sh, a_sh))

    def select(self, mask: jnp.ndarray, a_sh: jnp.ndarray,
               b_sh: jnp.ndarray) -> jnp.ndarray:
        """Elementwise ``mask ? a : b`` on shares — linear: exactly one
        operand survives per element, so the u32 blend is carry-free."""
        m = mask.astype(_U32)[None, None]
        return a_sh * m + b_sh * (_U32(1) - m)

    def minimum(self, a_sh: jnp.ndarray, b_sh: jnp.ndarray) -> jnp.ndarray:
        """Shared elementwise min — the MIN combine of the analytics
        workload family (bfs/cc/sssp)."""
        return self.select(self.less_mask(a_sh, b_sh), a_sh, b_sh)

    def add_public(self, sh: jnp.ndarray, pub_ring: jnp.ndarray
                   ) -> jnp.ndarray:
        """Add a public ring value (limb-leading, broadcastable) to a share
        tensor — added to share 0 only, the standard additive-sharing form
        of a public constant."""
        s0 = ring_add(self.ring, sh[0], pub_ring)
        return jnp.concatenate([s0[None], sh[1:]], axis=0)

    def softmax_pred(self, key: jax.Array, z_sh: jnp.ndarray,
                     y_onehot: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(prob_f32, shares of p - y) — the prediction Apply
        (sci::twoPartyGCNForwardNNPredictionWithoutWeight)."""
        z = self.reveal(z_sh)
        prob = jax.nn.softmax(z, axis=-1)
        pm = prob - y_onehot.astype(prob.dtype)
        return prob, self.share(key, pm)

    # -- fixed-point encode helpers -------------------------------------
    def encode_public(self, x_f32: jnp.ndarray) -> jnp.ndarray:
        """float -> public ring fixed-point (for normalizer vectors)."""
        return ring_from_f32(self.ring, x_f32, self.f)
