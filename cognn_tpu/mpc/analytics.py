"""Secret-shared graph analytics — the reference's HE analytics path, TPU-native.

The reference engine is a general secret-shared vertex-centric analytics
framework (SURVEY.md §0): its surviving task payload types
(`include/task/task.h:11-32` — DECRYPT_ADD / DECRYPT_MIN_WITH_PARENT / ...)
and commented-out kernel builds (`CMakeLists.txt:29-35` — ss-pagerank /
ss-bfs / ss-cc / ss-sssp) route scalar vertex payloads through the HE
(CipherEntry) path with ADD and MIN combines. This module provides that
capability on additive shares in Z_{2^64}:

  * ADD combine  -> carry-free exact segment sum on shares
    (`cognn_tpu.mpc.engine._segment_sum_shares`, the OGA replacement)
  * MIN combine  -> segmented doubling min: log2(max fan-in) rounds of a
    shared elementwise min (`Protocol.minimum`), whose comparison is the
    reconstruct-and-mask sign test sanctioned by SURVEY.md §7.3 — the same
    trade the GCN path's ReLU makes. Linear data movement (gather, halo
    shipping, select blends) never reconstructs.

Values are scalars per vertex in fixed point; "infinity" for MIN programs is
the exact ring value 2^20 (far above any hop count / label / path length,
far below the 2^(bits-1-f) overflow bound), so unreached vertices reveal to
exactly ``SS_INF``.

Programs mirror `cognn_tpu.engine.analytics` (pagerank / bfs / cc / sssp);
parity with the plaintext engine is the correctness contract
(`tests/test_mpc_analytics.py`).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cognn_tpu.core.fixedpoint import fp_encode_ring
from cognn_tpu.engine.plan import DevicePlan
from cognn_tpu.mpc.engine import _segment_sum_shares
from cognn_tpu.mpc.protocol import Protocol

_U32 = jnp.uint32

SS_INF = float(2.0 ** 20)  # share-space "infinity" (exact in fixed point)


def _run_rounds(seg: np.ndarray, trash: int) -> int:
    """Doubling rounds needed to cover the longest real segment run."""
    longest = 1
    for row in seg:
        real = row[row < trash]
        if real.size:
            longest = max(longest, int(np.bincount(real).max()))
    return max(0, math.ceil(math.log2(longest))) if longest > 1 else 0


def _first_slot_idx(seg: np.ndarray, num: int, pad_slot: int) -> np.ndarray:
    """[P, num] index of each segment's first slot (pad_slot if empty)."""
    P, E = seg.shape
    out = np.full((P, num), pad_slot, np.int32)
    idx = np.arange(E)
    for p in range(P):
        real = seg[p] < num
        first = np.full(num, pad_slot, np.int64)
        np.minimum.at(first, seg[p][real], idx[real])
        out[p] = first.astype(np.int32)
    return out


class _MinPlan:
    """Static data for one segmented-MIN reduction (local or remote slots)."""

    def __init__(self, seg: np.ndarray, num_segments: int, proto: Protocol,
                 identity: float):
        P, E = seg.shape
        self.num_segments = num_segments
        self.rounds = _run_rounds(seg, num_segments)
        # same-run masks per round: same[k][p, i] = seg[p, i+2^k] == seg[p, i]
        self.same = []
        for k in range(self.rounds):
            off = 1 << k
            m = np.zeros((P, E), bool)
            m[:, : E - off] = seg[:, off:] == seg[:, : E - off]
            self.same.append(jnp.asarray(m))
        self.first_idx = jnp.asarray(_first_slot_idx(seg, num_segments, E))
        L = proto.ring.limbs
        ident = fp_encode_ring(identity, proto.fp)  # [L]
        # share 0 carries the public identity; share 1 stays zero
        col = np.zeros((2, L, P, E + 1), np.uint32)
        col[0] = np.broadcast_to(ident[:, None, None], (L, P, E + 1))
        self.ident_full = jnp.asarray(col)  # [2, L, P, E+1]

    def reduce(self, proto: Protocol, sh: jnp.ndarray) -> jnp.ndarray:
        """sh [2, L, P, E] (invalid slots already identity) ->
        [2, L, P, num_segments] segment minima."""
        cur = sh
        for k in range(self.rounds):
            off = 1 << k
            cand = jnp.concatenate(
                [cur[..., off:], self.ident_full[..., :off]], axis=-1)
            take = jnp.logical_and(proto.less_mask(cand, cur), self.same[k])
            cur = proto.select(take, cand, cur)
        # append one identity slot so empty segments gather the identity
        cur = jnp.concatenate([cur, self.ident_full[..., :1]], axis=-1)
        idx = self.first_idx[None, None]  # [1, 1, P, num]
        return jnp.take_along_axis(
            cur, jnp.broadcast_to(idx, (*cur.shape[:3], idx.shape[-1])),
            axis=-1)


class SSAnalyticsEngine:
    """Runs pagerank / bfs / cc / sssp on additive shares over a DevicePlan
    (stacked parties). Vertex state: uint32[2, L, P, V]."""

    def __init__(self, plan: DevicePlan, name: str, *,
                 source: Optional[Tuple[int, int]] = None,
                 damping: float = 0.85,
                 num_vertices: Optional[int] = None,
                 proto: Optional[Protocol] = None):
        if name not in ("pagerank", "bfs", "cc", "sssp"):
            raise ValueError(f"unknown program {name!r}")
        self.plan, self.name = plan, name
        self.proto = proto or Protocol()
        self.combine = "add" if name == "pagerank" else "min"
        self.damping = damping
        self.source = source
        self.n_global = num_vertices or int(plan.num_local.sum())
        p = plan
        P, V, M = p.num_parties, p.V, p.M
        fp = self.proto.fp
        self._loc_src = jnp.asarray(p.loc_src)
        self._loc_seg = jnp.asarray(p.loc_seg)
        self._loc_valid = jnp.asarray(p.loc_valid)
        self._rem_src = jnp.asarray(p.rem_src)
        self._rem_seg = jnp.asarray(p.rem_seg)
        self._rem_valid = jnp.asarray(p.rem_valid)
        self._recv_target = jnp.asarray(p.recv_target)
        self._recv_mask = jnp.asarray(p.recv_mask)
        self._vertex_mask = jnp.asarray(p.vertex_mask)

        if self.combine == "min":
            self._loc_min = _MinPlan(p.loc_seg, V, self.proto, SS_INF)
            self._rem_min = _MinPlan(p.rem_seg, P * M, self.proto, SS_INF)
            self._ident_scalar = jnp.asarray(fp_encode_ring(SS_INF, fp))
        else:
            from cognn_tpu.mpc.engine import _check_segment_widths

            _check_segment_widths(plan)
        if name == "pagerank":
            od = self._global_out_deg()
            recip = np.where(od > 0, 1.0 / np.maximum(od, 1.0), 0.0)
            self._recip_fp = jnp.asarray(
                fp_encode_ring(recip, fp))  # [L, P, V]
            self._pr_base_fp = jnp.asarray(
                fp_encode_ring((1.0 - damping) / self.n_global, fp))
        if name == "bfs":
            self._one_fp = jnp.asarray(fp_encode_ring(1.0, fp))
        if name == "sssp":
            lw = np.where(p.loc_valid, p.loc_weight, 0.0)
            rw = np.where(p.rem_valid, p.rem_weight, 0.0)
            self._loc_w_fp = jnp.asarray(fp_encode_ring(lw, fp))
            self._rem_w_fp = jnp.asarray(fp_encode_ring(rw, fp))
        self._iter = jax.jit(self._iteration)

    def _global_out_deg(self):
        p = self.plan
        out = np.zeros((p.num_parties, p.V), np.float32)
        for i in range(p.num_parties):
            np.add.at(out[i], p.loc_src[i][p.loc_valid[i]], 1.0)
            np.add.at(out[i], p.rem_src[i][p.rem_valid[i]], 1.0)
        return out

    # ------------------------------------------------------------------
    def init_values(self) -> np.ndarray:
        """Plaintext [P, V] initial values (same as the plaintext programs,
        with SS_INF as the MIN identity)."""
        p = self.plan
        P, V = p.num_parties, p.V
        if self.name == "pagerank":
            return np.full((P, V), 1.0 / self.n_global, np.float32)
        if self.name == "cc":
            lab = np.tile(np.arange(V, dtype=np.float32), (P, 1))
            return (lab + np.arange(P)[:, None] * V).astype(np.float32)
        h = np.full((P, V), np.float32(SS_INF))
        sp, si = self.source
        h[sp, si] = 0.0
        return h

    def _mask_slots(self, vals, valid):
        """Invalid slots -> combine identity (0 for ADD, SS_INF for MIN)."""
        if self.combine == "add":
            return vals * valid.astype(_U32)[None, None]
        ident = jnp.broadcast_to(
            self._ident_scalar[:, None, None], vals.shape[1:])
        masked0 = jnp.where(valid[None], vals[0], ident)
        masked1 = jnp.where(valid[None], vals[1], jnp.zeros_like(vals[1]))
        return jnp.stack([masked0, masked1])

    def _iteration(self, key, h_sh):  # h_sh [2, L, P, V]
        proto, plan = self.proto, self.plan
        P, V, M = plan.num_parties, plan.V, plan.M

        # scatter message value at the vertex level
        if self.name == "pagerank":
            key, k = jax.random.split(key)
            msg = proto.scale_rows(k, h_sh, self._recip_fp)
        elif self.name == "bfs":
            msg = proto.add_public(h_sh, self._one_fp[:, None, None])
        else:
            msg = h_sh

        def slot_vals(src, w_fp):
            idx = jnp.broadcast_to(src[None, None],
                                   (*msg.shape[:3], src.shape[-1]))
            v = jnp.take_along_axis(msg, idx, axis=-1)  # [2, L, P, E]
            if self.name == "sssp":
                v = proto.add_public(v, w_fp)
            return v

        lv = self._mask_slots(
            slot_vals(self._loc_src,
                      getattr(self, "_loc_w_fp", None)), self._loc_valid)
        rv = self._mask_slots(
            slot_vals(self._rem_src,
                      getattr(self, "_rem_w_fp", None)), self._rem_valid)

        if self.combine == "add":
            loc_upd = jax.vmap(
                lambda v, s: _segment_sum_shares(v[..., None], s, V + 1),
                in_axes=(2, 0), out_axes=2)(lv, self._loc_seg)[:, :, :, :V, 0]
            send = jax.vmap(
                lambda v, s: _segment_sum_shares(v[..., None], s, P * M + 1),
                in_axes=(2, 0), out_axes=2)(rv, self._rem_seg)[
                    :, :, :, :P * M, 0]
        else:
            loc_upd = self._loc_min.reduce(proto, lv)
            send = self._rem_min.reduce(proto, rv)
        send = send.reshape(*send.shape[:2], P, P, M)

        # halo: recv[:, :, me, frm] = send[:, :, frm, me] (stacked transpose;
        # mirror-update shipping, ss_…h:1089-1100 — linear, sharewise)
        recv = jnp.swapaxes(send, 2, 3)

        ident_add = self.combine == "add"

        def scatter_one(rows, tgt, mask):  # rows [2, L, M]
            L = rows.shape[1]
            tgt = jnp.where(mask, tgt, V)
            if ident_add:
                base = jnp.zeros((2, L, V + 1), _U32)
                rows = rows * mask.astype(_U32)[None, None]
            else:
                base = jnp.zeros((2, L, V + 1), _U32)
                base = base.at[0].set(self._ident_scalar[:, None])
                ident = jnp.broadcast_to(self._ident_scalar[:, None],
                                         rows.shape[1:])
                rows = jnp.stack([jnp.where(mask[None], rows[0], ident),
                                  jnp.where(mask[None], rows[1], 0)])
            # mirror targets are unique per (me, from) pair -> exact set
            return base.at[:, :, tgt].set(rows)[:, :, :V]

        recv_r = jnp.moveaxis(recv, (2, 3), (0, 1))  # [P, Pfrom, 2, L, M]
        rem_upd = jax.vmap(jax.vmap(scatter_one))(
            recv_r, self._recv_target, self._recv_mask)  # [P, Pfrom, 2, L, V]

        if ident_add:
            agg = loc_upd
            for i in range(P):
                agg = proto.add(agg, jnp.moveaxis(rem_upd[:, i], 0, 2))
        else:
            agg = loc_upd
            for i in range(P):
                agg = proto.minimum(agg, jnp.moveaxis(rem_upd[:, i], 0, 2))

        # apply
        if self.name == "pagerank":
            key, k = jax.random.split(key)
            new = proto.scale_const(k, agg, self.damping)
            new = proto.add_public(new, self._pr_base_fp[:, None, None])
        else:
            new = proto.minimum(h_sh, agg)
        return proto.select(self._vertex_mask, new, h_sh)

    # ------------------------------------------------------------------
    def run(self, iters: int, seed: int = 0) -> np.ndarray:
        """Run ``iters`` sweeps; returns revealed float32 [P, V] values."""
        key = jax.random.PRNGKey(seed)
        key, k0 = jax.random.split(key)
        h = self.proto.share(k0, jnp.asarray(self.init_values()))
        for i in range(iters):
            h = self._iter(jax.random.fold_in(key, i), h)
        return np.asarray(self.proto.reveal(h))
