"""Vertex-centric graph analytics over the partitioned GAS engine.

The reference engine is "a general secret-shared vertex-centric
graph-analytics framework, not GCN-only" (SURVEY.md §0): its commented-out
kernels and surviving task payload types (`CMakeLists.txt:29-35`,
`include/task/task.h:11-32` — DECRYPT_ADD/DIV/MIN_WITH_PARENT/SWAP_CIPHER...,
plus the upstream GraphGASLite pagerank/bfs/cc/sssp apps) define the
workload family. This module provides those algorithms TPU-natively on the
same partitioned plan: per-iteration scatter along edges, segment combine
(ADD or MIN), halo exchange, gather/apply — all jitted, scalar payloads.

Algorithms: pagerank (damped), bfs (hop counts), cc (label propagation by
min), sssp (min-plus with edge weights).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cognn_tpu.engine.plan import DevicePlan

INF = jnp.float32(3.0e38)


@dataclasses.dataclass(frozen=True)
class VertexProgram:
    """GAS hooks for a scalar vertex value (reference
    `vertex_centric_algo_kernel.h:33-80` scatter/gather surface)."""

    name: str
    combine: str  # "add" | "min"
    # scatter(src_val, edge_weight, out_deg_of_src) -> slot update value
    scatter: Callable
    # apply(old_val, combined, has_update_mask, aux) -> new_val
    apply: Callable
    init: Callable  # (plan, aux) -> [P, V] initial values
    identity: float  # combine identity for dummy/padding slots


def _segment_combine(vals, seg, num, combine):
    if combine == "add":
        return jax.ops.segment_sum(vals, seg, num_segments=num,
                                   indices_are_sorted=True)
    return jax.ops.segment_min(vals, seg, num_segments=num,
                               indices_are_sorted=True)


class AnalyticsEngine:
    """Runs a VertexProgram over a DevicePlan (stacked parties)."""

    def __init__(self, plan: DevicePlan, program: VertexProgram,
                 aux: Optional[dict] = None):
        self.plan = plan
        self.program = program
        self.aux = aux or {}
        p = plan
        self._loc_src = jnp.asarray(p.loc_src)
        self._loc_seg = jnp.asarray(p.loc_seg)
        self._loc_valid = jnp.asarray(p.loc_valid)
        self._rem_src = jnp.asarray(p.rem_src)
        self._rem_seg = jnp.asarray(p.rem_seg)
        self._rem_valid = jnp.asarray(p.rem_valid)
        self._recv_target = jnp.asarray(p.recv_target)
        self._recv_mask = jnp.asarray(p.recv_mask)
        self._vertex_mask = jnp.asarray(p.vertex_mask)
        # per-slot edge weights (local + remote concatenated layouts)
        self._loc_w, self._rem_w = self._slot_weights()
        self._out_deg = jnp.asarray(self._global_out_deg())
        self._iter = jax.jit(self._iteration)

    def _slot_weights(self):
        p = self.plan
        loc_w = np.where(p.loc_valid, p.loc_weight, 0.0).astype(np.float32)
        rem_w = np.where(p.rem_valid, p.rem_weight, 0.0).astype(np.float32)
        return jnp.asarray(loc_w), jnp.asarray(rem_w)

    def _global_out_deg(self):
        """Global out-degree per local vertex from the slot structure."""
        p = self.plan
        out = np.zeros((p.num_parties, p.V), np.float32)
        for i in range(p.num_parties):
            real = p.loc_valid[i]
            np.add.at(out[i], p.loc_src[i][real], 1.0)
            rr = p.rem_valid[i]
            np.add.at(out[i], p.rem_src[i][rr], 1.0)
        return out

    # ------------------------------------------------------------------
    def _iteration(self, h):
        plan, prog = self.plan, self.program
        P, V, M = plan.num_parties, plan.V, plan.M
        ident = jnp.float32(prog.identity)

        def party_updates(h_p, od_p, src, seg, valid, w, num):
            vals = prog.scatter(h_p[src], w, od_p[src])
            vals = jnp.where(valid, vals, ident)
            return _segment_combine(vals, seg, num, prog.combine)

        loc = jax.vmap(partial(party_updates, num=V + 1))(
            h, self._out_deg, self._loc_src, self._loc_seg, self._loc_valid,
            self._loc_w)[:, :V]
        send = jax.vmap(partial(party_updates, num=P * M + 1))(
            h, self._out_deg, self._rem_src, self._rem_seg, self._rem_valid,
            self._rem_w)[:, :P * M].reshape(P, P, M)
        recv = jnp.swapaxes(send, 0, 1)  # [me, from, M]

        def scatter_one(rows, tgt, mask):
            tgt = jnp.where(mask, tgt, V)
            base = jnp.full((V + 1,), ident, h.dtype)
            rows = jnp.where(mask, rows, ident)
            if prog.combine == "add":
                return base.at[tgt].add(jnp.where(mask, rows, 0))[:V]
            return base.at[tgt].min(rows)[:V]

        rem = jax.vmap(jax.vmap(scatter_one))(
            recv, self._recv_target, self._recv_mask)  # [P, Pfrom, V]
        if prog.combine == "add":
            agg = loc + rem.sum(axis=1)
            has = agg != 0  # approximation refined by count below
        else:
            agg = jnp.minimum(loc, rem.min(axis=1))
            has = agg < ident / 2

        new = prog.apply(h, agg, has, self.aux)
        return jnp.where(self._vertex_mask, new, h)

    def run(self, iters: int, h0=None, tol: float = 0.0):
        h = jnp.asarray(self.program.init(self.plan, self.aux)
                        if h0 is None else h0, jnp.float32)
        for _ in range(iters):
            nh = self._iter(h)
            if tol > 0.0 and float(jnp.max(jnp.abs(nh - h))) <= tol:
                h = nh
                break
            h = nh
        return h


# ---------------------------------------------------------------------------
# Programs (upstream GraphGASLite app semantics)
# ---------------------------------------------------------------------------


def pagerank_program(damping: float = 0.85, num_vertices: int = 1):
    """Damped pagerank with x_u / outdeg_u contributions (the upstream
    GraphGASLite pagerank app semantics)."""
    return VertexProgram(
        name="pagerank",
        combine="add",
        scatter=lambda src_val, w, od: src_val / jnp.maximum(od, 1.0),
        apply=lambda old, agg, has, aux: (
            (1.0 - damping) / num_vertices + damping * agg),
        init=lambda plan, aux: np.full((plan.num_parties, plan.V),
                                       1.0 / num_vertices, np.float32),
        identity=0.0,
    )


def bfs_program(source_vid_flat):
    """Hop distance from a source (plan-local flat index (party, idx))."""

    def init(plan, aux):
        h = np.full((plan.num_parties, plan.V), np.float32(INF))
        p, i = source_vid_flat
        h[p, i] = 0.0
        return h

    return VertexProgram(
        name="bfs",
        combine="min",
        scatter=lambda src_val, w, out_deg: src_val + 1.0,
        apply=lambda old, agg, has, aux: jnp.minimum(old, agg),
        init=init,
        identity=float(INF),
    )


def sssp_program(source_vid_flat):
    def init(plan, aux):
        h = np.full((plan.num_parties, plan.V), np.float32(INF))
        p, i = source_vid_flat
        h[p, i] = 0.0
        return h

    return VertexProgram(
        name="sssp",
        combine="min",
        scatter=lambda src_val, w, out_deg: src_val + w,
        apply=lambda old, agg, has, aux: jnp.minimum(old, agg),
        init=init,
        identity=float(INF),
    )


def cc_program():
    """Connected components by min-label propagation (undirected input)."""

    def init(plan, aux):
        lab = np.tile(np.arange(plan.V, dtype=np.float32),
                      (plan.num_parties, 1))
        # globally unique labels: party-major
        lab = lab + np.arange(plan.num_parties)[:, None] * plan.V
        return lab.astype(np.float32)

    return VertexProgram(
        name="cc",
        combine="min",
        scatter=lambda src_val, w, out_deg: src_val,
        apply=lambda old, agg, has, aux: jnp.minimum(old, agg),
        init=init,
        identity=float(INF),
    )
