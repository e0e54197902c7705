"""The jitted GAS engine — TPU-native replacement for the reference's
``SSEdgeCentricAlgoKernel`` iteration machinery.

Where the reference choreographs per-peer client/server threads, semaphores,
oblivious mappers and 2PC rounds (`ss_vertex_centric_algo_kernel.h:680-1189`),
this engine compiles ONE function per epoch: the full 3L-phase (opt) / 2L-phase
(unopt) schedule is traced as straight-line dataflow — phase barriers become
data dependencies, the inter-party exchange becomes a collective, and XLA
fuses/overlaps the rest. Per-iteration semantics (including every quirk) match
`cognn_tpu.models.oracle` exactly; tests assert allclose against it.

Two communication modes share the phase code:

  * ``stacked`` — all P parties batched on the leading axis of every array in
    one program (single-chip execution; the halo exchange is a transpose).
  * ``sharded`` — the party axis is sharded over a ``jax.sharding.Mesh`` axis
    "party" via ``jax.shard_map``; the halo exchange is ``lax.all_to_all``
    over ICI and the weight average is ``lax.pmean``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cognn_tpu.config import GNNParam
from cognn_tpu.engine.plan import DevicePlan, set_split
from cognn_tpu.ops import segment_sum_rows
from cognn_tpu.utils.glibc_rand import glorot_init


def norm0(deg: jnp.ndarray) -> jnp.ndarray:
    """(deg+1)^-1/2 with the reference's zero-degree-is-zero quirk
    (`optimize-gcn/gcn.h:219-221`)."""
    return jnp.where(deg == 0, 0.0, jax.lax.rsqrt(deg + 1.0))


class _Comm:
    """Stacked-mode collectives (party axis = leading batch axis)."""

    def halo(self, send: jnp.ndarray) -> jnp.ndarray:
        # send[i, j] = party i's update rows for party j -> recv[j, i]
        return jnp.swapaxes(send, 0, 1)

    def weight_mean(self, w: jnp.ndarray) -> jnp.ndarray:
        return jnp.broadcast_to(jnp.mean(w, axis=0, keepdims=True), w.shape)


class _ShardedComm:
    """Sharded-mode collectives (inside shard_map, axis name "party")."""

    def halo(self, send: jnp.ndarray) -> jnp.ndarray:
        # local send: [1, P, M, D]; exchange over the party axis
        out = jax.lax.all_to_all(send, "party", split_axis=1, concat_axis=0)
        return jnp.swapaxes(out, 0, 1)  # [1, P, M, D] with [0, i] = from i

    def weight_mean(self, w: jnp.ndarray) -> jnp.ndarray:
        return jax.lax.pmean(w, "party")


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "vertex_mask", "in_deg", "border", "labels", "num_local", "train_n",
        "val_n", "train_mask", "val_mask", "loc_src", "loc_seg", "loc_valid",
        "rem_src", "rem_seg", "rem_valid", "recv_target", "recv_mask",
        "gather_ok_self", "gather_ok_from", "agg", "x0p",
    ],
    meta_fields=[],
)
@dataclasses.dataclass
class _PlanArrays:
    """Device-resident plan tensors (leading party axis, maybe sharded)."""

    vertex_mask: jnp.ndarray
    in_deg: jnp.ndarray
    border: jnp.ndarray
    labels: jnp.ndarray
    num_local: jnp.ndarray
    train_n: jnp.ndarray
    val_n: jnp.ndarray
    train_mask: jnp.ndarray
    val_mask: jnp.ndarray
    loc_src: jnp.ndarray
    loc_seg: jnp.ndarray
    loc_valid: jnp.ndarray
    rem_src: jnp.ndarray
    rem_seg: jnp.ndarray
    rem_valid: jnp.ndarray
    recv_target: jnp.ndarray
    recv_mask: jnp.ndarray
    gather_ok_self: jnp.ndarray  # [P, V]
    gather_ok_from: jnp.ndarray  # [P, P, V], diagonal False
    # aggregation-backend operand tensors that must ride compiled programs
    # as ARGUMENTS (closure-captured constants of this size break the
    # serialized-module transport at PubMed scale)
    agg: Dict[str, jnp.ndarray] = dataclasses.field(default_factory=dict)
    # loop-invariant layer-0 matmul operand prep (mpc engines: x0's
    # reconstruct + byte-limb decomposition hoisted out of the epoch scan;
    # party-leading leaves, same argument-not-constant rule as ``agg``)
    x0p: Dict[str, object] = dataclasses.field(default_factory=dict)


def _plan_arrays(plan: DevicePlan, dtype) -> _PlanArrays:
    P = plan.num_parties
    ok_self = np.stack([plan.gather_ok[p, p] for p in range(P)])
    ok_from = plan.gather_ok.copy()
    for p in range(P):
        ok_from[p, p] = False
    return _PlanArrays(
        vertex_mask=jnp.asarray(plan.vertex_mask),
        in_deg=jnp.asarray(plan.in_deg, dtype),
        border=jnp.asarray(plan.border),
        labels=jnp.asarray(plan.labels),
        num_local=jnp.asarray(plan.num_local),
        train_n=jnp.asarray(plan.train_n),
        val_n=jnp.asarray(plan.val_n),
        train_mask=jnp.asarray(plan.train_mask),
        val_mask=jnp.asarray(plan.val_mask),
        loc_src=jnp.asarray(plan.loc_src),
        loc_seg=jnp.asarray(plan.loc_seg),
        loc_valid=jnp.asarray(plan.loc_valid),
        rem_src=jnp.asarray(plan.rem_src),
        rem_seg=jnp.asarray(plan.rem_seg),
        rem_valid=jnp.asarray(plan.rem_valid),
        recv_target=jnp.asarray(plan.recv_target),
        recv_mask=jnp.asarray(plan.recv_mask),
        gather_ok_self=jnp.asarray(ok_self),
        gather_ok_from=jnp.asarray(ok_from),
    )


def _take_rows(h: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    return jax.vmap(lambda hp, ip: hp[ip])(h, idx)


def _party_edges(plan: DevicePlan, p: int):
    """Party p's real edge endpoints as (local src, GLOBAL flat dst)."""
    V, M = plan.V, plan.M
    real = plan.loc_valid[p]
    srcs = [plan.loc_src[p][real].astype(np.int64)]
    dsts = [p * V + plan.loc_seg[p][real].astype(np.int64)]
    rr = plan.rem_valid[p]
    seg = plan.rem_seg[p][rr].astype(np.int64)
    j = seg // M
    mir = seg % M
    tgt = plan.recv_target[j, p, mir].astype(np.int64)
    srcs.append(plan.rem_src[p][rr].astype(np.int64))
    dsts.append(j * V + tgt)
    return np.concatenate(srcs), np.concatenate(dsts)


def flat_dense_adjacency(plan: DevicePlan) -> np.ndarray:
    """[(P·V)src, (P·V)dst] edge-count matrix, built from the index plan
    (equals ``plan.dense_adj`` flattened when that was precomputed)."""
    P, V = plan.num_parties, plan.V
    if plan.dense_adj is not None:
        return plan.dense_adj.transpose(0, 2, 1, 3).reshape(P * V, P * V)
    flat = np.zeros((P * V, P * V), np.float32)
    for p in range(P):
        s, d = _party_edges(plan, p)
        np.add.at(flat, (p * V + s, d), 1.0)
    return flat


def select_backend(plan: DevicePlan, mode: str,
                   backend: Optional[str] = None,
                   param: Optional[GNNParam] = None,
                   variant: str = "opt") -> str:
    """``aggregation="auto"`` policy — pick the measured-best backend.

    Measured on one TPU v5e (tools/bench_spmm.py + GOLDEN.md): the XLA
    take+segment_sum sparse path is DMA-descriptor-bound (~0.06 Gedge/s);
    the dense flat-adjacency MXU matmul wins while (P·V)^2 fits
    ``DENSE_ADJ_BUDGET`` (Cora-scale: 462M -> 1.85B edge-iters/s going
    sparse -> dense); above that the Pallas block-sparse SpMM (bcsr) wins
    (PubMed 4p: 3.53 ms vs 10.5 ms sparse epochs; the supertiled kernel
    streams at 690 GB/s). Sharded mode on TPU picks the per-party bcsr
    SpMM (the layout MULTIHOST.md recommends; parity-pinned vs stacked by
    tests/test_engine.py) — sharded dense would need a dense=True plan and
    ships the same V-row halo for more FLOPs. On CPU the sparse path stays
    the default: no descriptor bottleneck, and it keeps golden runs
    bit-stable.

    ``backend`` overrides the platform probe (e.g. to resolve the policy
    for an intended TPU deployment while tracing on a CPU mesh). When
    ``param`` is given, bcsr is vetoed (-> sparse) if the variant's
    aggregation width makes the supertile VMEM-infeasible
    (:func:`bcsr_supertile_c` — e.g. unopt message-passing at full input
    width on PubMed-scale structures).
    """
    if backend is None:
        backend = jax.default_backend()
    if backend != "tpu":
        return "sparse"

    def bcsr_ok():
        if param is None:
            return True
        rows = -(-agg_width(param, variant) // 8) * 8
        return bcsr_supertile_c(rows) >= BCSR_MIN_C

    if mode != "stacked":
        return "bcsr" if bcsr_ok() else "sparse"
    P, V = plan.num_parties, plan.V
    from cognn_tpu.engine.plan import DENSE_ADJ_BUDGET

    if P * P * V * V <= DENSE_ADJ_BUDGET:
        return "dense"
    return "bcsr" if bcsr_ok() else "sparse"


def _build_bcsr_stacked(plan: DevicePlan, rhs_rows: int = 8):
    """Flatten all parties' real edge slots into one global (P*V)^2 BCSR
    matrix (stacked mode: the halo exchange is part of the block
    structure). Returns (agg_data dict, (n_src_blocks, n_dst_blocks)).

    The block tensors travel as *arguments* of the compiled programs, not
    as closure constants: at PubMed scale the A stream is hundreds of MB
    and constant-embedding it in the serialized HLO breaks compilation
    (the remote-compile transport rejects the module)."""
    from cognn_tpu.ops.bcsr import build_bcsr
    from cognn_tpu.ops.pallas_spmm import PallasSpmm

    P, V = plan.num_parties, plan.V
    srcs, dsts = [], []
    for p in range(P):
        s, d = _party_edges(plan, p)
        srcs.append(p * V + s)
        dsts.append(d)
    n = P * V
    m = build_bcsr(np.concatenate(srcs), np.concatenate(dsts), n, n)
    return {"bcsr_kernel": _pick_bcsr_kernel(m, rhs_rows)}, \
        (m.n_src_blocks, m.n_dst_blocks)


BCSR_TILED_NNZB = 1024  # supertile the SpMM at/above this block count
# Minimum supertile extent: C=4 supertiles MISCOMPILE on the real v5e
# (measured r5: identical programs converge at C=8 plaintext / C=16 mpc,
# silently corrupt at C=4 — loss 4.59 vs 0.05 on PubMed unopt-mpc;
# interpret mode is always correct, so the defect is below Pallas).
# Feasibility checks and the D-tile bound all floor at this extent.
BCSR_MIN_C = 8
# bytes per supertile operand (src or dst tile); 2 MiB reproduces both
# TPU-validated configs: C=128 @ 16 RHS rows, C=16 @ 256 byte-plane rows
VMEM_TILE_BUDGET = 2 << 20


def bcsr_supertile_c(rhs_rows: int) -> int:
    """Supertile extent C (in 128-blocks) for an SpMM whose RHS is
    ``rhs_rows`` rows: the largest power of two <= 128 whose f32 tile
    [rhs_rows, C*128] fits ``VMEM_TILE_BUDGET``; 0 when even C=1 cannot
    fit (the supertiled kernel is then structurally VMEM-infeasible).

    Measured (tools/bench_spmm.py, 1 GB regime, rhs_rows=16): time falls
    monotonically 16 -> 1.70 ms, 64 -> 1.63, 128 -> 1.57 (716 GB/s, 1.16x
    off the ideal roofline) as run padding shrinks, then collapses at 256
    (26 ms — tiles exceed VMEM). The formula reproduces both measured
    optima: rhs_rows=16 -> C=128; byte-plane shares rhs_rows=256 -> C=16
    (the r3 default that sustains 690 GB/s)."""
    c = VMEM_TILE_BUDGET // (max(rhs_rows, 1) * 128 * 4)
    if c < 1:
        return 0
    return min(128, 1 << (int(c).bit_length() - 1))


def bcsr_d_tile(planes_per_feature: int, width: int) -> int:
    """Feature-tile extent for a byte-plane SpMM whose full RHS
    (``planes_per_feature * width`` rows) blows the supertile VMEM budget:
    the widest D-chunk whose ``planes_per_feature * Dt`` rows still admit a
    C >= BCSR_MIN_C supertile. Chunking re-streams the A block values once per
    chunk, so the LARGEST feasible tile minimizes A traffic (the dominant
    stream for narrow chunks); the RHS/output streams are chunk-count
    invariant. Keeps wide-width (unopt / full-input-space) share
    aggregation on the MXU instead of falling back to the sparse OGA
    (original-gcn's full-width message passing, `original-gcn/
    gcn.h:243-251`)."""
    rows_max = VMEM_TILE_BUDGET // (BCSR_MIN_C * 128 * 4)
    dt = max(1, rows_max // max(planes_per_feature, 1))
    return min(dt, width)


def agg_width(param: GNNParam, variant: str) -> int:
    """Maximum feature width any GAS aggregation of ``variant`` runs at —
    hidden/label space for opt (the paper's core optimization), the full
    input width for unopt (original-gcn message-passes pre-matmul)."""
    from cognn_tpu.engine.comm_model import _opt_agg_dims, _unopt_agg_dims

    dims = param.layer_dims
    if variant == "opt_inference":
        return max(dims[l + 1] for l in range(len(dims) - 1))
    if variant == "unopt_inference":
        return max(dims[l] for l in range(len(dims) - 1))
    return max(_unopt_agg_dims(dims) if variant == "unopt"
               else _opt_agg_dims(dims))


def _pick_bcsr_kernel(m, rhs_rows: int = 8, vals_dtype=None):
    """Measured-best Pallas SpMM variant for a BCSR structure (TPU v5e,
    tools/bench_spmm.py): the one-block-per-step kernel pipelines fine on
    small streams but collapses to ~33 us/step DMA latency at GB-scale
    streams; the supertiled G=32 variant streams those at 700+ GB/s with
    supertile extent C sized to the RHS width by :func:`bcsr_supertile_c`
    (raises when the width is VMEM-infeasible — callers fall back to the
    sparse OGA). Wide RHS rows are chunked at the CALL level by the mpc
    engine (``rhs_rows`` then sizes one chunk)."""
    from cognn_tpu.ops.pallas_spmm import PallasSpmm, PallasSpmmTiled

    if m.nnzb >= BCSR_TILED_NNZB:
        c = bcsr_supertile_c(rhs_rows)
        if c < BCSR_MIN_C:
            raise ValueError(
                f"bcsr supertiles for a {rhs_rows}-row RHS do not fit VMEM "
                "at the C >= BCSR_MIN_C floor (aggregation width too large "
                "for the byte-plane/supertile layout at this scale); use "
                "aggregation='sparse'")
        kw = {} if vals_dtype is None else {"vals_dtype": vals_dtype}
        return PallasSpmmTiled(m, G=32, C=c, Cd=c, **kw)
    kw = {} if vals_dtype is None else {"vals_dtype": vals_dtype}
    return PallasSpmm(m, **kw)


def _build_bcsr_sharded(plan: DevicePlan, rhs_rows: int = 8):
    """Per-party BCSR over (local V src) x (global P*V dst), padded to a
    uniform shape so ONE shard_map program serves every party. Uses the
    same measured-best kernel policy as stacked mode: the supertiled
    variant when any party's structure reaches ``BCSR_TILED_NNZB``
    (group-padded to a uniform count; supertile extent C sized to
    ``rhs_rows`` by :func:`bcsr_supertile_c`, raising when VMEM-infeasible
    like ``_pick_bcsr_kernel``), the one-block kernel below it. Returns
    (agg_data dict of [P, ...] arrays, (n_src_blocks, n_dst_blocks) or a
    tiled-meta tuple)."""
    from cognn_tpu.ops.bcsr import BLOCK, build_bcsr
    from cognn_tpu.ops.pallas_spmm import PallasSpmm, PallasSpmmTiled

    P, V = plan.num_parties, plan.V
    ms = []
    for p in range(P):
        s, d = _party_edges(plan, p)
        ms.append(build_bcsr(s, d, V, P * V))
    n_src_blocks = ms[0].n_src_blocks
    n_dst_blocks = ms[0].n_dst_blocks

    if max(m.nnzb for m in ms) >= BCSR_TILED_NNZB:
        c = bcsr_supertile_c(rhs_rows)
        if c < BCSR_MIN_C:
            raise ValueError(
                f"bcsr supertiles for a {rhs_rows}-row RHS do not fit "
                "VMEM at the C >= BCSR_MIN_C floor; use "
                "aggregation='sparse'")
        ks = [PallasSpmmTiled(m, G=32, C=c, Cd=c, interpret=True)
              for m in ms]
        ng = max(len(np.asarray(k.first)) for k in ks)
        cols = {a: [] for a in ("first", "oi", "hi", "bil", "bjl", "vals")}
        for k in ks:
            first, oi, hi = (np.asarray(k.first), np.asarray(k.oi),
                             np.asarray(k.hi))
            bil, bjl = np.asarray(k.bil), np.asarray(k.bjl)
            vals = np.asarray(k.vals)
            pad = ng - len(first)
            # pad groups: zero A blocks aimed at this party's LAST output
            # supertile (keeps the sorted-by-oi revisit invariant; zero
            # products accumulate nothing)
            cols["first"].append(np.pad(first, (0, pad)))
            cols["oi"].append(np.pad(oi, (0, pad),
                                     constant_values=int(oi[-1])))
            cols["hi"].append(np.pad(hi, (0, pad)))
            cols["bil"].append(np.pad(bil, (0, pad * k.G)))
            cols["bjl"].append(np.pad(bjl, (0, pad * k.G)))
            cols["vals"].append(np.pad(vals,
                                       ((0, pad * k.G), (0, 0), (0, 0))))
        data = {f"bcsr_t_{a}": jnp.asarray(np.stack(v))
                for a, v in cols.items()}
        k0 = ks[0]
        meta = ("tiled", k0.G, k0.C, k0.Cd, k0.n_src_chunks,
                k0.n_dst_chunks, n_src_blocks, n_dst_blocks)
        return data, meta

    parts = []
    for m in ms:
        k = PallasSpmm(m, interpret=True)  # reuse its dst-coverage padding
        parts.append((np.asarray(k.first), np.asarray(k.bi),
                      np.asarray(k.bj), np.asarray(k.vals)))
    nnzb = max(len(f) for f, *_ in parts)
    firsts, bis, bjs, vals = [], [], [], []
    for f, bi, bj, v in parts:
        pad = nnzb - len(f)
        # zero blocks appended at the max bj keep the sorted-by-bj order and
        # the first-visit flags intact (they accumulate nothing)
        firsts.append(np.pad(f, (0, pad)))
        bis.append(np.pad(bi, (0, pad)))
        bjs.append(np.pad(bj, (0, pad), constant_values=n_dst_blocks - 1))
        vals.append(np.pad(v, ((0, pad), (0, 0), (0, 0))))
    data = {
        "bcsr_first": jnp.asarray(np.stack(firsts)),
        "bcsr_bi": jnp.asarray(np.stack(bis)),
        "bcsr_bj": jnp.asarray(np.stack(bjs)),
        "bcsr_vals": jnp.asarray(np.stack(vals)),
    }
    return data, ("base", n_src_blocks, n_dst_blocks)


class GasEngine:
    """Compiled GAS schedules over a :class:`DevicePlan`.

    ``mode``: "stacked" (default, single device) or "sharded" (party axis over
    mesh axis "party").
    ``aggregation``: "sparse" (take + segment_sum, general), "dense"
    (flat-adjacency MXU matmul; requires a plan built with dense=True), or
    "bcsr" (Pallas block-sparse SpMM kernel — the fast path, stacked mode).
    """

    def __init__(self, plan: DevicePlan, param: GNNParam,
                 variant: str = "opt", dtype=jnp.float32,
                 mode: str = "stacked", mesh: Optional[jax.sharding.Mesh] = None,
                 seed: int = 42, aggregation: str = "auto"):
        if variant not in ("opt", "opt_inference", "unopt",
                           "unopt_inference"):
            raise ValueError(variant)
        set_split(plan, param.train_ratio, param.val_ratio)
        self.plan = plan
        self.param = param
        self.variant = variant
        self.dtype = dtype
        self.mode = mode
        self.mesh = mesh
        self.L = param.num_layers
        self.epoch_layers = (3 if variant.startswith("opt") else 2) * self.L
        self.P = plan.num_parties
        self.arr = _plan_arrays(plan, dtype)
        # backend data that must be SHARDED with the party axis travels in
        # the explicit ``agg`` pytree (a closure would replicate it per
        # device under shard_map); stacked-mode backends stay closures.
        self._agg_data: Dict[str, jnp.ndarray] = {}
        if aggregation == "auto":
            aggregation = select_backend(plan, mode, param=param,
                                         variant=variant)
        if aggregation == "dense":
            if mode == "sharded":
                if plan.dense_adj is None:
                    raise ValueError(
                        "sharded dense aggregation needs a dense=True plan")
                # per-source-party blocked adjacency, sharded over axis 0;
                # the halo then ships V dense update rows per peer
                self._agg_data["adj"] = jnp.asarray(plan.dense_adj, dtype)
            else:
                # [(P V)src, (P V)dst] flat matrix for one MXU matmul;
                # derived from the index plan when no dense=True plan
                self._agg_data["flat_adj"] = jnp.asarray(
                    flat_dense_adjacency(plan), dtype)
        self._bcsr_blocks = None
        if aggregation == "bcsr":
            rhs_rows = -(-agg_width(param, variant) // 8) * 8
            if mode == "sharded":
                self._agg_data, self._bcsr_blocks = _build_bcsr_sharded(
                    plan, rhs_rows)
            else:
                data, self._bcsr_blocks = _build_bcsr_stacked(plan,
                                                              rhs_rows)
                self._agg_data.update(data)
        self.aggregation = aggregation
        self.x0 = jnp.asarray(plan.features, dtype)
        dims = param.layer_dims
        # per-party weight replicas (reference keeps one per party and
        # averages after each layer update, gcn.h:747-802)
        self.weights: List[jnp.ndarray] = [
            jnp.broadcast_to(
                jnp.asarray(glorot_init(dims[i], dims[i + 1], seed), dtype),
                (self.P, dims[i], dims[i + 1])).copy()
            for i in range(self.L)
        ]

        if mode == "sharded":
            if mesh is None:
                raise ValueError("sharded mode requires a mesh")
            self._epoch = self._build_sharded(self._epoch_body)
            self._forward = self._build_sharded(self._forward_body)
            self._place_sharded()
        else:
            self._epoch = jax.jit(functools.partial(self._epoch_body, _Comm()))
            self._forward = jax.jit(
                functools.partial(self._forward_body, _Comm()))
        self._epochs_cache: Dict[int, object] = {}

    # ------------------------------------------------------------------
    def _build_sharded(self, body):
        from jax.sharding import PartitionSpec as P

        comm = _ShardedComm()
        pspec = P("party")
        arr_specs = jax.tree.map(lambda _: pspec, self.arr)
        agg_specs = jax.tree.map(lambda _: pspec, self._agg_data)
        fn = jax.shard_map(
            functools.partial(body, comm),
            mesh=self.mesh,
            in_specs=(arr_specs, [pspec] * self.L, pspec, agg_specs),
            out_specs=(jax.tree.map(lambda _: pspec, self._out_tree(body))),
            check_vma=False,
        )
        return jax.jit(fn)

    def _place_sharded(self):
        """device_put inputs with their party shardings — required when the
        mesh spans multiple processes (each process owns its party's shard),
        and harmless single-process."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(self.mesh, P("party"))
        self.arr = jax.tree.map(lambda a: jax.device_put(a, sh), self.arr)
        self.x0 = jax.device_put(self.x0, sh)
        self.weights = [jax.device_put(w, sh) for w in self.weights]
        self._agg_data = {k: jax.device_put(v, sh)
                          for k, v in self._agg_data.items()}

    def _out_tree(self, body):
        # evaluate output structure abstractly for out_specs; inputs are
        # reduced to bare shape/dtype so placed arrays (explicit-axis mesh)
        # don't leak shardings into the stacked-_Comm trace
        comm = _Comm()
        abstract = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(jnp.shape(a), a.dtype),
            (self.arr, self.weights, self.x0, self._agg_data))
        outs = jax.eval_shape(functools.partial(body, comm), *abstract)
        return outs

    # ------------------------------------------------------------------
    # aggregation (scatter -> premerge/OGA -> halo exchange -> gather)
    # ------------------------------------------------------------------
    def _aggregate(self, comm, arr: _PlanArrays, h: jnp.ndarray,
                   dest_scale, agg_data=None) -> jnp.ndarray:
        plan = self.plan
        V, M, P = plan.V, plan.M, plan.num_parties
        D = h.shape[-1]
        agg_data = agg_data or {}

        if "bcsr_kernel" in agg_data:
            # stacked Pallas block-sparse SpMM path: gather/OGA/halo/gather
            # in one MXU kernel; dummy/mask semantics baked into the blocks.
            # The kernel is a pytree ARGUMENT (operands as HLO parameters,
            # not constants — GB-scale constants break remote compile).
            from cognn_tpu.ops.bcsr import BLOCK

            k = agg_data["bcsr_kernel"]
            n = P * V
            Dp = -(-D // 8) * 8  # f32 sublane multiple
            hf = h.reshape(n, D)
            if Dp != D:
                hf = jnp.pad(hf, ((0, 0), (0, Dp - D)))
            ht = hf.T
            if k.n_src_blocks * BLOCK != n:
                ht = jnp.pad(ht, ((0, 0), (0, k.n_src_blocks * BLOCK - n)))
            out = k(ht)
            agg = h + out[:D, :n].T.reshape(h.shape)
            agg = agg * norm0(arr.in_deg)[..., None] if dest_scale else agg
            return agg

        if "bcsr_vals" in agg_data or "bcsr_t_vals" in agg_data:
            # sharded Pallas BCSR: each party runs its own [V x P*V] SpMM
            # (one-block or supertiled kernel per the stacked-mode policy),
            # then the per-peer V-row update chunks ride the halo collective
            from cognn_tpu.ops.bcsr import BLOCK
            from cognn_tpu.ops.pallas_spmm import _spmm_call, _tiled_call

            interp = jax.default_backend() != "tpu"
            Dp = -(-D // 8) * 8
            Pl = h.shape[0]

            if self._bcsr_blocks[0] == "tiled":
                (_, G, C, Cd, nsc, ndc, nsb, ndb) = self._bcsr_blocks

                def one(i):
                    ht = h[i].T  # [D, V]
                    ht = jnp.pad(ht,
                                 ((0, Dp - D), (0, nsc * C * BLOCK - V)))
                    ht3 = ht.reshape(Dp, -1, BLOCK).swapaxes(0, 1)
                    out3 = _tiled_call(agg_data["bcsr_t_first"][i],
                                       agg_data["bcsr_t_oi"][i],
                                       agg_data["bcsr_t_hi"][i],
                                       agg_data["bcsr_t_bil"][i],
                                       agg_data["bcsr_t_bjl"][i], ht3,
                                       agg_data["bcsr_t_vals"][i],
                                       G, C, Cd, ndc, True, interp)
                    out = out3.swapaxes(0, 1).reshape(Dp, -1)
                    return out[:D, :P * V].T  # [P*V, D]
            else:
                _, nsb, ndb = self._bcsr_blocks

                def one(i):
                    ht = h[i].T  # [D, V]
                    ht = jnp.pad(ht, ((0, Dp - D), (0, nsb * BLOCK - V)))
                    out = _spmm_call(agg_data["bcsr_first"][i],
                                     agg_data["bcsr_bi"][i],
                                     agg_data["bcsr_bj"][i], ht,
                                     agg_data["bcsr_vals"][i], ndb, interp)
                    return out[:D, :P * V].T  # [P*V, D]

            send = jnp.stack([one(i) for i in range(Pl)])  # [Pl, P*V, D]
            send = send.reshape(Pl, P, V, D)
            recv = comm.halo(send)  # [Pl, P, V, D]
            agg = h + recv.sum(axis=1)
            agg = agg * norm0(arr.in_deg)[..., None] if dest_scale else agg
            return agg

        if "adj" in agg_data:
            # sharded dense: per-source-party blocked adjacency
            # [Pl, P, V, V]; one MXU matmul produces every peer's V dense
            # update rows, which then ride the halo collective
            send = jnp.einsum("pjvw,pvd->pjwd", agg_data["adj"], h)
            recv = comm.halo(send)  # [Pl, P, V, D]
            agg = h + recv.sum(axis=1)
            agg = agg * norm0(arr.in_deg)[..., None] if dest_scale else agg
            return agg

        if "flat_adj" in agg_data:
            # Dense adjacency path: the whole scatter/premerge/halo/gather
            # pipeline is ONE flat MXU matmul U = A^T H over the globally
            # flattened (party, vertex) axis. Dummy/mask semantics are baked
            # into A (only real slots set).
            hf = h.reshape(-1, D)  # [P*V, D]
            upd = jax.lax.dot_general(
                agg_data["flat_adj"], hf, (((0,), (0,)), ((), ())),
                preferred_element_type=h.dtype)  # A^T @ H
            agg = h + upd.reshape(h.shape)
            agg = agg * norm0(arr.in_deg)[..., None] if dest_scale else agg
            return agg

        # remote slots FIRST: segment-sum into per-destination-party mirror
        # rows and issue the halo exchange, so the collective is in flight
        # while the local aggregation below computes (the overlap the
        # reference achieves with its semaphore dance, ss_…h:838-841;
        # here XLA's scheduler hides the ICI latency behind independent work)
        rvals = _take_rows(h, arr.rem_src)
        rvals = jnp.where(arr.rem_valid[..., None], rvals, 0)
        send = jax.vmap(
            lambda v, s: segment_sum_rows(v, s, P * M + 1))(rvals, arr.rem_seg
                                                            )[:, :P * M]
        send = send.reshape(-1, P, M, D)
        # halo exchange over ICI (the reference's mirror-update shipping,
        # ss_…h:1089-1100)
        recv = comm.halo(send)  # [Pl, P, M, D]; [:, i] = rows from party i

        # local slots (overlaps the collective): gather rows, mask dummies,
        # segment-sum by local destination
        lvals = _take_rows(h, arr.loc_src)
        lvals = jnp.where(arr.loc_valid[..., None], lvals, 0)
        loc_upd = jax.vmap(
            lambda v, s: segment_sum_rows(v, s, V + 1))(lvals, arr.loc_seg
                                                        )[:, :V]

        # scatter received mirror rows into local vertex order
        def scatter_one(rows, tgt, mask):
            tgt = jnp.where(mask, tgt, V)
            return jnp.zeros((V + 1, D), h.dtype).at[tgt].add(
                jnp.where(mask[:, None], rows, 0))[:V]

        rem_upd = jax.vmap(jax.vmap(scatter_one))(
            recv, arr.recv_target, arr.recv_mask)  # [Pl, P, V, D]

        # gather: base vertex value + masked per-peer updates
        # (twoPartyGCNCondVectorAddition, gcn.h:456-463)
        agg = h + jnp.where(arr.gather_ok_self[..., None], loc_upd, 0)
        agg = agg + jnp.sum(
            jnp.where(arr.gather_ok_from[..., None], rem_upd, 0), axis=1)

        # deferred destination-side scale (gcn.h:470-484)
        agg = jnp.where(dest_scale, agg * norm0(arr.in_deg)[..., None], agg)
        return agg

    # ------------------------------------------------------------------
    def _metrics(self, arr: _PlanArrays, prob: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        valid = arr.vertex_mask
        train = arr.train_mask
        test = valid & ~arr.train_mask & ~arr.val_mask
        border = arr.border

        y_hot = jax.nn.one_hot(arr.labels, prob.shape[-1], dtype=prob.dtype)
        clamped = jnp.where(prob == 0.0, 0.001, prob)
        loss_rows = -jnp.sum(y_hot * jnp.log(clamped), axis=-1)
        loss = jnp.sum(jnp.where(valid, loss_rows, 0), -1) / arr.num_local

        hit = (jnp.argmax(prob, -1) == arr.labels)

        def acc(mask):
            n = jnp.sum(mask, -1)
            return jnp.where(n > 0, jnp.sum(hit & mask, -1) / jnp.maximum(n, 1), 0.0)

        return {
            "loss": loss,
            "full_acc": acc(valid),
            "train_acc": acc(train),
            "border_train_acc": acc(train & border),
            "test_acc": acc(test),
            "border_test_acc": acc(test & border),
            "num_border": jnp.sum(valid & border, -1),
        }

    # ------------------------------------------------------------------
    def _predict_apply(self, arr, h):
        """Prediction-layer Apply: softmax, metrics, masked p - y
        (gcn.h:557-643)."""
        prob = jax.nn.softmax(h, axis=-1)
        metrics = self._metrics(arr, prob)
        y_hot = jax.nn.one_hot(arr.labels, h.shape[-1], dtype=h.dtype)
        pm = prob - y_hot
        pm = jnp.where(arr.train_mask[..., None], pm, 0)
        return pm, metrics

    # ------------------------------------------------------------------
    def _forward_body(self, comm, arr: _PlanArrays, weights, x0, agg=None):
        """Inference: L forward phases; returns (logits, prob, metrics).
        ``unopt_inference`` = the original-gcn forward schedule run with
        maxIters=2 (reference `tmp_run_cluster.py:417-435`): aggregation
        in the full input width before the matmul."""
        h = x0
        n0 = norm0(arr.in_deg)[..., None]
        for l in range(self.L):
            if self.variant.startswith("unopt"):
                if l != 0:
                    h = h * n0
                h = self._aggregate(comm, arr, h, dest_scale=True,
                                    agg_data=agg)
                z = jnp.einsum("pvd,pde->pve", h, weights[l])
            else:
                h = jnp.einsum("pvd,pde->pve", h, weights[l])
                if l != 0:
                    h = h * n0
                z = self._aggregate(comm, arr, h, dest_scale=True,
                                    agg_data=agg)
            h = jax.nn.relu(z) if l != self.L - 1 else z
        prob = jax.nn.softmax(h, axis=-1)
        return h, prob, self._metrics(arr, prob)

    # ------------------------------------------------------------------
    def _epoch_body(self, comm, arr: _PlanArrays, weights, x0, agg=None):
        """One full training epoch (3L or 2L phases) as straight-line code."""
        if self.variant.startswith("unopt"):
            return self._epoch_unopt(comm, arr, weights, x0, agg)
        return self._epoch_opt(comm, arr, weights, x0, agg)

    def _epoch_opt(self, comm, arr, weights, x0, agg=None):
        L = self.L
        lr = self.dtype(self.param.learning_rate)
        n0 = norm0(arr.in_deg)[..., None]
        inv_train = (1.0 / arr.train_n.astype(self.dtype))[:, None, None]
        weights = list(weights)
        h = x0
        h_in: List[jnp.ndarray] = [None] * L
        z: List[jnp.ndarray] = [None] * L
        metrics = None

        # forward phases 0..L-1 (PreScatter matmul + deferred scaling)
        for l in range(L):
            h_in[l] = h
            h = jnp.einsum("pvd,pde->pve", h, weights[l])
            if l != 0:
                h = h * n0  # source-side scale skipped on phase 0
            h = self._aggregate(comm, arr, h, dest_scale=True, agg_data=agg)
            z[l] = h
            if l != L - 1:
                h = jax.nn.relu(h)
            else:
                h, metrics = self._predict_apply(arr, h)

        # backward phases L..3L-1, per-iteration as the reference runs them:
        # GAS aggregation on every phase EXCEPT phase % L == 0 (Apply-only,
        # ss_…h:709-732); Apply alternates first/second-of-two per layer.
        # For L=2 first-of-two always lands on the Apply-only phase; for
        # general L the aggregation precedes first-of-two on middle layers.
        g = None
        for phase in range(L, 3 * L):
            l = L - 1 - (phase - L) // 2
            first = ((phase - L) % 2 == 0)
            if phase % L != 0:
                hs = h * n0  # PreScatter backward scale (gcn.h:243-254)
                agg_scale = (phase + 1) != 3 * L  # epoch-boundary skip
                h = self._aggregate(comm, arr, hs, dest_scale=agg_scale,
                                    agg_data=agg)
            if first:
                if l != L - 1:
                    h = h * (z[l] > 0)  # BackwardNNWithoutAH relu' mask
                g = jnp.einsum("pve,pde->pvd", h, weights[l])  # delta @ W^T
            else:
                d = jnp.einsum("pvd,pve->pde", h_in[l], h) * inv_train
                weights[l] = weights[l] - lr * d
                weights[l] = comm.weight_mean(weights[l])
                h = g
        return weights, metrics

    def _epochs_body(self, comm, n, arr, weights, x0, agg=None):
        """``n`` epochs as ONE compiled ``lax.scan`` — the entire training
        loop is a single device program, so per-epoch dispatch overhead
        (which dominates at Planetoid scale: ~0.9 ms/epoch of launch latency
        vs ~0.1 ms of device work) amortizes to zero. The scan body is the
        same traced epoch as :meth:`run_epoch`; metrics come back stacked
        per epoch with the party axis leading ([P, n])."""
        def step(ws, _):
            ws, metrics = self._epoch_body(comm, arr, ws, x0, agg)
            return ws, metrics

        weights, metrics = jax.lax.scan(step, list(weights), None, length=n)
        metrics = jax.tree.map(lambda m: jnp.moveaxis(m, 0, 1), metrics)
        return weights, metrics

    def _epoch_unopt(self, comm, arr, weights, x0, agg=None):
        L = self.L
        lr = self.dtype(self.param.learning_rate)
        n0 = norm0(arr.in_deg)[..., None]
        inv_train = (1.0 / arr.train_n.astype(self.dtype))[:, None, None]
        weights = list(weights)
        h = x0
        ah: List[jnp.ndarray] = [None] * L
        z: List[jnp.ndarray] = [None] * L
        metrics = None

        for l in range(L):
            if l != 0:
                h = h * n0
            h = self._aggregate(comm, arr, h, dest_scale=True, agg_data=agg)
            ah[l] = h
            zz = jnp.einsum("pvd,pde->pve", h, weights[l])
            z[l] = zz
            if l != L - 1:
                h = jax.nn.relu(zz)
            else:
                h, metrics = self._predict_apply(arr, zz)

        for k, l in enumerate(reversed(range(L))):
            phase = L + k
            if l != L - 1:
                # aggregated g arrives through the GAS phase below
                h = h * (z[l] > 0)
            g = jnp.einsum("pve,pde->pvd", h, weights[l])
            d = jnp.einsum("pvd,pve->pde", ah[l], h) * inv_train
            weights[l] = weights[l] - lr * d
            weights[l] = comm.weight_mean(weights[l])
            h = g
            if l > 0:  # GAS aggregation between backward layers
                h = h * n0
                last_phase = (phase + 2) == 2 * L
                h = self._aggregate(comm, arr, h,
                                    dest_scale=not last_phase, agg_data=agg)
        return weights, metrics

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------
    def run_epoch(self):
        self.weights, metrics = self._epoch(self.arr, self.weights, self.x0,
                                            self._agg_data)
        return metrics

    def run_epochs(self, n: int):
        metrics = None
        for _ in range(n):
            metrics = self.run_epoch()
        return metrics

    def run_epochs_scan(self, n: int):
        """Run ``n`` epochs in one compiled program (lax.scan over the epoch
        body). Returns per-epoch metrics, each entry shaped [P, n]. One
        compile per distinct ``n`` (cached)."""
        fn = self._epochs_cache.get(n)
        if fn is None:
            if self.mode == "sharded":
                def body(comm, arr, weights, x0, agg):
                    return self._epochs_body(comm, n, arr, weights, x0, agg)
                fn = self._build_sharded(body)
            else:
                fn = jax.jit(
                    functools.partial(self._epochs_body, _Comm(), n))
            while len(self._epochs_cache) >= 8:  # bound: drop oldest n
                self._epochs_cache.pop(next(iter(self._epochs_cache)))
            self._epochs_cache[n] = fn
        self.weights, metrics = fn(self.arr, self.weights, self.x0,
                                   self._agg_data)
        return metrics

    @staticmethod
    def metrics_host(metrics) -> Dict[str, np.ndarray]:
        """Fetch a metrics dict to host numpy (sharded arrays included)."""
        return {k: np.asarray(jax.device_get(v)) for k, v in metrics.items()}

    @staticmethod
    def metrics_local(metrics) -> Dict[str, np.ndarray]:
        """Multi-process: this process's party shard of each metric
        (global device_get would touch non-addressable shards)."""
        out = {}
        for k, v in metrics.items():
            shards = getattr(v, "addressable_shards", None)
            if shards:
                out[k] = np.asarray(shards[0].data)
            else:
                out[k] = np.asarray(v)
        return out

    def forward(self):
        return self._forward(self.arr, self.weights, self.x0,
                             self._agg_data)
