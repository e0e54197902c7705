"""Communication accounting — measured (traced) and analytic.

The reference measures real per-NIC bytes around each run with psutil
(`tools/tmp_run_cluster.py:77-103`). The TPU-native equivalent of "what went
over the wire" is the set of XLA collectives in the compiled program:
:func:`traced_collective_bytes` walks the jaxpr of a sharded training
program and accounts the bytes each party sends per collective —
``all_to_all`` ships (P-1)/P of the local buffer, a ring all-reduce
(``psum``) sends 2·(P-1)/P of the reduced buffer, ``ppermute`` ships the
whole buffer, ``all_gather`` ships (P-1)/P of its output. ``lax.scan``
bodies multiply by trip count, so a whole scan-compiled training loop can
be accounted in one trace.

:func:`analytic_bytes_per_epoch` is the closed-form twin (the
reference-comparable model, cf. `tools/plot/plot_message_passing_comm.py`),
corrected for the engines' actual collective shapes: the halo exchange
ships padded mirror rows M (sparse backend) or dense update rows V
(dense/bcsr backends), and secret-shared tensors are 2 shares x L limbs of
uint32 (8L bytes/element; the share-space weight all-reduce rides 16-bit
planes in int32, 16L bytes/element). ``tests/test_comm.py`` pins
analytic == traced exactly for the sparse plaintext and mpc programs.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np

# per-party send factor per collective, as a function of axis size P:
# bytes_sent = factor(P) * buffer_bytes
_FACTORS = {
    "all_to_all": lambda P: (P - 1) / P,
    "ppermute": lambda P: 1.0,
    "psum": lambda P: 2.0 * (P - 1) / P,  # ring all-reduce
    "psum_invariant": lambda P: 2.0 * (P - 1) / P,
    "all_gather": lambda P: (P - 1) / P,
    "reduce_scatter": lambda P: (P - 1) / P,
    "all_gather_invariant": lambda P: (P - 1) / P,
}


def _buffer_bytes(eqn) -> int:
    # all_gather's wire volume is its (larger) output; everything else is
    # sized by the input operand(s)
    vars_ = (eqn.outvars if eqn.primitive.name.startswith("all_gather")
             else eqn.invars)
    total = 0
    for v in vars_:
        aval = getattr(v, "aval", None)
        if aval is not None and hasattr(aval, "shape"):
            total += int(np.prod(aval.shape, dtype=np.int64)
                         * np.dtype(aval.dtype).itemsize)
    return total


def traced_collectives(fn, *args, axis_size: int) -> Dict[str, Dict[str, float]]:
    """Per-party wire bytes AND collective round counts of one invocation
    of ``fn(*args)``.

    ``fn`` may be jitted and contain shard_map/scan/cond — the walk descends
    into every sub-jaxpr, multiplying scan bodies by their trip count. A
    "round" is one collective primitive in the compiled program: each is a
    synchronization point whose cost scales with interconnect latency (the
    TPU-native counterpart of the reference's interactive 2PC rounds, whose
    duration-vs-latency behavior Tables 1/2 of the paper measure).
    Returns {"bytes": {collective: b, ..., "total": b},
             "rounds": {collective: n, ..., "total": n}}.
    """
    jaxpr = jax.make_jaxpr(fn)(*args)
    out: Dict[str, float] = {}
    rounds: Dict[str, float] = {}

    def walk(jx, mult):
        for eqn in jx.eqns:
            name = eqn.primitive.name
            sub_mult = mult
            if name == "scan":
                sub_mult = mult * int(eqn.params.get("length", 1))
            if name in _FACTORS:
                b = _buffer_bytes(eqn) * _FACTORS[name](axis_size) * mult
                out[name] = out.get(name, 0.0) + b
                rounds[name] = rounds.get(name, 0.0) + mult
            for v in eqn.params.values():
                for item in (v if isinstance(v, (list, tuple)) else [v]):
                    if hasattr(item, "eqns"):  # open Jaxpr
                        walk(item, sub_mult)
                    elif hasattr(getattr(item, "jaxpr", None), "eqns"):
                        walk(item.jaxpr, sub_mult)  # ClosedJaxpr

    walk(jaxpr.jaxpr, 1)
    out["total"] = sum(out.values())
    rounds["total"] = sum(rounds.values())
    return {"bytes": out, "rounds": rounds}


def traced_collective_bytes(fn, *args, axis_size: int) -> Dict[str, float]:
    """Per-party bytes sent by one invocation of ``fn(*args)`` (the bytes
    half of :func:`traced_collectives`)."""
    return traced_collectives(fn, *args, axis_size=axis_size)["bytes"]


def engine_epoch_comm(engine, kind: str = "epoch"
                      ) -> Dict[str, Dict[str, float]]:
    """Traced per-party collective bytes + rounds of one training epoch (or
    forward pass, ``kind="forward"``) of a SHARDED engine (plaintext
    GasEngine or MpcGasEngine)."""
    if engine.mode != "sharded":
        raise ValueError("traced comm accounting needs a sharded engine")
    P = engine.P
    if hasattr(engine, "weights_sh"):  # MpcGasEngine
        fn = engine._epoch if kind == "epoch" else engine._forward
        return traced_collectives(
            lambda *a: fn(*a), engine._key, engine.arr,
            engine.weights_sh, engine.x0_sh, engine.n0_fp,
            engine.inv_train_fp, axis_size=P)
    fn = engine._epoch if kind == "epoch" else engine._forward
    return traced_collectives(
        lambda *a: fn(*a), engine.arr, engine.weights,
        engine.x0, engine._agg_data, axis_size=P)


def engine_epoch_bytes(engine, kind: str = "epoch") -> Dict[str, float]:
    """Bytes half of :func:`engine_epoch_comm` (compat surface)."""
    return engine_epoch_comm(engine, kind)["bytes"]


# the reference's simulated-network grid (`tools/tmp_run_cluster.py:23-29`,
# `tools/scripts/setup_network.sh:32-39`)
REFERENCE_BANDWIDTHS_MBIT = (200, 400, 1000, 4000)
REFERENCE_LATENCIES_MS = (0.15, 1.0, 10.0, 20.0)


def predict_epoch_duration(compute_s: float, bytes_per_epoch: float,
                           rounds_per_epoch: float, bandwidth_mbit: float,
                           latency_ms: float) -> float:
    """Predicted epoch duration on an interconnect with the given per-link
    bandwidth and one-way latency:

        duration = compute + wire_bytes*8/bandwidth + rounds*latency

    This is the counterpart of the reference's Tables 1/2 (epoch duration
    under the tc htb/netem grid): per-party wire bytes come from the traced
    collectives of the sharded program, and every collective primitive is
    one latency-bound synchronization round. It deliberately assumes no
    compute/comm overlap (an upper bound, matching how the netem delay
    serializes the reference's interactive 2PC rounds)."""
    return (compute_s + bytes_per_epoch * 8.0 / (bandwidth_mbit * 1e6)
            + rounds_per_epoch * latency_ms * 1e-3)


def duration_grid(compute_s: float, bytes_per_epoch: float,
                  rounds_per_epoch: float,
                  bandwidths=REFERENCE_BANDWIDTHS_MBIT,
                  latencies=REFERENCE_LATENCIES_MS):
    """{(bw_mbit, lat_ms): predicted seconds} over the reference grid."""
    return {(bw, lat): predict_epoch_duration(
        compute_s, bytes_per_epoch, rounds_per_epoch, bw, lat)
        for bw in bandwidths for lat in latencies}


def _opt_agg_dims(dims) -> list:
    """Aggregation-phase widths of one CoGNN-Opt epoch (mirrors
    GasEngine._epoch_opt's dataflow; 3L-2 GAS aggregations per epoch)."""
    L = len(dims) - 1
    out = [dims[l + 1] for l in range(L)]
    hdim = dims[L]
    g = None
    for phase in range(L, 3 * L):
        l = L - 1 - (phase - L) // 2
        first = ((phase - L) % 2 == 0)
        if phase % L != 0:
            out.append(hdim)
        if first:
            g = dims[l]
        else:
            hdim = g
    return out


def _unopt_agg_dims(dims) -> list:
    L = len(dims) - 1
    return [dims[l] for l in range(L)] + [dims[l]
                                          for l in reversed(range(1, L))]


def _variant_agg_dims(dims, variant: str, mpc: bool,
                      hoist_agg: bool | None) -> list:
    """Aggregation widths of one epoch/forward of ``variant``. The mpc
    engines hoist the unopt schedule's loop-invariant layer-0 aggregation
    agg(x0) out of the per-epoch program by default (``hoist_agg=None``
    resolves to ``mpc``), which removes its f-wide halo collective from
    every epoch; pass ``hoist_agg=False`` for the reference-faithful
    schedule (MpcGasEngine(hoist_agg=False))."""
    L = len(dims) - 1
    agg_dims = (_unopt_agg_dims(dims) if variant == "unopt"
                else _opt_agg_dims(dims))
    if variant == "opt_inference":
        agg_dims = [dims[l + 1] for l in range(L)]
    elif variant == "unopt_inference":
        # original-gcn forward aggregates in the INPUT width per layer
        agg_dims = [dims[l] for l in range(L)]
    if hoist_agg is None:
        hoist_agg = mpc
    if hoist_agg and variant.startswith("unopt"):
        agg_dims = agg_dims[1:]  # layer-0 agg(x0) precomputed at init
    return agg_dims


def analytic_bytes_per_epoch(plan, param, variant: str = "opt",
                             mpc: bool = False,
                             aggregation: str = "sparse",
                             limbs: int = 2,
                             hoist_agg: bool | None = None
                             ) -> Dict[str, float]:
    """Closed-form per-party bytes per training epoch, matching the sharded
    engines' collective shapes exactly (see module docstring)."""
    P = plan.num_parties
    if P <= 1:
        return {"all_to_all": 0.0, "psum": 0.0, "total": 0.0}
    dims = param.layer_dims
    agg_dims = _variant_agg_dims(dims, variant, mpc, hoist_agg)
    halo_rows = plan.M if aggregation == "sparse" else plan.V
    elem = 8 * limbs if mpc else 4
    a2a = float(sum((P - 1) * halo_rows * d * elem for d in agg_dims))
    w_elems = sum(dims[i] * dims[i + 1] for i in range(len(dims) - 1))
    psum_elem = 16 * limbs if mpc else 4  # share planes vs f32
    psum = (0.0 if variant.endswith("inference")
            else 2.0 * (P - 1) / P * w_elems * psum_elem)
    return {"all_to_all": a2a, "psum": psum, "total": a2a + psum}


def analytic_rounds_per_epoch(param, variant: str = "opt",
                              mpc: bool = False,
                              limbs: int = 2,
                              hoist_agg: bool | None = None
                              ) -> Dict[str, float]:
    """Closed-form collective ROUND counts per training epoch, matching the
    sharded engines' compiled programs exactly (pinned to the traced counts
    by tests/test_comm.py). Each GAS aggregation issues ONE halo
    ``all_to_all``; each per-layer weight average issues one ``pmean`` psum
    in plaintext, or 2 shares x ``limbs`` x 2 sixteen-bit-plane psums in
    share space (`mpc/engine.py::_ring_psum_shares`). ``hoist_agg`` as in
    :func:`_variant_agg_dims`."""
    dims = param.layer_dims
    L = len(dims) - 1
    n_agg = len(_variant_agg_dims(dims, variant, mpc, hoist_agg))
    if variant.endswith("inference"):
        n_psum = 0
    else:
        n_psum = L * (2 * limbs * 2 if mpc else 1)
    return {"all_to_all": float(n_agg), "psum": float(n_psum),
            "total": float(n_agg + n_psum)}
