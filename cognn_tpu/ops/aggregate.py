"""Neighborhood-aggregation primitives (the OGA / segment-sum layer).

Everything in the engines funnels sparse aggregation through
:func:`segment_sum_rows` (``jax.ops.segment_sum`` over destination-sorted
slots). This replaces the reference's external
``SecureAggregation::prefix_network_aggregate`` (OGA,
`optimize-gcn/gcn.h:309-342`) — an oblivious grouped ADD over
destination-sorted edge slots — with a segment sum whose shape is
data-independent (same obliviousness-by-padding contract).

Why there is deliberately NO hand-written Pallas kernel behind this seam:
on TPU the row-wise path is bounded by per-row DMA descriptors on the
*gather* side (``h[src]``, ~15 ns/row regardless of row width — measured in
`ops/bcsr.py`), and a Pallas segment-sum could only remove the scatter side,
capping its win at ~2x while staying two orders off the HBM roofline. The
TPU-native fast path instead removes BOTH sides by turning aggregation into
MXU work: the dense flat-adjacency matmul (small graphs) and the Pallas
block-sparse SpMM (`ops/pallas_spmm.py`, large graphs). Backend selection
lives in ``GasEngine`` (``aggregation="auto"``); this function is the
general fallback that works for every shape, dtype, and mesh layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum_rows(vals: jnp.ndarray, seg_ids: jnp.ndarray,
                     num_segments: int) -> jnp.ndarray:
    """Sum rows of ``vals [E, D]`` into ``[num_segments, D]`` by ``seg_ids``.

    ``seg_ids`` must be sorted ascending (destination-major slot order, which
    the device plan guarantees); out-of-range ids are dropped.
    """
    return jax.ops.segment_sum(vals, seg_ids, num_segments=num_segments,
                               indices_are_sorted=True)
