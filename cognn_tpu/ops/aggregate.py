"""Neighborhood-aggregation primitives (the OGA / segment-sum SpMM layer).

This module is the seam where the Pallas fast path plugs in: everything in the
engine funnels sparse aggregation through :func:`segment_sum_rows`, which
dispatches to the Pallas TPU kernel (`cognn_tpu.ops.pallas_segment`) when
enabled and to ``jax.ops.segment_sum`` otherwise.

Replaces the reference's external ``SecureAggregation::prefix_network_aggregate``
(OGA, `optimize-gcn/gcn.h:309-342`) — an oblivious grouped ADD over
destination-sorted edge slots — with a destination-sorted segment sum whose
shape is data-independent (same obliviousness-by-padding contract).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_USE_PALLAS = os.environ.get("COGNN_TPU_PALLAS", "auto")


def use_pallas() -> bool:
    if _USE_PALLAS == "1":
        return True
    if _USE_PALLAS == "0":
        return False
    return jax.default_backend() == "tpu"


def segment_sum_rows(vals: jnp.ndarray, seg_ids: jnp.ndarray,
                     num_segments: int) -> jnp.ndarray:
    """Sum rows of ``vals [E, D]`` into ``[num_segments, D]`` by ``seg_ids``.

    ``seg_ids`` must be sorted ascending (destination-major slot order, which
    the device plan guarantees); out-of-range ids are dropped.
    """
    if use_pallas():
        try:
            from cognn_tpu.ops.pallas_segment import pallas_segment_sum

            return pallas_segment_sum(vals, seg_ids, num_segments)
        except ImportError:
            pass
    return jax.ops.segment_sum(vals, seg_ids, num_segments=num_segments,
                               indices_are_sorted=True)
