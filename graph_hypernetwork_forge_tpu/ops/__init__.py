"""Compute ops: segment reductions, relational message passing, Pallas kernels."""

from graph_hypernetwork_forge_tpu.ops.message_passing import (
    relational_message_passing,
)
from graph_hypernetwork_forge_tpu.ops.segment import (
    segment_count,
    segment_mean_clamped,
    segment_sum,
)

__all__ = [
    "relational_message_passing",
    "segment_count",
    "segment_mean_clamped",
    "segment_sum",
]
