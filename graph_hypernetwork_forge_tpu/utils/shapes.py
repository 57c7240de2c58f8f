"""Static-shape discipline helpers.

XLA traces/compiles once per distinct input shape, so all ragged host-side
quantities (edge count E, unique-relation count U, max text length L) are
padded up to bucket boundaries before entering jit. This bounds the number of
compilations while keeping padding waste small. The reference has no such
concern (eager torch, ``models/hypergnn.py:236-298``); on TPU it is the
difference between one compile and a recompile per graph.
"""

from __future__ import annotations


def round_up_to_multiple(x: int, m: int) -> int:
    """Smallest multiple of ``m`` that is >= max(x, 1)."""
    x = max(int(x), 1)
    return ((x + m - 1) // m) * m


def pad_bucket_edges(e: int) -> int:
    """Bucket an edge count: multiples of 64 below 1024, powers of two up to
    1M, multiples of 1M above (padding waste matters more than compile
    count at that scale — full-graph E is fixed per dataset anyway).
    """
    if e <= 1024:
        return round_up_to_multiple(e, 64)
    if e <= 1 << 20:
        out = 1024
        while out < e:
            out *= 2
        return out
    return round_up_to_multiple(e, 1 << 20)


def pad_bucket_relations(u: int) -> int:
    """Bucket a unique-relation count to a multiple of 8."""
    return round_up_to_multiple(u, 8)


def pad_bucket_textlen(length: int) -> int:
    """Bucket a max-text-length to a multiple of 8."""
    return round_up_to_multiple(length, 8)
