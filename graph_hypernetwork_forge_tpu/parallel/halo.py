"""Boundary-minimized halo exchange for node-partitioned message passing.

``parallel/node_partition.py`` is the dense-boundary v1: every layer
``all_gather``s the full node-embedding matrix so any remote source row is
addressable — O(N·d) interconnect bytes per device per layer regardless of
how few rows actually cross the partition boundary. This module is the v2
the v1 docstring promises: a host-side :class:`HaloPlan` enumerates, for
every (owner → consumer) device pair, exactly which embedding rows the
consumer's edges read from the owner's range, and the device-side exchange
moves ONLY those rows with one ``all_to_all`` over the mesh axis —
O(B·d) bytes where B is the per-pair boundary width.

Combined with :func:`locality_relabel` (label-propagation community
relabeling so that range partitioning keeps neighborhoods on one device),
the exchanged volume on clustered graphs drops by orders of magnitude vs
the dense gather; on an adversarial random graph it degrades gracefully
toward the all_gather volume (every row is somebody's boundary).

Padding note: ``halo_width`` (B) is the *max* boundary over all device
pairs, so one hot pair pads every pair's ``all_to_all`` block — the volume
helpers below report this padded wire volume, which upper-bounds the true
unique-row volume (fine at k=8; a bucketed per-pair layout is the pod-scale
follow-up).

Exactness: rows are copied verbatim and each dst's full in-edge set lives
on its owner (same owner-computes property as the v1), so mean aggregation
— count clamp, per-node averaged W_self, isolated-node zero, reference
semantics ``/root/reference/graph_hypernetwork_forge/models/hypergnn.py:207-228``
— is bitwise the single-device computation per node.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from graph_hypernetwork_forge_tpu.parallel.node_partition import (
    partition_edges_by_dst,
)
from graph_hypernetwork_forge_tpu.utils.initializers import resolve_precision
from graph_hypernetwork_forge_tpu.utils.shapes import round_up_to_multiple


@dataclasses.dataclass(frozen=True)
class HaloPlan:
    """Host-precomputed exchange plan for one graph + mesh size.

    All arrays are shard-major over ``num_shards`` like
    :func:`partition_edges_by_dst` output. ``src_halo`` indexes into each
    consumer's concatenated ``[local rows (npp) ++ halo buffer (k·B)]``
    matrix: local sources map to ``src - j·npp``; a source owned by device
    ``i`` at send-slot ``b`` maps to ``npp + i·B + b``.
    """

    src_halo: np.ndarray    # [k * cap] int32, remapped per-consumer indices
    src_global: np.ndarray  # [k * cap] global src ids, same partitioned layout
    dst: np.ndarray         # [k * cap] global dst ids (owner-local offsetable)
    rel_ids: np.ndarray     # [k * cap]
    edge_mask: np.ndarray   # [k * cap]
    send_idx: np.ndarray    # [k, k, B] owner-local rows device i sends to j
    nodes_per_shard: int
    halo_width: int         # B (padded max boundary rows per device pair)
    num_shards: int
    # True (unpadded) unique boundary rows per (owner i, consumer j) pair;
    # the wire moves the padded max B for every pair, so
    # B·k·(k-1) / pair_widths.sum() is the skew-induced padding factor.
    pair_widths: np.ndarray = None  # [k, k] int64

    @property
    def edge_arrays(self) -> Tuple[np.ndarray, ...]:
        return self.src_halo, self.dst, self.rel_ids, self.edge_mask


def build_halo_plan(
    src: np.ndarray,
    dst: np.ndarray,
    rel_ids: np.ndarray,
    edge_mask: np.ndarray,
    num_nodes: int,
    num_shards: int,
) -> HaloPlan:
    """Partition edges by dst owner and enumerate boundary rows per pair."""
    k = num_shards
    src_p, dst_p, rel_p, mask_p, npp = partition_edges_by_dst(
        src, dst, rel_ids, edge_mask, num_nodes, k
    )
    cap = src_p.shape[0] // k

    # Pass 1: unique remote rows each consumer j needs from each owner i.
    needed = {}
    width = 0
    pair_widths = np.zeros((k, k), dtype=np.int64)
    for j in range(k):
        sl = slice(j * cap, (j + 1) * cap)
        s = np.asarray(src_p[sl], dtype=np.int64)
        real = np.asarray(mask_p[sl]) > 0
        owner = np.minimum(s // npp, k - 1)
        for i in range(k):
            if i == j:
                continue
            rows = np.unique(s[real & (owner == i)]) - i * npp
            needed[(i, j)] = rows.astype(np.int64)
            pair_widths[i, j] = rows.size
            width = max(width, rows.size)
    b = round_up_to_multiple(max(width, 1), 8)

    # Pass 2: send tables + per-edge remapped source indices.
    send_idx = np.zeros((k, k, b), dtype=np.int32)
    src_halo = np.zeros(k * cap, dtype=np.int32)
    for j in range(k):
        sl = slice(j * cap, (j + 1) * cap)
        s = np.asarray(src_p[sl], dtype=np.int64)
        real = np.asarray(mask_p[sl]) > 0
        owner = np.minimum(s // npp, k - 1)
        out = np.zeros(cap, dtype=np.int32)
        local = real & (owner == j)
        out[local] = (s[local] - j * npp).astype(np.int32)
        for i in range(k):
            if i == j:
                continue
            rows = needed[(i, j)]
            send_idx[i, j, : rows.size] = rows
            sel = real & (owner == i)
            pos = np.searchsorted(rows, s[sel] - i * npp)
            out[sel] = (npp + i * b + pos).astype(np.int32)
        src_halo[sl] = out

    return HaloPlan(
        src_halo=src_halo,
        src_global=src_p,
        dst=dst_p,
        rel_ids=rel_p,
        edge_mask=mask_p,
        send_idx=send_idx,
        nodes_per_shard=npp,
        halo_width=b,
        num_shards=k,
        pair_widths=pair_widths,
    )


def halo_bytes_per_device(plan: HaloPlan, d: int, itemsize: int = 4) -> int:
    """Interconnect bytes each device SENDS per exchange (excl. self-block).

    This is the PADDED wire volume: every pair's block is padded to the max
    boundary B, so a skewed graph inflates it — see
    :func:`halo_padding_factor` for the skew-induced overhead and
    ``plan.pair_widths`` for the true per-pair widths.
    """
    return (plan.num_shards - 1) * plan.halo_width * d * itemsize


def halo_true_bytes_per_device(plan: HaloPlan, d: int, itemsize: int = 4) -> float:
    """Average UNPADDED bytes per device per exchange (unique boundary rows)."""
    return float(plan.pair_widths.sum()) / plan.num_shards * d * itemsize


def halo_padding_factor(plan: HaloPlan) -> float:
    """Padded / true wire volume (1.0 = no skew-induced padding waste)."""
    true = float(plan.pair_widths.sum())
    padded = float(plan.num_shards * (plan.num_shards - 1) * plan.halo_width)
    return padded / max(true, 1.0)


def allgather_bytes_per_device(plan: HaloPlan, d: int, itemsize: int = 4) -> int:
    """Bytes each device sends for the dense v1 full all_gather of h."""
    return (plan.num_shards - 1) * plan.nodes_per_shard * d * itemsize


def halo_message_passing(
    mesh: Mesh,
    h: jax.Array,
    plan_arrays: Tuple[jax.Array, ...],
    send_idx: jax.Array,
    w_msg: jax.Array,
    w_self: jax.Array,
    bias: jax.Array,
    nodes_per_shard: int,
    halo_width: int,
    *,
    axis: str = "edge",
    precision="highest",
) -> jax.Array:
    """Owner-computes message passing with an all_to_all boundary exchange.

    Drop-in for
    :func:`~graph_hypernetwork_forge_tpu.parallel.node_partition.node_partitioned_message_passing`
    given a :class:`HaloPlan`: ``h [N_pad, d]`` node-range sharded over
    ``axis``; ``plan_arrays = plan.edge_arrays`` (shard-major);
    ``send_idx = plan.send_idx`` sharded over its leading (owner) axis.
    Returns the pre-residual ``h'`` with the same sharding as ``h``.
    """
    prec = resolve_precision(precision)
    npp, b = nodes_per_shard, halo_width
    src_halo, dst, rel, mask = plan_arrays

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(axis, None),                        # h: node-range sharded
            P(axis), P(axis), P(axis), P(axis),   # edges by dst owner
            P(axis, None, None),                  # send_idx by owner
            P(), P(), P(),                        # weight banks replicated
        ),
        out_specs=P(axis, None),
        check_vma=False,
    )
    def _shard_fn(h_local, src_l, dst_l, rel_l, mask_l, send_l, wm, ws, bb):
        k = send_l.shape[1]
        my_idx = jax.lax.axis_index(axis)
        # Boundary exchange: device i's send buffer row j holds the rows
        # consumer j reads from i's range; all_to_all delivers, on device j,
        # halo[i] = owner i's rows for j. One fused collective per layer,
        # (k-1)·B·d elements on the wire instead of (k-1)·npp·d.
        send_buf = h_local[send_l[0].reshape(-1)].reshape(k, b, -1)
        halo = jax.lax.all_to_all(send_buf, axis, split_axis=0, concat_axis=0)
        full = jnp.concatenate(
            [h_local, halo.reshape(k * b, h_local.shape[1])], axis=0
        )

        # Same epilogue as the dense v1, over the compact [npp + k·B] buffer.
        hw = jnp.einsum(
            "nd,udo->uno", full, jnp.concatenate([wm, ws]), precision=prec
        )
        u = wm.shape[0]
        dst_local = dst_l - my_idx * npp
        msg = (hw[rel_l, src_l] + bb[rel_l]) * mask_l[:, None]
        selfc = hw[rel_l + u, dst_local] * mask_l[:, None]

        agg = jax.ops.segment_sum(msg, dst_local, num_segments=npp)
        selft = jax.ops.segment_sum(selfc, dst_local, num_segments=npp)
        cnt = jax.ops.segment_sum(mask_l, dst_local, num_segments=npp)
        cnt = jnp.maximum(cnt, 1.0)[:, None]
        return agg / cnt + selft / cnt

    return _shard_fn(h, src_halo, dst, rel, mask, send_idx, w_msg, w_self, bias)


def locality_relabel(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    *,
    iters: int = 10,
) -> np.ndarray:
    """Community-aware node relabeling so range partitioning cuts few edges.

    Mode-based label propagation (each node repeatedly adopts the most
    frequent label among its neighbors; ties break toward the smaller
    label), fully vectorized in numpy, followed by ordering nodes by
    ``(community label, old id)``. Returns ``perm`` with
    ``perm[old_id] = new_id``; apply with ``src' = perm[src];
    dst' = perm[dst]; feats' = feats[argsort(perm)]``. On clustered graphs
    this shrinks the halo boundary by orders of magnitude; on structureless
    graphs it is a harmless near-identity reshuffle.
    """
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    u = np.concatenate([src, dst])
    v = np.concatenate([dst, src])
    labels = np.arange(num_nodes, dtype=np.int64)

    for _ in range(max(iters, 0)):
        el = labels[v]
        # Mode of neighbor labels per node: sort (node, label) pairs, count
        # runs, keep each node's highest-count run (smallest label on ties).
        order = np.lexsort((el, u))
        uu, ll = u[order], el[order]
        new_run = np.r_[True, (uu[1:] != uu[:-1]) | (ll[1:] != ll[:-1])]
        run_u = uu[new_run]
        run_l = ll[new_run]
        counts = np.diff(np.r_[np.flatnonzero(new_run), uu.size])
        pick = np.lexsort((run_l, -counts, run_u))
        first = np.r_[True, run_u[pick][1:] != run_u[pick][:-1]]
        winners = pick[first]
        new_labels = labels.copy()
        new_labels[run_u[winners]] = run_l[winners]
        if np.array_equal(new_labels, labels):
            break
        labels = new_labels

    order = np.lexsort((np.arange(num_nodes), labels))
    perm = np.empty(num_nodes, dtype=np.int64)
    perm[order] = np.arange(num_nodes)
    return perm



# ---------------------------------------------------------------------------
# Pod-scale variant: scheduled ppermute rounds with per-round padding
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ScheduledHaloPlan:
    """Pod-shaped exchange plan: a schedule of ppermute ROUNDS, each a
    partial permutation of (owner → consumer) pairs padded only to that
    round's max boundary width.

    The dense :class:`HaloPlan` pads every pair's ``all_to_all`` block to
    the GLOBAL max boundary B and stores a ``[k, k, B]`` cube — O(k²·B)
    memory, and one hot pair (a community straddling a partition cut)
    inflates every pair's wire block (its own docstring flags this as the
    pod-scale gap). Here the k·(k-1) pairs are bin-packed
    first-fit-decreasing into rounds: each round is a matching (every
    device sends to at most one peer and receives from at most one), a
    pair only joins a round whose width is within ``slack``× its own, and
    zero-width pairs never ship at all. ``lax.ppermute`` transmits ONLY the
    listed pairs, so wire padding is bounded by ``slack`` (measured ~1.1 on
    a clustered graph with one hot pair, vs 39× for the dense cube —
    ``benchmarks/halo_skew.py``), plan memory is O(Σ_r k·B_r) ≈ O(Σ B_ij),
    and uniform graphs degrade gracefully to a ring-like schedule.

    Exactness is untouched: rows are copied verbatim, every dst's full
    in-edge set stays on its owner, so the mean-aggregation semantics
    (count clamp, averaged W_self, isolated-node zero — reference
    ``/root/reference/graph_hypernetwork_forge/models/hypergnn.py:207-228``)
    are bitwise the single-device computation.

    ``src_halo`` indexes each consumer's ``[local (npp) ++ halo (Σ B_r)]``
    buffer: a source owned by device i consumed by j lives in the block of
    the round carrying pair (i, j), at ``npp + round_offset + pos``. Rounds
    a consumer does not participate in contribute zero rows it never
    indexes (ppermute semantics), keeping the buffer shape uniform across
    devices as SPMD requires.
    """

    src_halo: np.ndarray            # [k * cap] remapped per-consumer indices
    src_global: np.ndarray          # [k * cap]
    dst: np.ndarray                 # [k * cap]
    rel_ids: np.ndarray             # [k * cap]
    edge_mask: np.ndarray           # [k * cap]
    round_perms: Tuple[Tuple[Tuple[int, int], ...], ...]  # pairs per round
    send_tables: Tuple[np.ndarray, ...]  # per round: [k, B_r] owner rows
    round_widths: Tuple[int, ...]   # (B_1, ..., B_R)
    nodes_per_shard: int
    num_shards: int
    pair_widths: np.ndarray = None  # [k, k] true unique boundary rows

    @property
    def edge_arrays(self) -> Tuple[np.ndarray, ...]:
        return self.src_halo, self.dst, self.rel_ids, self.edge_mask

    @property
    def halo_rows(self) -> int:
        return int(sum(self.round_widths))

    @property
    def num_rounds(self) -> int:
        return len(self.round_widths)


def _schedule_rounds(pair_widths: np.ndarray, slack: float = 2.0):
    """First-fit-decreasing matching schedule.

    Returns a list of rounds, each ``(pairs, width)`` with ``pairs`` a
    matching and ``width`` its max (sublane-aligned) boundary. Sorting by
    width descending bounds per-pair wire padding by ``slack`` (a pair only
    joins a round already ≤ slack× its width); ties/order are deterministic.
    """
    k = pair_widths.shape[0]
    pairs = sorted(
        ((int(pair_widths[i, j]), i, j)
         for i in range(k) for j in range(k)
         if i != j and pair_widths[i, j] > 0),
        key=lambda t: (-t[0], t[1], t[2]),
    )
    rounds = []  # [senders, receivers, pairs, width]
    for w, i, j in pairs:
        placed = False
        for r in rounds:
            if i not in r[0] and j not in r[1] and r[3] <= slack * w:
                r[0].add(i); r[1].add(j); r[2].append((i, j))
                placed = True
                break
        if not placed:
            rounds.append([{i}, {j}, [(i, j)],
                           round_up_to_multiple(max(w, 1), 8)])
    return [(tuple(r[2]), int(r[3])) for r in rounds]


def build_scheduled_halo_plan(
    src: np.ndarray,
    dst: np.ndarray,
    rel_ids: np.ndarray,
    edge_mask: np.ndarray,
    num_nodes: int,
    num_shards: int,
    *,
    slack: float = 2.0,
) -> ScheduledHaloPlan:
    """Partition by dst owner, enumerate per-pair boundaries (same pass as
    :func:`build_halo_plan`), and bin-pack the pairs into ppermute rounds."""
    k = num_shards
    src_p, dst_p, rel_p, mask_p, npp = partition_edges_by_dst(
        src, dst, rel_ids, edge_mask, num_nodes, k
    )
    cap = src_p.shape[0] // k

    needed = {}
    pair_widths = np.zeros((k, k), dtype=np.int64)
    for j in range(k):
        sl = slice(j * cap, (j + 1) * cap)
        s = np.asarray(src_p[sl], dtype=np.int64)
        real = np.asarray(mask_p[sl]) > 0
        owner = np.minimum(s // npp, k - 1)
        for i in range(k):
            if i == j:
                continue
            rows = np.unique(s[real & (owner == i)]) - i * npp
            needed[(i, j)] = rows.astype(np.int64)
            pair_widths[i, j] = rows.size

    schedule = _schedule_rounds(pair_widths, slack=slack)
    round_widths = [w for _, w in schedule]
    offsets = np.concatenate([[0], np.cumsum(round_widths)]).astype(np.int64)

    send_tables = []
    pair_round = {}
    for ri, (prs, w) in enumerate(schedule):
        tbl = np.zeros((k, w), dtype=np.int32)
        for (i, j) in prs:
            rows = needed[(i, j)]
            tbl[i, : rows.size] = rows
            pair_round[(i, j)] = ri
        send_tables.append(tbl)

    src_halo = np.zeros(k * cap, dtype=np.int32)
    for j in range(k):
        sl = slice(j * cap, (j + 1) * cap)
        s = np.asarray(src_p[sl], dtype=np.int64)
        real = np.asarray(mask_p[sl]) > 0
        owner = np.minimum(s // npp, k - 1)
        out = np.zeros(cap, dtype=np.int32)
        local = real & (owner == j)
        out[local] = (s[local] - j * npp).astype(np.int32)
        for i in range(k):
            if i == j or (i, j) not in pair_round:
                continue
            rows = needed[(i, j)]
            sel = real & (owner == i)
            pos = np.searchsorted(rows, s[sel] - i * npp)
            out[sel] = (
                npp + offsets[pair_round[(i, j)]] + pos
            ).astype(np.int32)
        src_halo[sl] = out

    return ScheduledHaloPlan(
        src_halo=src_halo,
        src_global=src_p,
        dst=dst_p,
        rel_ids=rel_p,
        edge_mask=mask_p,
        round_perms=tuple(prs for prs, _ in schedule),
        send_tables=tuple(send_tables),
        round_widths=tuple(round_widths),
        nodes_per_shard=npp,
        num_shards=k,
        pair_widths=pair_widths,
    )


def scheduled_halo_exchange(h_local, send_tables_l, round_perms, axis: str):
    """Run the ppermute schedule INSIDE a shard_map body.

    ``send_tables_l``: per-round ``[1, B_r]`` local slices of the plan's
    send tables; ``round_perms`` the static per-round pair lists. Returns
    the consumer's ``[Σ B_r, d]`` halo buffer (round-major blocks matching
    ``ScheduledHaloPlan.src_halo`` offsets; rounds this consumer is not a
    receiver in are zeros it never reads).
    """
    blocks = []
    for tbl, perm in zip(send_tables_l, round_perms):
        buf = h_local[tbl[0]]  # [B_r, d]
        blocks.append(jax.lax.ppermute(buf, axis, perm=list(perm)))
    if not blocks:
        # Fully-local partition (zero cross-shard boundary rows — exactly
        # what locality_relabel aims for): no rounds, empty halo buffer.
        return jnp.zeros((0, h_local.shape[1]), h_local.dtype)
    return jnp.concatenate(blocks, axis=0)


def scheduled_halo_message_passing(
    mesh: Mesh,
    h: jax.Array,
    plan: ScheduledHaloPlan,
    w_msg: jax.Array,
    w_self: jax.Array,
    bias: jax.Array,
    *,
    axis: str = "edge",
    precision="highest",
) -> jax.Array:
    """Owner-computes message passing over the scheduled ppermute rounds.

    Semantics identical to :func:`halo_message_passing` (and hence to the
    single-device reference epilogue); only the exchange layout differs.
    """
    prec = resolve_precision(precision)
    npp = plan.nodes_per_shard
    src_halo, dst, rel, mask = (jnp.asarray(a) for a in plan.edge_arrays)
    tables = tuple(jnp.asarray(t) for t in plan.send_tables)
    perms = plan.round_perms

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(axis, None),
            P(axis), P(axis), P(axis), P(axis),
            tuple(P(axis, None) for _ in tables),
            P(), P(), P(),
        ),
        out_specs=P(axis, None),
        check_vma=False,
    )
    def _shard_fn(h_local, src_l, dst_l, rel_l, mask_l, tables_l, wm, ws, bb):
        my_idx = jax.lax.axis_index(axis)
        halo = scheduled_halo_exchange(h_local, tables_l, perms, axis)
        full = jnp.concatenate([h_local, halo], axis=0)
        hw = jnp.einsum(
            "nd,udo->uno", full, jnp.concatenate([wm, ws]), precision=prec
        )
        u = wm.shape[0]
        dst_local = dst_l - my_idx * npp
        msg = (hw[rel_l, src_l] + bb[rel_l]) * mask_l[:, None]
        selfc = hw[rel_l + u, dst_local] * mask_l[:, None]
        agg = jax.ops.segment_sum(msg, dst_local, num_segments=npp)
        selft = jax.ops.segment_sum(selfc, dst_local, num_segments=npp)
        cnt = jax.ops.segment_sum(mask_l, dst_local, num_segments=npp)
        cnt = jnp.maximum(cnt, 1.0)[:, None]
        return agg / cnt + selft / cnt

    return _shard_fn(h, src_halo, dst, rel, mask, tables, w_msg, w_self, bias)


def scheduled_halo_wire_rows(plan: ScheduledHaloPlan) -> int:
    """Total rows actually transmitted per exchange (ppermute ships only
    listed pairs; padding counts only within a shipped block)."""
    return int(
        sum(len(prs) * w for prs, w in
            zip(plan.round_perms, plan.round_widths))
    )


def scheduled_halo_bytes_per_device(plan: ScheduledHaloPlan, d: int,
                                    itemsize: int = 4) -> float:
    """Average bytes each device sends per exchange."""
    return scheduled_halo_wire_rows(plan) / plan.num_shards * d * itemsize


def scheduled_halo_padding_factor(plan: ScheduledHaloPlan) -> float:
    """Transmitted / true unique boundary rows (→ 1.0 = tight)."""
    true = float(plan.pair_widths.sum())
    return scheduled_halo_wire_rows(plan) / max(true, 1.0)
