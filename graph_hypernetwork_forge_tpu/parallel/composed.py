"""Composed multi-device training: relation sharding + node-partitioned
message passing + gradient reduction in ONE SPMD program.

This is the end-to-end distributed train step (fwd + bwd + Adam) the
single-op modules build toward (SURVEY.md §7.2.5-6):

- **nodes** are range-sharded over the mesh axis; each device owns the
  aggregation (and the residual/ReLU/LayerNorm epilogue) for its node rows;
- **edges** are pre-partitioned by dst ownership
  (:func:`~graph_hypernetwork_forge_tpu.parallel.node_partition.partition_edges_by_dst`),
  so segment sums never cross devices;
- **relations** (the hypernetwork's expert axis) are sharded over the same
  axis: each device tokenizes/encodes U/k relation texts and generates its
  slice of every layer's ``[U, d, d]`` weight banks, assembled with one
  tiled ``all_gather`` per layer (``parallel/relation_sharding.py``
  semantics, inlined here so the whole step is one program);
- the **halo** (default) is the boundary-minimized exchange from
  ``parallel/halo.py``: each layer moves only the B boundary rows per
  device pair with one ``all_to_all``, and every per-device tensor op runs
  over ``npp + k·B`` local+halo rows — per-layer compute AND communication
  divide by the mesh size. The dense-boundary v1 (one tiled ``all_gather``
  of the full node embeddings per layer, replicated relation product) is
  kept as the ``halo=False`` fallback and exactness oracle;
- the **loss** is the reference margin-ranking objective over the local
  edge shard, reduced with ``psum``; in halo mode scoring is fully local
  too (``neg_mode="local_roll"``: one more B-row boundary exchange for the
  positive heads, per-shard rotated tails as negatives) so nothing O(N)
  crosses the wire per step; gradients of the replicated parameters
  emerge from the ``shard_map`` transpose (collectives transpose to
  collectives), and the optimizer update runs replicated.

Exactness: every piece is a reshard of the single-device computation — the
step's loss and updated parameters match ``training/train.py``'s
``make_train_step`` to float tolerance on any mesh size (tested on a
virtual 8-device CPU mesh, ``tests/test_composed.py``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from graph_hypernetwork_forge_tpu.data.encoding import EncodedGraph
from graph_hypernetwork_forge_tpu.models.hypergnn import HyperGNNConfig
from graph_hypernetwork_forge_tpu.models.text_encoder import apply_text_encoder
from graph_hypernetwork_forge_tpu.models.weight_generator import (
    apply_weight_generator,
)
from graph_hypernetwork_forge_tpu.parallel.node_partition import (
    partition_edges_by_dst,
)
from graph_hypernetwork_forge_tpu.utils.initializers import (
    layer_norm_apply,
    linear_apply,
    resolve_precision,
)
from graph_hypernetwork_forge_tpu.utils.shapes import round_up_to_multiple


@dataclasses.dataclass(frozen=True)
class ComposedInputs:
    """Device-ready shard-major arrays for the composed step."""

    feats: np.ndarray       # [N_pad, F] node-range shardable
    src: np.ndarray         # [k * cap] shard-major edges (dst-owned), GLOBAL ids
    dst: np.ndarray
    rel_ids: np.ndarray
    edge_mask: np.ndarray
    char_ids: np.ndarray    # [U_pad, L], U_pad divisible by k
    lengths: np.ndarray
    nodes_per_shard: int
    num_nodes: int          # true N (un-padded)
    # Boundary-minimized halo exchange (parallel/halo.py); None = dense v1
    # full-h all_gather per layer.
    src_halo: Optional[np.ndarray] = None   # [k * cap] local++halo indices
    send_idx: Optional[np.ndarray] = None   # [k, k, B]
    halo_width: int = 0
    # Pod-scale scheduled-ppermute exchange (ScheduledHaloPlan): per-round
    # [k, B_r] send tables + the static round pair lists; src_halo then
    # indexes [local ++ Σ B_r round blocks].
    sched_send_tables: Optional[Tuple[np.ndarray, ...]] = None
    sched_round_perms: Optional[Tuple[Tuple[Tuple[int, int], ...], ...]] = None
    # Per-shard ragged group sizes [k, U_pad] when each shard's edge slice
    # is relation-sorted (``rel_sort_local=True``) — enables the grouped
    # (ragged_dot) contribution backend in the composed step.
    rel_group_sizes: Optional[np.ndarray] = None
    # Per-shard sort-free aggregation plan (the composed analogue of
    # ``SortPlan``): XLA lowers every unsorted in-shard segment-sum on TPU
    # to a device key sort per layer; with these host-precomputed arrays
    # the step reduces via bijective permute + sorted-hint segment-sum
    # (CSR Pallas kernel at d % 128 == 0 on TPU) and skips the per-layer
    # count scatter entirely (degrees are static). Shard-major layouts so
    # ``P(axis)`` slices each device's block.
    agg_dst_perm: Optional[np.ndarray] = None    # [k*cap] local row perm
    agg_inv_perm: Optional[np.ndarray] = None    # [k*cap]
    agg_dst_sorted: Optional[np.ndarray] = None  # [k*cap] local dst, sorted
    agg_dst_splits: Optional[np.ndarray] = None  # [k, npp+1] CSR bounds
    agg_in_degree: Optional[np.ndarray] = None   # [k, npp] masked degrees
    # Per-shard FULL SortPlan extension (``group_pad > 0``): the arrays
    # that, with the agg plan above, reconstruct a single-device
    # :class:`~graph_hypernetwork_forge_tpu.data.encoding.SortPlan` inside
    # each shard — letting the composed step run the SAME Pallas kernel
    # backends (``contrib="pallas"/"pallas_packed"``) as the single-chip
    # path. ``src`` domains are the per-shard [local ++ halo] row tables.
    kernel_src_perm: Optional[np.ndarray] = None     # [k*cap]
    kernel_inv_src_perm: Optional[np.ndarray] = None # [k*cap]
    kernel_src_sorted: Optional[np.ndarray] = None   # [k*cap]
    kernel_src_splits: Optional[np.ndarray] = None   # [k, rows+1]
    kernel_dst_splits: Optional[np.ndarray] = None   # [k, rows+1] (ext)
    kernel_rel_splits: Optional[np.ndarray] = None   # [k, U_pad+1]
    kernel_rel_counts: Optional[np.ndarray] = None   # [k, U_pad]

    @property
    def agg_plan(self):
        """The 5-tuple the step's ``agg_plan=`` kwarg expects (or None)."""
        if self.agg_dst_perm is None:
            return None
        return (
            self.agg_dst_perm, self.agg_inv_perm, self.agg_dst_sorted,
            self.agg_dst_splits, self.agg_in_degree,
        )

    @property
    def kernel_plan(self):
        """The 7-tuple the step's ``kernel_plan=`` kwarg expects (or None)."""
        if self.kernel_src_perm is None:
            return None
        return (
            self.kernel_src_perm, self.kernel_inv_src_perm,
            self.kernel_src_sorted, self.kernel_src_splits,
            self.kernel_dst_splits, self.kernel_rel_splits,
            self.kernel_rel_counts,
        )


def prepare_composed_inputs(
    graph: EncodedGraph, node_features, num_shards: int, *, halo: bool = True,
    rel_sort_local: bool = False, scheduled: bool = False, group_pad: int = 0,
) -> ComposedInputs:
    """Partition a graph + features for :func:`make_composed_train_step`.

    ``halo=True`` (the default) additionally builds a
    :class:`~graph_hypernetwork_forge_tpu.parallel.halo.HaloPlan`
    so the per-layer exchange moves only boundary rows (one ``all_to_all``
    of ``B`` rows per device pair) and — crucially — each device's dense
    relation product runs over its ``npp + k·B`` local+halo rows instead of
    the full gathered ``[N_pad, d]``: the per-layer compute actually
    divides by the mesh size. ``halo=False`` keeps the dense-boundary v1
    (full-``h`` all_gather per layer, replicated relation product).

    ``rel_sort_local=True`` additionally stable-sorts each shard's edge
    slice by relation id and precomputes per-shard ragged group sizes
    (``rel_group_sizes [k, U_pad]``) — the layout the composed step's
    ``contrib="grouped"`` backend needs. Aggregation is edge-order
    invariant within a shard, so all other plan arrays stay valid.
    """
    feats = np.asarray(node_features, dtype=np.float32)
    if scheduled and not halo:
        raise ValueError(
            "scheduled=True requires halo=True: the scheduled ppermute "
            "rounds are a halo-exchange layout, not a standalone mode"
        )
    n = graph.num_nodes
    src_halo = send_idx = None
    halo_width = 0
    sched_tables = sched_perms = None
    if halo and scheduled:
        # Pod-scale variant: bin-packed ppermute rounds with slack-bounded
        # padding (parallel/halo.py ScheduledHaloPlan). Same partitioning,
        # same exactness; only the exchange layout differs.
        from graph_hypernetwork_forge_tpu.parallel.halo import (
            build_scheduled_halo_plan,
        )

        plan = build_scheduled_halo_plan(
            graph.src, graph.dst, graph.rel_ids, graph.edge_mask, n, num_shards
        )
        _, dst, rel, mask = plan.edge_arrays
        src = plan.src_global
        npp = plan.nodes_per_shard
        src_halo = plan.src_halo
        sched_tables = plan.send_tables
        sched_perms = plan.round_perms
        halo_width = plan.halo_rows  # total concat halo rows per consumer
    elif halo:
        from graph_hypernetwork_forge_tpu.parallel.halo import build_halo_plan

        plan = build_halo_plan(
            graph.src, graph.dst, graph.rel_ids, graph.edge_mask, n, num_shards
        )
        # build_halo_plan partitions once; its edge arrays (including the
        # partitioned global src it carries) ARE the partitioned arrays.
        _, dst, rel, mask = plan.edge_arrays
        src = plan.src_global
        npp = plan.nodes_per_shard
        src_halo = plan.src_halo
        send_idx = plan.send_idx
        halo_width = plan.halo_width
    else:
        src, dst, rel, mask, npp = partition_edges_by_dst(
            graph.src, graph.dst, graph.rel_ids, graph.edge_mask, n, num_shards
        )
    n_pad = npp * num_shards
    if n_pad > feats.shape[0]:
        feats = np.pad(feats, ((0, n_pad - feats.shape[0]), (0, 0)))

    u_pad = round_up_to_multiple(graph.char_ids.shape[0], num_shards)
    char_ids = np.zeros((u_pad, graph.char_ids.shape[1]), dtype=np.int32)
    lengths = np.ones(u_pad, dtype=np.int32)
    char_ids[: graph.char_ids.shape[0]] = graph.char_ids
    lengths[: graph.text_lengths.shape[0]] = graph.text_lengths

    rel_group_sizes = None
    if rel_sort_local:
        # Stable-sort each shard's slice by relation id (padded rows carry
        # rel 0 / mask 0 and sort into group 0 — their ragged rows compute
        # masked garbage, exactly like the single-device grouped backend).
        cap = src.shape[0] // num_shards
        src = np.array(src)
        dst = np.array(dst)
        rel = np.array(rel)
        mask = np.array(mask)
        sh = None if src_halo is None else np.array(src_halo)
        rel_group_sizes = np.zeros((num_shards, u_pad), dtype=np.int32)
        for j in range(num_shards):
            sl = slice(j * cap, (j + 1) * cap)
            order = np.argsort(rel[sl], kind="stable")
            for arr in (src, dst, rel, mask) + (() if sh is None else (sh,)):
                arr[sl] = arr[sl][order]
            rel_group_sizes[j] = np.bincount(rel[sl], minlength=u_pad)
        src_halo = sh

    kernel_stacks = None
    if group_pad:
        # Group-padded per-shard re-layout + FULL per-shard SortPlans: the
        # layout contract of the single-chip Pallas kernel backends
        # (single-relation GROUP_PAD tiles, host-precomputed CSR splits),
        # rebuilt inside every shard so the composed step can call the
        # same ``relational_message_passing`` backends per shard.
        if not rel_sort_local:
            raise ValueError("group_pad requires rel_sort_local=True")
        from graph_hypernetwork_forge_tpu.data.encoding import build_sort_plan

        cap = src.shape[0] // num_shards
        counts = rel_group_sizes.astype(np.int64)  # [k, u_pad]
        padded_counts = (
            -(-counts // group_pad) * group_pad * (counts > 0)
        )
        cap2 = int(
            -(-padded_counts.sum(axis=1).max() // group_pad) * group_pad
        )
        has_halo_idx = src_halo is not None

        def fresh(ref, fill=0):
            out = np.full(num_shards * cap2, fill, dtype=np.asarray(ref).dtype)
            return out

        src2 = fresh(src)
        dst2 = fresh(dst)
        rel2 = fresh(rel)
        mask2 = np.zeros(num_shards * cap2, dtype=np.asarray(mask).dtype)
        srch2 = fresh(src_halo) if has_halo_idx else None
        for j in range(num_shards):
            base_in = j * cap
            base_out = j * cap2
            in_off = np.zeros(u_pad + 1, dtype=np.int64)
            np.cumsum(counts[j], out=in_off[1:])
            pos = 0
            last_rel = 0
            for r in range(u_pad):
                c = int(counts[j, r])
                if c == 0:
                    continue
                s_in = base_in + in_off[r]
                s_out = base_out + pos
                src2[s_out : s_out + c] = src[s_in : s_in + c]
                dst2[s_out : s_out + c] = dst[s_in : s_in + c]
                rel2[s_out : s_out + c] = rel[s_in : s_in + c]
                mask2[s_out : s_out + c] = mask[s_in : s_in + c]
                if has_halo_idx:
                    srch2[s_out : s_out + c] = src_halo[s_in : s_in + c]
                pad = int(padded_counts[j, r]) - c
                if pad:
                    # Pad rows: the GROUP's relation id (single-relation
                    # tiles), safe local indices, mask 0.
                    pe = s_out + c
                    rel2[pe : pe + pad] = r
                    src2[pe : pe + pad] = j * npp
                    dst2[pe : pe + pad] = j * npp
                pos += int(padded_counts[j, r])
                last_rel = r
            # Trailing rows extend the shard's last relation group (stays
            # non-decreasing, tiles stay single-relation: pos and cap2 are
            # both group_pad multiples).
            if pos < cap2:
                sl_t = slice(base_out + pos, base_out + cap2)
                rel2[sl_t] = last_rel
                src2[sl_t] = j * npp
                dst2[sl_t] = j * npp
        src, dst, rel, mask = src2, dst2, rel2, mask2
        src_halo = srch2
        rel_group_sizes = padded_counts.astype(np.int32)
        cap = cap2

        # Row-table size each shard's gathers index into (the [local ++
        # halo] concat in halo modes; the full gathered table otherwise).
        if halo and scheduled:
            table_rows = npp + halo_width      # halo_width = total rows
        elif halo:
            table_rows = npp + num_shards * halo_width  # per-pair B rows
        else:
            table_rows = npp * num_shards
        src_dom = src_halo if halo else src

        agg_perm = np.empty(num_shards * cap, dtype=np.int32)
        agg_inv = np.empty(num_shards * cap, dtype=np.int32)
        agg_sorted = np.empty(num_shards * cap, dtype=np.int32)
        agg_splits = np.empty((num_shards, npp + 1), dtype=np.int32)
        agg_indeg = np.empty((num_shards, npp), dtype=np.float32)
        k_sp = np.empty(num_shards * cap, dtype=np.int32)
        k_isp = np.empty(num_shards * cap, dtype=np.int32)
        k_ss = np.empty(num_shards * cap, dtype=np.int32)
        k_ssplit = np.empty((num_shards, table_rows + 1), dtype=np.int32)
        k_dsplit = np.empty((num_shards, table_rows + 1), dtype=np.int32)
        k_rsplit = np.empty((num_shards, u_pad + 1), dtype=np.int32)
        k_rcount = np.empty((num_shards, u_pad), dtype=np.int32)
        for j in range(num_shards):
            sl = slice(j * cap, (j + 1) * cap)
            ldst = (np.asarray(dst[sl]) - j * npp).astype(np.int32)
            pj = build_sort_plan(
                np.asarray(src_dom[sl]).astype(np.int32), ldst,
                np.asarray(rel[sl]).astype(np.int32),
                np.asarray(mask[sl]), table_rows, u_pad,
            )
            agg_perm[sl] = pj.dst_perm
            agg_inv[sl] = pj.inv_dst_perm
            agg_sorted[sl] = pj.dst_sorted
            agg_splits[j] = pj.dst_splits[: npp + 1]
            agg_indeg[j] = pj.in_degree[:npp]
            k_sp[sl] = pj.src_perm
            k_isp[sl] = pj.inv_src_perm
            k_ss[sl] = pj.src_sorted
            k_ssplit[j] = pj.src_splits
            k_dsplit[j] = pj.dst_splits
            k_rsplit[j] = pj.rel_splits
            # pj.rel_counts covers the FINAL layout (trailing pad rows
            # count into the shard's last relation) so ragged group sizes
            # sum to cap exactly.
            k_rcount[j] = pj.rel_counts
        kernel_stacks = dict(
            kernel_src_perm=k_sp, kernel_inv_src_perm=k_isp,
            kernel_src_sorted=k_ss, kernel_src_splits=k_ssplit,
            kernel_dst_splits=k_dsplit, kernel_rel_splits=k_rsplit,
            kernel_rel_counts=k_rcount,
        )
        # Keep the ragged group sizes consistent with the FINAL layout so
        # contrib="grouped" runs on group-padded inputs too (trailing pad
        # rows count into the last relation; they are masked).
        rel_group_sizes = k_rcount
    else:
        # Per-shard sort-free aggregation plan over the FINAL edge layout
        # (must follow any rel_sort_local reorder).
        cap = src.shape[0] // num_shards
        agg_perm = np.empty(num_shards * cap, dtype=np.int32)
        agg_inv = np.empty(num_shards * cap, dtype=np.int32)
        agg_sorted = np.empty(num_shards * cap, dtype=np.int32)
        agg_splits = np.empty((num_shards, npp + 1), dtype=np.int32)
        agg_indeg = np.empty((num_shards, npp), dtype=np.float32)
        node_bounds = np.arange(npp + 1, dtype=np.int32)
        for j in range(num_shards):
            sl = slice(j * cap, (j + 1) * cap)
            ldst = (np.asarray(dst[sl]) - j * npp).astype(np.int64)
            order = np.argsort(ldst, kind="stable").astype(np.int32)
            agg_perm[sl] = order
            inv = np.empty(cap, dtype=np.int32)
            inv[order] = np.arange(cap, dtype=np.int32)
            agg_inv[sl] = inv
            ds = ldst[order].astype(np.int32)
            agg_sorted[sl] = ds
            agg_splits[j] = np.searchsorted(ds, node_bounds, side="left")
            # Masked pad rows on high shards can carry an out-of-range dst
            # (partition pads point at min(owner_first, n-1)); their mask
            # weight is 0, so clipping only keeps bincount's index domain
            # valid. In the sorted reduction they fall outside every node
            # interval and are dropped, matching unsorted segment_sum.
            agg_indeg[j] = np.bincount(
                np.clip(ldst, 0, npp - 1),
                weights=np.asarray(mask[sl], dtype=np.float64),
                minlength=npp,
            )[:npp].astype(np.float32)

    return ComposedInputs(
        feats=feats,
        src=src,
        dst=dst,
        rel_ids=rel,
        edge_mask=mask,
        char_ids=char_ids,
        lengths=lengths,
        nodes_per_shard=npp,
        num_nodes=n,
        src_halo=src_halo,
        send_idx=send_idx,
        halo_width=halo_width,
        sched_send_tables=sched_tables,
        sched_round_perms=sched_perms,
        rel_group_sizes=rel_group_sizes,
        agg_dst_perm=agg_perm,
        agg_inv_perm=agg_inv,
        agg_dst_sorted=agg_sorted,
        agg_dst_splits=agg_splits,
        agg_in_degree=agg_indeg,
        **(kernel_stacks or {}),
    )


def make_composed_train_step(
    mesh: Mesh,
    config: HyperGNNConfig,
    optimizer,
    nodes_per_shard: int,
    *,
    axis: str = "edge",
    margin: float = 1.0,
    num_nodes: Optional[int] = None,
    halo_width: Optional[int] = None,
    neg_mode: Optional[str] = None,
    contrib: str = "dense",
    agg_sorted: bool = False,
    scheduled_rounds=None,
):
    """Jitted fully-sharded train step (fwd + bwd + Adam) on one mesh axis.

    Returns ``step(params, opt_state, inputs..., rng) → (params, opt_state,
    loss)`` where ``inputs`` are the :class:`ComposedInputs` arrays.
    Parameters and optimizer state stay replicated; data, edges, and the
    relation axis are sharded over ``axis``. ``config.dropout`` is honored
    with per-device row dropout (independent rows per shard — a valid
    dropout draw, though not bit-identical to any single-device draw).

    ``halo_width``: build the step for the boundary-minimized exchange
    (``prepare_composed_inputs(halo=True)``). The step then takes two extra
    arrays (``src_halo``, ``send_idx``) after ``lens``; each layer moves
    only ``(k-1)·B`` boundary rows per device (one ``all_to_all``) and the
    dense relation product runs over ``npp + k·B`` rows — per-layer compute
    AND communication divide by the mesh size, instead of the dense v1's
    replicated full-``h`` product.

    ``neg_mode`` controls negative sampling AND the scoring data flow:

    - ``"local_roll"`` (default in halo mode): scoring is FULLY LOCAL —
      positive heads come from the final-layer boundary exchange (one more
      B-row ``all_to_all``, reusing the halo plan), tails are owner-local,
      and negatives are a random rotation of each shard's own positive
      tails (the union over shards is a permutation of all dst — the same
      corrupted-tail family as the reference's host-side ``randperm`` at
      ``demo.py:93``, though block-rotational rather than uniform over all
      E! permutations). Nothing scales with N on the wire: the per-step
      full-embedding ``all_gather`` is gone.
    - ``"uniform_global"`` (default in dense mode): negatives are uniform
      random nodes; scoring assembles the full embedding matrix with one
      ``all_gather`` (O(N·d) wire bytes per device per step — fine on a
      handful of chips, the scaling bottleneck beyond that).

    ``contrib`` selects the per-device contribution backend:

    - ``"dense"``: the all-relations product over the local+halo rows —
      O((npp + k·B)·2U·d²) per-device FLOPs; right when U·npp ≈ E/k.
    - ``"grouped"``: relation-grouped ``ragged_dot`` over the shard's
      relation-sorted edge slice — O((E/k)·d²) per-device FLOPs, the
      production path at large U. Requires
      ``prepare_composed_inputs(rel_sort_local=True)`` and its
      ``rel_group_sizes`` passed to the step.

    ``scheduled_rounds``: the static round pair lists of a pod-scale
    :class:`~graph_hypernetwork_forge_tpu.parallel.halo.ScheduledHaloPlan`
    (``prepare_composed_inputs(halo=True, scheduled=True)``). The layer
    and scoring exchanges then run as bin-packed ppermute rounds with
    slack-bounded per-round padding instead of the ``[k, k, B]``
    ``all_to_all``; ``halo_width`` must be the plan's total halo rows
    (``plan.halo_rows``) and the step's ``send_idx`` argument carries the
    per-round send-table tuple.

    ``agg_sorted=True`` brings the single-chip SortPlan discipline to the
    in-shard aggregation: XLA lowers each shard's unsorted per-layer
    segment-sums to device key sorts on TPU; with the host-precomputed
    per-shard plan (``ComposedInputs.agg_*``, passed to the step) the
    reduction runs as bijective permute + sorted-hint segment-sum (the
    CSR Pallas kernel at d % 128 == 0 on TPU), the per-layer count
    scatter disappears (degrees are static), and the two contribution
    streams reduce as one summed ``[cap, d]`` pass. Numerics differ from
    the unsorted path only by reduction order / a single final divide.
    """
    import optax

    prec = resolve_precision(config.precision)
    use_halo = halo_width is not None
    if neg_mode is None:
        neg_mode = "local_roll" if use_halo else "uniform_global"
    if neg_mode not in ("local_roll", "uniform_global"):
        raise ValueError(f"unknown neg_mode: {neg_mode!r}")
    if neg_mode == "local_roll" and not use_halo:
        raise ValueError(
            "neg_mode='local_roll' requires halo mode (halo_width set): "
            "local scoring reuses the halo plan's boundary exchange"
        )
    if contrib not in ("dense", "grouped", "pallas", "pallas_packed"):
        raise ValueError(f"unknown contrib backend: {contrib!r}")
    if contrib in ("pallas", "pallas_packed") and not agg_sorted:
        raise ValueError(
            f"contrib={contrib!r} needs agg_sorted=True (the kernel "
            "backends run on the per-shard SortPlan discipline; "
            "prepare_composed_inputs(rel_sort_local=True, group_pad=256))"
        )

    def forward_local(params, feats_l, src_l, dst_l, rel_l, mask_l,
                      chars_l, lens_l, send_l, gs_l, agg_l, kern_l,
                      drop_rng):
        """Per-device forward over the local node/edge/relation shards.

        Runs INSIDE shard_map: ``feats_l [npp, F]``, edge arrays are the
        local dst-owned slice, ``chars_l/lens_l`` the local relation slice.
        In halo mode ``src_l`` holds local++halo indices and ``send_l`` the
        ``[1, k, B]`` send table. Returns the local rows of the final
        embeddings ``[npp, H]``.
        """
        use_dropout = drop_rng is not None and config.dropout > 0.0
        my_idx = jax.lax.axis_index(axis)

        h_local = jax.nn.relu(
            linear_apply(params["input_proj"], feats_l, precision=prec)
        )
        # Relation sharding: encode only the local U/k texts.
        text_local = apply_text_encoder(
            params["text_encoder"], chars_l, lens_l, precision=config.precision
        )

        rng_layer = drop_rng
        local_dst = dst_l - my_idx * nodes_per_shard
        for layer_idx in range(config.num_layers):
            gen_rng = drop_key = None
            if use_dropout:
                rng_layer, gen_rng, drop_key = jax.random.split(rng_layer, 3)
                gen_rng = jax.random.fold_in(gen_rng, my_idx)
                drop_key = jax.random.fold_in(drop_key, my_idx)
            # Expert-parallel weight generation + tiled all_gather of the
            # full banks (relation_sharding.py semantics).
            local_w = apply_weight_generator(
                config.weight_generator,
                params["weight_generators"][layer_idx],
                text_local,
                train=use_dropout,
                rng=gen_rng,
            )
            w = {
                kk: jax.lax.all_gather(v, axis, tiled=True)
                for kk, v in local_w.items()
            }
            if use_halo and scheduled_rounds is not None:
                # Pod-scale schedule: bin-packed ppermute rounds, only
                # listed pairs transmit (parallel/halo.py).
                from graph_hypernetwork_forge_tpu.parallel.halo import (
                    scheduled_halo_exchange,
                )

                halo = scheduled_halo_exchange(
                    h_local, send_l, scheduled_rounds, axis
                )
                rows = jnp.concatenate([h_local, halo])
                src_rows = src_l
            elif use_halo:
                # Boundary-minimized exchange (parallel/halo.py): move only
                # the rows some consumer's edges actually read.
                k = send_l.shape[1]
                send_buf = h_local[send_l[0].reshape(-1)].reshape(
                    k, halo_width, h_local.shape[1]
                )
                halo = jax.lax.all_to_all(
                    send_buf, axis, split_axis=0, concat_axis=0
                )
                rows = jnp.concatenate(
                    [h_local, halo.reshape(k * halo_width, h_local.shape[1])]
                )
                src_rows = src_l  # pre-remapped into [local ++ halo]
            else:
                # Dense-boundary v1: assemble full h so any remote src row
                # is addressable (replicates the relation product below).
                rows = jax.lax.all_gather(h_local, axis, tiled=True)
                src_rows = src_l
            self_rows = local_dst if use_halo else dst_l
            if contrib in ("pallas", "pallas_packed"):
                # Reconstruct the single-device SortPlan inside the shard
                # and run the SAME kernel backends as the single-chip path
                # (streaming combined edge transform / pair-packed d=64,
                # pad-free CSR reductions) — the shard's gathers index the
                # [local ++ halo] row table, aggregation outputs npp rows.
                from graph_hypernetwork_forge_tpu.data.encoding import (
                    SortPlan,
                )
                from graph_hypernetwork_forge_tpu.ops.message_passing import (
                    relational_message_passing,
                )

                perm_l, inv_l, dsort_l, _, indeg_l = agg_l
                (ksp_l, kisp_l, kss_l, kssp_l, kdsp_l, krsp_l,
                 krc_l) = kern_l
                plan_local = SortPlan(
                    dst_perm=perm_l, inv_dst_perm=inv_l, dst_sorted=dsort_l,
                    src_perm=ksp_l, inv_src_perm=kisp_l, src_sorted=kss_l,
                    in_degree=indeg_l[0], rel_counts=krc_l[0],
                    dst_splits=kdsp_l[0], src_splits=kssp_l[0],
                    rel_splits=krsp_l[0],
                )
                h_new = relational_message_passing(
                    rows, src_rows, local_dst, rel_l,
                    w["W_msg"], w["W_self"], w["bias"],
                    num_nodes=nodes_per_shard, edge_mask=mask_l,
                    backend=contrib, precision=config.precision,
                    rel_sorted=True, group_padded=True,
                    sort_plan=plan_local,
                )
                h_new = jax.nn.relu(h_new + h_local)
                if use_dropout:
                    keep = jax.random.bernoulli(
                        drop_key, 1.0 - config.dropout, h_new.shape
                    )
                    h_new = jnp.where(
                        keep, h_new / (1.0 - config.dropout), 0.0
                    )
                h_local = layer_norm_apply(
                    params["layer_norms"][layer_idx], h_new
                )
                continue
            if contrib == "grouped":
                # Relation-grouped ragged matmul over this shard's
                # rel-sorted edge slice: O((E/k)·d²) per-device FLOPs.
                from graph_hypernetwork_forge_tpu.ops.message_passing import (
                    _ragged_transform,
                )

                gs = gs_l[0]
                msg = (
                    _ragged_transform(rows[src_rows], w["W_msg"], gs, prec)
                    + w["bias"][rel_l]
                ) * mask_l[:, None]
                selfc = (
                    _ragged_transform(rows[self_rows], w["W_self"], gs, prec)
                    * mask_l[:, None]
                )
            else:
                hw = jnp.einsum(
                    "nd,udo->uno", rows,
                    jnp.concatenate([w["W_msg"], w["W_self"]]),
                    precision=prec,
                )
                u = w["W_msg"].shape[0]
                msg = (
                    hw[rel_l, src_rows] + w["bias"][rel_l]
                ) * mask_l[:, None]
                selfc = hw[rel_l + u, self_rows] * mask_l[:, None]
            if agg_sorted:
                # Sort-free in-shard tail: one summed [cap, d] reduction in
                # dst-sorted order (host-precomputed per-shard plan), static
                # degree counts — zero per-layer key sorts on TPU.
                from graph_hypernetwork_forge_tpu.ops.segment import (
                    sorted_segment_sum_by_plan,
                )

                perm_l, inv_l, dsort_l, splits_l, indeg_l = agg_l
                total = sorted_segment_sum_by_plan(
                    msg + selfc, perm_l, inv_l, dsort_l, nodes_per_shard,
                    splits_l[0],
                )
                cnt = jnp.maximum(indeg_l[0], 1.0)[:, None]
                h_new = total / cnt
            else:
                agg = jax.ops.segment_sum(
                    msg, local_dst, num_segments=nodes_per_shard
                )
                selft = jax.ops.segment_sum(
                    selfc, local_dst, num_segments=nodes_per_shard
                )
                cnt = jax.ops.segment_sum(
                    mask_l, local_dst, num_segments=nodes_per_shard
                )
                cnt = jnp.maximum(cnt, 1.0)[:, None]
                h_new = agg / cnt + selft / cnt
            h_new = jax.nn.relu(h_new + h_local)
            if use_dropout:
                keep = jax.random.bernoulli(
                    drop_key, 1.0 - config.dropout, h_new.shape
                )
                h_new = jnp.where(keep, h_new / (1.0 - config.dropout), 0.0)
            h_local = layer_norm_apply(
                params["layer_norms"][layer_idx], h_new
            )
        return h_local

    # Send-table spec: the dense plan ships one [k, k, B] cube; the
    # scheduled plan a tuple of per-round [k, B_r] tables.
    send_spec = (
        tuple(P(axis, None) for _ in scheduled_rounds)
        if scheduled_rounds is not None else P(axis, None, None)
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(),            # params (replicated)
            P(axis, None),  # feats: node-range sharded
            P(axis), P(axis), P(axis), P(axis),  # edges: dst-owner sharded
            P(axis, None), P(axis),              # relations sharded
            P(axis),        # src for layers (global or local++halo remapped)
            send_spec,      # send tables (halo)
            P(axis, None),  # per-shard ragged group sizes (grouped contrib)
            (P(axis), P(axis), P(axis), P(axis, None), P(axis, None)),
            #               ^ per-shard sort-free aggregation plan
            (P(axis), P(axis), P(axis), P(axis, None), P(axis, None),
             P(axis, None), P(axis, None)),
            #               ^ per-shard kernel SortPlan extension
            P(axis),        # neg_dst: edge-sharded
            P(),            # dropout rng (replicated; folded per device)
        ),
        out_specs=P(),
        check_vma=False,
    )
    def _loss_shard_global(params, feats_l, src_l, dst_l, rel_l, mask_l,
                           chars_l, lens_l, src_layers_l, send_l, gs_l,
                           agg_l, kern_l, neg_l, drop_rng):
        h_local = forward_local(
            params, feats_l, src_layers_l, dst_l, rel_l, mask_l, chars_l,
            lens_l, send_l, gs_l, agg_l, kern_l, drop_rng,
        )
        # Scoring needs arbitrary rows: assemble the full embeddings once.
        embs = jax.lax.all_gather(h_local, axis, tiled=True)
        pos = jnp.sum(embs[src_l] * embs[dst_l], axis=-1)
        neg = jnp.sum(embs[src_l] * embs[neg_l], axis=-1)
        per_edge = jnp.maximum(margin - pos + neg, 0.0) * mask_l
        # Mask-weighted mean across ALL shards (== reference plain mean
        # over real edges, demo.py:96).
        num = jax.lax.psum(jnp.sum(per_edge), axis)
        den = jax.lax.psum(jnp.sum(mask_l), axis)
        return num / jnp.maximum(den, 1.0)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(),            # params (replicated)
            P(axis, None),  # feats: node-range sharded
            P(axis), P(axis), P(axis), P(axis),  # edges (src = local++halo)
            P(axis, None), P(axis),              # relations sharded
            send_spec,                           # send tables (halo)
            P(axis, None),  # per-shard ragged group sizes (grouped contrib)
            (P(axis), P(axis), P(axis), P(axis, None), P(axis, None)),
            #               ^ per-shard sort-free aggregation plan
            (P(axis), P(axis), P(axis), P(axis, None), P(axis, None),
             P(axis, None), P(axis, None)),
            #               ^ per-shard kernel SortPlan extension
            P(),            # negative rng (replicated; folded per device)
            P(),            # dropout rng (replicated; folded per device)
        ),
        out_specs=P(),
        check_vma=False,
    )
    def _loss_shard_local(params, feats_l, srch_l, dst_l, rel_l, mask_l,
                          chars_l, lens_l, send_l, gs_l, agg_l, kern_l,
                          neg_rng, drop_rng):
        h_local = forward_local(
            params, feats_l, srch_l, dst_l, rel_l, mask_l, chars_l,
            lens_l, send_l, gs_l, agg_l, kern_l, drop_rng,
        )
        my_idx = jax.lax.axis_index(axis)
        # One more boundary exchange so positive HEADS (arbitrary src rows
        # of local edges) are addressable — same plan, same volume as a
        # layer exchange; nothing O(N) crosses the wire.
        if scheduled_rounds is not None:
            from graph_hypernetwork_forge_tpu.parallel.halo import (
                scheduled_halo_exchange,
            )

            halo_rows_buf = scheduled_halo_exchange(
                h_local, send_l, scheduled_rounds, axis
            )
            rows = jnp.concatenate([h_local, halo_rows_buf])
        else:
            k = send_l.shape[1]
            send_buf = h_local[send_l[0].reshape(-1)].reshape(
                k, halo_width, h_local.shape[1]
            )
            halo = jax.lax.all_to_all(
                send_buf, axis, split_axis=0, concat_axis=0
            )
            rows = jnp.concatenate(
                [h_local, halo.reshape(k * halo_width, h_local.shape[1])]
            )
        head = rows[srch_l]                              # [cap, d]
        local_dst = dst_l - my_idx * nodes_per_shard
        tail = h_local[local_dst]                        # [cap, d] owner rows
        # Negatives: random rotation of this shard's own positive tails —
        # a permutation of dst within the shard (corrupted-tail family of
        # reference demo.py:93; block-rotational, not uniform over all
        # permutations). Fold the step rng per device so shards rotate
        # independently.
        cap = dst_l.shape[0]
        shift = jax.random.randint(
            jax.random.fold_in(neg_rng, my_idx), (), 1, max(cap, 2)
        )
        neg_tail = jnp.roll(tail, -shift, axis=0)
        pos = jnp.sum(head * tail, axis=-1)
        neg = jnp.sum(head * neg_tail, axis=-1)
        per_edge = jnp.maximum(margin - pos + neg, 0.0) * mask_l
        num = jax.lax.psum(jnp.sum(per_edge), axis)
        den = jax.lax.psum(jnp.sum(mask_l), axis)
        return num / jnp.maximum(den, 1.0)

    @jax.jit
    def step(params, opt_state, feats, src, dst, rel, mask, chars, lens,
             rng, src_halo=None, send_idx=None, rel_group_sizes=None,
             agg_plan=None, kernel_plan=None):
        neg_rng, drop_rng = jax.random.split(rng)
        if config.dropout <= 0.0:
            drop_rng = None
        if use_halo:
            if src_halo is None or send_idx is None:
                raise ValueError(
                    "halo_width set: step needs src_halo and send_idx "
                    "(prepare_composed_inputs(halo=True))"
                )
            src_layers = src_halo
        else:
            src_layers = src
            k = mesh.shape[axis]
            send_idx = jnp.zeros((k, k, 1), dtype=jnp.int32)  # inert
        if contrib == "grouped":
            if rel_group_sizes is None:
                raise ValueError(
                    "contrib='grouped' needs rel_group_sizes "
                    "(prepare_composed_inputs(rel_sort_local=True))"
                )
        elif rel_group_sizes is None:
            k = mesh.shape[axis]
            rel_group_sizes = jnp.zeros((k, 1), dtype=jnp.int32)  # inert
        if agg_sorted:
            if agg_plan is None:
                raise ValueError(
                    "agg_sorted=True: step needs agg_plan=(dst_perm, "
                    "inv_perm, dst_sorted, dst_splits, in_degree) from "
                    "prepare_composed_inputs"
                )
        elif agg_plan is None:
            k = mesh.shape[axis]
            z = jnp.zeros((k,), dtype=jnp.int32)  # inert
            agg_plan = (
                z, z, z, jnp.zeros((k, 1), jnp.int32),
                jnp.zeros((k, 1), jnp.float32),
            )
        if contrib in ("pallas", "pallas_packed"):
            if kernel_plan is None:
                raise ValueError(
                    f"contrib={contrib!r}: step needs kernel_plan "
                    "(prepare_composed_inputs(rel_sort_local=True, "
                    "group_pad=256).kernel_plan)"
                )
        elif kernel_plan is None:
            k = mesh.shape[axis]
            z = jnp.zeros((k,), dtype=jnp.int32)  # inert
            z2 = jnp.zeros((k, 1), jnp.int32)
            kernel_plan = (z, z, z, z2, z2, z2, z2)

        if neg_mode == "local_roll":
            def loss_fn(p):
                return _loss_shard_local(
                    p, feats, src_halo, dst, rel, mask, chars, lens,
                    send_idx, rel_group_sizes, agg_plan, kernel_plan,
                    neg_rng, drop_rng
                )
        else:
            neg_dst = jax.random.randint(
                neg_rng, src.shape, 0,
                feats.shape[0] if num_nodes is None else num_nodes,
                dtype=src.dtype,
            )

            def loss_fn(p):
                return _loss_shard_global(
                    p, feats, src, dst, rel, mask, chars, lens, src_layers,
                    send_idx, rel_group_sizes, agg_plan, kernel_plan,
                    neg_dst, drop_rng
                )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_opt_state, loss

    return step


def composed_forward(
    mesh: Mesh,
    config: HyperGNNConfig,
    params,
    inputs: ComposedInputs,
    *,
    axis: str = "edge",
) -> jax.Array:
    """Inference-mode composed forward → full ``[N_pad, H]`` embeddings."""
    prec = resolve_precision(config.precision)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis), P(axis), P(axis), P(axis),
                  P(axis, None), P(axis)),
        out_specs=P(axis, None),
        check_vma=False,
    )
    def _fwd(params, feats_l, src_l, dst_l, rel_l, mask_l, chars_l, lens_l):
        # Same body as make_composed_train_step.forward_local without dropout.
        my_idx = jax.lax.axis_index(axis)
        h_local = jax.nn.relu(
            linear_apply(params["input_proj"], feats_l, precision=prec)
        )
        text_local = apply_text_encoder(
            params["text_encoder"], chars_l, lens_l, precision=config.precision
        )
        for layer_idx in range(config.num_layers):
            local_w = apply_weight_generator(
                config.weight_generator,
                params["weight_generators"][layer_idx],
                text_local,
            )
            w = {
                kk: jax.lax.all_gather(v, axis, tiled=True)
                for kk, v in local_w.items()
            }
            h_full = jax.lax.all_gather(h_local, axis, tiled=True)
            hw = jnp.einsum(
                "nd,udo->uno", h_full,
                jnp.concatenate([w["W_msg"], w["W_self"]]),
                precision=prec,
            )
            u = w["W_msg"].shape[0]
            msg = (hw[rel_l, src_l] + w["bias"][rel_l]) * mask_l[:, None]
            selfc = hw[rel_l + u, dst_l] * mask_l[:, None]
            local_dst = dst_l - my_idx * inputs.nodes_per_shard
            agg = jax.ops.segment_sum(
                msg, local_dst, num_segments=inputs.nodes_per_shard
            )
            selft = jax.ops.segment_sum(
                selfc, local_dst, num_segments=inputs.nodes_per_shard
            )
            cnt = jax.ops.segment_sum(
                mask_l, local_dst, num_segments=inputs.nodes_per_shard
            )
            cnt = jnp.maximum(cnt, 1.0)[:, None]
            h_local = layer_norm_apply(
                params["layer_norms"][layer_idx],
                jax.nn.relu(agg / cnt + selft / cnt + h_local),
            )
        return h_local

    return _fwd(
        params,
        jnp.asarray(inputs.feats),
        jnp.asarray(inputs.src),
        jnp.asarray(inputs.dst),
        jnp.asarray(inputs.rel_ids),
        jnp.asarray(inputs.edge_mask),
        jnp.asarray(inputs.char_ids),
        jnp.asarray(inputs.lengths),
    )
