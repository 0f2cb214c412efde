"""Graph partitioning for node-sharded (giant single graph) parallelism.

The GNN analog of sequence/context parallelism (SURVEY.md §5.7): one huge
graph's nodes are split into D ranges, each device owns a node range plus
its incident (incoming) edges, and remote sender features are fetched by
collectives each layer.  Edges are grouped by *sender shard* so the ring
schedule (``spmm.sharded_spmm_ring``) can process the local group while the
next remote shard's features are in flight — the halo-exchange overlap of
the north star.

Partitioners:
  * ``partition_nodes_contiguous`` — equal contiguous ranges (optimal for
    the on-device circulant benchmark graphs whose edges are short-range).
  * ``partition_nodes_bfs`` — BFS-grown blocks (METIS-style locality
    heuristic, no external dependency): peel connected BFS regions of
    n/D nodes each to minimize cross-shard edges on irregular graphs.

All shapes are static per (D, n_shard, e_shard): every device's edge group
buffers are padded to the same size so the whole `ShardedGraph` is a
stackable pytree usable under ``shard_map``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from gcn_maxcut_tpu.core.graph import round_up


@struct.dataclass
class ShardedGraph:
    """Node-sharded graph: per-device leading axis D on every field.

    Edge groups: for device d, group s holds edges whose receiver is owned
    by d and whose sender is owned by shard ``(d + s) mod D`` — group 0 is
    local, group s>0 arrives via the ring after s hops.  Senders are stored
    as *local indices within their owning shard*; receivers as local
    indices within d.

    Shapes: ``senders/receivers/weights/edge_mask: [D, S, e_group]`` with
    S = D groups, ``degrees/node_mask: [D, n_shard]``, scalars per shard.
    """

    senders: jnp.ndarray     # int32 [D, D, e_group] local idx in sender shard
    receivers: jnp.ndarray   # int32 [D, D, e_group] local idx in own shard
    weights: jnp.ndarray     # f32   [D, D, e_group]
    edge_mask: jnp.ndarray   # f32   [D, D, e_group]
    degrees: jnp.ndarray     # f32   [D, n_shard]
    node_mask: jnp.ndarray   # f32   [D, n_shard]
    n_nodes: jnp.ndarray     # int32 [] total real nodes
    # optional per-group ELL tables (receiver-major): gather-only SpMM runs
    # ~5x the gather+scatter segment-sum on TPU (see ops/segment.py)
    ell_senders: jnp.ndarray | None = None   # int32 [D, D, n_shard, ell_w]
    ell_weights: jnp.ndarray | None = None   # f32   [D, D, n_shard, ell_w]
    ell_mask: jnp.ndarray | None = None      # f32   [D, D, n_shard, ell_w]
    # static: True iff the directed COO was verified symmetric (A^T = A) at
    # build time; gates the symmetric custom VJP (spmm.sharded_spmm_sym) —
    # asymmetric graphs fall back to the autodiff backward.
    symmetric: bool = struct.field(pytree_node=False, default=True)

    @property
    def num_shards(self) -> int:
        return self.senders.shape[0]

    @property
    def n_shard(self) -> int:
        return self.node_mask.shape[-1]

    @property
    def e_group(self) -> int:
        return self.senders.shape[-1]


def shard_specs(sg: ShardedGraph, axis: str = "graph"):
    """``shard_map`` in_specs pytree for a `ShardedGraph`: leading-axis
    sharding on array fields, replication for scalars."""
    from jax.sharding import PartitionSpec as P

    return jax.tree_util.tree_map(
        lambda a: P(axis) if getattr(a, "ndim", 0) > 0 else P(), sg
    )


def local_shard(sg: ShardedGraph) -> ShardedGraph:
    """Squeeze the singleton device axis shard_map leaves on array fields."""
    return jax.tree_util.tree_map(
        lambda a: a[0] if getattr(a, "ndim", 0) > 0 else a, sg
    )


def partition_nodes_contiguous(n: int, num_shards: int) -> np.ndarray:
    """Owner shard of each node: equal contiguous ranges."""
    n_shard = -(-n // num_shards)
    return np.minimum(np.arange(n) // n_shard, num_shards - 1)


def partition_nodes_bfs(
    senders: np.ndarray, receivers: np.ndarray, n: int, num_shards: int
) -> np.ndarray:
    """BFS-grown balanced blocks (METIS-style locality without METIS).

    Grows each shard as a BFS region of ~n/D nodes from the lowest-id
    unassigned seed, so most edges stay within a shard on graphs with
    locality.  O(n + E) host-side; for the 10M-node config run once and
    cache alongside the dataset.
    """
    # CSR over undirected adjacency
    order = np.argsort(senders, kind="stable")
    s_sorted, r_sorted = senders[order], receivers[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, s_sorted + 1, 1)
    np.cumsum(indptr, out=indptr)

    target = -(-n // num_shards)
    owner = np.full(n, -1, dtype=np.int64)
    next_seed = 0
    from collections import deque

    for shard in range(num_shards):
        count = 0
        queue: deque[int] = deque()
        while count < target:
            if not queue:
                while next_seed < n and owner[next_seed] != -1:
                    next_seed += 1
                if next_seed >= n:
                    break
                queue.append(next_seed)
                owner[next_seed] = shard
                count += 1
            v = queue.popleft()
            for e in range(indptr[v], indptr[v + 1]):
                u = r_sorted[e]
                if owner[u] == -1 and count < target:
                    owner[u] = shard
                    count += 1
                    queue.append(u)
    owner[owner == -1] = num_shards - 1
    return owner


def is_symmetric_coo(
    senders: np.ndarray, receivers: np.ndarray, weights: np.ndarray
) -> bool:
    """True iff the directed COO multiset equals its transpose
    ({(s, r, w)} == {(r, s, w)}); O(E log E) host-side."""
    if senders.shape[0] != receivers.shape[0]:
        return False
    fwd = np.lexsort((weights, receivers, senders))
    bwd = np.lexsort((weights, senders, receivers))
    return (
        np.array_equal(senders[fwd], receivers[bwd])
        and np.array_equal(receivers[fwd], senders[bwd])
        and np.allclose(weights[fwd], weights[bwd])
    )


def shard_graph(
    senders: np.ndarray,
    receivers: np.ndarray,
    n: int,
    num_shards: int,
    weights: np.ndarray | None = None,
    owner: np.ndarray | None = None,
    edge_pad_multiple: int = 128,
    build_ell: bool = True,
    check_symmetry: bool = True,
    ell_budget_bytes: int = 1 << 30,
) -> Tuple[ShardedGraph, np.ndarray]:
    """Build a `ShardedGraph` from directed COO arrays.

    ``owner`` maps node -> shard (default contiguous).  Nodes are relabeled
    so each shard's nodes are locally dense ``[0, n_shard)``; returns
    ``(sharded_graph, global_to_local)`` where ``global_to_local[v]``
    encodes ``owner * n_shard + local_index`` for decoding results.

    ``check_symmetry``: verify A^T = A once at build time (sort-based, a
    few seconds at 80M edges) so the symmetric custom VJP
    (``spmm.sharded_spmm_sym``) is only used when its algebra holds;
    asymmetric inputs get ``symmetric=False`` and the autodiff backward.
    Pass False to skip the check and assert symmetry (trusted callers,
    e.g. the on-device circulant generators).
    """
    senders = np.asarray(senders, dtype=np.int64)
    receivers = np.asarray(receivers, dtype=np.int64)
    w = (
        np.ones(senders.shape[0], dtype=np.float32)
        if weights is None
        else np.asarray(weights, dtype=np.float32)
    )
    symmetric = True
    if check_symmetry:
        symmetric = is_symmetric_coo(senders, receivers, w)
    if owner is None:
        owner = partition_nodes_contiguous(n, num_shards)

    n_shard = round_up(int(np.max(np.bincount(owner, minlength=num_shards))), 8)

    # local index of each node within its shard (order-preserving)
    local = np.zeros(n, dtype=np.int64)
    for d in range(num_shards):
        members = np.nonzero(owner == d)[0]
        local[members] = np.arange(members.size)

    recv_shard = owner[receivers]
    send_shard = owner[senders]
    group = (send_shard - recv_shard) % num_shards  # ring hop distance

    # bucket sizes -> common padded group size
    counts = np.zeros((num_shards, num_shards), dtype=np.int64)
    for d in range(num_shards):
        for s in range(num_shards):
            counts[d, s] = np.sum((recv_shard == d) & (group == s))
    e_group = round_up(int(counts.max()), edge_pad_multiple)

    S = np.zeros((num_shards, num_shards, e_group), dtype=np.int32)
    R = np.zeros((num_shards, num_shards, e_group), dtype=np.int32)
    W = np.zeros((num_shards, num_shards, e_group), dtype=np.float32)
    M = np.zeros((num_shards, num_shards, e_group), dtype=np.float32)
    # padding edges point at the last local row with zero mask
    S[:] = n_shard - 1
    R[:] = n_shard - 1

    # per-(shard, group) in-degree of each local receiver -> ELL width
    deg_group = np.zeros((num_shards, num_shards, n_shard), dtype=np.int64)
    np.add.at(deg_group, (recv_shard, group, local[receivers]), 1)
    ell_w = int(deg_group.max()) if deg_group.size else 0
    # skip the tables when a hub/partition pathology would blow memory or
    # trace size: (a) byte budget across all THREE tables (senders/weights/
    # mask, 4 B each — ell_w is the max per-(shard,group) in-degree, so one
    # hub inflates every D^2 table); (b) skew ceiling — if the max in-degree
    # is far above the mean occupied in-degree, the unrolled gather loop
    # would mostly process padding (and its trace grows with ell_w).
    occupied = deg_group[deg_group > 0]
    mean_deg = float(occupied.mean()) if occupied.size else 0.0
    ell_bytes = 3 * 4 * num_shards * num_shards * n_shard * ell_w
    use_ell = (
        build_ell and ell_w > 0
        and ell_bytes <= ell_budget_bytes
        and ell_w <= max(8.0, 8.0 * mean_deg)
    )
    if use_ell:
        ES = np.full(
            (num_shards, num_shards, n_shard, ell_w), n_shard - 1, np.int32
        )
        EW = np.zeros_like(ES, dtype=np.float32)
        EM = np.zeros_like(EW)

    for d in range(num_shards):
        for s in range(num_shards):
            sel = np.nonzero((recv_shard == d) & (group == s))[0]
            m = sel.size
            # sort by local receiver for segment-sum friendliness
            order = np.argsort(local[receivers[sel]], kind="stable")
            sel = sel[order]
            S[d, s, :m] = local[senders[sel]]
            R[d, s, :m] = local[receivers[sel]]
            W[d, s, :m] = w[sel]
            M[d, s, :m] = 1.0
            if use_ell and m:
                r_loc = local[receivers[sel]]
                # slot within each run of equal (sorted) receivers
                slot = np.arange(m) - np.searchsorted(r_loc, r_loc)
                ES[d, s, r_loc, slot] = local[senders[sel]]
                EW[d, s, r_loc, slot] = w[sel]
                EM[d, s, r_loc, slot] = 1.0

    degrees = np.zeros((num_shards, n_shard), dtype=np.float32)
    np.add.at(degrees, (recv_shard, local[receivers]), 1.0)
    node_mask = np.zeros((num_shards, n_shard), dtype=np.float32)
    for d in range(num_shards):
        node_mask[d, : int(np.sum(owner == d))] = 1.0

    g2l = owner * n_shard + local
    sg = ShardedGraph(
        senders=jnp.asarray(S),
        receivers=jnp.asarray(R),
        weights=jnp.asarray(W),
        edge_mask=jnp.asarray(M),
        degrees=jnp.asarray(degrees),
        node_mask=jnp.asarray(node_mask),
        n_nodes=jnp.asarray(n, dtype=jnp.int32),
        ell_senders=jnp.asarray(ES) if use_ell else None,
        ell_weights=jnp.asarray(EW) if use_ell else None,
        ell_mask=jnp.asarray(EM) if use_ell else None,
        symmetric=symmetric,
    )
    return sg, g2l
