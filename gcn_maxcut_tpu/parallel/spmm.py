"""Node-sharded SpMM under ``shard_map``: all-gather and ring-overlap paths.

Two TPU-native schedules for ``y[r] = Σ w_e · x[s]`` when nodes (and
feature rows) are sharded across a 1-D mesh axis:

  * ``sharded_spmm_allgather`` — ``all_gather`` the full feature matrix,
    then one local masked segment-sum.  Simple; right when F·n fits and ICI
    bandwidth is plentiful.
  * ``sharded_spmm_ring`` — the halo-overlap schedule of the north star
    (BASELINE.json): features circulate the ring with ``ppermute`` while
    each hop's edge group (pre-bucketed by sender shard,
    ``partition.shard_graph``) is aggregated.  Communication of hop s+1
    overlaps with compute of hop s — the message-passing analog of ring
    attention; peak memory is 2 feature shards instead of D.

Both are pure functions of per-shard values, designed to be called inside
``shard_map`` over axis ``axis_name``; gradients flow through gather /
segment-sum / ppermute (all differentiable), so the same code serves
forward and backward.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from gcn_maxcut_tpu.parallel.partition import ShardedGraph


def _local_group_aggregate(
    senders: jnp.ndarray,     # [e_group] local idx in the *source* shard
    receivers: jnp.ndarray,   # [e_group] local idx in this shard
    weights: jnp.ndarray,     # [e_group]
    mask: jnp.ndarray,        # [e_group]
    x_src: jnp.ndarray,       # [n_shard, F] features of the source shard
    n_shard: int,
) -> jnp.ndarray:
    msgs = x_src[senders] * (weights * mask)[:, None]
    return jax.ops.segment_sum(
        msgs, receivers, num_segments=n_shard, indices_are_sorted=True
    )


def sharded_spmm_allgather(
    sg_shard: ShardedGraph,
    x: jnp.ndarray,
    axis_name: str = "graph",
) -> jnp.ndarray:
    """All-gather schedule.  ``x``: this shard's ``[n_shard, F]`` rows.

    ``sg_shard`` is the per-device slice of `ShardedGraph` (no leading D
    axis) as delivered by ``shard_map``.
    """
    n_shard, _ = x.shape
    num_shards = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    xg = jax.lax.all_gather(x, axis_name)          # [D, n_shard, F]

    out = jnp.zeros_like(x)
    for s in range(num_shards):
        src = (my + s) % num_shards
        out = out + _local_group_aggregate(
            sg_shard.senders[s],
            sg_shard.receivers[s],
            sg_shard.weights[s],
            sg_shard.edge_mask[s],
            xg[src],
            n_shard,
        )
    return out


def sharded_spmm_ring(
    sg_shard: ShardedGraph,
    x: jnp.ndarray,
    axis_name: str = "graph",
) -> jnp.ndarray:
    """Ring-overlap schedule: hop s aggregates the features of shard
    ``(my + s) mod D`` while ``ppermute`` ships the next hop's features.

    Group s of this shard's edges references exactly shard (my+s)'s nodes
    (``partition.shard_graph`` grouping invariant), so after s backward ring
    hops the circulating buffer holds the right rows.
    """
    n_shard, _ = x.shape
    num_shards = jax.lax.psum(1, axis_name)
    perm = [(i, (i - 1) % num_shards) for i in range(num_shards)]  # send left

    def hop(s: int, carry):
        out, buf = carry
        # start shipping next hop's features; XLA overlaps this ppermute
        # with the local aggregation below (independent dataflow).
        nxt = (
            jax.lax.ppermute(buf, axis_name, perm)
            if s + 1 < num_shards
            else buf
        )
        out = out + _local_group_aggregate(
            sg_shard.senders[s],
            sg_shard.receivers[s],
            sg_shard.weights[s],
            sg_shard.edge_mask[s],
            buf,
            n_shard,
        )
        return out, nxt

    out = jnp.zeros_like(x)
    buf = x
    for s in range(num_shards):
        out, buf = hop(s, (out, buf))
    return out


def make_sharded_spmm(schedule: str = "ring") -> Callable:
    if schedule == "ring":
        return sharded_spmm_ring
    if schedule == "allgather":
        return sharded_spmm_allgather
    raise ValueError(f"unknown schedule {schedule!r}")


def sharded_gcn_conv(
    w: jnp.ndarray,
    b: jnp.ndarray,
    sg_shard: ShardedGraph,
    x: jnp.ndarray,
    axis_name: str = "graph",
    schedule: str = "ring",
) -> jnp.ndarray:
    """Symmetric-normalized GraphConv on a node-sharded graph.

    Same math as ``models.gcn_conv_apply`` (DGL ``norm='both'``), with the
    aggregation running on the sharded schedule.  Degrees/masks are
    per-shard, so normalization is local.
    """
    spmm = make_sharded_spmm(schedule)
    deg = jnp.maximum(sg_shard.degrees, 1.0)
    norm = jax.lax.rsqrt(deg)[:, None]
    in_f, out_f = w.shape
    h = x * norm
    if in_f > out_f:
        h = h @ w
        h = spmm(sg_shard, h, axis_name)
    else:
        h = spmm(sg_shard, h, axis_name)
        h = h @ w
    return h * norm + b
