"""Sparse message-passing primitives as sorted segment ops (XLA path).

These are the TPU-native replacement for DGL's C++ SpMM kernels that the
reference calls through ``dgl.nn.pytorch.GraphConv``
(``Training/TrainingNeural.py:80,83`` in the reference tree).  The graph's
edge list is sorted by receiver at construction (``core/graph.py``), so
``jax.ops.segment_sum(..., indices_are_sorted=True)`` lowers to an efficient
scatter-add; gradients flow through the gather/scatter pair automatically.

A hand-written Pallas kernel path with the same signature lives in
``ops/pallas_spmm.py``; ``spmm`` dispatches between them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gcn_maxcut_tpu.core.graph import Graph

# Flipped to True by ops.pallas_spmm.enable_pallas() when the backend
# supports the Mosaic kernels (TPU only).
_USE_PALLAS = False


def spmm_xla(g: Graph, x: jnp.ndarray, edge_weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """y[r] = sum_{(s -> r) in E} w_e * x[s]  — sparse matrix times dense.

    ``x`` is ``[n_pad, F]``; returns ``[n_pad, F]``.  With
    ``edge_weights=None`` the aggregation is unweighted over real edges
    (``edge_mask``), matching DGL GraphConv's default of ignoring edge
    weights; pass ``g.weights`` for weighted aggregation.
    """
    w = g.edge_mask if edge_weights is None else edge_weights
    msgs = x[g.senders] * w[:, None]
    return jax.ops.segment_sum(
        msgs, g.receivers, num_segments=g.n_pad, indices_are_sorted=True
    )


def spmm(g: Graph, x: jnp.ndarray, edge_weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Dispatching SpMM: Pallas kernel when enabled, else XLA segment-sum."""
    if _USE_PALLAS:
        from gcn_maxcut_tpu.ops import pallas_spmm

        return pallas_spmm.spmm_pallas(g, x, edge_weights)
    return spmm_xla(g, x, edge_weights)


def sddmm(g: Graph, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Per-edge scores  e = <x[sender], y[receiver]>  — sampled dense-dense.

    Returns ``[e_pad]`` with zeros on padded edges.  This is the edge-form
    building block of the cut loss: for assignment matrix S, the relaxed
    same-partition probability of edge (u, v) is ``sddmm(g, S, S)``.
    """
    scores = jnp.sum(x[g.senders] * y[g.receivers], axis=-1)
    return scores * g.edge_mask


def segment_sum_edges(g: Graph, edge_values: jnp.ndarray) -> jnp.ndarray:
    """Sum per-edge values into their receiver nodes: ``[e_pad] -> [n_pad]``."""
    return jax.ops.segment_sum(
        edge_values * g.edge_mask,
        g.receivers,
        num_segments=g.n_pad,
        indices_are_sorted=True,
    )
