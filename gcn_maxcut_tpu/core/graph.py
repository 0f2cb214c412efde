"""Static-shape sparse graph container for TPU.

The reference pipeline (``/root/reference``) represents each graph twice: as a
DGL graph for message passing and as a dense padded adjacency matrix that
doubles as the node-feature matrix (``graphExtender.py:28-48,106-110``).  On
TPU everything under ``jit`` needs static shapes, so this module provides a
single canonical container: a padded COO/CSR edge list sorted by receiver,
stored as a pytree of fixed-shape arrays.  The same container drives

  * sparse neighborhood aggregation (SpMM via sorted segment-sum or the
    Pallas kernel in ``ops/pallas_spmm.py``),
  * the edge-form differentiable cut loss (``objectives/cut_loss.py``),
  * on-device cut evaluation and post-processing sampling (``eval/``).

Padding conventions:
  * nodes:  real nodes occupy ids ``[0, n_nodes)``; ids ``[n_nodes, n_pad)``
    are padding with ``node_mask == 0``.
  * edges:  directed edges (both directions of each undirected edge) occupy
    the first ``n_edges`` slots after sorting by receiver; padded slots have
    ``senders == receivers == n_pad - 1`` and ``weights == edge_mask == 0``
    so they aggregate into the last (padding) row with zero contribution.

Because every field is a fixed-shape array, a list of graphs padded to the
same ``(n_pad, e_pad)`` stacks into a batch that can be ``vmap``-ed or
``lax.scan``-ned over — the TPU replacement for the reference's Python
``for i in dataset`` loop (``TrainingNeural.py:371``).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


def round_up(x: int, m: int) -> int:
    """Round ``x`` up to the next multiple of ``m`` (min ``m``)."""
    return max(m, ((int(x) + m - 1) // m) * m)


@struct.dataclass
class Graph:
    """Padded sparse graph (directed COO sorted by receiver + CSR offsets).

    Shapes (static): ``senders/receivers/weights/edge_mask: [e_pad]``,
    ``row_ptr: [n_pad + 1]``, ``degrees/node_mask: [n_pad]``, scalars
    ``n_nodes/n_edges`` (dynamic values, static shapes).
    """

    senders: jnp.ndarray      # int32 [e_pad]
    receivers: jnp.ndarray    # int32 [e_pad], nondecreasing
    weights: jnp.ndarray      # float32 [e_pad], 0 on padding
    edge_mask: jnp.ndarray    # float32 [e_pad], 1 real / 0 padding
    row_ptr: jnp.ndarray      # int32 [n_pad + 1] CSR offsets by receiver
    degrees: jnp.ndarray      # float32 [n_pad], # real incident edges
    node_mask: jnp.ndarray    # float32 [n_pad], 1 real / 0 padding
    n_nodes: jnp.ndarray      # int32 scalar
    n_edges: jnp.ndarray      # int32 scalar (directed count)

    @property
    def n_pad(self) -> int:
        return self.node_mask.shape[-1]

    @property
    def e_pad(self) -> int:
        return self.senders.shape[-1]


def _build_padded_coo(
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    n_nodes: int,
    n_pad: int,
    e_pad: int,
) -> Graph:
    """Assemble a `Graph` from host-side directed COO arrays."""
    m = src.shape[0]
    if m > e_pad:
        raise ValueError(f"{m} directed edges do not fit in e_pad={e_pad}")
    if n_nodes > n_pad:
        raise ValueError(f"{n_nodes} nodes do not fit in n_pad={n_pad}")

    order = np.argsort(dst, kind="stable")
    src, dst, w = src[order], dst[order], w[order]

    senders = np.full(e_pad, n_pad - 1, dtype=np.int32)
    receivers = np.full(e_pad, n_pad - 1, dtype=np.int32)
    weights = np.zeros(e_pad, dtype=np.float32)
    edge_mask = np.zeros(e_pad, dtype=np.float32)
    senders[:m] = src
    receivers[:m] = dst
    weights[:m] = w
    edge_mask[:m] = 1.0

    # CSR offsets over the padded receiver ids (padding edges land in the
    # final row, giving row_ptr[n_pad] == e_pad).
    counts = np.bincount(receivers, minlength=n_pad)
    row_ptr = np.zeros(n_pad + 1, dtype=np.int32)
    np.cumsum(counts, out=row_ptr[1:])

    degrees = np.zeros(n_pad, dtype=np.float32)
    np.add.at(degrees, dst, 1.0)
    # Exclude the padding contributions accumulated into row n_pad - 1.
    degrees[n_pad - 1] = float(np.sum(dst == n_pad - 1))

    node_mask = np.zeros(n_pad, dtype=np.float32)
    node_mask[:n_nodes] = 1.0

    return Graph(
        senders=jnp.asarray(senders),
        receivers=jnp.asarray(receivers),
        weights=jnp.asarray(weights),
        edge_mask=jnp.asarray(edge_mask),
        row_ptr=jnp.asarray(row_ptr),
        degrees=jnp.asarray(degrees),
        node_mask=jnp.asarray(node_mask),
        n_nodes=jnp.asarray(n_nodes, dtype=jnp.int32),
        n_edges=jnp.asarray(m, dtype=jnp.int32),
    )


def graph_from_edges(
    edges: Sequence[Tuple[int, int]] | np.ndarray,
    n_nodes: int,
    *,
    weights: Sequence[float] | np.ndarray | None = None,
    n_pad: int | None = None,
    e_pad: int | None = None,
    symmetrize: bool = True,
) -> Graph:
    """Build a padded `Graph` from an undirected edge list.

    ``edges`` is a sequence of (u, v) pairs.  When ``symmetrize`` is True
    (the default, matching the reference's undirected NetworkX graphs fed
    through ``dgl.from_networkx``), both directions are stored.
    """
    e = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    w = (
        np.ones(e.shape[0], dtype=np.float32)
        if weights is None
        else np.asarray(weights, dtype=np.float32)
    )
    if symmetrize:
        src = np.concatenate([e[:, 0], e[:, 1]])
        dst = np.concatenate([e[:, 1], e[:, 0]])
        w = np.concatenate([w, w])
    else:
        src, dst = e[:, 0], e[:, 1]

    n_pad = n_pad if n_pad is not None else round_up(n_nodes, 8)
    e_pad = e_pad if e_pad is not None else round_up(src.shape[0], 128)
    return _build_padded_coo(
        src.astype(np.int32), dst.astype(np.int32), w, n_nodes, n_pad, e_pad
    )


def graph_from_dense(
    adj: np.ndarray,
    *,
    n_pad: int | None = None,
    e_pad: int | None = None,
) -> Graph:
    """Build a `Graph` from a dense (possibly weighted) adjacency matrix.

    Mirrors the reference's ``gen_adj_matrix`` + ``qubo_dict_to_torch``
    densification (``commons.py:38-77``) in reverse: we sparsify because the
    TPU-native loss never materializes n×n (SURVEY.md §7.3).
    """
    adj = np.asarray(adj)
    n = adj.shape[0]
    src, dst = np.nonzero(adj)
    w = adj[src, dst].astype(np.float32)
    n_pad = n_pad if n_pad is not None else round_up(n, 8)
    e_pad = e_pad if e_pad is not None else round_up(max(1, src.shape[0]), 128)
    return _build_padded_coo(
        src.astype(np.int32), dst.astype(np.int32), w, n, n_pad, e_pad
    )


def dense_adjacency(g: Graph, width: int | None = None) -> jnp.ndarray:
    """Densify to ``[n_pad, width]`` (default ``width = n_pad``).

    This reproduces the reference's padded adjacency-as-node-features quirk
    (``graphExtender.py:28-48``: the n×max_nodes zero-extended adjacency is
    the GCN input, ``TrainingNeural.py:373``).  Stays on device, O(E) writes.
    """
    width = g.n_pad if width is None else width
    dense = jnp.zeros((g.n_pad, width), dtype=jnp.float32)
    vals = g.weights * g.edge_mask
    # Padding edges carry weight 0 and land at (n_pad-1, n_pad-1): harmless.
    cols = jnp.minimum(g.senders, width - 1)
    return dense.at[g.receivers, cols].add(vals)


def pad_graph_batch(graphs: List[Graph]) -> Graph:
    """Stack equally-padded graphs into a leading batch dimension.

    All graphs must share (n_pad, e_pad) — use the data pipeline's bucketing
    to arrange that.  The result's fields have shape ``[B, ...]`` and work
    directly with ``jax.vmap``/``lax.scan``.
    """
    shapes = {(g.n_pad, g.e_pad) for g in graphs}
    if len(shapes) != 1:
        raise ValueError(f"graphs must share padded shapes, got {shapes}")
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *graphs)
