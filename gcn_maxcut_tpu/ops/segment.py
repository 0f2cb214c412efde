"""Sparse message-passing primitives as sorted segment ops (XLA path).

These are the TPU-native replacement for DGL's C++ SpMM kernels that the
reference calls through ``dgl.nn.pytorch.GraphConv``
(``Training/TrainingNeural.py:80,83`` in the reference tree).  The graph's
edge list is sorted by receiver at construction (``core/graph.py``), so
``jax.ops.segment_sum(..., indices_are_sorted=True)`` lowers to an efficient
scatter-add; gradients flow through the gather/scatter pair automatically.

Hand-written Pallas kernels exist for the structured cases Mosaic can
lower efficiently — ``ops/pallas_banded.py`` (bounded neighbor offsets:
circulant or BFS/RCM/METIS locality-reordered graphs) and
``ops/pallas_halo.py`` (multi-chip RDMA halo exchange).  Arbitrary
row-gathers do not lower well in Mosaic (measured), so general random
graphs stay on the ELL gather path below; small padded graphs can instead
use the dense-MXU aggregation path (``models.gcn_conv_apply(a_dense=...)``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gcn_maxcut_tpu.core.graph import Graph


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ell_gather_sum(
    x: jnp.ndarray, nbr: jnp.ndarray, w: jnp.ndarray, bf16: bool = False
) -> jnp.ndarray:
    """y[i] = Σ_j w[i, j] · x[nbr[i, j]] — gather-only SpMM (no scatter).

    On TPU the scatter half of segment-sum measured ~3x slower than pure
    row gathers (v5e), so the forward avoids it entirely; the custom VJP
    exploits adjacency symmetry (undirected graphs store both directions
    with equal weights) to make the backward a gather too:
    dL/dx = Aᵀ·dy = A·dy.

    bf16 feature rows: when ``x`` arrives as bfloat16 the gathers move
    half the bytes and accumulation stays f32 (output is f32).  Probe
    verdict (``experiments/gather_bf16_probe.py``, 3 runs on v5e): the
    expander gather is ROW/DESCRIPTOR-bound, not byte-bound — a single
    bf16 row-gather streams only ~80 GB/s (same per-row cost as f32, half
    the bytes), so bf16 features buy a modest +4-14% on the d-gather
    chain (5.0-5.7e8 -> 5.6-5.9e8 edges/s at n=100k d=8 F=128), from the
    halved output/intermediate traffic, not the gathers.  One early 3x
    reading did not reproduce (tunnel variance; PARITY §3's re-measure
    rule).  The mode ships as a small opt-in lever; the backward gathers
    the cotangent in bf16 too.
    """
    return _ell_sum(x, nbr, w)


def _ell_sum(x, nbr, w):
    # d separate row-gathers (no [n, d, F] intermediate): measured the
    # fastest formulation on v5e (273M vs 87M edges/s for gather+scatter).
    d = nbr.shape[1]
    bf16 = x.dtype == jnp.bfloat16

    def g(j):
        r = x[nbr[:, j]]
        return r.astype(jnp.float32) if bf16 else r

    out = w[:, 0:1] * g(0)
    for j in range(1, d):
        out = out + w[:, j : j + 1] * g(j)
    return out


def _ell_fwd(x, nbr, w, bf16):
    return _ell_sum(x, nbr, w), (nbr, w)


def _ell_bwd(bf16, res, dy):
    nbr, w = res
    # symmetric adjacency: transpose SpMM == same SpMM; keep the bf16
    # byte saving in the backward when the forward opted in
    if bf16:
        dy = dy.astype(jnp.bfloat16)
    dx = _ell_sum(dy, nbr, w)
    if bf16:
        dx = dx.astype(jnp.bfloat16)
    return dx, None, jnp.zeros_like(w)


_ell_gather_sum.defvjp(_ell_fwd, _ell_bwd)


def spmm_ell(g: Graph, x: jnp.ndarray, edge_weights_mode: str = "mask") -> jnp.ndarray:
    """ELL fast-path SpMM.  ``edge_weights_mode``: 'mask' (unweighted
    aggregation over real edges, the GraphConv case) or 'weights'.
    Accepts f32 or bf16 features (bf16 = half the gather bytes, f32
    accumulation, f32 output — the byte-bound expander lever)."""
    w = g.ell_mask if edge_weights_mode == "mask" else g.ell_weights
    return _ell_gather_sum(x, g.ell_senders, w, x.dtype == jnp.bfloat16)


def _spmm_block_ell(g: Graph, x: jnp.ndarray, mode: str) -> jnp.ndarray:
    """Windowed block-ELL Pallas path (locality-reordered graphs); see
    ``ops/pallas_block_ell.py``.  Exact same math as ``spmm_ell`` (in-window
    edges ride the kernel, out-of-window outliers ride a COO correction)."""
    from gcn_maxcut_tpu.ops.pallas_block_ell import block_ell_spmm

    w = g.bell_mask if mode == "mask" else g.bell_weights
    ow = g.bell_out_mask if mode == "mask" else g.bell_out_weights
    return block_ell_spmm(
        x, g.bell_senders, w, g.bell_out_senders, g.bell_out_receivers, ow,
        g.n_pad, g.bell_block, g.bell_wp,
    )


def spmm(
    g: Graph,
    x: jnp.ndarray,
    edge_weights: jnp.ndarray | None = None,
    feature_dtype: jnp.dtype | str | None = None,
) -> jnp.ndarray:
    """Dispatching SpMM: windowed block-ELL Pallas kernel when the graph
    carries a locality plan (``g.bell_block``, ~2x the gather path —
    measured 68% vs 34% of the gather roofline on v5e); else the ELL
    gather-only path when the graph carries ELL tables and the request
    matches a stored weighting; else XLA segment-sum.

    ``feature_dtype="bfloat16"`` (or passing ``x`` already as bf16)
    opts the GATHER path into half-width feature rows with f32
    accumulation.  Measured verdict: the expander gather is row/
    descriptor-bound, so this buys a modest +4-14% (5.6-5.9e8 vs
    5.0-5.7e8 edges/s at n=100k d=8 F=128 across 3 runs;
    ``experiments/gather_bf16_probe.py``) at bf16 read precision (~3
    decimal digits) — an opt-in lever, not a 2x.  Graphs with a
    block-ELL plan ignore the request entirely (whether made via the
    kwarg or by pre-casting ``x`` to bf16): the f32 Pallas kernel
    (74-77% of the gather roofline) is far past the gather ceiling
    already, so bf16 input is cast back to f32 there.

    NOTE: the ELL and block-ELL backwards assume a symmetric adjacency
    (always true for graphs built with ``symmetrize=True``, the framework
    default).
    """
    if g.bell_block is not None:
        # the plan wins over any dtype request (including pre-cast bf16
        # input — advisor r4): the f32 kernel is already past the gather
        # ceiling, so a quiet fall-through to the gather path would be a
        # perf downgrade, not an optimization
        if edge_weights is None:
            return _spmm_block_ell(g, x.astype(jnp.float32), "mask")
        if edge_weights is g.weights:
            return _spmm_block_ell(g, x.astype(jnp.float32), "weights")
    if feature_dtype is not None:
        x = x.astype(feature_dtype)
    if g.ell_senders is not None:
        if edge_weights is None:
            return spmm_ell(g, x, "mask")
        if edge_weights is g.weights:
            return spmm_ell(g, x, "weights")
    return spmm_xla(g, x.astype(jnp.float32), edge_weights)


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
