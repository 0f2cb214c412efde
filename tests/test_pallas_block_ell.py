"""Block-ELL windowed SpMM: plan selection, interpret-mode parity, VJP.

This is the general-graph locality path (VERDICT r2 task #1): graphs whose
RCM/BFS reorder bounds neighbor offsets ride a Pallas fused-window kernel
(one-hot gather on the VPU, contraction on the MXU) instead of per-edge HBM
row gathers; edges escaping the window (e.g. normalized-terminal rows) ride
a small outlier COO correction.  Reference kernel being replaced: DGL SpMM,
``/root/reference/python/Training/TrainingNeural.py:80,83``.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from gcn_maxcut_tpu.core.graph import attach_block_ell, graph_from_edges
from gcn_maxcut_tpu.ops.pallas_block_ell import plan_block_ell
from gcn_maxcut_tpu.ops.segment import spmm, spmm_ell


def _banded_graph(n=2048, per_node=3, w=50, long_edges=(), seed=0,
                  weighted=False, block_ell=True):
    rng = np.random.default_rng(seed)
    edges = []
    for i in range(n):
        for _ in range(per_node):
            j = int((i + rng.integers(-w, w + 1)) % n)
            if j != i:
                edges.append((i, j))
    edges += list(long_edges)
    wts = rng.random(len(edges)).astype(np.float32) + 0.5 if weighted else None
    return graph_from_edges(edges, n, weights=wts, block_ell=block_ell)


def test_plan_accepts_banded_rejects_expander():
    g = _banded_graph()
    assert g.bell_block is not None and g.bell_wp is not None
    assert g.n_pad % g.bell_block == 0

    rng = np.random.default_rng(1)
    n = 2048
    edges = np.stack(
        [np.repeat(np.arange(n), 3), rng.integers(0, n, 3 * n)], axis=1
    )
    edges = edges[edges[:, 0] != edges[:, 1]]
    ge = graph_from_edges(edges, n, block_ell=True)
    assert ge.bell_block is None  # expander: no window fits 99% of edges


def test_plan_outliers_capture_long_edges():
    long = [(0, 1000), (5, 1500), (1024, 30)]
    g = _banded_graph(long_edges=long)
    assert g.bell_block is not None
    out = set(
        zip(
            np.asarray(g.bell_out_senders)[np.asarray(g.bell_out_mask) > 0],
            np.asarray(g.bell_out_receivers)[np.asarray(g.bell_out_mask) > 0],
        )
    )
    for u, v in long:  # both directions of every long edge are outliers
        assert (u, v) in out and (v, u) in out


@pytest.mark.parametrize("weighted", [False, True])
def test_kernel_parity_vs_spmm_ell(weighted):
    """The dispatched block-ELL path must match the ELL gather path to the
    split-mode tolerance (hi/lo bf16 MXU passes; not bit-equal because the
    one-hot contraction sums window positions in a different order)."""
    g = _banded_graph(long_edges=[(0, 900), (7, 1400)], weighted=weighted,
                      seed=2)
    assert g.bell_block is not None
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(g.n_pad, 128)), np.float32)
    ew = g.weights if weighted else None
    mode = "weights" if weighted else "mask"
    with pltpu.force_tpu_interpret_mode():
        y = spmm(g, x, edge_weights=ew)
    ref = spmm_ell(g, x, mode)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_grad_parity_symmetric():
    g = _banded_graph(seed=4, long_edges=[(3, 1200)])
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(g.n_pad, 128)), np.float32)
    with pltpu.force_tpu_interpret_mode():
        dx = jax.grad(lambda x_: jnp.sum(spmm(g, x_) ** 2))(x)
    dx_ref = jax.grad(lambda x_: jnp.sum(spmm_ell(g, x_, "mask") ** 2))(x)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=1e-4, atol=1e-4)


def test_narrow_features_fall_back_exactly():
    """F % 128 != 0 outside interpret mode takes the exact XLA fallback
    (f32 gathers over the compact table + outlier correction) — matches
    spmm_ell up to the outlier rows' summation order."""
    g = _banded_graph(seed=6, long_edges=[(2, 1100)])
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(g.n_pad, 3)), np.float32)
    y = spmm(g, x)
    ref = spmm_ell(g, x, "mask")
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_small_graphs_skip_auto_plan():
    g = _banded_graph(n=512, block_ell="auto")
    assert g.bell_block is None  # auto threshold: n_pad >= 4096


def test_attach_block_ell_roundtrip():
    g = _banded_graph(block_ell=False)
    assert g.bell_block is None
    g2 = attach_block_ell(g)
    assert g2.bell_block is not None
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(g.n_pad, 128)), np.float32)
    with pltpu.force_tpu_interpret_mode():
        y = spmm(g2, x)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(spmm_ell(g, x, "mask")),
        rtol=1e-5, atol=1e-5,
    )


def test_plan_rejects_tiny_graphs():
    assert plan_block_ell(
        np.array([0, 1]), np.array([1, 0]), np.ones(2, np.float32), 512
    ) is None


def test_reorder_auto_recovers_band_from_shuffled_ids():
    # a banded graph whose node ids were randomly shuffled: raw edges span
    # the whole id space, so no plan attaches — reorder="auto" RCM-relabels
    # and recovers the kernel path (VERDICT r2 task #1's unbuilt bridge)
    n = 2048
    rng = np.random.default_rng(3)
    base = _banded_graph(n=n, block_ell=True)
    assert base.bell_block is not None

    # shuffle ids of the same edge list
    em = np.asarray(base.edge_mask) > 0
    ue = np.stack(
        [np.asarray(base.senders)[em], np.asarray(base.receivers)[em]], axis=1
    )
    ue = ue[ue[:, 0] < ue[:, 1]]                 # one direction
    shuf = rng.permutation(n)
    shuffled = shuf[ue]

    g_off = graph_from_edges(shuffled, n, block_ell=True, reorder="off")
    assert g_off.bell_block is None              # shuffled ids: no band
    g_auto = graph_from_edges(shuffled, n, block_ell=True, reorder="auto")
    assert g_auto.bell_block is not None         # RCM recovered the band
    assert g_auto.reorder_perm is not None

    # exactness: spmm on the relabeled graph == gather-path spmm on the
    # shuffled graph, rows mapped through the stored permutation
    x = jnp.asarray(
        np.random.default_rng(4).normal(size=(n, 128)).astype(np.float32)
    )
    perm = np.asarray(g_auto.reorder_perm)       # old id -> new id
    inv = np.argsort(perm)                       # new id -> old id
    with pltpu.force_tpu_interpret_mode():
        y_auto = np.asarray(spmm(g_auto, x[inv]))  # row j = original inv[j]
    y_ref = np.asarray(spmm_ell(g_off, x))
    np.testing.assert_allclose(y_auto[perm], y_ref, rtol=2e-5, atol=2e-5)


def test_reorder_auto_leaves_expander_untouched():
    rng = np.random.default_rng(5)
    n = 2048
    edges = np.stack(
        [np.repeat(np.arange(n), 3), rng.integers(0, n, 3 * n)], axis=1
    )
    edges = edges[edges[:, 0] != edges[:, 1]]
    g = graph_from_edges(edges, n, block_ell=True, reorder="auto")
    assert g.bell_block is None and g.reorder_perm is None


def test_reorder_rcm_explicit():
    g = _banded_graph(block_ell=False)
    em = np.asarray(g.edge_mask) > 0
    ue = np.stack(
        [np.asarray(g.senders)[em], np.asarray(g.receivers)[em]], axis=1
    )
    ue = ue[ue[:, 0] < ue[:, 1]]
    g2 = graph_from_edges(ue, 2048, block_ell=False, reorder="rcm")
    assert g2.reorder_perm is not None
    assert int(np.asarray(g2.n_edges)) == int(np.asarray(g.n_edges))
    with pytest.raises(ValueError):
        graph_from_edges(ue, 2048, reorder="bogus")
