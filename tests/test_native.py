"""Native C++ toolkit vs Python fallbacks (skipped when no compiler)."""

import numpy as np
import pytest

from gcn_maxcut_tpu.native import (
    is_available,
    random_regular_edges_native,
    sort_by_receiver_native,
    bfs_partition_native,
    brute_force_maxcut_native,
    greedy_maxcut_native,
)
from oracle import brute_force_maxcut as oracle_bf, oracle_cut_value

pytestmark = pytest.mark.skipif(not is_available(), reason="native lib unavailable")


def _dense(edges, n):
    adj = np.zeros((n, n), np.float32)
    for u, v in edges:
        adj[u, v] = adj[v, u] = 1
    return adj


def test_native_regular_graph_valid():
    e = random_regular_edges_native(200, 6, seed=1)
    assert e.shape == (600, 2)
    deg = np.bincount(e.ravel(), minlength=200)
    assert np.all(deg == 6)
    assert np.all(e[:, 0] < e[:, 1])
    assert len({tuple(x) for x in e.tolist()}) == 600


def test_native_regular_deterministic():
    e1 = random_regular_edges_native(100, 4, seed=7)
    e2 = random_regular_edges_native(100, 4, seed=7)
    np.testing.assert_array_equal(e1, e2)
    e3 = random_regular_edges_native(100, 4, seed=8)
    assert not np.array_equal(e1, e3)


def test_native_sort_by_receiver():
    rng = np.random.default_rng(0)
    src = rng.integers(0, 50, 300).astype(np.int64)
    dst = rng.integers(0, 50, 300).astype(np.int64)
    w = rng.random(300).astype(np.float32)
    s, d, ww = sort_by_receiver_native(src, dst, 50, w)
    assert np.all(np.diff(d) >= 0)
    # same multiset of (s, d, w) triples
    got = sorted(zip(s.tolist(), d.tolist(), np.round(ww, 5).tolist()))
    exp = sorted(zip(src.tolist(), dst.tolist(), np.round(w, 5).tolist()))
    assert got == exp


def test_native_bfs_partition():
    e = random_regular_edges_native(128, 4, seed=2)
    src = np.concatenate([e[:, 0], e[:, 1]])
    dst = np.concatenate([e[:, 1], e[:, 0]])
    owner = bfs_partition_native(src, dst, 128, 4)
    counts = np.bincount(owner, minlength=4)
    assert counts.sum() == 128
    assert counts.max() <= 32 + 4


def test_native_brute_force_matches_oracle():
    e = random_regular_edges_native(9, 4, seed=3)
    adj = _dense(e, 9)
    ev, _ = oracle_bf(adj, 3, fixed={0: 0, 1: 1, 2: 2})
    asn, val = brute_force_maxcut_native(e, 9, 3, 3)
    assert val == pytest.approx(ev)
    assert oracle_cut_value(adj, asn) == pytest.approx(ev)
    assert list(asn[:3]) == [0, 1, 2]


def test_native_greedy_improves_and_consistent():
    e = random_regular_edges_native(60, 6, seed=4)
    adj = _dense(e, 60)
    rng = np.random.default_rng(1)
    init = rng.integers(0, 3, 60)
    init[:3] = [0, 1, 2]
    c0 = oracle_cut_value(adj, init)
    asn, val = greedy_maxcut_native(e, 60, init)
    assert val >= c0
    assert val == pytest.approx(oracle_cut_value(adj, asn))
    assert list(asn[:3]) == [0, 1, 2]


def test_python_generate_dispatches_to_native_for_large_n():
    from gcn_maxcut_tpu.data.generate import random_regular_edges

    e = random_regular_edges(20_000, 4, seed=5)
    deg = np.bincount(e.ravel(), minlength=20_000)
    assert np.all(deg == 4)
