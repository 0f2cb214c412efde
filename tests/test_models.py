"""GCN layer/model parity vs the dense DGL-semantics oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from gcn_maxcut_tpu.core import graph_from_dense, dense_adjacency
from gcn_maxcut_tpu.models import (
    gcn_conv_init,
    gcn_conv_apply,
    gcn_softmax_init,
    gcn_softmax_apply,
    gcn_dev_init,
    gcn_dev_apply,
    embedding_init,
    count_params,
)
from oracle import oracle_gcn_conv


def _graph(n=18, p=0.4, seed=0):
    rng = np.random.default_rng(seed)
    a = np.triu((rng.random((n, n)) < p).astype(np.float32), 1)
    a = a + a.T
    return graph_from_dense(a), a


def test_conv_matches_dense_oracle_both_orders():
    g, a = _graph()
    n = a.shape[0]
    rng = np.random.default_rng(1)
    for in_f, out_f in [(12, 5), (5, 12)]:  # project-first and aggregate-first
        params = gcn_conv_init(jax.random.PRNGKey(0), in_f, out_f)
        x = rng.normal(size=(g.n_pad, in_f)).astype(np.float32)
        y = np.asarray(gcn_conv_apply(params, g, jnp.asarray(x)))
        expect = oracle_gcn_conv(
            a, x[:n], np.asarray(params["w"]), np.asarray(params["b"])
        )
        np.testing.assert_allclose(y[:n], expect, rtol=1e-4, atol=1e-5)


def test_conv_zero_degree_clamp():
    # isolated node: degree clamped to 1, output = bias only
    a = np.zeros((4, 4), np.float32)
    a[0, 1] = a[1, 0] = 1.0
    g = graph_from_dense(a)
    params = gcn_conv_init(jax.random.PRNGKey(1), 3, 2)
    x = jnp.ones((g.n_pad, 3), jnp.float32)
    y = np.asarray(gcn_conv_apply(params, g, x))
    np.testing.assert_allclose(y[2], np.asarray(params["b"]), atol=1e-6)


def test_gcn_softmax_shapes_and_simplex():
    g, a = _graph(n=25, seed=2)
    params = gcn_softmax_init(jax.random.PRNGKey(2), 32, 16, 3)
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(g.n_pad, 32)), jnp.float32
    )
    probs = np.asarray(gcn_softmax_apply(params, g, x))
    assert probs.shape == (g.n_pad, 3)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-5)
    assert np.all(probs >= 0)


def test_flagship_param_count_matches_reference():
    # Reference: 1000→500→3 GCNSoftmax = 502,003 params
    # (neural_network_testing.ipynb cell 6 output; SURVEY.md §2.3).
    params = gcn_softmax_init(jax.random.PRNGKey(0), 1000, 500, 3)
    assert count_params(params) == 502_003


def test_dropout_train_vs_eval():
    g, a = _graph(n=10, seed=4)
    params = gcn_softmax_init(jax.random.PRNGKey(3), 8, 4, 3)
    x = jnp.ones((g.n_pad, 8), jnp.float32)
    eval_out = gcn_softmax_apply(params, g, x, dropout=0.5, train=False)
    train_out = gcn_softmax_apply(
        params, g, x, dropout=0.5, train=True, dropout_rng=jax.random.PRNGKey(4)
    )
    assert not np.allclose(np.asarray(eval_out), np.asarray(train_out))
    # eval path deterministic
    eval_out2 = gcn_softmax_apply(params, g, x, dropout=0.5, train=False)
    np.testing.assert_allclose(np.asarray(eval_out), np.asarray(eval_out2))


def test_gcn_dev_sigmoid_range():
    g, _ = _graph(n=12, seed=5)
    params = gcn_dev_init(jax.random.PRNGKey(5), 6, 4, 1)
    x = jnp.asarray(np.random.default_rng(6).normal(size=(g.n_pad, 6)), jnp.float32)
    out = np.asarray(gcn_dev_apply(params, g, x))
    assert out.shape == (g.n_pad, 1)
    assert np.all((out > 0) & (out < 1))


def test_adjacency_as_features_forward():
    # The reference's load-bearing quirk: node features ARE the padded
    # adjacency rows (SURVEY.md §2.3). End-to-end forward must accept them.
    g, a = _graph(n=20, seed=7)
    feats = dense_adjacency(g, width=64)
    params = gcn_softmax_init(jax.random.PRNGKey(6), 64, 32, 3)
    probs = gcn_softmax_apply(params, g, feats)
    assert probs.shape == (g.n_pad, 3)


def test_embedding_init_shape():
    emb = embedding_init(jax.random.PRNGKey(7), 10, 4)
    assert emb.shape == (10, 4)
