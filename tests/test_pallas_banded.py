"""Banded/circulant Pallas SpMM: interpret-mode parity + VJP math."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from gcn_maxcut_tpu.ops.pallas_banded import (
    _banded_spmm_raw,
    banded_spmm_xla,
)


def _oracle(x, w, offsets):
    return sum(
        np.asarray(w)[:, k : k + 1] * np.roll(np.asarray(x), -o, axis=0)
        for k, o in enumerate(offsets)
    )


@pytest.mark.parametrize(
    "n,block,offsets",
    [
        (64, 16, (1, -1, 3, -3)),
        (64, 32, (5, -5)),
        (128, 32, (0, 7, -7, 31, -31)),
    ],
)
def test_banded_kernel_interpret_parity(n, block, offsets):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, 8)), jnp.float32)
    w = jnp.asarray(rng.random((n, len(offsets))), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        y = _banded_spmm_raw(x, w, offsets, block)
    np.testing.assert_allclose(
        np.asarray(y), _oracle(x, w, offsets), rtol=1e-5, atol=1e-5
    )


def test_banded_xla_reference_matches_oracle():
    rng = np.random.default_rng(1)
    offsets = (2, -2, 9)
    x = jnp.asarray(rng.normal(size=(48, 4)), jnp.float32)
    w = jnp.asarray(rng.random((48, 3)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(banded_spmm_xla(x, w, offsets)),
        _oracle(x, w, offsets),
        rtol=1e-5,
    )


def test_banded_vjp_math_matches_autodiff():
    # the custom VJP's transpose algebra (negated offsets, rolled weights)
    # must equal autodiff through the XLA reference implementation
    rng = np.random.default_rng(2)
    offsets = (1, -4, 6)
    x = jnp.asarray(rng.normal(size=(32, 5)), jnp.float32)
    w = jnp.asarray(rng.random((32, 3)), jnp.float32)

    gx_ref, gw_ref = jax.grad(
        lambda x_, w_: jnp.sum(jnp.sin(banded_spmm_xla(x_, w_, offsets))),
        argnums=(0, 1),
    )(x, w)

    y = banded_spmm_xla(x, w, offsets)
    dy = jnp.cos(y)
    neg = tuple(-o for o in offsets)
    w_t = jnp.stack([jnp.roll(w[:, k], o) for k, o in enumerate(offsets)], axis=1)
    dx = banded_spmm_xla(dy, w_t, neg)
    dw = jnp.stack(
        [jnp.sum(dy * jnp.roll(x, -o, axis=0), axis=1) for o in offsets], axis=1
    )
    np.testing.assert_allclose(np.asarray(dx), np.asarray(gx_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(gw_ref), rtol=1e-4, atol=1e-5)


def test_banded_rejects_bad_shapes():
    # wide (kernel-path) arrays hit the shape checks at trace time
    x = jnp.ones((60, 128))
    w = jnp.ones((60, 2))
    with pytest.raises(ValueError, match="multiple of block"):
        _banded_spmm_raw(x, w, (1, -1), 16)


def test_banded_narrow_features_fall_back_to_xla():
    # lane-tiling constraint: F not a multiple of 128 silently uses rolls
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(64, 4)), jnp.float32)
    w = jnp.asarray(rng.random((64, 2)), jnp.float32)
    y = _banded_spmm_raw(x, w, (1, -1), 16)
    np.testing.assert_allclose(
        np.asarray(y), _oracle(x, w, (1, -1)), rtol=1e-5
    )
