"""Halo-exchange banded SpMM: interpret-mode parity on the virtual mesh.

Interpret mode simulates remote DMAs and semaphores, so the exact program
that targets ICI on a TPU slice is validated here against the
single-device circulant reference.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from gcn_maxcut_tpu.ops.pallas_halo import halo_banded_spmm


def _expect(x_global, w_global, offsets):
    out = np.zeros_like(x_global)
    for k, o in enumerate(offsets):
        out += w_global[:, k : k + 1] * np.roll(x_global, -o, axis=0)
    return out


@pytest.mark.parametrize("n_dev,block", [(4, 16), (2, 32)])
def test_halo_spmm_matches_global_circulant(n_dev, block):
    n_shard, F = 64, 128
    offsets = (1, -1, 5, -5, 13, -13)
    n = n_dev * n_shard
    rng = np.random.default_rng(0)
    xg = rng.normal(size=(n, F)).astype(np.float32)
    wg = rng.random((n, len(offsets))).astype(np.float32)

    x_sh = jnp.asarray(xg.reshape(n_dev, n_shard, F))
    w_sh = jnp.asarray(wg.reshape(n_dev, n_shard, len(offsets)))

    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("graph",))
    fn = jax.shard_map(
        lambda x, w: halo_banded_spmm(
            x[0], w[0], offsets, "graph", block
        )[None],
        mesh=mesh,
        in_specs=(P("graph"), P("graph")),
        out_specs=P("graph"),
        check_vma=False,
    )
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(jax.jit(fn)(x_sh, w_sh))

    np.testing.assert_allclose(
        out.reshape(n, F), _expect(xg, wg, offsets), rtol=1e-5, atol=1e-5
    )


def test_halo_spmm_single_device_wraps():
    # D=1: the RDMA loops back to self == circulant wrap
    n_shard, F = 64, 128
    offsets = (2, -2)
    rng = np.random.default_rng(1)
    xg = rng.normal(size=(n_shard, F)).astype(np.float32)
    wg = rng.random((n_shard, 2)).astype(np.float32)

    mesh = Mesh(np.array(jax.devices()[:1]), ("graph",))
    fn = jax.shard_map(
        lambda x, w: halo_banded_spmm(x[0], w[0], offsets, "graph", 16)[None],
        mesh=mesh,
        in_specs=(P("graph"), P("graph")),
        out_specs=P("graph"),
        check_vma=False,
    )
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(
            jax.jit(fn)(xg[None], wg[None])
        )[0]
    np.testing.assert_allclose(out, _expect(xg, wg, offsets), rtol=1e-5, atol=1e-5)


def test_halo_spmm_shape_validation():
    with pytest.raises(ValueError, match="multiple"):
        halo_banded_spmm(
            jnp.ones((60, 128)), jnp.ones((60, 2)), (1, -1), "graph", 16
        )
