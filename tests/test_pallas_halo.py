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


# ---- packed interleaved-order halo kernel ---------------------------------

from gcn_maxcut_tpu.ops.pallas_halo import halo_banded_spmm_unit_packed
from gcn_maxcut_tpu.ops.pallas_banded import (
    banded_spmm_unit_xla,
    pack_interleaved,
    unpack_interleaved,
)


def _run_packed_halo(xg, offsets, r, n_dev, block, interpret=True):
    """Shard pack_interleaved(xg) contiguously over n_dev and run the
    packed halo kernel; returns the result in global NODE order."""
    n, F = xg.shape
    n_loc = n // n_dev
    pg = np.asarray(pack_interleaved(jnp.asarray(xg), r))
    x_sh = jnp.asarray(pg.reshape(n_dev, n_loc, F))
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("graph",))
    fn = jax.shard_map(
        lambda x: halo_banded_spmm_unit_packed(
            x[0], offsets, r, "graph", block
        )[None],
        mesh=mesh,
        in_specs=(P("graph"),),
        out_specs=P("graph"),
        check_vma=False,
    )
    if interpret:
        with pltpu.force_tpu_interpret_mode():
            out = np.asarray(jax.jit(fn)(x_sh))
    else:
        out = np.asarray(jax.jit(fn)(x_sh))
    return np.asarray(
        unpack_interleaved(jnp.asarray(out.reshape(n, F)), r)
    )


@pytest.mark.parametrize("n_dev,block", [(4, 16), (2, 32), (8, 8)])
def test_packed_halo_matches_global_circulant(n_dev, block):
    r, F, m_loc = 4, 32, 64                      # L = 128 lanes
    offsets = (1, -1, 5, -5, 13, -13)
    n = n_dev * m_loc * r
    rng = np.random.default_rng(0)
    xg = rng.normal(size=(n, F)).astype(np.float32)
    out = _run_packed_halo(xg, offsets, r, n_dev, block)
    ref = np.asarray(banded_spmm_unit_xla(jnp.asarray(xg), offsets))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_packed_halo_single_block_per_device():
    # n_blocks == 1: pre AND post windows both arrive by RDMA
    r, F, m_loc = 4, 32, 32
    offsets = (3, -3, 7, -7)
    n_dev = 4
    n = n_dev * m_loc * r
    rng = np.random.default_rng(1)
    xg = rng.normal(size=(n, F)).astype(np.float32)
    out = _run_packed_halo(xg, offsets, r, n_dev, block=m_loc)
    ref = np.asarray(banded_spmm_unit_xla(jnp.asarray(xg), offsets))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_packed_halo_xla_fallback_parity():
    # L % 128 != 0 routes to the ppermute fallback — same semantics
    r, F, m_loc, n_dev = 3, 8, 32, 4             # L = 24
    offsets = (2, -2, 9, -9)
    n = n_dev * m_loc * r
    rng = np.random.default_rng(2)
    xg = rng.normal(size=(n, F)).astype(np.float32)
    out = _run_packed_halo(xg, offsets, r, n_dev, block=None, interpret=False)
    ref = np.asarray(banded_spmm_unit_xla(jnp.asarray(xg), offsets))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_packed_halo_grad_is_transpose():
    # d/dx <ct, A x> = A^T ct == circulant with negated offsets
    r, F, m_loc, n_dev = 4, 32, 32, 4
    offsets = (1, -1, 6, -6)
    n = n_dev * m_loc * r
    n_loc = n // n_dev
    rng = np.random.default_rng(3)
    xg = rng.normal(size=(n, F)).astype(np.float32)
    ct = rng.normal(size=(n, F)).astype(np.float32)
    pg = np.asarray(pack_interleaved(jnp.asarray(xg), r))
    ct_p = np.asarray(pack_interleaved(jnp.asarray(ct), r))
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("graph",))

    # explicit vjp pull with ct as the cotangent (a psum'd scalar loss would
    # double-count under check_vma=False: psum transposes to psum again)
    def pull(x_sh, ct_sh):
        _, vjp_fn = jax.vjp(
            lambda x: halo_banded_spmm_unit_packed(
                x[0], offsets, r, "graph", 16
            )[None],
            x_sh,
        )
        return vjp_fn(ct_sh)[0]

    fn = jax.shard_map(
        pull,
        mesh=mesh,
        in_specs=(P("graph"), P("graph")),
        out_specs=P("graph"),
        check_vma=False,
    )
    with pltpu.force_tpu_interpret_mode():
        g = np.asarray(
            jax.jit(fn)(
                jnp.asarray(pg.reshape(n_dev, n_loc, F)),
                jnp.asarray(ct_p.reshape(n_dev, n_loc, F)),
            )
        )
    g_node = np.asarray(
        unpack_interleaved(jnp.asarray(g.reshape(n, F)), r)
    )
    neg = tuple(-o for o in offsets)
    ref = np.asarray(banded_spmm_unit_xla(jnp.asarray(ct), neg))
    np.testing.assert_allclose(g_node, ref, rtol=1e-5, atol=1e-5)


def test_halo_spmm_bf16_streams():
    """bf16 halo streams (round 4): output dtype follows input, values
    within bf16 read tolerance of the f32 path, RDMA wrap included."""
    n_dev, block, n_shard, F = 4, 16, 64, 128
    offsets = (1, -1, 5, -5)
    n = n_dev * n_shard
    rng = np.random.default_rng(3)
    xg = rng.normal(size=(n, F)).astype(np.float32)
    wg = np.ones((n, len(offsets)), np.float32)
    x_sh = jnp.asarray(xg.reshape(n_dev, n_shard, F)).astype(jnp.bfloat16)
    w_sh = jnp.asarray(wg.reshape(n_dev, n_shard, len(offsets)))
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("graph",))
    fn = jax.shard_map(
        lambda x, w: halo_banded_spmm(x[0], w[0], offsets, "graph", block)[None],
        mesh=mesh,
        in_specs=(P("graph"), P("graph")),
        out_specs=P("graph"),
        check_vma=False,
    )
    with pltpu.force_tpu_interpret_mode():
        y = fn(x_sh, w_sh)
    assert y.dtype == jnp.bfloat16
    expect = _expect(xg, wg, offsets)
    scale = np.abs(expect).max()
    np.testing.assert_allclose(
        np.asarray(y, np.float32).reshape(n, F) / scale, expect / scale,
        atol=3e-2,
    )
