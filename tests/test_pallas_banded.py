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


# ---- interleaved packed variant (full bandwidth for narrow F) ------------

def test_pack_unpack_roundtrip():
    from gcn_maxcut_tpu.ops.pallas_banded import (
        pack_interleaved, unpack_interleaved)
    x = jnp.asarray(np.arange(64 * 5, dtype=np.float32).reshape(64, 5))
    for r in (4, 8, 16):
        y = unpack_interleaved(pack_interleaved(x, r), r)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


@pytest.mark.parametrize(
    "n,F,r,offsets",
    [
        (4096, 16, 8, (1, -1, 5, -5)),
        (8192, 4, 32, (2, -2, 7, -7, 63, -63)),
        (4096, 32, 8, (33, -33, 1, -1)),
        (8192, 16, 32, (9, -9, 2, -2)),
        (4096, 16, 8, (3, 11)),            # one-sided, no ± symmetry
    ],
)
def test_packed_unit_matches_rolls(n, F, r, offsets):
    from gcn_maxcut_tpu.ops.pallas_banded import (
        banded_spmm_unit_packed, banded_spmm_unit_xla,
        pack_interleaved, unpack_interleaved)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, F)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        yp = banded_spmm_unit_packed(pack_interleaved(x, r), offsets, r)
    y = unpack_interleaved(yp, r)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(banded_spmm_unit_xla(x, offsets)),
        rtol=1e-5, atol=1e-5,
    )


def test_packed_unit_gradient_matches_rolls():
    from gcn_maxcut_tpu.ops.pallas_banded import (
        banded_spmm_unit_packed, banded_spmm_unit_xla,
        pack_interleaved, unpack_interleaved)
    rng = np.random.default_rng(1)
    n, F, r, offsets = 4096, 16, 8, (1, -1, 9, -9)
    x = jnp.asarray(rng.normal(size=(n, F)).astype(np.float32))
    xp = pack_interleaved(x, r)
    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(
            lambda z: jnp.sum(banded_spmm_unit_packed(z, offsets, r) ** 2)
        )(xp)
    g_ref = jax.grad(
        lambda z: jnp.sum(banded_spmm_unit_xla(z, offsets) ** 2)
    )(x)
    np.testing.assert_allclose(
        np.asarray(unpack_interleaved(g, r)), np.asarray(g_ref),
        rtol=1e-4, atol=1e-4,
    )


def test_packed_unit_graceful_fallback():
    # r*F not a multiple of 128: exact same result via the rolls fallback
    from gcn_maxcut_tpu.ops.pallas_banded import (
        banded_spmm_unit_packed, banded_spmm_unit_xla,
        pack_interleaved, unpack_interleaved)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(120, 5)).astype(np.float32))
    y = unpack_interleaved(
        banded_spmm_unit_packed(pack_interleaved(x, 4), (1, -1), 4), 4
    )
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(banded_spmm_unit_xla(x, (1, -1))),
        rtol=1e-5,
    )


def test_packed_giant_trainer_improves_cut():
    from gcn_maxcut_tpu.bench.giant_demo import train_banded_giant_packed
    with pltpu.force_tpu_interpret_mode():
        r = train_banded_giant_packed(
            n=8192, epochs=20, epochs_per_call=5, bandwidth=31
        )
    assert r["final_cut"] > r["initial_cut"]
    assert r["cut_fraction"] > 0.75


def test_auto_block_invariants():
    """Auto-picked blocks divide n, are 8-aligned, fit the VMEM budget,
    and leave >=8 grid steps for pipeline overlap (measured requirement:
    2 blocks = no DMA/compute overlap)."""
    from gcn_maxcut_tpu.ops.pallas_banded import _auto_block

    for rows, width, wp in [
        (131_072, 128, 64), (10_002_432 // 8, 1024, 64),
        (16_384, 128, 64), (4096, 128, 16), (1024, 256, 8),
    ]:
        b = _auto_block(rows, width, wp)
        assert b is not None
        assert rows % b == 0 and b % 8 == 0
        assert b <= 8192
        if rows >= 64:
            assert rows // b >= 8, (rows, b)
        # double buffer + out block inside the 64 MB budget
        assert 12 * b * width * 4 <= 64 * 1024 * 1024 + 12 * wp * width * 4


def test_banded_spmm_explicit_block_still_validated():
    import pytest as _pt
    from gcn_maxcut_tpu.ops.pallas_banded import banded_spmm_unit

    with _pt.raises(ValueError, match="multiple"):
        banded_spmm_unit(jnp.ones((100, 128)), (1, -1), 64)


def test_weighted_mxu_mode_matches_vpu_mode():
    # the default "mxu" weighted path (3-way bf16 split broadcast matmul)
    # must agree with the bit-exact "vpu" lane-broadcast form to ~2^-24
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu
    from gcn_maxcut_tpu.ops.pallas_banded import banded_spmm, banded_spmm_xla

    n, F = 1024, 128
    offsets = (3, -3, 17, -17)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, F)).astype(np.float32))
    w = jnp.asarray(rng.uniform(0.25, 4.0, size=(n, 4)).astype(np.float32))
    ref = banded_spmm_xla(x, w, offsets)
    with pltpu.force_tpu_interpret_mode():
        y_mxu = banded_spmm(x, w, offsets, 128, "mxu")
        y_vpu = banded_spmm(x, w, offsets, 128, "vpu")
    np.testing.assert_allclose(
        np.asarray(y_vpu), np.asarray(ref), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(y_mxu), np.asarray(ref), rtol=1e-5, atol=1e-5
    )
    # weight-splitting error specifically (mxu vs vpu shares the summation
    # order, so this isolates the 3-way bf16 split): under 1e-6 relative
    rel = np.max(np.abs(np.asarray(y_mxu) - np.asarray(y_vpu))) / np.max(
        np.abs(np.asarray(ref))
    )
    assert rel < 1e-6, rel


def test_weighted_gradient_both_modes():
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu
    from gcn_maxcut_tpu.ops.pallas_banded import banded_spmm, banded_spmm_xla

    n, F = 512, 128
    offsets = (5, -5)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(n, F)).astype(np.float32))
    w = jnp.asarray(rng.uniform(0.5, 1.5, size=(n, 2)).astype(np.float32))

    def loss(fn):
        return lambda x_, w_: jnp.sum(fn(x_, w_) ** 2)

    gx_ref, gw_ref = jax.grad(
        loss(lambda a, b: banded_spmm_xla(a, b, offsets)), argnums=(0, 1)
    )(x, w)
    with pltpu.force_tpu_interpret_mode():
        for mode in ("mxu", "vpu"):
            gx, gw = jax.grad(
                loss(lambda a, b: banded_spmm(a, b, offsets, 64, mode)),
                argnums=(0, 1),
            )(x, w)
            np.testing.assert_allclose(
                np.asarray(gx), np.asarray(gx_ref), rtol=2e-5, atol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(gw), np.asarray(gw_ref), rtol=2e-5, atol=1e-5
            )


def test_weighted_mxu_split_barrier_survives_lowering():
    # XLA with --xla_allow_excess_precision (set in the TPU env) elides
    # bf16->f32 cast round-trips on traced inputs, silently collapsing the
    # 3-way weight split to bf16 truncation (caught on hardware: rel err
    # 2e-3).  The optimization_barrier prevents that; assert it is present
    # in the traced jaxpr so a refactor can't drop it (the TPU pallas call
    # itself cannot lower on the CPU backend, so trace under interpret).
    from gcn_maxcut_tpu.ops.pallas_banded import _banded_spmm_raw

    n, F = 256, 128
    offsets = (3, -3)
    x = jnp.zeros((n, F), jnp.float32)
    w = jnp.zeros((n, 2), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        jaxpr = jax.make_jaxpr(
            lambda a, b: _banded_spmm_raw(a, b, offsets, 64, "mxu")
        )(x, w)
    assert "optimization_barrier" in str(jaxpr)


def test_unit_kernels_bf16_streams():
    """bf16 unit-kernel streams (round 4): output dtype follows input,
    values match the f32 path to bf16 read tolerance (f32 in-kernel
    accumulation), fwd and bwd, row-window and packed variants."""
    from gcn_maxcut_tpu.ops.pallas_banded import (
        banded_spmm_unit, banded_spmm_unit_packed, banded_spmm_unit_xla,
        pack_interleaved, unpack_interleaved)

    rng = np.random.default_rng(7)
    offsets = (1, -1, 9, -9)
    n, F = 2048, 128
    x = jnp.asarray(rng.normal(size=(n, F)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        y16 = banded_spmm_unit(x.astype(jnp.bfloat16), offsets)
        assert y16.dtype == jnp.bfloat16
        ref = banded_spmm_unit_xla(x, offsets)
        scale = float(jnp.max(jnp.abs(ref)))
        np.testing.assert_allclose(
            np.asarray(y16, np.float32) / scale, np.asarray(ref) / scale,
            atol=3e-2,
        )
        # backward: cotangent of a bf16 output is bf16; same kernel
        g16 = jax.grad(
            lambda z: jnp.sum(
                banded_spmm_unit(z, offsets).astype(jnp.float32) ** 2
            )
        )(x.astype(jnp.bfloat16))
        gref = jax.grad(
            lambda z: jnp.sum(banded_spmm_unit_xla(z, offsets) ** 2)
        )(x)
        gs = float(jnp.max(jnp.abs(gref)))
        np.testing.assert_allclose(
            np.asarray(g16, np.float32) / gs, np.asarray(gref) / gs,
            atol=5e-2,
        )
        # packed variant
        r = 8
        xp = pack_interleaved(x[:, :16], r).astype(jnp.bfloat16)
        yp = banded_spmm_unit_packed(xp, offsets, r)
        assert yp.dtype == jnp.bfloat16
        y = unpack_interleaved(yp.astype(jnp.float32), r)
        refp = banded_spmm_unit_xla(x[:, :16], offsets)
        sp = float(jnp.max(jnp.abs(refp)))
        np.testing.assert_allclose(
            np.asarray(y) / sp, np.asarray(refp) / sp, atol=3e-2
        )


def test_weighted_kernel_rejects_bf16():
    from gcn_maxcut_tpu.ops.pallas_banded import banded_spmm

    x = jnp.ones((256, 128), jnp.bfloat16)
    w = jnp.ones((256, 2), jnp.float32)
    with pytest.raises(ValueError, match="f32"):
        with pltpu.force_tpu_interpret_mode():
            banded_spmm(x, w, (1, -1))
