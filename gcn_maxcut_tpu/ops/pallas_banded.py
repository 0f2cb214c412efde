"""Pallas TPU kernel: banded/circulant SpMM in one streaming pass.

Arbitrary-row gathers do not lower efficiently on the TPU vector unit (the
general SpMM path therefore uses XLA's gather over ELL tables,
``ops/segment.py``).  But graphs with *locality* — circulant benchmark
graphs from ``data.generate.regular_graph_on_device``, or any graph
reordered by BFS/RCM/METIS into a band (``parallel.partition``) — have
neighbor offsets bounded by a bandwidth ``W``:

    y[i] = Σ_k  w[i, k] · x[(i + o_k) mod n]        |o_k| ≤ W.

This kernel streams x through VMEM exactly once: grid over row blocks, a
manually double-buffered DMA brings in the ``[B + 2W, F]`` window for block
i+1 while block i computes its D statically-sliced shifted adds (pure VPU).
Traffic = read x once + write y once — the speed-of-light for any SpMM —
vs. the ~6 reads/row of the gather path.

The custom VJP uses the circulant transpose (negated offsets, weights
rolled by their own offset), so backward is the same kernel; for the
symmetric graphs this framework builds, the shift set is ±o pairs and the
operator is self-adjoint.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Row-block size: multiples of 8 sublanes; 1024×128 f32 = 512 KB per window
# buffer slot (×2 slots, plus accumulator) stays well inside VMEM.
DEFAULT_BLOCK = 1024


def _interpreting() -> bool:
    """True inside ``pltpu.force_tpu_interpret_mode`` (tests on CPU), where
    the lane-tiling DMA constraint does not apply."""
    try:
        from jax._src.pallas import pallas_call as _pc  # noqa: F401
        from jax._src import config as _jcfg

        return (
            _jcfg.config.pallas_tpu_interpret_mode_context_manager.get_local()
            is not None
        )
    except Exception:  # pragma: no cover
        return False


def _banded_kernel(offsets, B, W, F, n_blocks, w_ref, x_hbm, out_ref, scratch, sems):
    """Grid step i: compute y rows [iB, iB+B) from window [iB-W, iB+B+W).

    The window is fetched as three contiguous DMAs straight out of x (no
    wrap-padded copy of x is ever materialized):
      A: rows [iB-W, iB)   — wraps to [n-W, n) at i == 0
      M: rows [iB, iB+B)
      C: rows [iB+B, iB+B+W) — wraps to [0, W) at i == n_blocks-1
    double-buffered across grid steps (DMA for i+1 overlaps compute of i).
    """
    i = pl.program_id(0)
    n = n_blocks * B
    slot = jax.lax.rem(i, 2)
    nxt_slot = jax.lax.rem(i + 1, 2)

    def dmas(block_idx, into_slot):
        base = block_idx * B
        pre = jax.lax.rem(base - W + n, n)
        post = jax.lax.rem(base + B, n)
        return (
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(pre, W), :],
                scratch.at[into_slot, pl.ds(0, W), :],
                sems.at[into_slot, 0],
            ),
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(base, B), :],
                scratch.at[into_slot, pl.ds(W, B), :],
                sems.at[into_slot, 1],
            ),
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(post, W), :],
                scratch.at[into_slot, pl.ds(W + B, W), :],
                sems.at[into_slot, 2],
            ),
        )

    @pl.when(i == 0)
    def _():
        for d in dmas(0, 0):
            d.start()

    @pl.when(i + 1 < n_blocks)
    def _():
        for d in dmas(i + 1, nxt_slot):
            d.start()

    for d in dmas(i, slot):
        d.wait()

    x_win = scratch[slot]                      # [B + 2W, F]
    acc = jnp.zeros((B, F), jnp.float32)
    for k, o in enumerate(offsets):            # static unrolled shifts
        src = x_win[W + o : W + o + B, :]
        acc = acc + w_ref[:, k : k + 1] * src
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("offsets", "block"))
def _banded_spmm_raw(
    x: jnp.ndarray,
    w: jnp.ndarray,
    offsets: tuple[int, ...],
    block: int = DEFAULT_BLOCK,
) -> jnp.ndarray:
    n, F = x.shape
    D = len(offsets)
    W = int(max(abs(o) for o in offsets))
    if F % 128 and not _interpreting():
        # TPU DMA slices need 128-aligned lanes; narrow arrays (e.g. the
        # k=3 class dim) take the XLA rolls path — same math, no shape
        # constraints.
        return banded_spmm_xla(x, w, offsets)
    if n % block:
        raise ValueError(f"n={n} must be a multiple of block={block}")
    if W > n:
        raise ValueError(f"bandwidth {W} exceeds n={n}")
    if W > block:
        raise ValueError(f"bandwidth {W} must be <= block={block}")
    n_blocks = n // block

    kernel = functools.partial(
        _banded_kernel, tuple(offsets), block, W, F, n_blocks
    )
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # x, manual 3-piece DMA
        ],
        out_specs=pl.BlockSpec(
            (block, F), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, F), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, block + 2 * W, F), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(w, x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def banded_spmm(
    x: jnp.ndarray,
    w: jnp.ndarray,
    offsets: tuple[int, ...],
    block: int = DEFAULT_BLOCK,
) -> jnp.ndarray:
    """y[i] = Σ_k w[i, k] · x[(i + o_k) mod n]   (Pallas streaming kernel).

    ``x``: [n, F] features (n a multiple of ``block``); ``w``: [n, D]
    per-row shift weights (use zeros to mask padded rows); ``offsets``:
    static shift tuple.  Differentiable in x and w.
    """
    return _banded_spmm_raw(x, w, offsets, block)


def _banded_fwd(x, w, offsets, block):
    return _banded_spmm_raw(x, w, offsets, block), (x, w)


def _banded_bwd(offsets, block, res, dy):
    x, w = res
    # transpose: y = Σ_k diag(w_k) S_{o_k} x  ⇒  Aᵀ = Σ_k S_{-o_k} diag(w_k);
    # (Aᵀ dy)[i] = Σ_k w_k[(i + o_k)] · dy[(i + o_k)]  with offsets as-is is
    # wrong — correct: (Aᵀ dy)[i] = Σ_k w_k[i - o_k] · dy[i - o_k], i.e. the
    # same banded form with offsets negated and weights rolled by -o_k.
    neg = tuple(-o for o in offsets)
    # w'_k[i] = w_k[i - o_k]  ==  roll(w_k, +o_k)
    w_t = jnp.stack(
        [jnp.roll(w[:, k], o) for k, o in enumerate(offsets)], axis=1
    )
    dx = _banded_spmm_raw(dy, w_t, neg, block)
    # dL/dw[i, k] = dy[i] · x[(i + o_k)]
    dw = jnp.stack(
        [jnp.sum(dy * jnp.roll(x, -o, axis=0), axis=1) for o in offsets],
        axis=1,
    )
    return dx, dw


banded_spmm.defvjp(_banded_fwd, _banded_bwd)


def banded_spmm_xla(
    x: jnp.ndarray, w: jnp.ndarray, offsets: Sequence[int]
) -> jnp.ndarray:
    """Reference XLA implementation (rolls) for parity tests/CPU."""
    out = jnp.zeros_like(x)
    for k, o in enumerate(offsets):
        out = out + w[:, k : k + 1] * jnp.roll(x, -o, axis=0)
    return out


# ---- unit-weight variant (all edge weights 1; no [n, D] weight table) ----

def _banded_unit_kernel(offsets, B, W, F, n_blocks, x_hbm, out_ref, scratch, sems):
    i = pl.program_id(0)
    n = n_blocks * B
    slot = jax.lax.rem(i, 2)
    nxt_slot = jax.lax.rem(i + 1, 2)

    def dmas(block_idx, into_slot):
        base = block_idx * B
        pre = jax.lax.rem(base - W + n, n)
        post = jax.lax.rem(base + B, n)
        return (
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(pre, W), :],
                scratch.at[into_slot, pl.ds(0, W), :],
                sems.at[into_slot, 0],
            ),
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(base, B), :],
                scratch.at[into_slot, pl.ds(W, B), :],
                sems.at[into_slot, 1],
            ),
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(post, W), :],
                scratch.at[into_slot, pl.ds(W + B, W), :],
                sems.at[into_slot, 2],
            ),
        )

    @pl.when(i == 0)
    def _():
        for d in dmas(0, 0):
            d.start()

    @pl.when(i + 1 < n_blocks)
    def _():
        for d in dmas(i + 1, nxt_slot):
            d.start()

    for d in dmas(i, slot):
        d.wait()

    x_win = scratch[slot]
    acc = jnp.zeros((B, F), jnp.float32)
    for o in offsets:
        acc = acc + x_win[W + o : W + o + B, :]
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("offsets", "block"))
def _banded_spmm_unit_raw(
    x: jnp.ndarray, offsets: tuple[int, ...], block: int = DEFAULT_BLOCK
) -> jnp.ndarray:
    n, F = x.shape
    W = int(max(abs(o) for o in offsets))
    if F % 128 and not _interpreting():
        # Narrow feature widths fall back to XLA rolls here; the full-
        # bandwidth narrow-F path is the interleaved-order kernel below
        # (``banded_spmm_unit_packed``) used by the giant-graph trainers.
        return banded_spmm_unit_xla(x, offsets)
    if n % block:
        raise ValueError(f"n={n} must be a multiple of block={block}")
    if W > block:
        raise ValueError(f"bandwidth {W} must be <= block={block}")
    n_blocks = n // block
    kernel = functools.partial(
        _banded_unit_kernel, tuple(offsets), block, W, F, n_blocks
    )
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (block, F), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, F), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, block + 2 * W, F), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def banded_spmm_unit(
    x: jnp.ndarray, offsets: tuple[int, ...], block: int = DEFAULT_BLOCK
) -> jnp.ndarray:
    """y[i] = Σ_k x[(i + o_k) mod n]  — unit edge weights, no weight table.

    The memory-lean path for exactly-regular circulant graphs (10M-node
    configs: a [n, D] weight table would cost n·D·4 bytes for constant 1s).
    Backward is the same kernel with negated offsets.
    """
    return _banded_spmm_unit_raw(x, offsets, block)


def _banded_unit_fwd(x, offsets, block):
    return _banded_spmm_unit_raw(x, offsets, block), None


def _banded_unit_bwd(offsets, block, _, dy):
    neg = tuple(-o for o in offsets)
    return (_banded_spmm_unit_raw(dy, neg, block),)


banded_spmm_unit.defvjp(_banded_unit_fwd, _banded_unit_bwd)


def banded_spmm_unit_xla(x: jnp.ndarray, offsets: Sequence[int]) -> jnp.ndarray:
    """XLA rolls reference for the unit-weight variant."""
    out = jnp.zeros_like(x)
    for o in offsets:
        out = out + jnp.roll(x, -o, axis=0)
    return out




# ---- interleaved-order variant: full bandwidth for narrow F --------------
#
# The row-window kernel above needs F % 128 == 0 lanes; narrow widths (the
# k=3 class dim, 16-wide hiddens) otherwise fall back to XLA rolls at ~1/6
# bandwidth (measured 54 vs 317 GB/s on v5e), and in-VMEM lane rotations or
# MXU lane-routing matmuls measured no better (VPU-/MXU-bound).  The fix is
# a *node ordering*, not more kernel tricks: store node i = u·m + j at
# position p = j·r + u (r nodes interleaved per packed row, m = n/r rows).
# Then the packed [m, r·F] view of the array turns every circulant node
# shift o into a pure ROW shift by o — the exact shape the window kernel
# already streams at full bandwidth — and only the W wrap rows at each end
# need their lane groups rotated by F, which is precomputed outside the
# kernel on two [W, r·F] tiles.  GEMMs, elementwise ops, softmax, STE and
# the cut objective are all row-wise, so an entire training pipeline can
# live in interleaved order for free (``parallel/giant_banded.py``,
# ``bench/giant_demo.py``); ``pack_interleaved``/``unpack_interleaved``
# convert at the boundaries.


def _pick_block(m: int, target: int = 1024, minimum: int = 8) -> int | None:
    """Largest multiple-of-8 divisor of m that is <= target."""
    b = min(target - target % 8, m - m % 8)
    while b >= minimum:
        if m % b == 0:
            return b
        b -= 8
    return None


def pack_interleaved(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Reorder nodes so node u·m + j lands at position j·r + u (m = n/r)."""
    n, F = x.shape
    if n % r:
        raise ValueError(f"n={n} must be a multiple of r={r}")
    m = n // r
    return x.reshape(r, m, F).transpose(1, 0, 2).reshape(n, F)


def unpack_interleaved(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Inverse of ``pack_interleaved``."""
    n, F = x.shape
    m = n // r
    return x.reshape(m, r, F).transpose(1, 0, 2).reshape(n, F)


def _packed_unit_kernel(
    offsets, B, W, L, n_blocks,
    x_hbm, lo_hbm, hi_hbm, out_ref, scratch, sems,
):
    """Window kernel over the packed [m, L] view; wrap rows come from the
    precomputed lane-rotated tiles instead of the array's other end."""
    i = pl.program_id(0)
    slot = jax.lax.rem(i, 2)
    nxt_slot = jax.lax.rem(i + 1, 2)

    def start_dmas(block_idx, into_slot):
        base = pl.multiple_of(block_idx * B, 8)

        @pl.when(block_idx == 0)
        def _():
            pltpu.make_async_copy(
                lo_hbm.at[pl.ds(0, W), :],
                scratch.at[into_slot, pl.ds(0, W), :],
                sems.at[into_slot, 0],
            ).start()

        @pl.when(block_idx > 0)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(pl.multiple_of(base - W, 8), W), :],
                scratch.at[into_slot, pl.ds(0, W), :],
                sems.at[into_slot, 0],
            ).start()

        pltpu.make_async_copy(
            x_hbm.at[pl.ds(base, B), :],
            scratch.at[into_slot, pl.ds(W, B), :],
            sems.at[into_slot, 1],
        ).start()

        @pl.when(block_idx == n_blocks - 1)
        def _():
            pltpu.make_async_copy(
                hi_hbm.at[pl.ds(0, W), :],
                scratch.at[into_slot, pl.ds(W + B, W), :],
                sems.at[into_slot, 2],
            ).start()

        @pl.when(block_idx < n_blocks - 1)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(pl.multiple_of(base + B, 8), W), :],
                scratch.at[into_slot, pl.ds(W + B, W), :],
                sems.at[into_slot, 2],
            ).start()

    @pl.when(i == 0)
    def _():
        start_dmas(0, 0)

    @pl.when(i + 1 < n_blocks)
    def _():
        start_dmas(i + 1, nxt_slot)

    # waits: same dst/semaphore/size regardless of which source was chosen
    base = pl.multiple_of(i * B, 8)
    pltpu.make_async_copy(
        x_hbm.at[pl.ds(0, W), :],
        scratch.at[slot, pl.ds(0, W), :],
        sems.at[slot, 0],
    ).wait()
    pltpu.make_async_copy(
        x_hbm.at[pl.ds(base, B), :],
        scratch.at[slot, pl.ds(W, B), :],
        sems.at[slot, 1],
    ).wait()
    pltpu.make_async_copy(
        x_hbm.at[pl.ds(0, W), :],
        scratch.at[slot, pl.ds(W + B, W), :],
        sems.at[slot, 2],
    ).wait()

    x_win = scratch[slot]                      # [B + 2W, L]
    acc = jnp.zeros((B, L), jnp.float32)
    for o in offsets:                          # static row shifts only
        acc = acc + x_win[W + o : W + o + B, :]
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("offsets", "r", "block"))
def _banded_spmm_unit_packed_raw(
    x: jnp.ndarray,
    offsets: tuple[int, ...],
    r: int,
    block: int | None = None,
) -> jnp.ndarray:
    n, F = x.shape
    L = r * F
    W = int(max(abs(o) for o in offsets))
    m = n // r if n % r == 0 else 0
    block = block or (_pick_block(m) if m else None)
    # DMA row slices must be 8-aligned (Mosaic tiling); round W up once
    Wp = (W + 7) // 8 * 8
    usable = (
        m > 0 and L % 128 == 0 and block is not None
        and m % block == 0 and Wp <= block and 2 * Wp <= m
    )
    if not usable:
        # graceful fallback: exact same math through the ordered rolls path
        return pack_interleaved(
            banded_spmm_unit_xla(unpack_interleaved(x, r), offsets), r
        )
    p = x.reshape(m, L)
    wrap_lo = jnp.roll(p[m - Wp :], F, axis=1)
    wrap_hi = jnp.roll(p[:Wp], -F, axis=1)
    n_blocks = m // block
    kernel = functools.partial(
        _packed_unit_kernel, tuple(offsets), block, Wp, L, n_blocks
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (block, L), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, L), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, block + 2 * Wp, L), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(p, wrap_lo, wrap_hi)
    return out.reshape(n, F)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def banded_spmm_unit_packed(
    x: jnp.ndarray,
    offsets: tuple[int, ...],
    r: int,
    block: int | None = None,
) -> jnp.ndarray:
    """Unit-weight circulant SpMM on arrays stored in interleaved node
    order (``pack_interleaved``): y_pos(i) = Σ_k x_pos((i + o_k) mod n).

    Full stream bandwidth for ANY feature width with r·F % 128 == 0 —
    the narrow-F path the row-window kernel cannot serve.  Backward is the
    same kernel with negated offsets.
    """
    return _banded_spmm_unit_packed_raw(x, offsets, r, block)


def _packed_unit_fwd(x, offsets, r, block):
    return _banded_spmm_unit_packed_raw(x, offsets, r, block), None


def _packed_unit_bwd(offsets, r, block, _, dy):
    neg = tuple(-o for o in offsets)
    return (_banded_spmm_unit_packed_raw(dy, neg, r, block),)


banded_spmm_unit_packed.defvjp(_packed_unit_fwd, _packed_unit_bwd)
