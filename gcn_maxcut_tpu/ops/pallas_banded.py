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

Performance notes (measured on v5e, n=131k d=8 W=63 F=128):
  * interior blocks issue ONE fused DMA for the whole [B + 2W, F] window
    (three separate pre/mid/post copies cost ~10% in descriptor overhead);
    the two wrap rows-at-the-ends blocks use precomputed wrap tiles passed
    as extra inputs, so every DMA source is a single contiguous slice;
  * all row slices are 8-sublane aligned (W rounded up to Wp);
  * big blocks win: B=8192 reaches 82% of the 819 GB/s stream ceiling
    (B=1024: 73%) — the default is picked per call from n and the VMEM
    budget;
  * bf16 is SLOWER in absolute time (the D shifted adds are VPU-bound at
    these widths), so everything stays f32;
  * the scoped-VMEM limit must stay at 64 MB: the identical kernel runs
    82.7% of SoL at 64 MB and 32.9% at 100 MB (oversized scoped-vmem
    allowances derail the Mosaic/XLA DMA schedule).

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


# Scoped-VMEM cap for the kernels.  MEASURED CLIFF: the identical kernel
# runs at 82.7% of stream SoL with a 64 MB limit and 32.9% with 100 MB —
# an oversized scoped-vmem allowance makes the Mosaic/XLA scheduler pick a
# catastrophically worse DMA schedule.  Keep 64 MB; _auto_block sizes the
# buffers to fit it.
_VMEM_LIMIT = 64 * 1024 * 1024


def _auto_block(rows: int, width: int, wp: int) -> int | None:
    """Largest multiple-of-8 divisor of ``rows`` that keeps the double
    buffer + output block inside the VMEM budget (capped at 8192 — the
    measured sweet spot: 82% of stream SoL vs 73% at 1024) AND leaves at
    least ~8 grid steps so the double-buffered DMA actually overlaps
    compute (2 blocks = no pipeline)."""
    # bytes ≈ 2·(B+2Wp)·width·4 (window slots) + B·width·4 (out block)
    budget = 64 * 1024 * 1024
    cap = max(8, (budget // (12 * max(width, 1) * 4) - wp) // 8 * 8)
    steps = max(8, rows // 8 // 8 * 8)
    return _pick_block(rows, target=min(8192, cap, steps))


def _auto_block_weighted(rows: int, width: int, d: int, wp: int) -> int | None:
    """Block size for the weighted "mxu" path: the [B, D·F] broadcast slab
    joins the window buffers in scoped VMEM, and 2048 measured the sweet
    spot (54.8% SoL-w vs 54.0% at 4096; larger OOMs the slab)."""
    budget = 64 * 1024 * 1024
    per_row = 48 * max(width, 1) + 4 * d * max(width, 1) + 6 * d + 64
    cap = max(8, (budget // per_row - wp) // 8 * 8)
    steps = max(8, rows // 8 // 8 * 8)
    return _pick_block(rows, target=min(2048, cap, steps))


def _window_plan(x_hbm, lo_hbm, hi_hbm, scratch, sems, B, Wp, n_blocks):
    """(start, wait) closures streaming [B + 2Wp, width] windows.

    Interior blocks fetch the whole window in ONE fused DMA (three-piece
    pre/mid/post copies measured ~10% slower in descriptor overhead); the
    first and last blocks splice in the precomputed wrap tiles ``lo``/``hi``
    so every DMA source is a single contiguous, 8-sublane-aligned slice.
    ``wait`` re-creates copies with identical dst/semaphore/shape (the
    source is irrelevant to a wait).
    """

    def pieces(bi, s, first, last):
        if first and last:                      # n_blocks == 1
            return (
                pltpu.make_async_copy(
                    lo_hbm.at[:], scratch.at[s, pl.ds(0, Wp), :],
                    sems.at[s, 0],
                ),
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(0, B), :],
                    scratch.at[s, pl.ds(Wp, B), :],
                    sems.at[s, 1],
                ),
                pltpu.make_async_copy(
                    hi_hbm.at[:], scratch.at[s, pl.ds(Wp + B, Wp), :],
                    sems.at[s, 2],
                ),
            )
        if first:
            return (
                pltpu.make_async_copy(
                    lo_hbm.at[:], scratch.at[s, pl.ds(0, Wp), :],
                    sems.at[s, 1],
                ),
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(0, B + Wp), :],
                    scratch.at[s, pl.ds(Wp, B + Wp), :],
                    sems.at[s, 2],
                ),
            )
        base = pl.multiple_of(bi * B, 8)
        if last:
            return (
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(pl.multiple_of(base - Wp, 8), B + Wp), :],
                    scratch.at[s, pl.ds(0, B + Wp), :],
                    sems.at[s, 1],
                ),
                pltpu.make_async_copy(
                    hi_hbm.at[:], scratch.at[s, pl.ds(Wp + B, Wp), :],
                    sems.at[s, 2],
                ),
            )
        return (
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(pl.multiple_of(base - Wp, 8), B + 2 * Wp), :],
                scratch.at[s],
                sems.at[s, 0],
            ),
        )

    def act(bi, s, go):
        if n_blocks == 1:
            for c in pieces(bi, s, True, True):
                go(c)
            return

        @pl.when(bi == 0)
        def _():
            for c in pieces(bi, s, True, False):
                go(c)

        @pl.when(jnp.logical_and(bi > 0, bi < n_blocks - 1))
        def _():
            for c in pieces(bi, s, False, False):
                go(c)

        @pl.when(bi == n_blocks - 1)
        def _():
            for c in pieces(bi, s, False, True):
                go(c)

    return (
        lambda bi, s: act(bi, s, lambda c: c.start()),
        lambda bi, s: act(bi, s, lambda c: c.wait()),
    )


def _fused_window_kernel(offsets, B, Wp, F, n_blocks, weighted, *refs):
    """Double-buffered fused-window circulant SpMM body (unit or weighted).

    Grid step i computes y rows [iB, iB+B) from the [iB-Wp, iB+B+Wp)
    window; the DMA for block i+1 overlaps block i's compute.

    ``weighted`` modes (measured on v5e, n=131k d=8 W=63 F=128, SoL-w
    = read x + w + write y at 819 GB/s):
      * ``"mxu"`` (default): ONE matmul per block builds ALL D lane
        broadcasts — [B, 3D] (hi|mid|lo bf16 split of w, exact to ~2^-24)
        @ [3D, D·F] block-diagonal ones → [B, D·F] f32 — so the fma loop
        matches the unit kernel's VPU cost.  3.4e9 edges/s ≈ 55% SoL-w,
        stable across tunnel-speed runs (MXU-bound, not DMA-bound).
      * ``"vpu"``: per-offset lane broadcast of the f32 w column; bit-exact
        but ~3 VPU ops per vreg (extract + broadcast + fma): 2.4e9 ≈ 40%.
        Measured alternatives that lost: rank-1 MXU per offset (52% bf16 /
        49% hi-lo), MXU/VPU offset splits (39-49%, one 70% outlier that
        did not reproduce), per-column [B,1] inputs (fails to compile),
        whole-w VMEM residency (scoped-vmem OOM).  Matrix of 12 variants:
        experiments/weighted_probe.py.
    """
    if weighted == "mxu":
        w_ref, g_ref, x_hbm, lo_hbm, hi_hbm, out_ref, scratch, sems = refs
    elif weighted:
        w_ref, x_hbm, lo_hbm, hi_hbm, out_ref, scratch, sems = refs
    else:
        x_hbm, lo_hbm, hi_hbm, out_ref, scratch, sems = refs
    i = pl.program_id(0)
    slot = jax.lax.rem(i, 2)
    nxt_slot = jax.lax.rem(i + 1, 2)
    start, wait = _window_plan(
        x_hbm, lo_hbm, hi_hbm, scratch, sems, B, Wp, n_blocks
    )

    @pl.when(i == 0)
    def _():
        start(0, 0)

    @pl.when(i + 1 < n_blocks)
    def _():
        start(i + 1, nxt_slot)

    wait(i, slot)

    x_win = scratch[slot]                      # [B + 2Wp, F]
    # accumulate in f32 regardless of the stream dtype: bf16 windows halve
    # the HBM bytes (the platform's pallas stream ceiling is BYTE-based —
    # measured 1.94 vs 3.84 ms for the same elements at 10M scale) while
    # sums stay exact to f32
    acc = jnp.zeros((B, F), jnp.float32)
    if weighted == "mxu":
        bw = jax.lax.dot_general(               # [B, D*F] all broadcasts
            w_ref[:], g_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for k, o in enumerate(offsets):
            acc = acc + bw[:, k * F : (k + 1) * F] * x_win[Wp + o : Wp + o + B, :]
    elif weighted:
        for k, o in enumerate(offsets):        # static unrolled shifts
            acc = acc + w_ref[:, k : k + 1] * x_win[Wp + o : Wp + o + B, :]
    else:
        for o in offsets:
            acc = acc + x_win[Wp + o : Wp + o + B, :].astype(jnp.float32)
    out_ref[:] = acc.astype(out_ref.dtype)


def _fused_pallas_call(x, w, offsets, block, weighted_mode: str = "mxu"):
    """Shared pallas_call builder for the row-window kernels; ``w`` is None
    for the unit variant.  Returns None if the shape can't ride the kernel
    (caller falls back to XLA rolls).  ``weighted_mode``: "mxu" (default,
    one broadcast matmul per block) or "vpu" (bit-exact lane broadcasts) —
    see ``_fused_window_kernel``."""
    n, F = x.shape
    W = int(max(abs(o) for o in offsets))
    Wp = (W + 7) // 8 * 8
    weighted = w is not None
    if block is not None:
        blk = block
    elif weighted and weighted_mode == "mxu":
        blk = _auto_block_weighted(n, F, w.shape[1], Wp)
    else:
        blk = _auto_block(n, F, Wp)
    if blk is None or n % blk or Wp > blk or Wp > n:
        return None
    n_blocks = n // blk
    lo = x[n - Wp :]
    hi = x[:Wp]
    kernel = functools.partial(
        _fused_window_kernel, tuple(offsets), blk, Wp, F, n_blocks,
        weighted_mode if weighted else False,
    )
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 3
    args = (x, lo, hi)
    if weighted and weighted_mode == "mxu":
        D = w.shape[1]
        # exact-to-~2^-24 three-way bf16 split of w, built once per call.
        # The optimization_barrier is LOAD-BEARING: XLA (with
        # --xla_allow_excess_precision, set in this TPU env) elides the
        # bf16->f32 cast round-trip on traced inputs, silently collapsing
        # the split to plain bf16 truncation (measured: rel err 2e-3
        # instead of 0 on the real device; interpret mode does not elide,
        # so only a hardware run catches it).
        wh = jax.lax.optimization_barrier(w.astype(jnp.bfloat16))
        r1 = w - wh.astype(jnp.float32)
        wm = jax.lax.optimization_barrier(r1.astype(jnp.bfloat16))
        wl = (r1 - wm.astype(jnp.float32)).astype(jnp.bfloat16)
        w3 = jnp.concatenate([wh, wm, wl], axis=1)           # [n, 3D]
        gmat = jnp.tile(
            jnp.repeat(jnp.eye(D, dtype=jnp.float32), F, axis=1), (3, 1)
        ).astype(jnp.bfloat16)                               # [3D, D*F]
        in_specs = [
            pl.BlockSpec((blk, 3 * D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ] + in_specs
        args = (w3, gmat, x, lo, hi)
    elif weighted:
        D = w.shape[1]
        in_specs = [
            pl.BlockSpec((blk, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ] + in_specs
        args = (w, x, lo, hi)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (blk, F), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, F), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, blk + 2 * Wp, F), x.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT
        ),
    )(*args)


@functools.partial(jax.jit, static_argnames=("offsets", "block", "mode"))
def _banded_spmm_raw(
    x: jnp.ndarray,
    w: jnp.ndarray,
    offsets: tuple[int, ...],
    block: int | None = None,
    mode: str = "mxu",
) -> jnp.ndarray:
    n, F = x.shape
    W = int(max(abs(o) for o in offsets))
    if mode not in ("mxu", "vpu"):
        raise ValueError(f"mode must be 'mxu' or 'vpu', got {mode!r}")
    if x.dtype != jnp.float32:
        raise ValueError(
            "weighted banded_spmm requires f32 features (its exactness "
            "contract); the unit kernels accept bf16 streams"
        )
    if F % 128 and not _interpreting():
        # TPU DMA slices need 128-aligned lanes; narrow arrays (e.g. the
        # k=3 class dim) take the XLA rolls path — same math, no shape
        # constraints.
        return banded_spmm_xla(x, w, offsets)
    if block is not None and n % block:
        raise ValueError(f"n={n} must be a multiple of block={block}")
    if W > n:
        raise ValueError(f"bandwidth {W} exceeds n={n}")
    if block is not None and W > block:
        raise ValueError(f"bandwidth {W} must be <= block={block}")
    out = _fused_pallas_call(x, w, offsets, block, weighted_mode=mode)
    return out if out is not None else banded_spmm_xla(x, w, offsets)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def banded_spmm(
    x: jnp.ndarray,
    w: jnp.ndarray,
    offsets: tuple[int, ...],
    block: int | None = None,
    mode: str = "mxu",
) -> jnp.ndarray:
    """y[i] = Σ_k w[i, k] · x[(i + o_k) mod n]   (Pallas streaming kernel).

    ``x``: [n, F] features; ``w``: [n, D] per-row shift weights (use zeros
    to mask padded rows); ``offsets``: static shift tuple.  ``block`` is
    auto-picked from n and the VMEM budget when None.  Differentiable in
    x and w.  ``mode``: "mxu" (default, ~55% of stream SoL, weights exact
    to ~2^-24 via a three-way bf16 split) or "vpu" (bit-exact f32 weights,
    ~40%) — see ``_fused_window_kernel``.
    """
    return _banded_spmm_raw(x, w, offsets, block, mode)


def _banded_fwd(x, w, offsets, block, mode):
    return _banded_spmm_raw(x, w, offsets, block, mode), (x, w)


def _banded_bwd(offsets, block, mode, res, dy):
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
    dx = _banded_spmm_raw(dy, w_t, neg, block, mode)
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

@functools.partial(jax.jit, static_argnames=("offsets", "block"))
def _banded_spmm_unit_raw(
    x: jnp.ndarray, offsets: tuple[int, ...], block: int | None = None
) -> jnp.ndarray:
    n, F = x.shape
    W = int(max(abs(o) for o in offsets))
    if F % 128 and not _interpreting():
        # Narrow feature widths fall back to XLA rolls here; the full-
        # bandwidth narrow-F path is the interleaved-order kernel below
        # (``banded_spmm_unit_packed``) used by the giant-graph trainers.
        return banded_spmm_unit_xla(x, offsets)
    if block is not None and n % block:
        raise ValueError(f"n={n} must be a multiple of block={block}")
    if block is not None and W > block:
        raise ValueError(f"bandwidth {W} must be <= block={block}")
    out = _fused_pallas_call(x, None, offsets, block)
    return out if out is not None else banded_spmm_unit_xla(x, offsets)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def banded_spmm_unit(
    x: jnp.ndarray, offsets: tuple[int, ...], block: int | None = None
) -> jnp.ndarray:
    """y[i] = Σ_k x[(i + o_k) mod n]  — unit edge weights, no weight table.

    The memory-lean path for exactly-regular circulant graphs (10M-node
    configs: a [n, D] weight table would cost n·D·4 bytes for constant 1s).
    ``block`` is auto-picked when None.  Backward is the same kernel with
    negated offsets.

    Accepts f32 or bf16 ``x`` (output dtype follows input): bf16 halves
    the window bytes — on this platform's byte-based pallas stream
    ceiling that halves the wall time at HBM-resident sizes (measured
    3.84 -> 1.94 ms at 1.25M x 128) — while in-kernel accumulation stays
    f32 (only the stream values are bf16-rounded).
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
    # DMA row slices must be 8-aligned (Mosaic tiling); round W up once
    Wp = (W + 7) // 8 * 8
    block = block or (_auto_block(m, L, Wp) if m else None)
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
    # wrap tiles carry the global wrap's lane-group rotation, so the kernel
    # body (shared with the row-window variant) is pure row shifts
    wrap_lo = jnp.roll(p[m - Wp :], F, axis=1)
    wrap_hi = jnp.roll(p[:Wp], -F, axis=1)
    n_blocks = m // block
    kernel = functools.partial(
        _fused_window_kernel, tuple(offsets), block, Wp, L, n_blocks, False
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
        out_shape=jax.ShapeDtypeStruct((m, L), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, block + 2 * Wp, L), x.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT
        ),
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
