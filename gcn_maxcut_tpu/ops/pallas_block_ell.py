"""Pallas TPU kernel: block-ELL SpMM for locality-reordered general graphs.

The general-graph SpMM replaces DGL's C++ SpMM kernels (reference
``Training/TrainingNeural.py:80,83``).  Arbitrary HBM row-gathers cap at
~405 GB/s on v5e (measured: a single ``x[idx]`` gather of 512-byte rows —
49% of the 819 GB/s stream peak; the XLA d-gather chain lands at ~34% of
the gather roofline).  Graphs with *locality* — anything RCM/BFS-reordered
into a bounded band (``data/reorder.py``), which covers meshes, lattices,
road-like networks, banded random graphs — can do much better: sort rows
into blocks of ``B`` receivers, stream the ``[B + 2·Wp, F]`` source window
through VMEM once (the same fused-window DMA plan as
``ops/pallas_banded.py``), and resolve the *arbitrary* per-edge indices
inside the window by building a one-hot gather matrix on the VPU and
contracting it on the MXU:

    G[i, l]  = Σ_j  w[i, j] · [lidx[i, j] == l]        (VPU, d compare passes)
    y_block  = G @ x_window                            (MXU)

The one-hot build is row-SUB-BLOCKED (``_R0`` = 128): a row at block
offset t only references window columns [t, t + 2Wp], so each 128-row
sub-block scans only its [kR0, kR0 + R0 + 2Wp) window slice — the VPU
build (the kernel's bottleneck) costs d·(R0 + 2Wp) instead of
d·(B + 2Wp) elem-ops per row, MXU MACs unchanged.

Measured on v5e (n=100k, d=8, F=128, ``bench/microbench.py``, best-of-3
amortized — single shots on the tunnel vary by ±15 SoL points):
  * W ≤ 255: 1.13e9 edges/s ≈ 81% of the gather roofline (XLA gather
    path: 35–38%) in the default ``split`` mode; pre-sub-blocking: 73–77%;
  * W = 511: 1.05e9 (75%); pre-sub-blocking: 55%.  Beyond ~W=1024 the
    VPU one-hot build dominates and the gather path wins again — the
    planner refuses such bands.  (A panel-bucketed one-hot build — fewer
    compares, narrower slabs — measured *slower*, 45%: per-row neighbors
    cluster into few panels so the table needs width 4, and 24 narrow
    slab passes lose to 8 wide ones; ``experiments/panel_ell_probe.py``.);
  * precision: the MXU truncates inputs to bf16 at default precision
    (~2e-3 rel err).  The default ``split`` mode sends the window through
    the MXU twice as ``hi + lo`` bf16 halves (rel err ~3e-6, measured) for
    ~3% cost; ``fast`` mode is single-pass bf16.

A small **outlier list** keeps the plan exact for graphs that band *almost*
everywhere: edges whose source falls outside the receiver's window (e.g.
the three terminal rows that ``data/process.normalize_terminals`` moves to
ids 0..2, breaking an RCM band locally) are carried as COO triples and
added by one tiny gather + scatter after the kernel.  In-window edges and
outliers partition the real edges exactly, so

    block_ell_spmm(x) == spmm_ell(x)    (up to float summation order).

The custom VJP uses adjacency symmetry (undirected graphs store both
directions with equal weights, the framework default), so the backward is
the same operator: dL/dx = Aᵀ·dy = A·dy — no scatter in the hot path, the
same trick as ``ops/segment._ell_gather_sum``.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gcn_maxcut_tpu.ops.pallas_banded import (
    _VMEM_LIMIT,
    _interpreting,
    _window_plan,
)

# Matmul panel width over the window dimension: bounds the [B, P] one-hot
# slab in VMEM and lets the compiler overlap panel p's MXU contraction with
# panel p+1's VPU one-hot build.  384 measured best at B=256 on v5e.
_PANEL = 384


# Rows are tiled into sub-blocks of _R0 for the one-hot build: a row at
# block offset t only references window columns [t, t + 2Wp] (the planner
# spills |offset| > Wp edges to the outlier COO), so sub-block k scans
# only its [k*_R0, k*_R0 + _R0 + 2Wp) slice instead of the full window —
# the VPU build drops from d*(B+2Wp) to d*(_R0+2Wp) elem-ops per row with
# the MXU MAC count unchanged (128 rows keep the systolic array full).
# Measured (experiments/subblock_probe.py, best-of-3): W=255 73% -> 81%,
# W=511 55% -> 75% of the gather roofline.
_R0 = 128


def _block_ell_kernel(
    n, B, Wp, F, P, nb, d, mode, sidx_ref, w_ref, x_hbm, lo_hbm, hi_hbm,
    out_ref, scratch, sems
):
    """One grid step: rows [iB, iB+B) from the [iB−Wp, iB+B+Wp) window."""
    i = pl.program_id(0)
    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)
    start, wait = _window_plan(x_hbm, lo_hbm, hi_hbm, scratch, sems, B, Wp, nb)

    @pl.when(i == 0)
    def _():
        start(0, 0)

    @pl.when(i + 1 < nb)
    def _():
        start(i + 1, nxt)

    wait(i, slot)
    xw = scratch[slot]                                  # [B + 2Wp, F]

    # window-local indices from absolute sender ids (mod-n wrap, matching
    # the window layout [x[n-Wp:] | x[bB-Wp : bB+B+Wp] | x[:Wp]] at the ends)
    raw = sidx_ref[:] + (Wp - i * B)                    # [B, d] int32
    lidx = raw + jnp.where(raw < 0, n, 0) - jnp.where(raw >= n, n, 0)
    wgt = w_ref[:]

    if mode == "split":
        hi = xw.astype(jnp.bfloat16).astype(jnp.float32)
        lo = xw - hi
    dn = (((1,), (0,)), ((), ()))
    r0 = _R0 if B % _R0 == 0 else B
    span = r0 + 2 * Wp                                  # per-sub-block cols
    for k in range(B // r0):
        li = lidx[k * r0:(k + 1) * r0, :]
        wk = wgt[k * r0:(k + 1) * r0, :]
        acc = jnp.zeros((r0, F), jnp.float32)
        for p0 in range(k * r0, k * r0 + span, P):
            pw = min(P, k * r0 + span - p0)
            col = jax.lax.broadcasted_iota(jnp.int32, (r0, pw), 1) + p0
            Gp = jnp.zeros((r0, pw), jnp.float32)
            for j in range(d):                          # static unroll
                Gp = Gp + jnp.where(li[:, j:j+1] == col, wk[:, j:j+1], 0.0)
            if mode == "split":
                acc = acc + jax.lax.dot_general(
                    Gp, hi[p0:p0+pw, :], dn,
                    preferred_element_type=jnp.float32)
                acc = acc + jax.lax.dot_general(
                    Gp, lo[p0:p0+pw, :], dn,
                    preferred_element_type=jnp.float32)
            else:
                acc = acc + jax.lax.dot_general(
                    Gp, xw[p0:p0+pw, :], dn,
                    preferred_element_type=jnp.float32)
        out_ref[k * r0:(k + 1) * r0, :] = acc


def _kernel_call(x, sidx, w, n, block, wp, mode):
    """pallas_call builder; returns None when the shape can't ride the
    kernel (caller falls back to the exact XLA ELL-gather path)."""
    npad, F = x.shape
    d = sidx.shape[1]
    B, Wp = block, wp
    Wwin = B + 2 * Wp
    interp = _interpreting()
    ok = (
        npad == n and n % B == 0 and Wp % 8 == 0 and Wp <= B
        and Wp <= n and Wwin <= n and x.dtype == jnp.float32
        and (F % 128 == 0 or interp)
        # double-buffered window + output block + one-hot slab in VMEM
        and 2 * Wwin * F * 4 + B * F * 4 + B * _PANEL * 8 <= 48 * 1024 * 1024
    )
    if not ok:
        return None
    nb = n // B
    lo = x[n - Wp:]
    hi = x[:Wp]
    kern = functools.partial(
        _block_ell_kernel, n, B, Wp, F, min(_PANEL, Wwin), nb, d, mode)
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((B, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (B, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, F), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, Wwin, F), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT),
    )(sidx, w, x, lo, hi)


def _ell_sum_exact(x, sidx, w):
    """Exact XLA gather-sum over the plan's compact table (fallback when
    the shape can't ride the kernel; same math, no Pallas)."""
    d = sidx.shape[1]
    out = w[:, 0:1] * x[sidx[:, 0]]
    for j in range(1, d):
        out = out + w[:, j:j+1] * x[sidx[:, j]]
    return out


@functools.partial(jax.jit, static_argnames=("n", "block", "wp", "mode"))
def _block_ell_raw(x, sidx, w, out_s, out_r, out_w, n, block, wp, mode):
    y = _kernel_call(x, sidx, w, n, block, wp, mode)
    if y is None:
        y = _ell_sum_exact(x, sidx, w)
    # outlier correction: window/sub-block-slice escapes and width spills
    # live only in the COO triples (in-kernel, a sender outside its
    # receiver sub-block's scanned [kR0, kR0 + R0 + 2Wp) slice matches no
    # one-hot column — the planner guarantees table edges are in-slice)
    return y.at[out_r].add(out_w[:, None] * x[out_s])


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def block_ell_spmm(x, sidx, w, out_s, out_r, out_w, n, block, wp,
                   mode="split"):
    """y[i] = Σ_j w[i, j]·x[sidx[i, j]] + outliers — windowed one-hot SpMM.

    ``sidx``/``w``: the plan's compact ELL tables ``[n, width]`` (absolute
    sender ids; zero weight on empty slots).  ``out_s/out_r/out_w``: padded
    outlier COO from ``plan_block_ell`` (edges outside their receiver
    block's window or spilling the width — the kernel skips them
    structurally, the correction re-adds them).  Differentiable in ``x``;
    the backward assumes a symmetric adjacency and returns zero cotangents
    for the weight tables, the same contract as ``ops.segment.spmm_ell``.
    """
    return _block_ell_raw(x, sidx, w, out_s, out_r, out_w, n, block, wp, mode)


def _bell_fwd(x, sidx, w, out_s, out_r, out_w, n, block, wp, mode):
    y = _block_ell_raw(x, sidx, w, out_s, out_r, out_w, n, block, wp, mode)
    return y, (sidx, w, out_s, out_r, out_w)


def _bell_bwd(n, block, wp, mode, res, dy):
    sidx, w, out_s, out_r, out_w = res
    # symmetric adjacency: Aᵀ·dy == A·dy, kernel+outlier split included
    dx = _block_ell_raw(dy, sidx, w, out_s, out_r, out_w, n, block, wp, mode)
    return (dx, None, jnp.zeros_like(w), None, None, jnp.zeros_like(out_w))


block_ell_spmm.defvjp(_bell_fwd, _bell_bwd)


# ---------------------------------------------------------------- planning

@dataclasses.dataclass(frozen=True)
class BlockEllPlan:
    """Host-side plan: static kernel geometry, compact ELL tables, and
    padded outlier COO arrays.

    The plan owns its own ELL tables rather than reusing the graph's: the
    kernel's VPU one-hot build costs O(width · window) per row, so the plan
    caps the table width near the degree distribution's high quantile and
    spills over-degree edges to the outlier list (a symmetrized random
    graph's max degree can be ~2.5× its mean — reusing the max-width table
    measured slower than the plain gather path)."""

    block: int
    wp: int
    senders: np.ndarray        # int32 [n_pad, width] in-window ELL table
    weights: np.ndarray        # f32   [n_pad, width], 0 on empty slots
    mask: np.ndarray           # f32   [n_pad, width]
    out_senders: np.ndarray    # int32 [o_pad]
    out_receivers: np.ndarray  # int32 [o_pad]
    out_weights: np.ndarray    # f32   [o_pad], 0 on padding
    out_mask: np.ndarray       # f32   [o_pad], 1 real / 0 padding
    n_outliers: int
    window: int                # block + 2*wp


def _divisor_block(n_pad: int, wp: int, target: int = 256) -> int | None:
    """Divisor of ``n_pad`` in [max(wp, 128), 2048], nearest to ``target``
    (B≈256 measured best on v5e; larger is a mild penalty).

    Multiples of ``_R0`` (128) are strongly preferred: they enable the
    row-sub-blocked one-hot build (W=511 measured 75% vs 55% of the
    gather roofline with vs without it); only when no 128-multiple
    divides ``n_pad`` does any multiple-of-8 divisor qualify."""
    lo = max(wp, 128)
    best = None
    for step in (_R0, 8):
        for b in range(((lo + step - 1) // step) * step,
                       min(2048, n_pad) + 1, step):
            if n_pad % b == 0:
                if best is None or abs(b - target) < abs(best - target):
                    best = b
        if best is not None:
            return best
    return best


def plan_block_ell(
    senders: np.ndarray,
    receivers: np.ndarray,
    weights: np.ndarray,
    n_pad: int,
    *,
    max_wp: int = 512,
    max_outlier_frac: float = 0.05,
    force_wp: int | None = None,
    force_width: int | None = None,
) -> BlockEllPlan | None:
    """Pick (block, wp, width) for the kernel, or None if the graph
    doesn't band.

    Inputs are the *real* directed COO edges (host numpy).  Tries half-window
    sizes smallest-first and accepts the first whose out-of-window edge count
    stays under half of ``max_outlier_frac·E`` — small windows are faster
    (the VPU one-hot build costs O(width · window) per row).  The ELL width
    is then the smallest that keeps over-degree spills inside the remaining
    outlier budget; outliers = window escapes + degree spills, re-added by
    the COO correction so the operator stays exact.

    ``force_wp``/``force_width`` pin the half-window / table width instead
    of searching (the sharded builder uses this to give every shard's local
    plan identical kernel geometry so plans stack into one ``[D, ...]``
    pytree); the outlier budget is NOT enforced for forced geometry — all
    escapes/spills go to the outlier COO, so the operator stays exact
    regardless, the caller owns the perf judgement.

    ``max_outlier_frac`` default (0.05) is DERIVED FROM MEASUREMENT
    (round 5, ``experiments/bell_crossover.py`` on v5e, n=100k banded +
    eps rewires, full sharded-trainer epochs): the kernel beats the
    gather path 1.57-1.85x at outlier fractions up to 5%, is break-even
    around ~12% (1.06x at 10%), and LOSES at 25% (0.66x — the outlier
    correction is a scatter).  docs/bell_crossover_r5.json.
    """
    senders = np.asarray(senders, np.int64)
    receivers = np.asarray(receivers, np.int64)
    weights = np.asarray(weights, np.float32)
    e = senders.shape[0]
    if e == 0 or n_pad < 1024:
        return None
    cap = max(256, int(max_outlier_frac * e))
    candidates = [w for w in (64, 128, 192, 256, 320, 384, 448, 512)
                  if w <= max_wp]

    def escapes(wp):
        b = _divisor_block(n_pad, wp)
        if b is None or b + 2 * wp > n_pad:
            return None, None, None
        lidx = (senders - (receivers // b) * b + wp) % n_pad
        # sub-block coverage: the kernel's one-hot build only scans window
        # columns [k*_R0, k*_R0 + _R0 + 2*wp) for a receiver in row
        # sub-block k, so an edge is in-window iff it lands in its
        # receiver's slice (equivalently |offset| <= wp up to sub-block
        # granularity); everything else spills to the outlier COO.
        r0 = _R0 if b % _R0 == 0 else b
        k = (receivers % b) // r0
        in_win = (lidx >= k * r0) & (lidx < k * r0 + r0 + 2 * wp)
        return b, in_win, int(e - in_win.sum())

    # The outlier correction is a scatter (~6 row-traffics per edge,
    # measured ~0.3 ms at 1% of E) while widening the window is nearly
    # free below wp≈256 — so first look for a near-escape-free window,
    # then fall back to the loose budget.
    chosen = None
    if force_wp is not None:
        b, in_win, n_escape = escapes(force_wp)
        if b is not None:
            chosen = (force_wp, b, in_win, n_escape)
    else:
        # escape-budget ladder, tightest first: a LOOSE final budget must
        # not let a too-small window win over one that escapes far less
        # (a 2-rung ladder once accepted wp=128 at 29% escapes when
        # wp=448 had 5% — the intermediate rungs find the right window
        # before the loose rung applies)
        tiers = sorted(
            {max(64, e // 1000), e // 100, e // 20, e // 10, cap // 2}
        )
        for tier_cap in (t for t in tiers if t <= cap // 2):
            for wp in candidates:
                b, in_win, n_escape = escapes(wp)
                if b is not None and n_escape <= tier_cap:
                    chosen = (wp, b, in_win, n_escape)
                    break
            if chosen:
                break
    if chosen:
        wp, b, in_win, n_escape = chosen
        # in-window edges, receiver-major with within-row ranks
        order = np.argsort(receivers[in_win], kind="stable")
        r_in = receivers[in_win][order]
        s_in = senders[in_win][order]
        w_in = weights[in_win][order]
        counts = np.bincount(r_in, minlength=n_pad)
        starts = np.zeros(n_pad, np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        ranks = np.arange(r_in.shape[0]) - starts[r_in]
        # smallest width whose degree spill fits the remaining budget
        max_deg = int(counts.max()) if r_in.size else 0
        # degree-spill budget stays tight (2% of E) even when the caller
        # loosens the WINDOW-ESCAPE budget: outliers ride a scatter, and a
        # loose joint budget once starved the table to width 4 / 50% of E
        # in the outlier list (0.28x the gather path, measured — the
        # crossover experiment's first casualty)
        spill_budget = max(0, min(cap - n_escape, int(0.02 * e)))
        width = max_deg
        if force_width is not None:
            width = force_width
        elif max_deg:
            # edges at rank >= d0 spill; spills(d0) = E_in - Σ_{r<d0} rank_counts
            rank_counts = np.bincount(ranks, minlength=max_deg)
            spills = r_in.shape[0] - np.cumsum(rank_counts)
            ok_widths = np.nonzero(spills <= spill_budget)[0]
            if ok_widths.size:
                width = int(ok_widths[0]) + 1
        fits = ranks < width
        spill = ~fits
        n_out = n_escape + int(spill.sum())

        table_s = np.full((n_pad, max(1, width)), n_pad - 1, np.int32)
        table_w = np.zeros((n_pad, max(1, width)), np.float32)
        table_m = np.zeros((n_pad, max(1, width)), np.float32)
        table_s[r_in[fits], ranks[fits]] = s_in[fits]
        table_w[r_in[fits], ranks[fits]] = w_in[fits]
        table_m[r_in[fits], ranks[fits]] = 1.0

        o_pad = max(128, int(np.ceil(max(1, n_out) / 128)) * 128)
        out_s = np.full(o_pad, n_pad - 1, np.int32)
        out_r = np.full(o_pad, n_pad - 1, np.int32)
        out_w = np.zeros(o_pad, np.float32)
        out_m = np.zeros(o_pad, np.float32)
        out_s[:n_escape] = senders[~in_win]
        out_r[:n_escape] = receivers[~in_win]
        out_w[:n_escape] = weights[~in_win]
        out_s[n_escape:n_out] = s_in[spill]
        out_r[n_escape:n_out] = r_in[spill]
        out_w[n_escape:n_out] = w_in[spill]
        out_m[:n_out] = 1.0
        return BlockEllPlan(
            block=b, wp=wp, senders=table_s, weights=table_w, mask=table_m,
            out_senders=out_s, out_receivers=out_r, out_weights=out_w,
            out_mask=out_m, n_outliers=n_out, window=b + 2 * wp,
        )
    return None
