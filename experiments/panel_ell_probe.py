#!/usr/bin/env python
"""Panel-ELL block SpMM prototype: can bucketing each row's neighbors by
128-wide window *panel* beat the full-window one-hot build?

The shipped block-ELL kernel (ops/pallas_block_ell.py) is VPU-bound: the
one-hot gather matrix costs d compare passes over the WHOLE window per row
(d*(B+2Wp) elem-ops), although only d columns ever match.  Bucketing the
table by panel (host-side, static) cuts the build to W_P compare passes
per 128-wide panel — total ~ n_panels*W_P*128 per row, independent of the
window width.  Prototype + measurement vs the shipped kernel at W=255 and
W=511 (the VERDICT r3 #5 targets: >=70% / >=55% of the gather roofline).

MEASURED VERDICT (v5e, 2026-08-20): **negative result — shipped kernel
wins.**  At W=255 the panel variant needs W_P=4 to keep spills under 2%
(per-row neighbors cluster in a few panels on banded graphs — the panel
occupancy is far more skewed than binomial), so 6 panels x 4 slots = 24
compare passes over [B,128] slabs plus 12 small split-matmuls lose to the
shipped kernel's 8 passes over wide slabs: 6.3e8 (45%) vs 1.04e9 (74%).
Meanwhile best-of-3 measurement shows the shipped kernel already makes
both targets — W=255: 74-77%, W=511: 55% — the round-3 single-shot
readings (65%/48%) were tunnel variance (PARITY §3).
"""

import os
import subprocess
import sys

if os.environ.get("PROBE_CHILD") != "1" and __name__ == "__main__":
    for attempt in range(4):
        try:
            rc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), *sys.argv[1:]],
                env=dict(os.environ, PROBE_CHILD="1"),
                timeout=900,
            ).returncode
        except subprocess.TimeoutExpired:
            print(f"[probe] attempt {attempt} timed out; retrying", flush=True)
            continue
        sys.exit(rc)
    sys.exit(1)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gcn_maxcut_tpu.bench.microbench import _banded_regular_graph
from gcn_maxcut_tpu.bench.roofline import RooflineModel, chip_specs
from gcn_maxcut_tpu.core.graph import round_up
from gcn_maxcut_tpu.ops.pallas_banded import _VMEM_LIMIT, _window_plan
from gcn_maxcut_tpu.ops.segment import spmm
from gcn_maxcut_tpu.utils.timing import scan_timeit_stats

PANEL = 128


def build_panel_tables(senders, receivers, weights, n_pad, B, Wp, W_P):
    """[n_pad, n_panels*W_P] panel-local index + weight tables.

    Out-of-window edges (wrap-around; the shipped plan's outlier COO) and
    over-W_P spills are DROPPED here — the probe measures the kernel, not
    the correction — and the affected receiver rows are returned so the
    correctness check can mask them.  Returns (idx, wgt, n_dropped,
    dropped_rows_mask)."""
    Wwin = B + 2 * Wp
    n_panels = Wwin // PANEL
    if Wwin % PANEL:
        raise ValueError(f"window {Wwin} not divisible by PANEL={PANEL}")
    lidx = (senders - (receivers // B) * B + Wp) % n_pad
    in_win = lidx < Wwin
    escaped_recv = receivers[~in_win]
    senders, receivers, weights, lidx = (
        senders[in_win], receivers[in_win], weights[in_win], lidx[in_win]
    )
    panel = lidx // PANEL
    local = lidx % PANEL
    key = receivers * n_panels + panel
    order = np.lexsort((local, key))
    rank = np.arange(senders.shape[0]) - np.concatenate(
        [[0], np.cumsum(np.bincount(key[order]))[:-1]]
    )[key[order]]
    fits = rank < W_P
    idx = np.full((n_pad, n_panels * W_P), -1, np.int32)
    wgt = np.zeros((n_pad, n_panels * W_P), np.float32)
    r_ord = receivers[order]
    idx[r_ord[fits], (panel[order] * W_P + rank)[fits]] = local[order][fits]
    wgt[r_ord[fits], (panel[order] * W_P + rank)[fits]] = weights[order][fits]
    n_drop = int((~in_win).sum() + (~fits).sum())
    # rows losing any edge: out-of-window receivers + spilled receivers
    dropped_rows = np.zeros(n_pad, bool)
    dropped_rows[escaped_recv] = True
    dropped_rows[r_ord[~fits]] = True
    return idx, wgt, n_drop, dropped_rows


def _panel_kernel(n, B, Wp, F, nb, n_panels, W_P, mode,
                  idx_ref, w_ref, x_hbm, lo_hbm, hi_hbm, out_ref, scratch,
                  sems):
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
    if mode == "split":
        hi = xw.astype(jnp.bfloat16).astype(jnp.float32)
        lo = xw - hi
    col = jax.lax.broadcasted_iota(jnp.int32, (B, PANEL), 1)
    acc = jnp.zeros((B, F), jnp.float32)
    dn = (((1,), (0,)), ((), ()))
    for p in range(n_panels):
        Gp = jnp.zeros((B, PANEL), jnp.float32)
        for j in range(W_P):
            c = p * W_P + j
            Gp = Gp + jnp.where(
                idx_ref[:, c:c+1] == col, w_ref[:, c:c+1], 0.0
            )
        s0 = p * PANEL
        if mode == "split":
            acc = acc + jax.lax.dot_general(
                Gp, hi[s0:s0+PANEL, :], dn,
                preferred_element_type=jnp.float32)
            acc = acc + jax.lax.dot_general(
                Gp, lo[s0:s0+PANEL, :], dn,
                preferred_element_type=jnp.float32)
        else:
            acc = acc + jax.lax.dot_general(
                Gp, xw[s0:s0+PANEL, :], dn,
                preferred_element_type=jnp.float32)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("n", "B", "Wp", "W_P", "mode"))
def panel_spmm(x, idx, wgt, n, B, Wp, W_P, mode="split"):
    npad, F = x.shape
    Wwin = B + 2 * Wp
    nb = n // B
    n_panels = Wwin // PANEL
    lo = x[n - Wp:]
    hi = x[:Wp]
    kern = functools.partial(
        _panel_kernel, n, B, Wp, F, nb, n_panels, W_P, mode)
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((B, n_panels * W_P), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, n_panels * W_P), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
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
    )(idx, wgt, x, lo, hi)


def main():
    n, d, F = 100_000, 8, 128
    n_pad = round_up(n, 2048)
    model = RooflineModel(chip_specs("v5e"), F, n, n * d)
    roof = model.edges_per_s(fwd_bwd=False)
    for locality, wp in ((255, 256), (511, 512)):
        g = _banded_regular_graph(n, d, locality, n_pad=n_pad)
        # shipped kernel (auto-attached plan)
        x = jax.random.normal(jax.random.PRNGKey(1), (n_pad, F), jnp.float32)
        e = n * d
        if g.bell_block is not None:
            st = scan_timeit_stats(lambda x_: spmm(g, x_) * (1 / d), x)
            print(f"W={locality}: shipped block-ELL {e / st['best_s']:.3e} "
                  f"edges/s ({100 * e / st['best_s'] / roof:.0f}% roof, "
                  f"spread {100 * st['spread_frac']:.0f}%)", flush=True)
        # panel-ELL prototype
        s = np.asarray(g.senders)[: int(g.n_edges)]
        r = np.asarray(g.receivers)[: int(g.n_edges)]
        w = np.ones_like(s, np.float32)
        B = g.bell_block or 256
        for W_P in (2, 3, 4):
            idx, wgt, n_drop, dropped = build_panel_tables(
                s, r, w, n_pad, B, wp, W_P
            )
            if n_drop > 0.05 * e:
                print(f"W={locality} W_P={W_P}: dropped {n_drop} "
                      f"({100 * n_drop / e:.2f}%) too high", flush=True)
                continue
            ij = jnp.asarray(idx)
            wj = jnp.asarray(wgt)
            y = panel_spmm(x, ij, wj, n_pad, B, wp, W_P)
            ref = spmm(g, x)
            keep = jnp.asarray(~dropped)[:, None]
            err = float(
                jnp.max(jnp.abs((y - ref) * keep))
                / (jnp.max(jnp.abs(ref)) + 1e-9)
            )
            st = scan_timeit_stats(
                lambda x_: panel_spmm(x_, ij, wj, n_pad, B, wp, W_P) * (1 / d),
                x,
            )
            eps = e / st["best_s"]
            print(f"W={locality} W_P={W_P}: panel-ELL {eps:.3e} edges/s "
                  f"({100 * eps / roof:.0f}% roof, spread "
                  f"{100 * st['spread_frac']:.0f}%), dropped "
                  f"{100 * n_drop / e:.2f}%, rel err (kept rows) {err:.1e}",
                  flush=True)


if __name__ == "__main__":
    main()
