#!/usr/bin/env python
"""Probe: why is the weighted banded kernel at 32-47% SoL vs unit's 92%?

Hypotheses tested, one kernel variant each (all share the unit kernel's
fused-window DMA plan from ops/pallas_banded.py):

  blockw  baseline: w via auto-pipelined [B, D] BlockSpec, VPU broadcast
          multiply (what banded_spmm ships today).
  fullw   whole [n, D] w resident in VMEM (4 MB at n=131k), kernel slices
          rows by block index -> removes the BlockSpec pipeline entirely.
          If the auto-pipeline was serializing the manual window DMAs,
          this jumps.
  hoist   blockw, but all D lane-broadcasts computed before the fma loop
          (tests whether Mosaic fails to hoist the column extracts).
  mxu1    broadcast each w column via a rank-1 bf16 MXU matmul
          (w_col [B,1] @ ones [1,F]) -- inexact (bf16 truncation), perf
          ceiling for the MXU route.
  mxu2    same but hi/lo bf16 split as ONE K=2 matmul with f32 accum
          (rel err ~1e-5 -- 16 mantissa bits).
  unit    the unit kernel, for the run's SoL anchor.

Run on the axon TPU:  python experiments/weighted_probe.py
(wraps itself in a retrying child; the tunnel hangs device init ~1-in-2).
"""

import functools
import os
import subprocess
import sys

if os.environ.get("PROBE_CHILD") != "1" and __name__ == "__main__":
    for attempt in range(4):
        try:
            rc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=dict(os.environ, PROBE_CHILD="1"),
                timeout=420,
            ).returncode
        except subprocess.TimeoutExpired:
            print(f"[probe] attempt {attempt} timed out; retrying", flush=True)
            continue
        sys.exit(rc)
    sys.exit(1)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gcn_maxcut_tpu.ops.pallas_banded import (
    _VMEM_LIMIT,
    _window_plan,
    banded_spmm,
    banded_spmm_unit,
    banded_spmm_xla,
)
from gcn_maxcut_tpu.utils.timing import scan_timeit

N, D, F, W = 131_072, 8, 128, 63
BLOCK = 8192


def _kernel(offsets, B, Wp, F, n_blocks, variant, *refs):
    if variant.startswith("mxuall"):
        w_ref, g_ref, x_hbm, lo_hbm, hi_hbm, out_ref, scratch, sems = refs
    elif variant == "cols":
        D = len(offsets)
        col_refs = refs[:D]
        x_hbm, lo_hbm, hi_hbm, out_ref, scratch, sems = refs[D:]
        w_ref = None
    else:
        w_ref, x_hbm, lo_hbm, hi_hbm, out_ref, scratch, sems = refs
    i = pl.program_id(0)
    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)
    start, wait = _window_plan(x_hbm, lo_hbm, hi_hbm, scratch, sems, B, Wp, n_blocks)

    @pl.when(i == 0)
    def _():
        start(0, 0)

    @pl.when(i + 1 < n_blocks)
    def _():
        start(i + 1, nxt)

    wait(i, slot)
    x_win = scratch[slot]
    acc = jnp.zeros((B, F), jnp.float32)

    if variant == "fullw":
        w_blk = w_ref[pl.ds(pl.multiple_of(i * B, 8), B), :]
    elif w_ref is not None:
        w_blk = w_ref[:]

    if variant == "cols":
        # per-offset weight columns arrive as separate [B, 1] blocks — no
        # in-kernel lane extract, just broadcast + fma
        for k, o in enumerate(offsets):
            acc = acc + col_refs[k][:] * x_win[Wp + o : Wp + o + B, :]
    elif variant in ("blockw", "fullw"):
        for k, o in enumerate(offsets):
            acc = acc + w_blk[:, k : k + 1] * x_win[Wp + o : Wp + o + B, :]
    elif variant == "hoist":
        cols = [
            jnp.broadcast_to(w_blk[:, k : k + 1], (B, F))
            for k in range(len(offsets))
        ]
        for k, o in enumerate(offsets):
            acc = acc + cols[k] * x_win[Wp + o : Wp + o + B, :]
    elif variant == "mxu1":
        wh = w_blk.astype(jnp.bfloat16)
        ones = jnp.ones((1, F), jnp.bfloat16)
        for k, o in enumerate(offsets):
            bw = jax.lax.dot_general(
                wh[:, k : k + 1], ones,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = acc + bw * x_win[Wp + o : Wp + o + B, :]
    elif variant == "mxu2":
        wh = w_blk.astype(jnp.bfloat16)
        wl = (w_blk - wh.astype(jnp.float32)).astype(jnp.bfloat16)
        ones = jnp.ones((2, F), jnp.bfloat16)
        for k, o in enumerate(offsets):
            pair = jnp.concatenate(
                [wh[:, k : k + 1], wl[:, k : k + 1]], axis=1
            )
            bw = jax.lax.dot_general(
                pair, ones,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = acc + bw * x_win[Wp + o : Wp + o + B, :]
    elif variant.startswith("mxuall"):
        # ONE matmul per block computes ALL D lane-broadcasts:
        # [B, 2D] (hi|lo bf16) @ [2D, D*F] block-diag ones -> [B, D*F] f32.
        # The fma loop then matches the unit kernel's VPU cost exactly.
        bw = jax.lax.dot_general(
            w_ref[:], g_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for k, o in enumerate(offsets):
            acc = acc + bw[:, k * F : (k + 1) * F] * x_win[Wp + o : Wp + o + B, :]
    elif variant.startswith("hybrid"):
        # offsets alternate between the MXU rank-1 hi/lo route and the VPU
        # broadcast route so the two units overlap.
        s = int(variant[6:])
        wh = w_blk.astype(jnp.bfloat16)
        wl = (w_blk - wh.astype(jnp.float32)).astype(jnp.bfloat16)
        ones = jnp.ones((2, F), jnp.bfloat16)
        order = sorted(range(len(offsets)), key=lambda k: (k % 2, k))
        mxu_set = set(order[:s])
        for k, o in enumerate(offsets):
            xs = x_win[Wp + o : Wp + o + B, :]
            if k in mxu_set:
                pair = jnp.concatenate(
                    [wh[:, k : k + 1], wl[:, k : k + 1]], axis=1
                )
                bw = jax.lax.dot_general(
                    pair, ones,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = acc + bw * xs
            else:
                acc = acc + w_blk[:, k : k + 1] * xs
    else:
        raise ValueError(variant)
    out_ref[:] = acc


def weighted_variant(x, w, offsets, variant, block=BLOCK):
    n, F = x.shape
    D = w.shape[1]
    Wmax = int(max(abs(o) for o in offsets))
    Wp = (Wmax + 7) // 8 * 8
    n_blocks = n // block
    lo = x[n - Wp :]
    hi = x[:Wp]
    extra_args, extra_specs = (), ()
    if variant.startswith("mxuall"):
        if variant == "mxuallbf16":
            w_in = w.astype(jnp.bfloat16)          # inexact ceiling check
            g = np.zeros((D, D * F), np.float32)
            for k in range(D):
                g[k, k * F : (k + 1) * F] = 1.0
        elif variant == "mxuall3":
            wh = w.astype(jnp.bfloat16)
            r1 = w - wh.astype(jnp.float32)
            wm = r1.astype(jnp.bfloat16)
            wl = (r1 - wm.astype(jnp.float32)).astype(jnp.bfloat16)
            w_in = jnp.concatenate([wh, wm, wl], axis=1)   # [n, 3D]
            g = np.zeros((3 * D, D * F), np.float32)
            for k in range(D):
                for p in range(3):
                    g[p * D + k, k * F : (k + 1) * F] = 1.0
        else:
            wh = w.astype(jnp.bfloat16)
            wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)
            w_in = jnp.concatenate([wh, wl], axis=1)   # [n, 2D]
            g = np.zeros((2 * D, D * F), np.float32)
            for k in range(D):
                g[k, k * F : (k + 1) * F] = 1.0
                g[D + k, k * F : (k + 1) * F] = 1.0
        extra_args = (jnp.asarray(g, jnp.bfloat16),)
        extra_specs = (pl.BlockSpec(memory_space=pltpu.VMEM),)
        w_spec = pl.BlockSpec(
            (block, w_in.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
    elif variant == "cols":
        D_ = w.shape[1]
        cols = tuple(jnp.asarray(w[:, k : k + 1]) for k in range(D_))
        col_specs = tuple(
            pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(D_)
        )
        kernel = functools.partial(
            _kernel, tuple(offsets), block, Wp, F, n_blocks, variant
        )
        return pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=list(col_specs) + [pl.BlockSpec(memory_space=pl.ANY)] * 3,
            out_specs=pl.BlockSpec(
                (block, F), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n, F), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, block + 2 * Wp, F), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 3)),
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT
            ),
        )(*cols, x, lo, hi)
    elif variant == "fullw":
        w_in = w
        w_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    else:
        w_in = w
        w_spec = pl.BlockSpec(
            (block, w.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
    kernel = functools.partial(
        _kernel, tuple(offsets), block, Wp, F, n_blocks, variant
    )
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[w_spec, *extra_specs] + [pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=pl.BlockSpec(
            (block, F), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, F), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, block + 2 * Wp, F), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT
        ),
    )(w_in, *extra_args, x, lo, hi)


def main():
    rng = np.random.default_rng(0)
    half = rng.choice(np.arange(1, W + 1), size=D // 2, replace=False)
    offsets = tuple(int(o) for pair in ((s, -s) for s in half) for o in pair)
    x = jax.random.normal(jax.random.PRNGKey(1), (N, F), jnp.float32)
    w = jax.random.uniform(
        jax.random.PRNGKey(2), (N, D), jnp.float32, 0.5, 1.5
    )
    e = N * D
    sol_unit = 819e9 / (2 * 4.0 * F / D)           # read x + write y
    sol_w = 819e9 / ((2 * 4.0 * F + 4.0 * D) / D)  # + read w

    ref = banded_spmm_xla(x, w, offsets)
    scale = 1.0 / D

    t = scan_timeit(lambda x_: banded_spmm_unit(x_, offsets) * scale, x)
    print(f"unit        : {e / t:.3e} edges/s  ({100 * (e / t) / sol_unit:.1f}% SoL)", flush=True)

    cases = [
        ("mxuall3", 2048), ("mxuall", 2048),
        ("mxuall3", 2048), ("mxuall", 2048),
        ("mxuall3", 4096), ("mxuall3", 2048),
    ]
    for variant, blk in cases:
        tag = f"{variant}@{blk}"
        try:
            fn = jax.jit(
                lambda x_, v=variant, b=blk: weighted_variant(
                    x_, w, offsets, v, block=b
                )
            )
            out = fn(x)
            err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
            t = scan_timeit(lambda x_, f=fn: f(x_) * scale, x)
            print(
                f"{tag:12s}: {e / t:.3e} edges/s  "
                f"({100 * (e / t) / sol_w:.1f}% SoL-w)  rel_err={err:.2e}",
                flush=True,
            )
        except Exception as exc:
            print(f"{tag:12s}: FAILED {str(exc)[:120]}", flush=True)


if __name__ == "__main__":
    main()
