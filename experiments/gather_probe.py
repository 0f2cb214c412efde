"""Round-3 probe: how fast can a general-graph SpMM go on this v5e?

Measures (a) raw gather formulation ceilings for the expander case and
(b) a prototype block-ELL windowed one-hot-MXU kernel for bandable graphs.
Run: timeout 900 python experiments/gather_probe.py
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gcn_maxcut_tpu.bench.microbench import _scan_timeit
from gcn_maxcut_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

N, D, F = 100_000, 8, 128
E = N * D
SOL_BYTES = 4.0 * F + 12.0 + 4.0 * F / D  # microbench roofline bytes/edge
SOL_EDGES = 819e9 / SOL_BYTES


def report(name, t):
    eps = E / t
    print(f"{name:44s} {eps:.3e} edges/s  ({100*eps/SOL_EDGES:5.1f}% SoL)  t={t*1e3:.2f} ms",
          flush=True)
    return eps


def main():
    rng = np.random.default_rng(0)
    # arbitrary (expander-like) ELL table: each row D random senders
    nbr = rng.integers(0, N, size=(N, D)).astype(np.int32)
    nbr_j = jnp.asarray(nbr)
    w_j = jnp.ones((N, D), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (N, F), jnp.float32)
    scale = 1.0 / D

    # 1. current formulation: D separate row-gathers + adds
    def ell_loop(x_):
        out = w_j[:, 0:1] * x_[nbr_j[:, 0]]
        for j in range(1, D):
            out = out + w_j[:, j:j+1] * x_[nbr_j[:, j]]
        return out * scale
    report("d-gathers (current ELL)", _scan_timeit(ell_loop, x))

    # 2. one flat gather + reshape sum
    flat = nbr_j.reshape(-1)
    def flat_gather(x_):
        msgs = x_[flat].reshape(N, D, F)
        return jnp.sum(msgs, axis=1) * scale
    report("flat gather + reshape-sum", _scan_timeit(flat_gather, x))

    # 3. bf16 gather, f32 accumulate
    def ell_bf16(x_):
        xb = x_.astype(jnp.bfloat16)
        out = x_[nbr_j[:, 0]].astype(jnp.float32)
        out = xb[nbr_j[:, 0]].astype(jnp.float32)
        for j in range(1, D):
            out = out + xb[nbr_j[:, j]].astype(jnp.float32)
        return out * scale
    report("bf16 d-gathers", _scan_timeit(ell_bf16, x))

    # 4. sorted-index gather (all senders ascending per slot column)
    nbr_sorted = jnp.asarray(np.sort(nbr, axis=0))
    def ell_sorted(x_):
        out = x_[nbr_sorted[:, 0]]
        for j in range(1, D):
            out = out + x_[nbr_sorted[:, j]]
        return out * scale
    report("d-gathers, column-sorted idx", _scan_timeit(ell_sorted, x))

    # 5. take_along_axis style: one gather of [E] at once, segment ids
    def take1(x_):
        return x_[nbr_j[:, 0]] * scale
    t1 = _scan_timeit(take1, x)
    print(f"single [N] gather: {N / t1:.3e} rows/s "
          f"({N * F * 4 / t1 / 1e9:.0f} GB/s gathered)", flush=True)

    # ---- prototype block-ELL windowed one-hot kernel -----------------
    for W, B, P in ((127, 512, 512), (255, 512, 512), (255, 256, 384),
                    (511, 512, 512), (1023, 1024, 512)):
        try:
            proto_block_ell(W, B, P, prec="default")
            proto_block_ell(W, B, P, prec="highest")
        except Exception as e:
            print(f"block-ELL W={W} B={B} P={P} failed: {type(e).__name__} {e}",
                  flush=True)


def _kernel(B, Wp, F, P, nb, d, prec, lidx_ref, w_ref, x_hbm, out_ref,
            scratch, sems):
    i = pl.program_id(0)
    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)
    Wwin = B + 2 * Wp

    def start(bi, s):
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(pl.multiple_of(bi * B, 8), Wwin), :],
            scratch.at[s], sems.at[s],
        ).start()

    def wait(bi, s):
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(pl.multiple_of(bi * B, 8), Wwin), :],
            scratch.at[s], sems.at[s],
        ).wait()

    @pl.when(i == 0)
    def _():
        start(0, 0)

    @pl.when(i + 1 < nb)
    def _():
        start(i + 1, nxt)

    wait(i, slot)
    xw = scratch[slot]
    lidx = lidx_ref[:]
    wgt = w_ref[:]
    acc = jnp.zeros((B, F), jnp.float32)
    precision = (jax.lax.Precision.HIGHEST if prec == "highest"
                 else jax.lax.Precision.DEFAULT)
    for p0 in range(0, Wwin, P):
        pw = min(P, Wwin - p0)
        col = jax.lax.broadcasted_iota(jnp.int32, (B, pw), 1) + p0
        Gp = jnp.zeros((B, pw), jnp.float32)
        for j in range(d):
            Gp = Gp + jnp.where(lidx[:, j:j+1] == col, wgt[:, j:j+1], 0.0)
        acc = acc + jax.lax.dot_general(
            Gp, xw[p0:p0+pw, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
    out_ref[:] = acc


def proto_block_ell(W, B, P, prec):
    rng = np.random.default_rng(1)
    Wp = (W + 7) // 8 * 8
    # banded random graph WITHOUT wrap: senders within [i-W, i+W] clipped,
    # padded x with Wp rows both sides so window DMA never wraps
    i = np.arange(N)[:, None]
    nbr = np.clip(i + rng.integers(-W, W + 1, size=(N, D)), 0, N - 1)
    nb = N // B if N % B == 0 else None
    n_use = (N // B) * B
    nbr = nbr[:n_use].astype(np.int64)
    nbr = np.clip(nbr, 0, n_use - 1)
    nb = n_use // B
    blk_start = (np.arange(n_use)[:, None] // B) * B
    lidx = (nbr - (blk_start - Wp)).astype(np.int32)
    assert lidx.min() >= 0 and lidx.max() < B + 2 * Wp, (lidx.min(), lidx.max())

    x = jax.random.normal(jax.random.PRNGKey(1), (n_use, F), jnp.float32)
    xpad = jnp.concatenate(
        [jnp.zeros((Wp, F), jnp.float32), x, jnp.zeros((Wp, F), jnp.float32)])
    lidx_j = jnp.asarray(lidx)
    w_j = jnp.ones((n_use, D), jnp.float32)

    Wwin = B + 2 * Wp
    kern = functools.partial(_kernel, B, Wp, F, P, nb, D, prec)

    @jax.jit
    def run(xp):
        return pl.pallas_call(
            kern,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((B, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((B, F), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_use, F), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, Wwin, F), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, vmem_limit_bytes=64 * 1024 * 1024),
        )(lidx_j, w_j, xp)

    # correctness vs XLA gather
    y = run(xpad)
    nbr_j = jnp.asarray(nbr)
    ref = jnp.zeros_like(x)
    for j in range(D):
        ref = ref + x[nbr_j[:, j]]
    err = float(jnp.max(jnp.abs(y - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    e_use = n_use * D

    def op(xp):
        out = run(xp)
        return jnp.concatenate(
            [jnp.zeros((Wp, F), jnp.float32), out * (1.0 / D),
             jnp.zeros((Wp, F), jnp.float32)])
    t = _scan_timeit(op, xpad)
    eps = e_use / t
    print(f"block-ELL W={W:5d} B={B:5d} P={P} prec={prec:8s} "
          f"{eps:.3e} edges/s ({100*eps/SOL_EDGES:5.1f}% SoL) "
          f"relerr={err:.2e} t={t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
