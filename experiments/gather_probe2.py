"""Round-3 probe #2: precision/shape tuning for the block-ELL kernel."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gcn_maxcut_tpu.bench.microbench import _scan_timeit
from gcn_maxcut_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

N, D, F = 100_000, 8, 128
SOL_BYTES = 4.0 * F + 12.0 + 4.0 * F / D
SOL_EDGES = 819e9 / SOL_BYTES


def _kernel(B, Wp, F, P, nb, d, mode, lidx_ref, w_ref, x_hbm, out_ref,
            scratch, sems):
    i = pl.program_id(0)
    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)
    Wwin = B + 2 * Wp

    def mk(bi, s):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(pl.multiple_of(bi * B, 8), Wwin), :],
            scratch.at[s], sems.at[s])

    @pl.when(i == 0)
    def _():
        mk(0, 0).start()

    @pl.when(i + 1 < nb)
    def _():
        mk(i + 1, nxt).start()

    mk(i, slot).wait()
    xw = scratch[slot]
    lidx = lidx_ref[:]
    wgt = w_ref[:]
    acc = jnp.zeros((B, F), jnp.float32)
    if mode == "split":
        hi = xw.astype(jnp.bfloat16).astype(jnp.float32)
        lo = xw - hi
    for p0 in range(0, Wwin, P):
        pw = min(P, Wwin - p0)
        col = jax.lax.broadcasted_iota(jnp.int32, (B, pw), 1) + p0
        Gp = jnp.zeros((B, pw), jnp.float32)
        for j in range(d):
            Gp = Gp + jnp.where(lidx[:, j:j+1] == col, wgt[:, j:j+1], 0.0)
        dn = (((1,), (0,)), ((), ()))
        if mode == "split":
            acc = acc + jax.lax.dot_general(
                Gp, hi[p0:p0+pw, :], dn, preferred_element_type=jnp.float32)
            acc = acc + jax.lax.dot_general(
                Gp, lo[p0:p0+pw, :], dn, preferred_element_type=jnp.float32)
        else:
            prec = {"default": jax.lax.Precision.DEFAULT,
                    "high": jax.lax.Precision.HIGH,
                    "highest": jax.lax.Precision.HIGHEST}[mode]
            acc = acc + jax.lax.dot_general(
                Gp, xw[p0:p0+pw, :], dn,
                preferred_element_type=jnp.float32, precision=prec)
    out_ref[:] = acc


def proto(W, B, P, mode, d=D, fwdbwd=False):
    rng = np.random.default_rng(1)
    Wp = (W + 7) // 8 * 8
    n_use = (N // B) * B
    i = np.arange(n_use)[:, None]
    nbr = np.clip(i + rng.integers(-W, W + 1, size=(n_use, d)), 0, n_use - 1)
    blk_start = (np.arange(n_use)[:, None] // B) * B
    lidx = (nbr - (blk_start - Wp)).astype(np.int32)
    assert lidx.min() >= 0 and lidx.max() < B + 2 * Wp
    nb = n_use // B

    x = jax.random.normal(jax.random.PRNGKey(1), (n_use, F), jnp.float32)
    xpad = jnp.concatenate(
        [jnp.zeros((Wp, F), jnp.float32), x, jnp.zeros((Wp, F), jnp.float32)])
    lidx_j = jnp.asarray(lidx)
    w_j = jnp.ones((n_use, d), jnp.float32)
    Wwin = B + 2 * Wp
    kern = functools.partial(_kernel, B, Wp, F, P, nb, d, mode)

    @jax.jit
    def run(xp):
        return pl.pallas_call(
            kern,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((B, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
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

    y = run(xpad)
    nbr_j = jnp.asarray(nbr)
    ref = jnp.zeros_like(x)
    for j in range(d):
        ref = ref + x[nbr_j[:, j]]
    err = float(jnp.max(jnp.abs(y - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    e_use = n_use * d
    scale = 1.0 / d

    def op(xp):
        out = run(xp)
        return jnp.concatenate(
            [jnp.zeros((Wp, F), jnp.float32), out * scale,
             jnp.zeros((Wp, F), jnp.float32)])
    t = _scan_timeit(op, xpad)
    eps = e_use / t
    print(f"block-ELL W={W:4d} B={B:4d} P={P:4d} d={d:2d} mode={mode:8s} "
          f"{eps:.3e} e/s ({100*eps/SOL_EDGES:5.1f}% SoL) relerr={err:.2e} "
          f"t={t*1e3:.2f} ms", flush=True)


def expander_variants():
    rng = np.random.default_rng(0)
    nbr_j = jnp.asarray(rng.integers(0, N, size=(N, D)).astype(np.int32))
    x = jax.random.normal(jax.random.PRNGKey(1), (N, F), jnp.float32)
    scale = 1.0 / D

    def tree_add(x_):  # pairwise tree instead of serial chain, no weights
        gs = [x_[nbr_j[:, j]] for j in range(D)]
        while len(gs) > 1:
            gs = [gs[i] + gs[i+1] for i in range(0, len(gs), 2)]
        return gs[0] * scale
    t = _scan_timeit(tree_add, x)
    print(f"expander tree-add unit      {N*D/t:.3e} e/s ({100*N*D/t/SOL_EDGES:5.1f}% SoL)",
          flush=True)

    def serial_unit(x_):  # serial chain, no weight multiply
        out = x_[nbr_j[:, 0]]
        for j in range(1, D):
            out = out + x_[nbr_j[:, j]]
        return out * scale
    t = _scan_timeit(serial_unit, x)
    print(f"expander serial-add unit    {N*D/t:.3e} e/s ({100*N*D/t/SOL_EDGES:5.1f}% SoL)",
          flush=True)


if __name__ == "__main__":
    expander_variants()
    for args in ((255, 256, 768, "split"), (255, 256, 768, "default"),
                 (255, 256, 384, "split"), (255, 256, 768, "high"),
                 (127, 256, 640, "split"), (127, 512, 768, "split"),
                 (255, 512, 512, "split"), (511, 512, 768, "split")):
        try:
            proto(*args)
        except Exception as e:
            print(f"{args} failed: {type(e).__name__} {e}", flush=True)
    # ELL width 16 with half the slots masked-off (variable-degree case)
    try:
        proto(255, 256, 768, "split", d=16)
    except Exception as e:
        print(f"d=16 failed: {e}", flush=True)
