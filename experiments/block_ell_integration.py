"""Validate + time the integrated block-ELL path on the real TPU."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from gcn_maxcut_tpu.bench.microbench import _scan_timeit
from gcn_maxcut_tpu.core.graph import graph_from_edges
from gcn_maxcut_tpu.ops.segment import spmm, spmm_ell
from gcn_maxcut_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

N, D, F, W = 100_000, 8, 128, 255
SOL_BYTES = 4.0 * F + 12.0 + 4.0 * F / D
SOL_EDGES = 819e9 / SOL_BYTES


def banded_random_edges(n, d, w, seed=0):
    """~d-regular random graph with all offsets within ±w (the post-RCM
    shape of any bandable graph; structure per-row is arbitrary)."""
    rng = np.random.default_rng(seed)
    u = np.repeat(np.arange(n, dtype=np.int64), d // 2)
    delta = rng.integers(1, w + 1, size=u.shape[0])
    sign = rng.integers(0, 2, size=u.shape[0]) * 2 - 1
    v = (u + sign * delta) % n
    return np.stack([u, v], axis=1)


t0 = time.time()
edges = banded_random_edges(N, D, W)
g = graph_from_edges(edges, N, block_ell="auto")
print(f"build {time.time()-t0:.1f}s; bell_block={g.bell_block} wp={g.bell_wp} "
      f"outliers={0 if g.bell_out_mask is None else int(np.asarray(g.bell_out_mask).sum())} "
      f"ell_width={g.ell_senders.shape[1]}", flush=True)
assert g.bell_block is not None

x = jax.random.normal(jax.random.PRNGKey(1), (g.n_pad, F), jnp.float32)
y = spmm(g, x)
y_ref = spmm_ell(g, x, "mask")
err = float(jnp.max(jnp.abs(y - y_ref)) / jnp.max(jnp.abs(y_ref)))
print(f"fwd relerr vs spmm_ell: {err:.2e}", flush=True)

e = int(np.asarray(g.n_edges))
scale = 1.0 / D
t_fwd = _scan_timeit(lambda x_: spmm(g, x_) * scale, x)
print(f"fwd  {e/t_fwd:.3e} edges/s ({100*e/t_fwd/SOL_EDGES:.1f}% SoL) t={t_fwd*1e3:.2f} ms",
      flush=True)

grad_fn = jax.grad(lambda x_: jnp.sum(spmm(g, x_) ** 2))
dx = grad_fn(x)
dx_ref = jax.grad(lambda x_: jnp.sum(spmm_ell(g, x_, "mask") ** 2))(x)
gerr = float(jnp.max(jnp.abs(dx - dx_ref)) / jnp.max(jnp.abs(dx_ref)))
print(f"grad relerr: {gerr:.2e}", flush=True)
t_fb = _scan_timeit(lambda x_: grad_fn(x_) * (scale * scale * 0.5), x)
sol_fb = SOL_EDGES / 3
print(f"fwd+bwd {e/t_fb:.3e} edges/s ({100*e/t_fb/sol_fb:.1f}% SoL) t={t_fb*1e3:.2f} ms",
      flush=True)
