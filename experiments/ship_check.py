#!/usr/bin/env python
"""Validate the shipped weighted banded kernel (mode='mxu' default) on the
real TPU: exactness vs XLA rolls + bench_spmm_banded numbers."""

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
            print(f"[ship] attempt {attempt} timed out; retrying", flush=True)
            continue
        sys.exit(rc)
    sys.exit(1)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from gcn_maxcut_tpu.ops.pallas_banded import banded_spmm, banded_spmm_xla
    from gcn_maxcut_tpu.bench.microbench import bench_spmm_banded

    n, F, D = 131_072, 128, 8
    rng = np.random.default_rng(0)
    half = rng.choice(np.arange(1, 64), size=D // 2, replace=False)
    offsets = tuple(int(o) for p in ((s, -s) for s in half) for o in p)
    x = jax.random.normal(jax.random.PRNGKey(1), (n, F), jnp.float32)
    w = jax.random.uniform(jax.random.PRNGKey(2), (n, D), jnp.float32, 0.5, 1.5)
    y = banded_spmm(x, w, offsets)
    ref = banded_spmm_xla(x, w, offsets)
    rel = float(jnp.max(jnp.abs(y - ref)) / jnp.max(jnp.abs(ref)))
    print(f"shipped mxu weighted kernel rel_err vs XLA rolls: {rel:.2e}", flush=True)
    assert rel < 1e-6

    # gradient exactness on the real device
    g = jax.grad(lambda x_: jnp.sum(banded_spmm(x_, w, offsets) ** 2))(x)
    g_ref = jax.grad(lambda x_: jnp.sum(banded_spmm_xla(x_, w, offsets) ** 2))(x)
    grel = float(jnp.max(jnp.abs(g - g_ref)) / jnp.max(jnp.abs(g_ref)))
    print(f"grad rel_err: {grel:.2e}", flush=True)
    assert grel < 1e-5

    res = bench_spmm_banded()
    print(
        f"bench: unit fwd {res['fwd_edges_per_s']:.3e} "
        f"({100 * res['fraction_of_banded_roofline']:.1f}%), weighted fwd "
        f"{res['weighted_fwd_edges_per_s']:.3e} "
        f"({100 * res['weighted_fraction_of_banded_roofline']:.1f}% SoL-w)",
        flush=True,
    )


def check_block_ell_hw():
    """Hardware exactness of the block-ELL split mode (Mosaic-side split —
    XLA's excess-precision elision does not apply, but verify on-device)."""
    from gcn_maxcut_tpu.bench.microbench import _banded_regular_graph
    from gcn_maxcut_tpu.core.graph import round_up
    from gcn_maxcut_tpu.ops.segment import spmm, spmm_ell

    n, d = 65_536, 8
    g = _banded_regular_graph(n, d, 255, n_pad=round_up(n, 2048))
    assert g.bell_block is not None
    x = jax.random.normal(jax.random.PRNGKey(3), (g.n_pad, 128), jnp.float32)
    y = spmm(g, x)              # block-ELL kernel
    ref = spmm_ell(g, x)        # exact gather path
    rel = float(jnp.max(jnp.abs(y - ref)) / jnp.max(jnp.abs(ref)))
    print(f"block-ELL hw rel_err vs gather path: {rel:.2e}", flush=True)
    assert rel < 1e-5, rel


if __name__ == "__main__":
    main()
    check_block_ell_hw()
