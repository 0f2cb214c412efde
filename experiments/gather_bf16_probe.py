#!/usr/bin/env python
"""Is the expander-graph gather path byte-bound or row-bound?

The general SpMM on true expanders rides XLA's row gather at ~405 GB/s
(the measured hardware ceiling for scattered 512-byte rows).  If the
ceiling is BYTES, gathering bf16 rows (256 B at F=128) should double
edges/s for the cost of bf16 aggregation precision; if it is ROWS
(descriptor-bound), bf16 changes nothing.  This decides whether an opt-in
bf16 feature mode is worth shipping for the expander path.

MEASURED VERDICT (v5e, 3 runs, 2026-08-20): **row/descriptor-bound.**
A single bf16 row-gather streams only ~75-90 GB/s — the same per-row cost
as f32 at half the bytes — and the d-gather chain lands at 5.6-5.9e8
edges/s bf16 vs 5.0-5.7e8 f32 (+4-14%, from the halved output traffic,
not the gathers).  Run 1 printed a 3x bf16 gain (1.13e9) that runs 2 and
3 refuted — tunnel variance; always re-measure outliers (PARITY §3).
The bf16 feature mode ships in ``ops/segment.py`` as a small opt-in
lever with f32 accumulation.
"""

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

from gcn_maxcut_tpu.utils.timing import scan_timeit


def main():
    n, F, d = 100_000, 128, 8
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, n, size=(n, d)).astype(np.int32))
    x32 = jax.random.normal(jax.random.PRNGKey(1), (n, F), jnp.float32)
    x16 = x32.astype(jnp.bfloat16)
    e = n * d

    # raw single gather (the primitive's ceiling)
    for name, x in (("f32", x32), ("bf16", x16)):
        t = scan_timeit(
            lambda x_: x_[idx[:, 0]] + 0.0 * x_[:1, :1].astype(x_.dtype), x
        )
        gbps = n * F * x.dtype.itemsize / t / 1e9
        print(f"single gather {name}: {gbps:6.0f} GB/s ({n / t:.2e} rows/s)",
              flush=True)

    # d-gather ELL aggregation chain
    for name, x in (("f32", x32), ("bf16", x16)):
        def agg(x_):
            out = jnp.zeros((n, F), x_.dtype)
            for k in range(d):
                out = out + x_[idx[:, k]]
            return out * (1.0 / d).__float__()

        t = scan_timeit(lambda x_: agg(x_).astype(x_.dtype), x)
        print(f"d-gather agg {name}: {e / t:.3e} edges/s", flush=True)


if __name__ == "__main__":
    main()
