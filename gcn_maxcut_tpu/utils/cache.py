"""Persistent XLA compilation cache.

The reference repays nothing per run (eager torch); our jit'd pipelines paid
a multi-minute XLA compile on every bench/CLI invocation (229.8 s for the
train-epoch bench in round 1).  Enabling JAX's persistent compilation cache
makes every compile after the first process near-free: traced programs are
keyed by HLO + compile options and reloaded from disk.

Call :func:`enable_compilation_cache` once per process before the first jit
execution (bench.py, the CLI driver, and examples do).  Tests do NOT enable
it — they exercise fresh-compile behavior on the CPU backend.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.environ.get("GCN_CACHE_ROOT", os.path.expanduser("~")),
    ".cache",
    "gcn_maxcut_tpu",
    "xla",
)

_enabled = False


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Configure JAX's on-disk compilation cache (idempotent).

    Caches every compilation regardless of compile time or artifact size —
    this framework's programs are few and large, so eviction pressure is
    a non-issue next to the 100x win on repeat runs.
    """
    global _enabled
    import jax

    path = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR", _DEFAULT_DIR)
    if _enabled:
        return path
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _enabled = True
    return path
