"""Test environment: force CPU backend with 8 virtual devices.

Multi-device code paths (``parallel/``) are exercised on a fake 8-device CPU
mesh — the same ``shard_map``/``pjit`` code that runs on a real TPU slice
(SURVEY.md §4c).  Must run before JAX initializes its backends.
"""

import os

# The harness environment pins JAX_PLATFORMS=axon (tunneled TPU); tests must
# run on the virtual-8-device CPU backend, so override unconditionally.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
