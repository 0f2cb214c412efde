"""Multi-chip halo-kernel giant trainer (interpret mode, virtual mesh)."""

import numpy as np
import jax
import pytest
from jax.experimental.pallas import tpu as pltpu

from gcn_maxcut_tpu.parallel.giant_banded import HaloGiantConfig, train_halo_giant
from gcn_maxcut_tpu.parallel.mesh import make_mesh


def test_halo_giant_improves_cut_on_4_devices():
    mesh = make_mesh(("graph",), devices=jax.devices()[:4])
    cfg = HaloGiantConfig(
        d=4, dim_embedding=16, hidden_dim=16, epochs=10, epochs_per_call=5,
        bandwidth=15, block=64, learning_rate=5e-3,
    )
    with pltpu.force_tpu_interpret_mode():
        res = train_halo_giant(n_shard=128, config=cfg, mesh=mesh)
    assert res["num_devices"] == 4
    assert res["n"] == 512
    assert res["final_cut"] > res["initial_cut"]
    assert np.isfinite(res["final_cut"])


def test_halo_giant_single_device_consistency():
    # D=1 loopback must also train (wrap == circulant)
    mesh = make_mesh(("graph",), devices=jax.devices()[:1])
    cfg = HaloGiantConfig(
        d=4, dim_embedding=8, hidden_dim=8, epochs=5, epochs_per_call=5,
        bandwidth=7, block=32, learning_rate=5e-3,
    )
    with pltpu.force_tpu_interpret_mode():
        res = train_halo_giant(n_shard=128, config=cfg, mesh=mesh)
    assert res["final_cut"] >= res["initial_cut"]
