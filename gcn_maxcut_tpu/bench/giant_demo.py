"""Single-chip giant-graph training demo: 10M-node circulant regular graph.

BASELINE.json config[4] scale on ONE chip: the circulant structure keeps
everything banded, so both GCN convs use the Pallas streaming kernel
(``ops.pallas_banded.banded_spmm_unit``), the cut loss reduces to
``E − ½⟨S, A S⟩`` (one more banded SpMM), and the whole epoch — forward,
STE, loss, backward, Adam — is a single jit with no host transfers except
the scalar loss.  Memory at n=10M, dim=32: embedding+Adam ≈ 3.8 GB,
activations ≈ 2 GB; fits a 16 GB v5e.

For the multi-chip version of the same computation see ``parallel/giant.py``
(ring halo exchange); this module is the per-chip speed-of-light anchor the
scaling numbers are measured against.
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gcn_maxcut_tpu.models.gcn import gcn_conv_init
from gcn_maxcut_tpu.ops.pallas_banded import banded_spmm_unit
from gcn_maxcut_tpu.ops.ste import pin_terminals, ste_argmax_onehot
from gcn_maxcut_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def banded_gcn_conv(params, x, offsets, degree, block=1024):
    """GraphConv (norm='both') on an exactly-regular circulant graph.

    The aggregation order prefers the 128-lane-aligned side so the Pallas
    kernel (not the rolls fallback) does the SpMM; ties break to fewer
    FLOPs like DGL.
    """
    norm = 1.0 / jnp.sqrt(float(degree))
    in_f, out_f = params["w"].shape
    h = x * norm
    in_aligned, out_aligned = in_f % 128 == 0, out_f % 128 == 0
    project_first = (out_f < in_f) if in_aligned == out_aligned else out_aligned
    if project_first:
        h = h @ params["w"]
        h = banded_spmm_unit(h, offsets, block)
    else:
        h = banded_spmm_unit(h, offsets, block)
        h = h @ params["w"]
    return h * norm + params["b"]


def train_banded_giant(
    n: int = 10_002_432,          # 10M rounded to a block multiple
    d: int = 8,
    dim_embedding: int = 32,
    hidden_dim: int = 16,
    num_classes: int = 3,
    learning_rate: float = 1e-3,
    epochs: int = 50,
    epochs_per_call: int = 10,
    bandwidth: int = 63,
    block: int = 1024,
    seed: int = 0,
) -> Dict[str, float]:
    """Train the 2-layer banded GCN on one chip; returns cut + edges/s."""
    if n % block:
        raise ValueError(f"n must be a multiple of {block}")
    rng = np.random.default_rng(seed)
    half = rng.choice(np.arange(1, bandwidth + 1), size=d // 2, replace=False)
    offsets = tuple(int(o) for s in half for o in (s, -s))
    e_undirected = n * d // 2

    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "conv1": gcn_conv_init(k1, dim_embedding, hidden_dim),
        "conv2": gcn_conv_init(k2, hidden_dim, num_classes),
        "embed": jax.random.normal(k3, (n, dim_embedding), jnp.float32) * 0.1,
    }
    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)

    def loss_fn(params):
        h = banded_gcn_conv(params["conv1"], params["embed"], offsets, d, block)
        h = jax.nn.relu(h)
        h = banded_gcn_conv(params["conv2"], h, offsets, d, block)
        probs = jax.nn.softmax(h, axis=-1)
        onehot = ste_argmax_onehot(pin_terminals(probs))
        # cut = E - ½·Σ_i <s_i, (A s)_i>  for unit weights
        same = jnp.vdot(onehot, banded_spmm_unit(onehot, offsets, block))
        return -(e_undirected - 0.5 * same)

    @jax.jit
    def steps(params, opt_state, _):
        def body(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), None, length=epochs_per_call
        )
        return params, opt_state, losses

    # compile (host fetch forces completion — block_until_ready alone does
    # not synchronize on remote/async runtimes)
    t0 = time.perf_counter()
    params, opt_state, losses = steps(params, opt_state, None)
    history = [float(x) for x in np.asarray(losses)]
    compile_time = time.perf_counter() - t0

    t0 = time.perf_counter()
    done = epochs_per_call
    while done < epochs:
        params, opt_state, losses = steps(params, opt_state, None)
        history += [float(x) for x in np.asarray(losses)]  # hard sync
        done += epochs_per_call
    steady = time.perf_counter() - t0
    timed_epochs = max(1, done - epochs_per_call)
    epoch_time = steady / timed_epochs

    final_cut = -history[-1]
    res = {
        "n": n,
        "d": d,
        "edges": e_undirected,
        "epochs": done,
        "compile_time_s": compile_time,
        "epoch_time_s": epoch_time,
        # 2 convs + loss ≈ 3 SpMM fwd + 2 bwd per epoch over E directed edges
        "edges_per_s_per_epoch": n * d / epoch_time,
        "initial_cut": -history[0],
        "final_cut": final_cut,
        "cut_fraction": final_cut / e_undirected,
    }
    logger.info(
        "banded giant n=%d d=%d: epoch %.3fs (%.2e edges/s), cut %.3g/%.3g (%.1f%%)",
        n, d, epoch_time, res["edges_per_s_per_epoch"],
        final_cut, e_undirected, 100 * res["cut_fraction"],
    )
    return res
