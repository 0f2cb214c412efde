"""Multi-chip giant banded-graph training with the Pallas halo kernel.

BASELINE config[4] as one program: a circulant/banded regular graph
node-sharded contiguously across the mesh, every SpMM (two GCN convs, the
cut loss's A·S product, and all their backward passes via the symmetric
custom VJP) running the Pallas halo-exchange kernel
(``ops/pallas_halo.py``) — boundary rows travel by inter-chip RDMA
overlapped with the interior sweep; the only XLA collectives left are the
scalar ``psum`` of the loss and the ``pmean`` of conv gradients.

Validated end-to-end (training improves the global cut; gradients match
the single-device banded trainer) under interpret mode on the virtual CPU
mesh; the identical program targets ICI on a real slice.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gcn_maxcut_tpu.models.gcn import gcn_conv_init
from gcn_maxcut_tpu.ops.pallas_halo import halo_banded_spmm_unit
from gcn_maxcut_tpu.parallel.mesh import make_mesh
from gcn_maxcut_tpu.utils.logging import get_logger

logger = get_logger(__name__)


@dataclasses.dataclass(frozen=True)
class HaloGiantConfig:
    d: int = 8
    num_classes: int = 3
    dim_embedding: int = 128
    hidden_dim: int = 128
    learning_rate: float = 1e-3
    epochs: int = 40
    epochs_per_call: int = 10
    bandwidth: int = 63
    block: int = 1024
    seed: int = 0
    axis: str = "graph"


def _halo_conv(params, x, offsets, degree, axis, block):
    """GraphConv (norm='both') with the halo kernel doing the aggregation."""
    norm = 1.0 / jnp.sqrt(float(degree))
    in_f, out_f = params["w"].shape
    h = x * norm
    in_al, out_al = in_f % 128 == 0, out_f % 128 == 0
    project_first = (out_f < in_f) if in_al == out_al else out_al
    if project_first:
        h = h @ params["w"]
        h = halo_banded_spmm_unit(h, offsets, axis, block)
    else:
        h = halo_banded_spmm_unit(h, offsets, axis, block)
        h = h @ params["w"]
    return h * norm + params["b"]


def make_halo_giant_step(
    mesh: Mesh, offsets: tuple[int, ...], config: HaloGiantConfig,
    optimizer: optax.GradientTransformation, n_shard: int,
):
    axis = config.axis
    k = config.num_classes

    def local_step(conv_params, embed, opt_state):
        x = embed[0]                                     # [n_shard, F]

        def loss_fn(conv_params, embed_rows):
            h = _halo_conv(
                conv_params["conv1"], embed_rows, offsets, config.d, axis,
                config.block,
            )
            h = jax.nn.relu(h)
            h = _halo_conv(
                conv_params["conv2"], h, offsets, config.d, axis, config.block
            )
            probs = jax.nn.softmax(h, axis=-1)
            # terminal pinning on shard 0 rows 0..k-1 + STE argmax
            my = jax.lax.axis_index(axis)
            rows = jnp.arange(probs.shape[0])[:, None]
            cols = jnp.arange(k)[None, :]
            onehot_rows = (rows == cols).astype(probs.dtype)
            is_term = ((rows < k) & (my == 0)).astype(probs.dtype)
            pinned = is_term * onehot_rows + (1.0 - is_term) * probs
            pinned = jax.lax.stop_gradient(pinned - probs) + probs
            hard = jax.nn.one_hot(jnp.argmax(pinned, -1), k, dtype=probs.dtype)
            s = jax.lax.stop_gradient(hard - pinned) + pinned
            # cut = E_total − ½·Σ ⟨s, A s⟩ ; A s via the halo kernel too
            same = jnp.vdot(s, halo_banded_spmm_unit(s, offsets, axis, config.block))
            same = jax.lax.psum(same, axis)
            n_total = n_shard * jax.lax.psum(1, axis)
            e_total = n_total * config.d / 2.0
            return -(e_total - 0.5 * same)

        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            conv_params, x
        )
        conv_grads = jax.lax.pmean(grads[0], axis)
        updates, opt_state = optimizer.update(
            (conv_grads, grads[1][None]), opt_state, (conv_params, embed)
        )
        conv_params, embed = optax.apply_updates((conv_params, embed), updates)
        return conv_params, embed, opt_state, loss

    def chunk(conv_params, embed, opt_state):
        def body(carry, _):
            conv_params, embed, opt_state = carry
            conv_params, embed, opt_state, loss = local_step(
                conv_params, embed, opt_state
            )
            return (conv_params, embed, opt_state), loss

        (conv_params, embed, opt_state), losses = jax.lax.scan(
            body, (conv_params, embed, opt_state), None,
            length=config.epochs_per_call,
        )
        return conv_params, embed, opt_state, losses

    def opt_state_specs(opt_state):
        # adam moments for the embedding are [D, n_shard, F] (sharded);
        # everything else (conv moments, counts) is replicated
        return jax.tree_util.tree_map(
            lambda a: P(config.axis) if getattr(a, "ndim", 0) == 3 else P(),
            opt_state,
        )

    def build(opt_state):
        return jax.jit(
            jax.shard_map(
                chunk,
                mesh=mesh,
                in_specs=(P(), P(config.axis), opt_state_specs(opt_state)),
                out_specs=(
                    P(), P(config.axis), opt_state_specs(opt_state), P(),
                ),
                check_vma=False,
            )
        )

    return build


def train_halo_giant(
    n_shard: int,
    config: HaloGiantConfig = HaloGiantConfig(),
    mesh: Mesh | None = None,
) -> Dict[str, Any]:
    """Train on an (n_shard × D_devices)-node banded regular graph."""
    mesh = mesh or make_mesh((config.axis,))
    n_dev = int(np.prod(mesh.devices.shape))
    n = n_shard * n_dev
    rng = np.random.default_rng(config.seed)
    half = rng.choice(
        np.arange(1, config.bandwidth + 1), size=config.d // 2, replace=False
    )
    offsets = tuple(int(o) for s in half for o in (s, -s))

    key = jax.random.PRNGKey(config.seed)
    k1, k2, k3 = jax.random.split(key, 3)
    conv_params = {
        "conv1": gcn_conv_init(k1, config.dim_embedding, config.hidden_dim),
        "conv2": gcn_conv_init(k2, config.hidden_dim, config.num_classes),
    }
    embed = jax.random.normal(
        k3, (n_dev, n_shard, config.dim_embedding), jnp.float32
    ) * 0.1
    embed = jax.device_put(embed, NamedSharding(mesh, P(config.axis)))
    optimizer = optax.adam(config.learning_rate)
    opt_state = optimizer.init((conv_params, embed))

    step = make_halo_giant_step(mesh, offsets, config, optimizer, n_shard)(
        opt_state
    )

    t0 = time.perf_counter()
    history = []
    done = 0
    while done < config.epochs:
        conv_params, embed, opt_state, losses = step(
            conv_params, embed, opt_state
        )
        history += [float(x) for x in np.asarray(losses)]
        done += config.epochs_per_call
    total = time.perf_counter() - t0

    e_total = n * config.d // 2
    res = {
        "n": n,
        "num_devices": n_dev,
        "edges": e_total,
        "epochs": done,
        "initial_cut": -history[0],
        "final_cut": -history[-1],
        "cut_fraction": -history[-1] / e_total,
        "total_time_s": total,
    }
    logger.info(
        "halo giant n=%d over %d devices: cut %.3g/%.3g (%.1f%%) in %.1fs",
        n, n_dev, res["final_cut"], e_total, 100 * res["cut_fraction"], total,
    )
    return res
