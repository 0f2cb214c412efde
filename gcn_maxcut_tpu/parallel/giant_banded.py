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


# ---- packed interleaved-order multi-chip trainer --------------------------
#
# The plain trainer above aggregates the class-dim STE output (k=3 lanes)
# through ``halo_banded_spmm_unit``'s zero-pad branch (3 -> 128 lanes, ~42x
# DMA traffic on real hardware).  This variant is the multi-chip analog of
# ``bench.giant_demo.train_banded_giant_packed``: every array lives in the
# interleaved node order of ``ops.pallas_banded.banded_spmm_unit_packed``
# and CARRIES THE WIDE [m_loc, r·F] SHAPE through the whole epoch, so all
# three aggregations (two convs + the cut loss's A·S) ride the
# full-bandwidth packed HALO kernel (``ops.pallas_halo.
# halo_banded_spmm_unit_packed``) — boundary rows travel by inter-chip RDMA
# overlapped with the interior sweep, and the F%128 pad branch is never
# taken.  GEMMs run as kron(I_r, W) (redundant FLOPs on an idle MXU);
# group softmax/argmax/pinning are reduce_window + mask ops exactly as in
# the single-chip demo.
#
# Gradient formulation: the loss the grads flow through is the PER-SHARD
# slice -(E_loc - ½⟨s_loc, (A s)_loc⟩); summing it over shards is the
# global objective, and the packed halo kernel's symmetric custom VJP
# imports neighbor cotangents in the backward, so each shard's autodiff
# gradient is exactly its slice of the global gradient — no psum inside
# the differentiated region (under check_vma=False the transpose of psum
# is psum again, which would scale cotangents by the device count).
# Conv-weight gradients are therefore combined with psum (sum of true
# per-shard contributions), and the scalar loss is psum'd only for
# reporting.


def _group_max(h, g=16):
    return jax.lax.reduce_window(
        h, -jnp.inf, jax.lax.max, (1, g), (1, g), "VALID"
    )


def _bcast(g16, g=16):
    return jnp.repeat(g16, g, axis=1)


@dataclasses.dataclass(frozen=True)
class PackedHaloGiantConfig:
    d: int = 8
    num_classes: int = 3
    dim_embedding: int = 32
    learning_rate: float = 1e-3
    epochs: int = 40
    epochs_per_call: int = 10
    bandwidth: int = 63
    r: int = 8                      # interleave factor; r*16 % 128 == 0
    block: int | None = None        # packed-row block (None = auto)
    seed: int = 0
    axis: str = "graph"
    agg_dtype: str | None = "bfloat16"  # bf16 aggregation streams (f32
                                    # in-kernel accumulation): the pallas
                                    # stream ceiling is byte-based, so
                                    # halving the window bytes halves the
                                    # per-layer aggregation time at
                                    # HBM-resident shard sizes; measured
                                    # quality-neutral on the single-chip
                                    # twin (93.55% vs 93.56% at 10M).
                                    # None = full-f32 streams.
    mu_dtype: str | None = "bfloat16"  # Adam first moment dtype — round-5
                                    # default, measured quality-neutral
                                    # and −2.2 ms/epoch on the single-chip
                                    # twin (PARITY §4); None = f32.
    act_dtype: str | None = None    # opt-in bf16 activation pipeline —
                                    # mirrors the single-chip twin's
                                    # measured tradeoff (46.7 vs 62.1
                                    # ms/epoch at 10M, ~1.3x the epochs
                                    # to equal quality); None = f32.


def make_packed_halo_step(
    mesh: Mesh, offsets: tuple[int, ...], config: PackedHaloGiantConfig,
    optimizer: optax.GradientTransformation, m_shard: int,
):
    """Builds the jitted shard_map chunk step for the packed halo trainer.

    ``m_shard``: packed rows per device (n_shard = m_shard * r nodes).
    """
    from gcn_maxcut_tpu.ops.pallas_halo import halo_banded_spmm_unit_packed

    axis = config.axis
    G = 16                          # lane-group width (classes padded to 16)
    k = config.num_classes
    r = config.r
    if k > G or k > r:
        raise ValueError(f"need num_classes <= {min(G, r)}")
    if config.dim_embedding % G:
        raise ValueError("dim_embedding must be a multiple of 16")
    inv_d = 1.0 / config.d

    act = jnp.dtype(
        config.act_dtype if config.act_dtype is not None else jnp.float32
    )
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, r * G), 1)
    class_ok = (lane % G < k).astype(act)                        # [1, r*16]
    grp = lane // G
    term_cols = (grp < k).astype(act)
    term_onehot = ((lane % G) == grp).astype(act) * term_cols
    eye_r = jnp.eye(r, dtype=jnp.float32)
    sum_bcast = jnp.kron(eye_r, jnp.ones((G, G), jnp.float32)).astype(act)

    def group_max(h):
        # bf16 activations use the reshape formulation (reduce_window's
        # init_value is a static f32 scalar; reduce_max follows dtype)
        if act != jnp.float32:
            return h.reshape(m_shard, r, G).max(axis=-1).reshape(m_shard, r)
        return _group_max(h)

    def local_step(conv_params, embed, opt_state):
        wide = embed[0]                                 # [m_shard, r*emb]
        n_loc = m_shard * r
        e_local = n_loc * config.d / 2.0

        def spmm(h):
            L = h.shape[1]
            hh = h.reshape(n_loc, L // r)
            if config.agg_dtype is not None and act == jnp.float32:
                hh = hh.astype(config.agg_dtype)
            out = halo_banded_spmm_unit_packed(
                hh, offsets, r, axis, config.block
            )
            return out.astype(act).reshape(m_shard, L)

        def loss_fn(conv_params, wide_rows):
            k1w = jnp.kron(eye_r, conv_params["conv1"]["w"]).astype(act)
            k2w = jnp.kron(eye_r, conv_params["conv2"]["w"]).astype(act)
            b1 = jnp.tile(conv_params["conv1"]["b"], r).astype(act)
            b2 = jnp.tile(conv_params["conv2"]["b"], r).astype(act)
            h = wide_rows.astype(act) @ k1w
            h = spmm(h) * act.type(inv_d) + b1
            h = jax.nn.relu(h)
            h = h @ k2w
            h = spmm(h) * act.type(inv_d) + b2
            # masked group softmax (windowed max is shift-invariant ->
            # stop_gradient; no select-and-scatter lowering on TPU)
            gmax = jax.lax.stop_gradient(
                _bcast(group_max(h + (class_ok - 1.0) * 1e9))
            )
            e = jnp.exp(h - gmax) * class_ok
            probs = e / (e @ sum_bcast)
            # terminals: global packed row 0 (shard 0), lane groups 0..k-1
            my = jax.lax.axis_index(axis)
            row0 = (
                (jnp.arange(m_shard)[:, None] == 0) & (my == 0)
            ).astype(act)
            is_term = row0 * term_cols
            pinned_hard = is_term * term_onehot + (1.0 - is_term) * probs
            pinned = jax.lax.stop_gradient(pinned_hard - probs) + probs
            hard = jax.lax.stop_gradient(
                (pinned >= _bcast(group_max(pinned))).astype(act)
                * class_ok
            )
            onehot = jax.lax.stop_gradient(hard - pinned) + pinned
            # f32 reduction (cut ~ n*d/2, beyond bf16 resolution)
            same = jnp.vdot(
                onehot.astype(jnp.float32), spmm(onehot).astype(jnp.float32)
            )
            return -(e_local - 0.5 * same)

        loss_loc, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            conv_params, wide
        )
        conv_grads = jax.lax.psum(grads[0], axis)       # true global sum
        updates, opt_state = optimizer.update(
            (conv_grads, grads[1][None]), opt_state, (conv_params, embed)
        )
        conv_params, embed = optax.apply_updates((conv_params, embed), updates)
        return conv_params, embed, opt_state, jax.lax.psum(loss_loc, axis)

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


def train_halo_giant_packed(
    n_shard: int,
    config: PackedHaloGiantConfig = PackedHaloGiantConfig(),
    mesh: Mesh | None = None,
) -> Dict[str, Any]:
    """Multi-chip giant banded training with EVERY aggregation on the
    packed full-bandwidth halo kernel (no F%128 zero-padding anywhere).

    ``n_shard`` nodes per device; requires ``n_shard % r == 0``.  Uses the
    same parameter shapes, init keys and objective as the single-chip
    ``bench.giant_demo.train_banded_giant_packed`` (hidden = 16 lanes,
    classes padded 3 -> 16), so loss histories are directly comparable.
    """
    mesh = mesh or make_mesh((config.axis,))
    n_dev = int(np.prod(mesh.devices.shape))
    if n_shard % config.r:
        raise ValueError(f"n_shard={n_shard} must be a multiple of r={config.r}")
    n = n_shard * n_dev
    m_shard = n_shard // config.r
    G = 16
    rng = np.random.default_rng(config.seed)
    half = rng.choice(
        np.arange(1, config.bandwidth + 1), size=config.d // 2, replace=False
    )
    offsets = tuple(int(o) for s in half for o in (s, -s))

    key = jax.random.PRNGKey(config.seed)
    k1, k2, k3 = jax.random.split(key, 3)
    conv_params = {
        "conv1": gcn_conv_init(k1, config.dim_embedding, G),
        "conv2": gcn_conv_init(k2, G, G),
    }
    # same global init as the single-chip packed demo, then row-sharded
    embed = jax.random.normal(
        k3, (n // config.r, config.r * config.dim_embedding), jnp.float32
    ) * 0.1
    embed = embed.reshape(n_dev, m_shard, config.r * config.dim_embedding)
    embed = jax.device_put(embed, NamedSharding(mesh, P(config.axis)))
    optimizer = optax.adam(
        config.learning_rate,
        mu_dtype=None if config.mu_dtype is None
        else jnp.dtype(config.mu_dtype),
    )
    opt_state = optimizer.init((conv_params, embed))

    step = make_packed_halo_step(mesh, offsets, config, optimizer, m_shard)(
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
        "layout": "packed",
    }
    logger.info(
        "packed halo giant n=%d over %d devices: cut %.3g/%.3g (%.1f%%) in %.1fs",
        n, n_dev, res["final_cut"], e_total, 100 * res["cut_fraction"], total,
    )
    return res


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
