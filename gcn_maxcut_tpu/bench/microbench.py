"""Microbenchmarks: SpMM edges/s, training epoch, post-processing throughput.

The performance surface BASELINE.json cares about: SpMM fwd+bwd edges/s per
chip vs roofline, the reference-recipe training epoch (20×n500 graphs,
reference: ~0.354 s/epoch on CPU, ``BASELINE.md`` §4), and the 200-iteration
post-processing pass (reference: ~374× its forward pass, ``BASELINE.md`` §3).
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from gcn_maxcut_tpu.bench.roofline import RooflineModel, chip_specs
from gcn_maxcut_tpu.core.graph import Graph, pad_graph_batch, round_up
from gcn_maxcut_tpu.data.generate import generate_graph, regular_graph_on_device
from gcn_maxcut_tpu.data.process import DataConfig, process_graphs
from gcn_maxcut_tpu.ops.segment import spmm
from gcn_maxcut_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def _timeit(fn, *args, warmup: int = 2, iters: int = 10) -> float:
    """Naive dispatch-loop timing.  UNRELIABLE on remote/async runtimes
    where ``block_until_ready`` acks before completion (the axon tunnel) —
    kept only for local backends; benches use `_scan_timeit`."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


# Canonical implementation lives in utils/timing.py (shared with the eval
# harness and the k-way sweep); the `_scan_timeit` name is kept for docs.
from gcn_maxcut_tpu.utils.timing import (  # noqa: E402
    scan_timeit as _scan_timeit,
    scan_timeit_stats as _scan_timeit_stats,
)


def _device_graph(n: int, d: int, seed: int = 0) -> Graph:
    """Exactly d-regular circulant graph assembled fully on device."""
    senders, receivers = regular_graph_on_device(n, d, jax.random.PRNGKey(seed))
    order = jnp.argsort(receivers, stable=True)
    senders, receivers = senders[order], receivers[order]
    e = senders.shape[0]
    # receivers sorted with uniform degree d: row i owns slots [i*d, (i+1)*d)
    ell_senders = senders.reshape(n, d)
    return Graph(
        senders=senders,
        receivers=receivers,
        weights=jnp.ones((e,), jnp.float32),
        edge_mask=jnp.ones((e,), jnp.float32),
        row_ptr=jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(jnp.full((n,), d, jnp.int32))]
        ),
        degrees=jnp.full((n,), float(d), jnp.float32),
        node_mask=jnp.ones((n,), jnp.float32),
        n_nodes=jnp.asarray(n, jnp.int32),
        n_edges=jnp.asarray(e, jnp.int32),
        ell_senders=ell_senders,
        ell_weights=jnp.ones((n, d), jnp.float32),
        ell_mask=jnp.ones((n, d), jnp.float32),
    )


def _banded_regular_graph(
    n: int, d: int, w: int, n_pad: int | None = None, seed: int = 0
) -> Graph:
    """Exact d-regular random graph with all neighbor offsets within ±w —
    the post-RCM shape of any bandable graph (``data/reorder.py``).

    Built as d/2 distinct circulant shifts relabeled by a random *local*
    permutation (shuffles within blocks of w/4), so per-row neighbor
    structure is arbitrary (the block-ELL kernel sees true gather indices,
    nothing circulant survives) while degrees stay exactly d and the
    bandwidth stays ≤ w.
    """
    rng = np.random.default_rng(seed)
    half = rng.choice(np.arange(1, max(2, w // 2)), size=d // 2, replace=False)
    perm = np.arange(n)
    r = max(8, w // 4)
    for s in range(0, n, r):
        rng.shuffle(perm[s:s + r])
    u = np.tile(perm[np.arange(n)], d // 2)
    v = np.concatenate([perm[(np.arange(n) + o) % n] for o in half])
    from gcn_maxcut_tpu.core.graph import graph_from_edges

    return graph_from_edges(
        np.stack([u, v], axis=1), n, n_pad=n_pad, block_ell=True
    )


def bench_spmm(
    n: int = 100_000,
    d: int = 8,
    feature_dim: int = 128,
    chip: str = "v5e",
    iters: int = 10,
    locality: int = 255,
) -> Dict[str, float]:
    """General-graph SpMM fwd / fwd+bwd edges/s with roofline fractions.

    Two instances, two dispatch paths (``ops/segment.spmm``):
      * ``banded random`` — exact d-regular, arbitrary per-row structure,
        neighbor offsets within ±``locality`` (what RCM reordering produces
        for any graph with locality): rides the block-ELL Pallas kernel
        (``ops/pallas_block_ell.py``).  This is the headline general-SpMM
        number.
      * ``expander`` — random circulant offsets spanning the whole id
        space; no ordering can band an expander, so it rides the ELL
        gather path, which sits near the hardware's scattered-row-gather
        ceiling (a single ``x[idx]`` gather measures ~405 GB/s ≈ 49% of
        stream peak on v5e; the d-gather chain lands at ~34% of the
        roofline below, which charges one row read per edge).
    """
    x = jax.random.normal(jax.random.PRNGKey(1), (n, feature_dim), jnp.float32)
    e = n * d
    model = RooflineModel(chip_specs(chip), feature_dim, n, e)
    scale = 1.0 / d
    res = {
        "n": n,
        "d": d,
        "feature_dim": feature_dim,
        "edges_directed": e,
        "roofline_fwd_edges_per_s": model.edges_per_s(fwd_bwd=False),
        "roofline_fwdbwd_edges_per_s": model.edges_per_s(fwd_bwd=True),
    }

    # --- banded-random instance on the block-ELL kernel (headline) ---
    n_pad = round_up(n, 2048)  # divisor-friendly so the plan gets B≈256
    gb = _banded_regular_graph(n, d, locality, n_pad=n_pad)
    assert gb.bell_block is not None, "banded instance must plan"
    xb = jnp.concatenate(
        [x, jnp.zeros((n_pad - n, feature_dim), jnp.float32)]
    )
    st_fwd = _scan_timeit_stats(lambda x_: spmm(gb, x_) * scale, xb)
    grad_b = jax.grad(lambda x_: jnp.sum(spmm(gb, x_) ** 2))
    st_fwdbwd = _scan_timeit_stats(
        lambda x_: grad_b(x_) * (scale * scale * 0.5), xb
    )
    t_fwd, t_fwdbwd = st_fwd["best_s"], st_fwdbwd["best_s"]
    res.update(
        fwd_time_s=t_fwd,
        fwd_edges_per_s=e / t_fwd,
        fwd_stats=st_fwd,
        fwdbwd_time_s=t_fwdbwd,
        fwdbwd_edges_per_s=e / t_fwdbwd,
        fwdbwd_stats=st_fwdbwd,
        fraction_of_roofline_fwd=model.fraction_of_roofline(
            e / t_fwd, fwd_bwd=False
        ),
        fraction_of_roofline_fwdbwd=model.fraction_of_roofline(
            e / t_fwdbwd, fwd_bwd=True
        ),
        bell_block=gb.bell_block,
        bell_wp=gb.bell_wp,
    )

    # --- expander instance on the ELL gather path ---
    ge = _device_graph(n, d)
    st_fwd_e = _scan_timeit_stats(lambda x_: spmm(ge, x_) * scale, x)
    grad_e = jax.grad(lambda x_: jnp.sum(spmm(ge, x_) ** 2))
    st_fb_e = _scan_timeit_stats(
        lambda x_: grad_e(x_) * (scale * scale * 0.5), x
    )
    t_fwd_e, t_fb_e = st_fwd_e["best_s"], st_fb_e["best_s"]
    # bf16 feature rows (byte-bound gather lever): op must map bf16->bf16
    # to chain, so the f32 accumulate is truncated once per iteration —
    # the gather traffic being measured is unchanged
    x16 = x.astype(jnp.bfloat16)
    st_fwd_e16 = _scan_timeit_stats(
        lambda x_: (spmm(ge, x_) * scale).astype(jnp.bfloat16), x16
    )
    res.update(
        expander_fwd_edges_per_s=e / t_fwd_e,
        expander_fwdbwd_edges_per_s=e / t_fb_e,
        expander_fwd_stats=st_fwd_e,
        expander_fwdbwd_stats=st_fb_e,
        expander_bf16_fwd_edges_per_s=e / st_fwd_e16["best_s"],
        expander_bf16_fwd_stats=st_fwd_e16,
        expander_fraction_of_roofline_fwd=model.fraction_of_roofline(
            e / t_fwd_e, fwd_bwd=False
        ),
        expander_fraction_of_roofline_fwdbwd=model.fraction_of_roofline(
            e / t_fb_e, fwd_bwd=True
        ),
    )
    logger.info(
        "spmm n=%d d=%d F=%d: banded-random/block-ELL fwd %.2e edges/s "
        "(%.0f%% SoL), fwd+bwd %.2e (%.0f%%); expander/gather fwd %.2e "
        "(%.0f%%), fwd+bwd %.2e (%.0f%%), bf16 fwd %.2e (%.0f%% of f32 SoL)",
        n, d, feature_dim,
        res["fwd_edges_per_s"], 100 * res["fraction_of_roofline_fwd"],
        res["fwdbwd_edges_per_s"], 100 * res["fraction_of_roofline_fwdbwd"],
        res["expander_fwd_edges_per_s"],
        100 * res["expander_fraction_of_roofline_fwd"],
        res["expander_fwdbwd_edges_per_s"],
        100 * res["expander_fraction_of_roofline_fwdbwd"],
        res["expander_bf16_fwd_edges_per_s"],
        100 * model.fraction_of_roofline(
            res["expander_bf16_fwd_edges_per_s"], fwd_bwd=False
        ),
    )
    return res


def bench_spmm_banded(
    n: int = 131_072,
    d: int = 8,
    feature_dim: int = 128,
    bandwidth: int = 63,
    chip: str = "v5e",
    iters: int = 30,
) -> Dict[str, float]:
    """Banded Pallas SpMM edges/s (locality-reordered / circulant graphs).

    The structured fast path: graphs whose neighbor offsets are bounded
    (circulant benchmark graphs, or any graph reordered by BFS/RCM into a
    band) stream x through VMEM once — see ``ops/pallas_banded.py``.
    """
    from gcn_maxcut_tpu.ops.pallas_banded import banded_spmm, banded_spmm_unit

    if d % 2:
        raise ValueError("banded bench requires even d")
    rng = np.random.default_rng(0)
    half = rng.choice(np.arange(1, bandwidth + 1), size=d // 2, replace=False)
    offsets = tuple(int(o) for pair in ((s, -s) for s in half) for o in pair)
    x = jax.random.normal(jax.random.PRNGKey(1), (n, feature_dim), jnp.float32)
    w = jnp.ones((n, d), jnp.float32)

    scale = 1.0 / d
    # these kernels run in 0.1-0.3 ms, so the default 50-iteration chain
    # is RTT-dominated on the tunnel and the k-differencing occasionally
    # degenerates (n_valid < outer) — longer chains keep the signal well
    # above the noise floor
    ks = dict(k_hi=150, k_lo=30)
    # unit-weight kernel: what the giant trainers actually run (headline)
    st_fwd = _scan_timeit_stats(
        lambda x_: banded_spmm_unit(x_, offsets) * scale, x, **ks
    )
    grad_fn = jax.grad(lambda x_: jnp.sum(banded_spmm_unit(x_, offsets) ** 2))
    st_fwdbwd = _scan_timeit_stats(
        lambda x_: grad_fn(x_) * (scale * scale * 0.5), x, **ks
    )
    # weighted kernel (per-row [n, d] weight table)
    st_fwd_w = _scan_timeit_stats(
        lambda x_: banded_spmm(x_, w, offsets) * scale, x, **ks
    )
    t_fwd, t_fwdbwd = st_fwd["best_s"], st_fwdbwd["best_s"]
    t_fwd_w = st_fwd_w["best_s"]

    e = n * d
    model = RooflineModel(chip_specs(chip), feature_dim, n, e)
    res = {
        "n": n,
        "d": d,
        "feature_dim": feature_dim,
        "bandwidth": bandwidth,
        "fwd_time_s": t_fwd,
        "fwd_edges_per_s": e / t_fwd,
        "fwd_stats": st_fwd,
        "fwdbwd_time_s": t_fwdbwd,
        "fwdbwd_edges_per_s": e / t_fwdbwd,
        "fwdbwd_stats": st_fwdbwd,
        "weighted_fwd_time_s": t_fwd_w,
        "weighted_fwd_edges_per_s": e / t_fwd_w,
        "weighted_fwd_stats": st_fwd_w,
        # banded roofline: read x + write y once => bytes = 2 n F 4 / E edges
        "banded_roofline_edges_per_s": model.chip.hbm_gbps
        * 1e9
        / (2 * 4.0 * feature_dim / d),
        # weighted adds the [n, d] weight-table read
        "weighted_roofline_edges_per_s": model.chip.hbm_gbps
        * 1e9
        / ((2 * 4.0 * feature_dim + 4.0 * d) / d),
    }
    res["fraction_of_banded_roofline"] = (
        res["fwd_edges_per_s"] / res["banded_roofline_edges_per_s"]
    )
    res["weighted_fraction_of_banded_roofline"] = (
        res["weighted_fwd_edges_per_s"] / res["weighted_roofline_edges_per_s"]
    )

    # HBM-resident regime: at n=131k the working set (~134 MB in+out)
    # straddles VMEM, and chained iterations run partially VMEM-resident —
    # apparent bandwidth can exceed HBM peak (2 TB/s measured).  A 1.25M-row
    # instance (1.3 GB traffic) measures the kernel's true HBM-resident
    # rate, which on this environment caps at ~330-350 GB/s for ANY
    # pallas_call (probed exhaustively: DMA splitting, manual vs auto
    # pipelining, input_output_aliases, block 64-7104, width 128-2048,
    # dimension_semantics — all flat) while XLA fusions stream ~660 GB/s.
    n_big = 1_250_304
    xb = jax.random.normal(jax.random.PRNGKey(2), (n_big, feature_dim),
                           jnp.float32)
    st_big = _scan_timeit_stats(
        lambda x_: banded_spmm_unit(x_, offsets) * scale, xb,
        k_hi=20, k_lo=4,
    )
    e_big = n_big * d
    # weighted kernel in the same guaranteed-HBM-resident regime: round 5
    # found the n=131k weighted reading can exceed its physical roofline
    # when chained iterations go partially VMEM-resident (8.7e9 measured
    # once vs the 6.3e9 roofline — docs/weighted_stability_r5.json), so
    # the large-n row is the regime-unambiguous number
    wb = jax.random.uniform(jax.random.PRNGKey(3), (n_big, d),
                            jnp.float32) + 0.5
    st_big_w = _scan_timeit_stats(
        lambda x_: banded_spmm(x_, wb, offsets) * scale, xb,
        k_hi=20, k_lo=4,
    )
    res.update(
        hbm_regime_n=n_big,
        hbm_regime_fwd_edges_per_s=e_big / st_big["best_s"],
        hbm_regime_fwd_stats=st_big,
        hbm_regime_gbps=2 * n_big * feature_dim * 4 / st_big["best_s"] / 1e9,
        hbm_regime_weighted_fwd_edges_per_s=e_big / st_big_w["best_s"],
        hbm_regime_weighted_fwd_stats=st_big_w,
    )
    logger.info(
        "banded spmm n=%d d=%d W=%d: unit fwd %.2e edges/s (%.0f%% of stream "
        "SoL), unit fwd+bwd %.2e, weighted fwd %.2e (%.0f%%); HBM-resident "
        "regime n=%d: %.2e edges/s (%.0f GB/s)",
        n, d, bandwidth, res["fwd_edges_per_s"],
        100 * res["fraction_of_banded_roofline"], res["fwdbwd_edges_per_s"],
        res["weighted_fwd_edges_per_s"],
        100 * res["weighted_fraction_of_banded_roofline"],
        res["hbm_regime_n"], res["hbm_regime_fwd_edges_per_s"],
        res["hbm_regime_gbps"],
    )
    return res


def bench_train_epoch(
    num_graphs: int = 20,
    n: int = 500,
    d_range=(6, 8),
    max_nodes: int = 1000,
    epochs_timed: int = 10,
    seed: int = 1000,
) -> Dict[str, float]:
    """The reference recipe's epoch (20 graphs n=500 d∈[6,8], 1000-wide
    features, per-graph Adam steps) timed end-to-end on device.

    Reference baseline: 171.81 s / 486 epochs ≈ 0.354 s/epoch on CPU
    (``BASELINE.md`` §4).
    """
    from gcn_maxcut_tpu.train.config import TrainingConfig
    from gcn_maxcut_tpu.train.loop import make_epoch_fn, setup_train_state

    rng = np.random.default_rng(seed)
    specs = []
    while len(specs) < num_graphs:
        deg = int(rng.integers(d_range[0], d_range[1] + 1))
        if (n * deg) % 2:
            continue
        specs.append(
            generate_graph(n=n, d=deg, graph_type="reg", seed=seed + len(specs))
        )
    ds = process_graphs(specs, DataConfig(max_nodes=max_nodes))
    batch = pad_graph_batch([ds.graphs[k] for k in sorted(ds.graphs)])

    cfg = TrainingConfig(n_nodes=max_nodes)
    state = setup_train_state(cfg)
    epoch_fn = make_epoch_fn(cfg, state.optimizer)

    params, opt_state = state.params, state.opt_state
    key = jax.random.PRNGKey(0)

    # amortized timing with ONE compile: the epoch count is a *dynamic*
    # scalar driving a fori_loop (lowers to while_loop), so the k_hi and
    # k_lo runs share a single executable — round 2 compiled the scan
    # twice (num_epochs static) and paid 514 s cold (BENCH_r02); the
    # differencing still cancels dispatch/RTT exactly.
    @jax.jit
    def run_k(params, opt_state, rng, k):
        xs, n_graphs = epoch_fn.epoch_inputs(batch)

        def body(i, carry):
            params, opt_state, _ = carry
            params, opt_state, loss = epoch_fn.run_epoch(
                params, opt_state, xs, n_graphs, jax.random.fold_in(rng, i)
            )
            return (params, opt_state, loss)

        params, opt_state, loss = jax.lax.fori_loop(
            0, k, body, (params, opt_state, jnp.float32(0))
        )
        return params, opt_state, loss

    k_hi, k_lo = max(20, 2 * epochs_timed), 5
    t0 = time.perf_counter()
    _, _, loss = run_k(params, opt_state, key, k_lo)
    float(loss)
    compile_time = time.perf_counter() - t0

    # outer best-of-3 of the full differenced estimate (PARITY §3: tunnel
    # variance makes single-shot readings incomparable across rounds)
    estimates = []
    for _ in range(3):
        best = {}
        for k in (k_hi, k_lo):
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                _, _, loss = run_k(params, opt_state, key, k)
                float(loss)
                ts.append(time.perf_counter() - t0)
            best[k] = min(ts)
        d_t = best[k_hi] - best[k_lo]
        if d_t > 0:
            estimates.append(d_t / (k_hi - k_lo))
    epoch_time = min(estimates) if estimates else float("nan")
    # advance params for a meaningful final loss
    params, opt_state, loss = run_k(params, opt_state, key, k_hi)
    losses = [loss]

    ref_epoch_time = 171.81 / 486.0
    res = {
        "num_graphs": num_graphs,
        "n": n,
        "epoch_time_s": epoch_time,
        "epoch_time_stats": {
            "best_s": epoch_time,
            "mean_s": (
                sum(estimates) / len(estimates)
                if estimates else float("nan")
            ),
            "spread_s": (
                max(estimates) - min(estimates)
                if estimates else float("nan")
            ),
            "n": 3,
            "n_valid": len(estimates),
        },
        "compile_time_s": compile_time,
        "final_epoch_loss": float(losses[-1]),
        "reference_epoch_time_s": ref_epoch_time,
        "speedup_vs_reference": ref_epoch_time / epoch_time,
    }
    logger.info(
        "train epoch (%dx n=%d): %.4f s/epoch (ref CPU %.4f, %.1fx), compile %.1fs",
        num_graphs, n, epoch_time, ref_epoch_time,
        res["speedup_vs_reference"], compile_time,
    )
    return res


def bench_post_processing(
    n: int = 500, d: int = 8, iterations: int = 200, iters: int = 10
) -> Dict[str, float]:
    """Post-processing sampling throughput (reference overhead: ~374×)."""
    from gcn_maxcut_tpu.eval.decode import post_process

    spec = generate_graph(n=n, d=d, graph_type="reg", seed=0)
    ds = process_graphs([spec], DataConfig(max_nodes=n))
    g = ds.graphs[0]
    probs = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(0), (g.n_pad, 3)), axis=-1
    )

    from functools import partial

    @partial(jax.jit, static_argnames=("k",))
    def chain(key, k):
        def body(carry, _):
            key, acc = carry
            key, sub = jax.random.split(key)
            _, cut = post_process(g, probs, sub, iterations=iterations)
            return (key, acc + cut), None

        (key, acc), _ = jax.lax.scan(body, (key, 0.0), None, length=k)
        return acc

    k_hi, k_lo = 400, 50
    float(chain(jax.random.PRNGKey(1), k_hi))
    float(chain(jax.random.PRNGKey(1), k_lo))
    best = {}
    for k in (k_hi, k_lo):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(jax.random.PRNGKey(1), k))
            ts.append(time.perf_counter() - t0)
        best[k] = min(ts)
    t = max(1e-6, (best[k_hi] - best[k_lo]) / (k_hi - k_lo))
    res = {
        "n": n,
        "iterations": iterations,
        "time_s": t,
        "samples_per_s": iterations / t,
    }
    logger.info(
        "post-processing n=%d, %d iters: %.4f s (%.0f samples/s)",
        n, iterations, t, res["samples_per_s"],
    )
    return res
