"""Decompose the 10M-node packed giant epoch (PARITY §4: 64.2 ms) into its
traffic components by ablation, on the real TPU.

VERDICT r4 #1 says "the 10M trainer's epochs run at the pallas stream
ceiling, so ~2x is plausibly on the table".  Before attacking the banded
kernel with XLA formulations, establish what the epoch actually spends:
the six bf16 aggregation streams account for only ~6 x 640 MB / 330 GB/s
~= 12 ms of the 64; the Adam update on the [1.25M, 256] f32 embedding is
~9 GB of HBM traffic ~= 13 ms by itself at XLA's ~660 GB/s.

Method: the giant trainer's own chunked-epochs timing (many epochs per
jit, host fetch per chunk — the measurement PARITY §4 calls stable), on
variants that ablate one component each:

  base       default trainer config (bf16 aggregation streams)
  f32agg     full-f32 aggregation streams (the pre-round-4 default)
  no_spmm    aggregations replaced by identity (keeps scale/bias/relu)
  sgd        optax.sgd instead of adam (ablates the moment traffic)
  mubf16     optax.adam(mu_dtype=bfloat16) (halves the mu read+write)
  fwd_only   loss forward only per epoch (no grad, no update)

Round-5 measured shares at n=10M (base 64.3 ms): the six bf16
aggregation streams are only ~7.3 ms; forward non-spmm elementwise is
~30 ms, backward ~21 ms, Adam-extra ~8.6 ms.  Optimization variants
attacking those (the epoch is elementwise-traffic-bound, not
aggregation-bound):

  bf16act        all activations in bf16 (halves every elementwise pass)
  remat          jax.checkpoint the softmax/STE head (no residual
                 materialization -> whole-head fusion; recompute is cheap
                 in a memory-bound epoch)
  bf16act_remat  both
  candidate      bf16act + remat + mu_dtype=bfloat16

Forward decomposition (all run the fwd_only harness).  Measured at 10M
(fwd_only total 34.3 ms): fwd_nohead 14.1 (convs+aggregations),
fwd_nospmm 27.0, fwd_f32agg 38.6.  So the softmax/STE head is ~20 ms of
the forward — and since fwd_only saves NO residuals, that cost is pure
pass count: the `e @ sum_bcast` matmul and the two reduce_window maxes
are fusion boundaries forcing ~6-8 extra 640 MB round-trips.  Remaining
f32-safe wins are ~5 ms scale against ~3% tunnel noise — and the one
candidate was MEASURED AND REJECTED: "fusedhead" (reshape-based group
sum replacing the kron-ones matmul for the softmax denominator,
algebraically identical) runs **80.2 ms vs 64.3** — the trailing-axis
reduce + repeat costs far more in layout than the matmul boundary costs
in traffic, vindicating the original MXU formulation.  The quality-safe
floor for this epoch on this platform is ~60 ms; the bf16-activation
knob (46.7 ms) is the lever past it.

  fwd_nospmm     forward with aggregations replaced by identity
  fwd_nohead     forward stopping after conv2 (loss = sum(h) -- no
                 softmax/STE/loss aggregation)
  fwd_f32agg     forward with full-f32 aggregation streams

Run:  python experiments/epoch_anatomy.py [n] [epochs_per_call] [chunks]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

RESULTS = "/tmp/epoch_anatomy_results.jsonl"

# tunnel hang recovery (see weighted_probe.py): retried child process,
# per-variant checkpointing so a retry resumes where the hang struck
if os.environ.get("PROBE_CHILD") != "1" and __name__ == "__main__":
    for attempt in range(6):
        try:
            rc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
                env=dict(os.environ, PROBE_CHILD="1"),
                timeout=900,
            ).returncode
        except subprocess.TimeoutExpired:
            print(f"[probe] attempt {attempt} timed out; retrying", flush=True)
            continue
        if rc == 0:
            sys.exit(0)
        print(f"[probe] attempt {attempt} rc={rc}; retrying", flush=True)
    sys.exit(1)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gcn_maxcut_tpu.models.gcn import gcn_conv_init
from gcn_maxcut_tpu.ops.pallas_banded import banded_spmm_unit_packed


def build_step(
    n: int,
    variant: str,
    d: int = 8,
    dim_embedding: int = 32,
    bandwidth: int = 63,
    r: int = 8,
    seed: int = 0,
    epochs_per_call: int = 10,
    learning_rate: float = 1e-3,
):
    """Mirror of bench.giant_demo.train_banded_giant_packed's step with
    one component ablated per ``variant`` (see module docstring)."""
    G = 16
    num_classes = 3
    m = n // r
    rng = np.random.default_rng(seed)
    half = rng.choice(np.arange(1, bandwidth + 1), size=d // 2, replace=False)
    offsets = tuple(int(o) for s in half for o in (s, -s))
    e_undirected = n * d // 2
    inv_d = 1.0 / d
    agg_dtype = None if variant in ("f32agg", "fwd_f32agg") else "bfloat16"

    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "conv1": gcn_conv_init(k1, dim_embedding, G),
        "conv2": gcn_conv_init(k2, G, G),
        "embed": jax.random.normal(k3, (m, r * dim_embedding), jnp.float32)
        * 0.1,
    }
    if variant == "sgd":
        optimizer = optax.sgd(learning_rate)
    elif variant in ("mubf16", "candidate", "candidate2"):
        optimizer = optax.adam(learning_rate, mu_dtype=jnp.bfloat16)
    elif variant == "afact":
        optimizer = optax.adafactor(learning_rate)
    else:
        optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)
    bf16act = variant in (
        "bf16act", "bf16act_remat", "candidate", "candidate2",
        "bf16act_fwd", "afact",
    )
    remat = variant in ("remat", "bf16act_remat", "candidate")
    # jax.checkpoint cannot linearize reduce_window (and its init_value
    # must be a static Python scalar, which pins it to f32), so the
    # remat/bf16 variants (and "reshmax", which isolates the change) use a
    # reshape-based group max: reduce_max has full autodiff/linearization
    # support and follows the operand dtype
    reshape_max = remat or bf16act or variant in ("reshmax", "fusedhead")
    # "fusedhead": f32 + reshape-based group SUM for the softmax
    # denominator instead of the kron-ones matmul — algebraically the
    # same 16-value sums, but the matmul is a fusion boundary (e must
    # materialize as its input) while a trailing-axis reduce can fuse
    # with the exp producer and the divide consumer
    reshape_sum = variant in ("fusedhead",)
    act = jnp.bfloat16 if bf16act else jnp.float32

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, r * G), 1)
    class_ok = (lane % G < num_classes).astype(jnp.float32)
    grp = lane // G
    term_cols = (grp < num_classes).astype(jnp.float32)
    term_onehot = ((lane % G) == grp).astype(jnp.float32) * term_cols
    eye_r = jnp.eye(r, dtype=jnp.float32)
    sum_bcast = jnp.kron(eye_r, jnp.ones((G, G), jnp.float32))

    def _group_max(h, g=16):
        if reshape_max:
            m_, L_ = h.shape
            return h.reshape(m_, L_ // g, g).max(axis=-1)
        return jax.lax.reduce_window(
            h, -jnp.inf, jax.lax.max, (1, g), (1, g), "VALID"
        )

    def _bcast(g16, g=16):
        return jnp.repeat(g16, g, axis=1)

    def spmm(h):
        if variant in ("no_spmm", "fwd_nospmm"):
            return h
        L = h.shape[1]
        hh = h.reshape(n, L // r)
        if agg_dtype is not None and not bf16act:
            hh = hh.astype(agg_dtype)
        out = banded_spmm_unit_packed(hh, offsets, r)
        return out.astype(act).reshape(m, L)

    class_ok_a = class_ok.astype(act)
    term_cols_a = term_cols.astype(act)
    term_onehot_a = term_onehot.astype(act)
    sum_bcast_a = sum_bcast.astype(act)

    def head(h):
        gmax = jax.lax.stop_gradient(
            _bcast(_group_max(h + (class_ok_a - 1.0) * 1e9))
        )
        e = jnp.exp(h - gmax) * class_ok_a
        if reshape_sum:
            m_, L_ = e.shape
            den = e.reshape(m_, L_ // 16, 16).sum(axis=-1)
            probs = e / jnp.repeat(den, 16, axis=1)
        else:
            probs = e / (e @ sum_bcast_a)
        row0 = jnp.zeros((m, 1), act).at[0, 0].set(1.0)
        is_term = row0 * term_cols_a
        pinned_hard = is_term * term_onehot_a + (1.0 - is_term) * probs
        pinned = jax.lax.stop_gradient(pinned_hard - probs) + probs
        hard = jax.lax.stop_gradient(
            (pinned >= _bcast(_group_max(pinned))).astype(act)
            * class_ok_a
        )
        onehot = jax.lax.stop_gradient(hard - pinned) + pinned
        # f32 reduction (the cut is ~4e7; bf16 accumulation would be junk)
        same = jnp.vdot(
            onehot.astype(jnp.float32), spmm(onehot).astype(jnp.float32)
        )
        return -(e_undirected - 0.5 * same)

    def loss_fn(params):
        k1w = jnp.kron(eye_r, params["conv1"]["w"]).astype(act)
        k2w = jnp.kron(eye_r, params["conv2"]["w"]).astype(act)
        b1 = jnp.tile(params["conv1"]["b"], r).astype(act)
        b2 = jnp.tile(params["conv2"]["b"], r).astype(act)
        h = params["embed"].astype(act) @ k1w
        h = spmm(h) * act(inv_d) + b1
        h = jax.nn.relu(h)
        h = h @ k2w
        h = spmm(h) * act(inv_d) + b2
        if variant == "fwd_nohead":
            return jnp.sum(h.astype(jnp.float32))
        return (jax.checkpoint(head) if remat else head)(h)

    if variant in ("fwd_only", "bf16act_fwd", "fwd_nospmm", "fwd_nohead",
                   "fwd_f32agg"):

        @jax.jit
        def steps(params, opt_state, _):
            def body(carry, _):
                params, opt_state = carry
                loss = loss_fn(params)
                # data dependency so scan iterations cannot be CSE'd
                params = dict(params, embed=params["embed"] + 1e-30 * loss)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), None, length=epochs_per_call
            )
            return params, opt_state, losses

    else:

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

    return steps, params, opt_state


def time_variant(n, variant, epochs_per_call=10, chunks=4):
    steps, params, opt_state = build_step(
        n, variant, epochs_per_call=epochs_per_call
    )
    t0 = time.perf_counter()
    params, opt_state, losses = steps(params, opt_state, None)
    float(np.asarray(losses)[-1])
    compile_s = time.perf_counter() - t0
    samples = []
    for _ in range(chunks):
        t0 = time.perf_counter()
        params, opt_state, losses = steps(params, opt_state, None)
        float(np.asarray(losses)[-1])  # hard sync
        samples.append((time.perf_counter() - t0) / epochs_per_call)
    return {
        "variant": variant,
        "epoch_ms_best": min(samples) * 1e3,
        "epoch_ms_mean": sum(samples) / len(samples) * 1e3,
        "epoch_ms_all": [s * 1e3 for s in samples],
        "compile_s": compile_s,
    }


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_002_432
    epc = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    chunks = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    variants = sys.argv[4].split(",") if len(sys.argv) > 4 else [
        "base", "f32agg", "no_spmm", "sgd", "mubf16", "fwd_only",
        "bf16act", "remat", "bf16act_remat", "candidate",
    ]
    print(f"devices: {jax.devices()}", file=sys.stderr)
    done = set()
    results = []
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            for line in f:
                rec = json.loads(line)
                done.add(rec["variant"])
                results.append(rec)
    for v in variants:
        if v in done:
            continue
        r = time_variant(n, v, epc, chunks)
        print(json.dumps(r), flush=True)
        with open(RESULTS, "a") as f:
            f.write(json.dumps(r) + "\n")
        results.append(r)
    with open("/tmp/epoch_anatomy.json", "w") as f:
        json.dump({"n": n, "epochs_per_call": epc, "results": results}, f,
                  indent=2)


if __name__ == "__main__":
    main()
