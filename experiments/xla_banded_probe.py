"""VERDICT r4 #1: attack the ~330 GB/s pallas stream ceiling from the XLA
side — can ANY XLA formulation of the circulant row-shift aggregation
  y[i] = sum_k x[(i + o_k) mod m]          (x: [m, L], D = len(offsets))
beat the Pallas row-window kernel at HBM-resident sizes, given that XLA
elementwise fusions stream ~660 GB/s on the same arrays while pallas_call
caps at ~330-350?

Formulations measured (scan_timeit_stats, best-of-N amortized — the only
trusted timing on this tunnel):

  pallas     the existing row-window kernel (baseline, ~330 GB/s)
  rolls      sum of D jnp.roll — the current narrow-F fallback
  slicesum   pad once then sum D static slices of the padded buffer
             (one elementwise fusion; D+2 passes if XLA does not dedupe
             the overlapping reads, 2 passes if it does)
  blockmm_R  reshape [m/R, R, L]; y = A1 @ block + E_lo @ prev_tail +
             E_hi @ next_head with static 0/1 banded matrices — the MXU
             *is* the stream (read x once, write y once, + 2W/R edge
             reads), so the question is what XLA's batched-matmul
             emitter streams at.

Each runs at f32 and bf16 (the giant trainer's default streams bf16 with
f32 accumulation; the block matmuls accumulate f32 via
preferred_element_type, so 0/1 matrices keep bf16-stream semantics
exact).

Run:  python experiments/xla_banded_probe.py [m] [L] [variants,csv]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

RESULTS = "/tmp/xla_banded_results.jsonl"

# tunnel hang recovery: run the measurements in a retried child; completed
# (variant, dtype) pairs are checkpointed to RESULTS so a retry resumes
if os.environ.get("PROBE_CHILD") != "1" and __name__ == "__main__":
    for attempt in range(6):
        try:
            rc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
                env=dict(os.environ, PROBE_CHILD="1"),
                timeout=600,
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

from gcn_maxcut_tpu.ops.pallas_banded import _banded_spmm_unit_raw
from gcn_maxcut_tpu.utils.timing import scan_timeit_stats

M_DEFAULT = 1_250_304          # 10M nodes / r=8: the giant trainer's shape
L_DEFAULT = 128
BANDWIDTH = 63
D = 8
SEED = 0


def make_offsets():
    rng = np.random.default_rng(SEED)
    half = rng.choice(np.arange(1, BANDWIDTH + 1), size=D // 2, replace=False)
    return tuple(int(o) for s in half for o in (s, -s))


def op_pallas(offsets):
    def op(x):
        return _banded_spmm_unit_raw(x, offsets)

    return op


def op_rolls(offsets):
    def op(x):
        out = jnp.zeros_like(x)
        for o in offsets:
            out = out + jnp.roll(x, -o, axis=0)
        return out.astype(x.dtype)

    return op


def op_slicesum(offsets):
    W = max(abs(o) for o in offsets)

    def op(x):
        m = x.shape[0]
        xp = jnp.concatenate([x[m - W:], x, x[:W]], axis=0)
        out = xp[W + offsets[0] : W + offsets[0] + m]
        for o in offsets[1:]:
            out = out + xp[W + o : W + o + m]
        return out.astype(x.dtype)

    return op


def _block_mats(offsets, R):
    W = max(abs(o) for o in offsets)
    A1 = np.zeros((R, R), np.float32)
    E_lo = np.zeros((R, W), np.float32)
    E_hi = np.zeros((R, W), np.float32)
    for i in range(R):
        for o in offsets:
            j = i + o
            if 0 <= j < R:
                A1[i, j] += 1
            elif j < 0:
                E_lo[i, W + j] += 1
            else:
                E_hi[i, j - R] += 1
    return A1, E_lo, E_hi, W


def op_blockmm(offsets, R):
    A1_np, E_lo_np, E_hi_np, W = _block_mats(offsets, R)

    def op(x):
        m, L = x.shape
        nb = m // R
        cd = jnp.bfloat16  # 0/1 contraction matrices: exact in bf16
        A1 = jnp.asarray(A1_np, cd)
        E_lo = jnp.asarray(E_lo_np, cd)
        E_hi = jnp.asarray(E_hi_np, cd)
        xb = x.reshape(nb, R, L)
        tail = jnp.roll(xb[:, R - W:, :], 1, axis=0)     # [nb, W, L] small
        head = jnp.roll(xb[:, :W, :], -1, axis=0)
        y = jnp.einsum(
            "ij,bjl->bil", A1, xb, preferred_element_type=jnp.float32
        )
        y = y + jnp.einsum(
            "ij,bjl->bil", E_lo, tail, preferred_element_type=jnp.float32
        )
        y = y + jnp.einsum(
            "ij,bjl->bil", E_hi, head, preferred_element_type=jnp.float32
        )
        return y.reshape(m, L).astype(x.dtype)

    return op


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else M_DEFAULT
    L = int(sys.argv[2]) if len(sys.argv) > 2 else L_DEFAULT
    want = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    offsets = make_offsets()
    print(f"devices={jax.devices()} offsets={offsets}", file=sys.stderr)

    variants = {
        "pallas": op_pallas(offsets),
        "rolls": op_rolls(offsets),
        "slicesum": op_slicesum(offsets),
    }
    for R in (128, 256, 512, 1024):
        if m % R == 0:
            variants[f"blockmm_{R}"] = op_blockmm(offsets, R)

    done = set()
    results = []
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            for line in f:
                rec = json.loads(line)
                done.add((rec["variant"], rec["dtype"]))
                results.append(rec)

    for dtype in ("float32", "bfloat16"):
        x0 = (
            jax.random.normal(jax.random.PRNGKey(1), (m, L), jnp.float32)
            .astype(dtype)
        )
        nbytes = m * L * x0.dtype.itemsize
        for name, op in variants.items():
            if want and name not in want:
                continue
            if (name, dtype) in done:
                continue
            try:
                stats = scan_timeit_stats(op, x0, k_hi=30, k_lo=6, reps=3,
                                          outer=3)
            except Exception as e:  # noqa: BLE001 - probe must survive
                print(f"{name}/{dtype}: FAILED {e}", file=sys.stderr)
                continue
            t = stats["best_s"]
            rec = {
                "variant": name,
                "dtype": dtype,
                "ms": t * 1e3,
                "stream2_GBps": 2 * nbytes / t / 1e9,  # read-once+write-once
                "edges_per_s": m * 8 * D / t,          # n=8m nodes, d=8
                "spread_frac": stats["spread_frac"],
                "n_valid": stats["n_valid"],
            }
            print(json.dumps(rec), flush=True)
            with open(RESULTS, "a") as f:
                f.write(json.dumps(rec) + "\n")
            results.append(rec)

    with open("/tmp/xla_banded_probe.json", "w") as f:
        json.dump({"m": m, "L": L, "offsets": offsets, "results": results}, f,
                  indent=2)


if __name__ == "__main__":
    main()
