"""VERDICT r4 #5: re-establish the weighted banded kernel number.

BENCH_r04 measured the weighted [n, d]-table banded kernel at 4.07e9
edges/s best with a 78% spread across 3 samples in ONE session — too
unstable to publish.  This probe runs >= N_SESSIONS separate processes
(fresh TPU client each, like independent bench sessions), each taking a
best-of-N_OUTER amortized measurement (`scan_timeit_stats`), and reports
the per-session bests, their median, and the cross-session spread.
Publication rule (VERDICT): spread < 15% -> publish median-of-best;
otherwise publish the range with an explicit tunnel-limited note.

Also measures the unit kernel in the same sessions as a control: if the
unit number is stable while the weighted one is not, the variance is the
weighted kernel's (MXU broadcast-matmul) scheduling, not the tunnel.

Run:  python experiments/weighted_stability.py [n_sessions]
Writes docs/weighted_stability_r5.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

OUT = "/root/repo/docs/weighted_stability_r5.json"
N_SESSIONS = int(sys.argv[1]) if len(sys.argv) > 1 else 4

if os.environ.get("PROBE_CHILD") != "1" and __name__ == "__main__":
    sessions = []
    attempts = 0
    while len(sessions) < N_SESSIONS and attempts < 3 * N_SESSIONS:
        attempts += 1
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=dict(os.environ, PROBE_CHILD="1"),
                timeout=900,
                capture_output=True,
                text=True,
            )
        except subprocess.TimeoutExpired:
            print(f"[probe] session attempt {attempts} timed out", flush=True)
            continue
        lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
        if proc.returncode == 0 and lines:
            rec = json.loads(lines[-1])
            sessions.append(rec)
            print(f"session {len(sessions)}: {rec}", flush=True)
        else:
            sys.stderr.write(proc.stderr[-2000:])
            print(f"[probe] session attempt {attempts} failed", flush=True)
    if not sessions:
        sys.exit(1)
    import statistics

    w_bests = sorted(s["weighted_best_eps"] for s in sessions)
    u_bests = sorted(s["unit_best_eps"] for s in sessions)
    summary = {
        "n_sessions": len(sessions),
        "weighted_session_bests_eps": w_bests,
        "weighted_median_eps": statistics.median(w_bests),
        "weighted_cross_session_spread_frac": (
            (w_bests[-1] - w_bests[0]) / w_bests[0]
        ),
        "unit_session_bests_eps": u_bests,
        "unit_median_eps": statistics.median(u_bests),
        "unit_cross_session_spread_frac": (
            (u_bests[-1] - u_bests[0]) / u_bests[0]
        ),
        "sessions": sessions,
    }
    with open(OUT, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: v for k, v in summary.items() if k != "sessions"}))
    sys.exit(0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gcn_maxcut_tpu.ops.pallas_banded import banded_spmm, banded_spmm_unit
from gcn_maxcut_tpu.utils.timing import scan_timeit_stats

N, D, BW, F = 131_072, 8, 63, 128
SEED = 0


def main():
    rng = np.random.default_rng(SEED)
    half = rng.choice(np.arange(1, BW + 1), size=D // 2, replace=False)
    offsets = tuple(int(o) for s in half for o in (s, -s))
    x = jax.random.normal(jax.random.PRNGKey(1), (N, F), jnp.float32)
    w = jax.random.uniform(jax.random.PRNGKey(2), (N, D), jnp.float32) + 0.5
    scale = 1.0 / D  # keep the chain numerically bounded

    stats_w = scan_timeit_stats(
        lambda x_: banded_spmm(x_, w, offsets) * scale, x,
        k_hi=50, k_lo=10, reps=3, outer=5,
    )
    stats_u = scan_timeit_stats(
        lambda x_: banded_spmm_unit(x_, offsets) * scale, x,
        k_hi=50, k_lo=10, reps=3, outer=5,
    )
    e = N * D
    print(json.dumps({
        "weighted_best_eps": e / stats_w["best_s"],
        "weighted_inner_spread_frac": stats_w["spread_frac"],
        "unit_best_eps": e / stats_u["best_s"],
        "unit_inner_spread_frac": stats_u["spread_frac"],
        "n_valid_w": stats_w["n_valid"],
        "n_valid_u": stats_u["n_valid"],
    }))


if __name__ == "__main__":
    main()
