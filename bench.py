#!/usr/bin/env python
"""Driver benchmark: reference-recipe training epoch on the real device.

Prints ONE JSON line:
  {"metric": "train_epoch_time_n500x20", "value": <s/epoch>, "unit": "s",
   "vs_baseline": <reference_cpu_epoch_time / ours>}

The metric is the full hot path of the reference pipeline — 20 graphs
(n=500, d∈[6,8], 1000-wide adjacency features), per-graph forward + STE +
cut loss + backward + Adam — as one scanned jit step.  Baseline:
171.81 s / 486 epochs ≈ 0.3535 s/epoch on the reference's CPU
(BASELINE.md §4).  Extra context (SpMM edges/s, post-processing) goes to
stderr only.
"""

import json
import os
import subprocess
import sys


def _run_with_retries(max_attempts: int = 3, timeout_s: int = 900) -> int:
    """The axon TPU tunnel occasionally hangs at device init (observed
    ~1-in-2 this round).  Run the real bench in a child process with a
    timeout and retry; forward only the child's final JSON line."""
    for attempt in range(1, max_attempts + 1):
        env = dict(os.environ, GCN_BENCH_CHILD="1")
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                timeout=timeout_s,
            )
        except subprocess.TimeoutExpired:
            print(
                f"[bench] attempt {attempt} timed out after {timeout_s}s "
                "(device-init hang); retrying",
                file=sys.stderr,
            )
            continue
        sys.stderr.write(proc.stderr)
        json_lines = [
            ln for ln in proc.stdout.splitlines() if ln.startswith("{")
        ]
        if proc.returncode == 0 and json_lines:
            print(json_lines[-1])
            return 0
        print(
            f"[bench] attempt {attempt} failed (rc={proc.returncode}); retrying",
            file=sys.stderr,
        )
    print("[bench] all attempts failed", file=sys.stderr)
    return 1


def main():
    from gcn_maxcut_tpu.utils.cache import enable_compilation_cache

    cache_dir = enable_compilation_cache()
    print(f"[bench] persistent compilation cache: {cache_dir}", file=sys.stderr)

    from gcn_maxcut_tpu.bench.microbench import (
        bench_post_processing,
        bench_spmm,
        bench_spmm_banded,
        bench_train_epoch,
    )

    train = bench_train_epoch(epochs_timed=10)
    ts = train["epoch_time_stats"]
    print(
        f"[bench] train-epoch compile {train['compile_time_s']:.1f}s, "
        f"steady {train['epoch_time_s'] * 1e3:.2f} ms/epoch "
        f"(best of {ts['n_valid']}/{ts['n']}, spread {ts['spread_s'] * 1e3:.2f} ms; "
        "compile repaid from the persistent cache on repeat runs)",
        file=sys.stderr,
    )

    def _kernel_entry(stats, edges, sol_denom):
        """best/mean/spread edges/s + SoL fraction from a scan_timeit_stats
        dict (the round-over-round comparability record, VERDICT r3 #2)."""
        best = edges / stats["best_s"]
        return {
            "best_edges_per_s": round(best, 1),
            "mean_edges_per_s": round(edges / stats["mean_s"], 1),
            "spread_frac": round(stats["spread_frac"], 4),
            "n_valid": stats["n_valid"],
            "sol_frac": round(best / sol_denom, 4),
        }

    kernels = {}
    try:
        spmm = bench_spmm(n=100_000, d=8, feature_dim=128)
        banded = bench_spmm_banded()
        post = bench_post_processing()
        e = spmm["edges_directed"]
        kernels = {
            "block_ell_fwd": _kernel_entry(
                spmm["fwd_stats"], e, spmm["roofline_fwd_edges_per_s"]
            ),
            "block_ell_fwdbwd": _kernel_entry(
                spmm["fwdbwd_stats"], e, spmm["roofline_fwdbwd_edges_per_s"]
            ),
            "expander_gather_fwd": _kernel_entry(
                spmm["expander_fwd_stats"], e,
                spmm["roofline_fwd_edges_per_s"],
            ),
            "expander_gather_fwdbwd": _kernel_entry(
                spmm["expander_fwdbwd_stats"], e,
                spmm["roofline_fwdbwd_edges_per_s"],
            ),
            # sol_frac here is vs the F32 roofline (the bf16 lever moves
            # half the bytes, so >100% of the f32 bound is expected)
            "expander_bf16_fwd": _kernel_entry(
                spmm["expander_bf16_fwd_stats"], e,
                spmm["roofline_fwd_edges_per_s"],
            ),
        }
        eb = banded["n"] * banded["d"]
        kernels.update(
            banded_unit_fwd=_kernel_entry(
                banded["fwd_stats"], eb, banded["banded_roofline_edges_per_s"]
            ),
            # fwd+bwd = 2x the fwd stream (backward = same kernel on dy).
            # NOTE: the n=131k working set straddles VMEM, so these
            # sol_frac values are vs an HBM bound the chained run can
            # legitimately exceed (PARITY §3 regime caveat); the
            # *_hbm_regime row below is the HBM-resident truth.
            banded_unit_fwdbwd=_kernel_entry(
                banded["fwdbwd_stats"], eb,
                banded["banded_roofline_edges_per_s"] / 2.0,
            ),
            banded_weighted_fwd=_kernel_entry(
                banded["weighted_fwd_stats"], eb,
                banded["weighted_roofline_edges_per_s"],
            ),
            # true HBM-resident regime (1.25M rows, 1.3 GB traffic): the
            # platform caps pallas_call streams at ~330-350 GB/s here
            # (sol_frac is vs the 819 GB/s stream roofline; the n=131k
            # rows above run partially VMEM-resident — see PARITY §3)
            # same roofline formula as the small-n row (it is n-independent:
            # chip HBM GB/s / bytes-per-edge), so the denominator tracks the
            # chip spec bench_spmm_banded ran with rather than a literal
            banded_unit_fwd_hbm_regime=_kernel_entry(
                banded["hbm_regime_fwd_stats"],
                banded["hbm_regime_n"] * banded["d"],
                banded["banded_roofline_edges_per_s"],
            ),
            banded_weighted_fwd_hbm_regime=_kernel_entry(
                banded["hbm_regime_weighted_fwd_stats"],
                banded["hbm_regime_n"] * banded["d"],
                banded["weighted_roofline_edges_per_s"],
            ),
        )
        print(
            f"[bench] general spmm fwd+bwd: {spmm['fwdbwd_edges_per_s']:.3e} edges/s; "
            f"banded pallas spmm fwd: {banded['fwd_edges_per_s']:.3e} edges/s "
            f"({100 * banded['fraction_of_banded_roofline']:.0f}% of stream SoL, "
            f"spread {100 * banded['fwd_stats']['spread_frac']:.0f}%); "
            f"post-processing 200 iters: {post['time_s'] * 1e3:.1f} ms",
            file=sys.stderr,
        )
    except Exception as e:  # auxiliary benches must not break the headline
        print(f"[bench] auxiliary benches failed: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "train_epoch_time_n500x20",
                "value": round(train["epoch_time_s"], 6),
                "unit": "s",
                "vs_baseline": round(train["speedup_vs_reference"], 3),
                "epoch_time_spread_s": round(ts["spread_s"], 6),
                "best_of": ts["n"],
                "kernels": kernels,
            }
        )
    )


if __name__ == "__main__":
    if os.environ.get("GCN_BENCH_CHILD") == "1":
        main()
    else:
        sys.exit(_run_with_retries())
