#!/usr/bin/env python
"""Bench smoke with a regression gate: run ``bench.py`` and compare its
headline metric against the newest committed ``BENCH_r*.json``.

Part of ``make check`` (SURVEY.md §4 test-strategy plan: a committed gate a
round can run instead of relying on the driver to notice regressions).

Exit codes: 0 ok, 1 bench failed, 2 regression beyond threshold.

The headline is train_epoch_time_n500x20 (seconds; lower is better).  The
tunnel has large run variance even best-of-N (PARITY §3), so the default
threshold is generous (2x) — it catches real breakage (a kernel falling
off its fast path, a 10x regression), not noise.

Env: BENCH_SMOKE_THRESHOLD (float, default 2.0), BENCH_SMOKE_TIMEOUT
(seconds, default 1200 — first compile on a cold cache is ~240 s).
"""

import glob
import json
import os
import re
import subprocess
import sys


def newest_bench_json(repo: str):
    paths = glob.glob(os.path.join(repo, "BENCH_r*.json"))
    if not paths:
        return None, None
    paths.sort(key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
    with open(paths[-1]) as f:
        data = json.load(f)
    return paths[-1], (data.get("parsed") or {})


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    threshold = float(os.environ.get("BENCH_SMOKE_THRESHOLD", "2.0"))
    timeout = int(os.environ.get("BENCH_SMOKE_TIMEOUT", "1200"))

    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(repo, "bench.py")],
            capture_output=True, text=True, timeout=timeout, cwd=repo,
        )
    except subprocess.TimeoutExpired:
        print(f"[smoke] bench.py timed out after {timeout}s", file=sys.stderr)
        return 1
    sys.stderr.write(proc.stderr[-2000:])
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    if proc.returncode != 0 or not lines:
        print(f"[smoke] bench.py failed rc={proc.returncode}", file=sys.stderr)
        return 1
    now = json.loads(lines[-1])
    print(f"[smoke] {now['metric']} = {now['value']} {now['unit']}")

    path, prev = newest_bench_json(repo)
    if not prev or prev.get("metric") != now["metric"]:
        print("[smoke] no comparable previous BENCH json; pass")
        return 0
    ratio = now["value"] / prev["value"]
    print(
        f"[smoke] vs {os.path.basename(path)}: {prev['value']} -> "
        f"{now['value']} ({ratio:.2f}x; threshold {threshold}x)"
    )
    if ratio > threshold:
        print("[smoke] REGRESSION beyond threshold", file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
