"""Wall-clock timing helpers for phases and steps.

The reference scatters ``time.time()`` deltas through every module
(SURVEY.md §5.1); here they are one utility, with `jax.block_until_ready`
awareness so device work is actually measured.
"""

from __future__ import annotations

import time
from typing import Any, Dict

import jax


class Timer:
    """Context manager measuring wall time; ``.elapsed`` in seconds."""

    def __init__(self, sync: Any = None):
        self._sync = sync
        self.elapsed = 0.0

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self._sync is not None:
            jax.block_until_ready(self._sync)
        self.elapsed = time.perf_counter() - self._start
        return False


class PhaseTimer:
    """Accumulates named phase durations (generation/processing/training...)."""

    def __init__(self):
        self.phases: Dict[str, float] = {}

    def phase(self, name: str):
        timer = self

        class _Ctx:
            def __enter__(self):
                self._start = time.perf_counter()
                return self

            def __exit__(self, *exc):
                timer.phases[name] = timer.phases.get(name, 0.0) + (
                    time.perf_counter() - self._start
                )
                return False

        return _Ctx()

    def summary(self) -> str:
        total = sum(self.phases.values())
        lines = [f"{k}: {v:.2f}s" for k, v in self.phases.items()]
        lines.append(f"total: {total:.2f}s")
        return "\n".join(lines)
