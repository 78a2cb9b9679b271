"""Hierarchical profiling timers (reference src/timer.rs): nested,
colored-less, enabled via SPARTAN_TPU_PROFILE=1 (the analogue of the
reference's `profile` cargo feature); no-ops otherwise."""

from __future__ import annotations

import os
import time

_ENABLED = os.environ.get("SPARTAN_TPU_PROFILE", "0") not in ("", "0")
_DEPTH = 0


class Timer:
    def __init__(self, label: str):
        global _DEPTH
        self.label = label
        self.start = time.perf_counter()
        if _ENABLED:
            from . import rt

            self._rt0 = rt.snapshot()
            print(f"{'  ' * _DEPTH}* {label}")
            _DEPTH += 1

    def stop(self) -> float:
        global _DEPTH
        elapsed = time.perf_counter() - self.start
        if _ENABLED:
            from . import rt

            _DEPTH -= 1
            f1, s1 = rt.snapshot()
            df, ds = f1 - self._rt0[0], s1 - self._rt0[1]
            extra = (f"  [{df} fetch{'es' if df != 1 else ''}, "
                     f"{ds:.3f}s stalled]") if df else ""
            print(f"{'  ' * _DEPTH}* {self.label} "
                  f"{elapsed * 1000:.3f}ms{extra}")
        return elapsed

    @staticmethod
    def print_msg(msg: str) -> None:
        if _ENABLED:
            print(f"{'  ' * _DEPTH}* {msg}")
