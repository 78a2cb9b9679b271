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
            print(f"{'  ' * _DEPTH}* {label}")
            _DEPTH += 1

    def stop(self) -> float:
        global _DEPTH
        elapsed = time.perf_counter() - self.start
        if _ENABLED:
            _DEPTH -= 1
            print(f"{'  ' * _DEPTH}* {self.label} {elapsed * 1000:.3f}ms")
        return elapsed

    @staticmethod
    def print_msg(msg: str) -> None:
        if _ENABLED:
            print(f"{'  ' * _DEPTH}* {msg}")
