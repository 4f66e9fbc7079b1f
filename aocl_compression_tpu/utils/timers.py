"""Timing + handle-level stats.

Parity with the reference's timer macros (/root/reference/utils/utils.h:219-248)
and the stats the unified API records when measureStats is on
(/root/reference/api/api.cpp:58-75): cSize/cTime/cSpeed and d* counterparts,
speed = bytes * 1000 / ns  (MB/s).

Device work is timed around ``jax.block_until_ready`` so the number reflects
actual TPU execution, not dispatch.
"""

from __future__ import annotations

import time


class Timer:
    __slots__ = ("_t0", "elapsed_ns")

    def __init__(self):
        self._t0 = 0
        self.elapsed_ns = 0

    def start(self) -> None:
        self._t0 = time.perf_counter_ns()

    def stop(self) -> int:
        self.elapsed_ns = time.perf_counter_ns() - self._t0
        return self.elapsed_ns


def speed_mbps(num_bytes: int, elapsed_ns: int) -> float:
    """speed = bytes*1000/ns, the reference's MB/s definition (api/api.cpp:74)."""
    if elapsed_ns <= 0:
        return 0.0
    return num_bytes * 1000.0 / elapsed_ns
