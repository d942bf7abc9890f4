"""Wall-clock timing with event laps (reference /root/reference/timingRoutines.py:12).

On an async backend like TPU, timing a jax computation requires blocking on the
result; ``Timer.evt``/``end`` accept an optional array (or pytree) to
``block_until_ready`` before taking the timestamp.
"""

from __future__ import annotations

import time

import jax


class Timer:
    def __init__(self):
        self._t0 = None
        self._laps: list[tuple[str, float]] = []

    def start(self):
        self._t0 = time.perf_counter()
        self._laps = []
        return self

    def evt(self, label: str = "", block_on=None) -> float:
        """Record a lap. Returns seconds since the previous lap (or start)."""
        if block_on is not None:
            jax.block_until_ready(block_on)
        now = time.perf_counter()
        prev = self._laps[-1][1] if self._laps else self._t0
        self._laps.append((label, now))
        return now - prev

    def end(self, block_on=None) -> float:
        """Total seconds since start()."""
        if block_on is not None:
            jax.block_until_ready(block_on)
        return time.perf_counter() - self._t0

    def rpt(self):
        prev = self._t0
        for label, t in self._laps:
            print(f"{label}: {t - prev:.6f}s")
            prev = t
        if self._laps:
            print(f"Total: {self._laps[-1][1] - self._t0:.6f}s")
