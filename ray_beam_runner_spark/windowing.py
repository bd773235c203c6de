"""Window functions (Beam model parity, SURVEY.md §2.2 WindowInto).

Reference: fixed/sliding/session windows and custom merging WindowFns are
assigned by `RayWindowInto` (`/root/reference/ray_beam_runner/translator.py:393-416`)
and tested at `portability/ray_runner_test.py:880-908, 2028-2047`.

Spark mapping: window assignment is a column computation on ``event_time``
(fixed: one interval; sliding: explode into size/period intervals). Merging
window fns (sessions, custom) cannot be assigned element-wise — they merge
per key at grouping time (GroupAlsoByWindow), which here happens inside
``PCollection.group_by_key`` via an applyInPandas merge (sessions use the
native ``F.session_window`` fast path where possible).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

__all__ = ["GlobalWindows", "FixedWindows", "SlidingWindows", "Sessions", "CustomMergingWindows"]


@dataclass(frozen=True)
class GlobalWindows:
    """Single global window (the default)."""

    merging = False


@dataclass(frozen=True)
class FixedWindows:
    """Tumbling windows of `size` seconds, aligned to the epoch."""

    size: float
    merging = False

    def assign(self, ts: float) -> list[tuple[float, float]]:
        start = math.floor(ts / self.size) * self.size
        return [(start, start + self.size)]


@dataclass(frozen=True)
class SlidingWindows:
    """Overlapping windows of `size` seconds every `period` seconds."""

    size: float
    period: float
    merging = False

    def assign(self, ts: float) -> list[tuple[float, float]]:
        out = []
        first = math.floor(ts / self.period) * self.period
        start = first
        while start > ts - self.size:
            out.append((start, start + self.size))
            start -= self.period
        return out


@dataclass(frozen=True)
class Sessions:
    """Per-key sessions closed by a `gap`-second silence."""

    gap: float
    merging = True

    def assign(self, ts: float) -> list[tuple[float, float]]:
        return [(ts, ts + self.gap)]

    @staticmethod
    def merge(windows: list[tuple[float, float]]) -> list[tuple[float, float]]:
        """Merge overlapping/abutting proto-windows (standard interval merge)."""
        out: list[list[float]] = []
        for s, e in sorted(windows):
            if out and s <= out[-1][1]:
                out[-1][1] = max(out[-1][1], e)
            else:
                out.append([s, e])
        return [(s, e) for s, e in out]


@dataclass(frozen=True)
class CustomMergingWindows:
    """User-defined merging WindowFn: `assign_fn(ts) -> [(start, end)]` and
    `merge_fn(windows) -> [(start, end)]` (must map each input window into
    exactly one output window). Mirrors the reference's custom WindowFn test
    (ray_runner_test.py:2028-2047)."""

    assign_fn: object
    merge_fn: object
    merging = True

    def assign(self, ts: float) -> list[tuple[float, float]]:
        return list(self.assign_fn(ts))

    def merge(self, windows: list[tuple[float, float]]) -> list[tuple[float, float]]:
        return list(self.merge_fn(windows))
