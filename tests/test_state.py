"""Stateful ParDo + event-time timer conformance tests, mirroring
`/root/reference/ray_beam_runner/portability/ray_runner_test.py:363-602`.
"""

import pytest

from ray_beam_runner_spark.pipeline import Pipeline
from ray_beam_runner_spark.state import (
    BagState,
    CombiningState,
    StatefulDoFn,
    ValueState,
    run_stateful_batch,
)


@pytest.fixture()
def p(spark):
    return Pipeline(spark)


def test_index_assignment(p):
    # ray_runner_test.py:363-393: per-key element indexing via combining state
    class IndexFn(StatefulDoFn):
        def create_states(self):
            return {"idx": CombiningState(lambda a, b: a + b, 0)}

        def process(self, key, value, timestamp, states, timers):
            i = states["idx"].read()
            states["idx"].add(1)
            yield (key, value, i)

    data = [("A", "a")] * 2 + [("B", "b")] * 3
    pc = p.create_kv(data, key_type="string", value_type="string")
    out = run_stateful_batch(pc, IndexFn())
    out.assert_that(
        [("A", "a", 0), ("A", "a", 1), ("B", "b", 0), ("B", "b", 1), ("B", "b", 2)]
    )


def test_value_state_rmw(p):
    # ReadModifyWrite cell (ray_runner_test.py:365-367)
    class LastFn(StatefulDoFn):
        def create_states(self):
            return {"last": ValueState()}

        def process(self, key, value, timestamp, states, timers):
            prev = states["last"].read(default="<none>")
            states["last"].write(value)
            yield (key, prev)

    pc = p.create_kv(
        [("k", "x"), ("k", "y")], key_type="string", value_type="string",
        timestamp_fn=lambda kv: 0 if kv[1] == "x" else 1,
    )
    run_stateful_batch(pc, LastFn()).assert_that([("k", "<none>"), ("k", "x")])


def test_event_time_timer(p):
    # ray_runner_test.py:428-459: timer set at ts+10 fires with bag contents
    class BufferFn(StatefulDoFn):
        def create_states(self):
            return {"bag": BagState()}

        def process(self, key, value, timestamp, states, timers):
            states["bag"].add(value)
            timers.set("flush", timestamp + 10)
            return ()

        def on_timer(self, key, tag, fire_ts, states, timers):
            vals = sorted(states["bag"].read())
            states["bag"].clear()
            if vals:
                yield (key, vals)

    pc = p.create_kv(
        [("k1", 10), ("k2", 100), ("k1", 11)],
        key_type="string",
        value_type="bigint",
        timestamp_fn=lambda kv: kv[1],
    )
    # k1: ts 10 sets timer@20, ts 11 re-sets timer@21 (dedupe — only one
    # flush); k2: timer@110 fires at end-of-input watermark.
    run_stateful_batch(pc, BufferFn()).assert_that([("k1", [10, 11]), ("k2", [100])])


def test_timer_clear(p):
    # ray_runner_test.py:461-497: cleared timers never fire
    class ClearFn(StatefulDoFn):
        def create_states(self):
            return {"n": CombiningState(lambda a, b: a + b, 0)}

        def process(self, key, value, timestamp, states, timers):
            states["n"].add(1)
            if value == "set":
                timers.set("t", timestamp + 5)
            elif value == "clear":
                timers.clear("t")
            return ()

        def on_timer(self, key, tag, fire_ts, states, timers):
            yield (key, "fired", states["n"].read())

    # key a: set then clear -> never fires; key b: set -> fires
    pc = p.create_kv(
        [("a", "set"), ("a", "clear"), ("b", "set")],
        key_type="string",
        value_type="string",
        timestamp_fn=lambda kv: {"set": 0, "clear": 1}[kv[1]],
    )
    run_stateful_batch(pc, ClearFn()).assert_that([("b", "fired", 1)])


def test_dynamic_timer_tags(p):
    # ray_runner_test.py:577-602: per-tag timers, each fires independently
    class DynFn(StatefulDoFn):
        def process(self, key, value, timestamp, states, timers):
            timers.set(f"tag-{value}", timestamp + value)
            return ()

        def on_timer(self, key, tag, fire_ts, states, timers):
            yield (key, tag, fire_ts)

    pc = p.create_kv(
        [("k", 10), ("k", 100)], key_type="string", value_type="bigint",
        timestamp_fn=lambda kv: 0.0,
    )
    run_stateful_batch(pc, DynFn()).assert_that(
        [("k", "tag-10", 10.0), ("k", "tag-100", 100.0)]
    )


def test_timer_sets_timer(p):
    # timers may chain (runner re-injects fired timers: ray_fn_runner.py:268-297)
    class ChainFn(StatefulDoFn):
        def create_states(self):
            return {"n": CombiningState(lambda a, b: a + b, 0)}

        def process(self, key, value, timestamp, states, timers):
            timers.set("chain", timestamp + 1)
            return ()

        def on_timer(self, key, tag, fire_ts, states, timers):
            states["n"].add(1)
            n = states["n"].read()
            yield (key, n)
            if n < 3:
                timers.set("chain", fire_ts + 1)

    pc = p.create_kv([("k", 0)], key_type="string", value_type="bigint")
    run_stateful_batch(pc, ChainFn()).assert_that([("k", 1), ("k", 2), ("k", 3)])


def test_buffered_batching(p):
    # ray_runner_test.py:508-575: bag-state buffer flushed every 3 elements
    class Batcher(StatefulDoFn):
        def create_states(self):
            return {"bag": BagState()}

        def process(self, key, value, timestamp, states, timers):
            states["bag"].add(value)
            if len(states["bag"].read()) >= 3:
                batch = states["bag"].read()
                states["bag"].clear()
                yield (key, batch)
            timers.set("flush", 1e9)

        def on_timer(self, key, tag, fire_ts, states, timers):
            rest = states["bag"].read()
            states["bag"].clear()
            if rest:
                yield (key, rest)

    letters = list("abcdefgh")
    pc = p.create_kv(
        [("key", c) for c in letters],
        key_type="string",
        value_type="string",
        timestamp_fn=lambda kv: letters.index(kv[1]),
    )
    run_stateful_batch(pc, Batcher()).assert_that(
        [("key", ["a", "b", "c"]), ("key", ["d", "e", "f"]), ("key", ["g", "h"])]
    )
