"""Fuzzy edit-distance join tests: differential completeness vs the
all-pairs levenshtein ground truth (including the short-string band the
pigeonhole argument cannot cover), two-relation join, plan shape, and
the hot-key cap's conservative (subset) contract."""

import random

import pytest
from pyspark.sql import functions as F

from ray_beam_runner_spark.functions.fuzzy import edit_distance_pairs, fuzzy_join


def _corpus(spark, n=120, alpha="abc", max_len=10, seed=7):
    random.seed(seed)
    # Adversarial short strip first: everything the segment path can't index.
    strs = ["", "a", "b", "ab", "ba", "abc", "aabb", "abab"]
    strs += [
        "".join(random.choice(alpha) for _ in range(random.randint(0, max_len)))
        for _ in range(n)
    ]
    return spark.createDataFrame(list(enumerate(strs)), "id int, s string")


def _brute_pairs(df, d, min_d=1):
    a, b = df.alias("a"), df.alias("b")
    return set(
        map(
            tuple,
            a.join(b, F.col("a.id") < F.col("b.id"))
            .select("a.id", "b.id", F.levenshtein("a.s", "b.s").alias("dist"))
            .filter((F.col("dist") >= min_d) & (F.col("dist") <= d))
            .collect(),
        )
    )


@pytest.mark.parametrize("d", [1, 2, 3])
def test_edit_distance_pairs_equals_brute_force(spark, d):
    df = _corpus(spark)
    got = set(map(tuple, edit_distance_pairs(df, "id", "s", d).collect()))
    assert got == _brute_pairs(df, d)


def test_edit_distance_min_dist_zero_includes_exact_dups(spark):
    df = spark.createDataFrame(
        [(0, "same"), (1, "same"), (2, "sane"), (3, "x")], "id int, s string"
    )
    got = set(
        map(tuple, edit_distance_pairs(df, "id", "s", max_dist=1, min_dist=0).collect())
    )
    assert got == {(0, 1, 0), (0, 2, 1), (1, 2, 1)}


def test_fuzzy_join_two_relations(spark):
    df = _corpus(spark)
    strs = [r.s for r in df.orderBy("id").collect()]
    l = spark.createDataFrame(list(enumerate(strs[:60])), "lk int, ls string")
    r = spark.createDataFrame(list(enumerate(strs[60:])), "rk int, rs string")
    got = set(
        map(tuple, fuzzy_join(l, r, "ls", "rs", 2).select("lk", "rk", "dist").collect())
    )
    want = set(
        map(
            tuple,
            l.join(r, F.levenshtein("ls", "rs") <= 2)
            .select("lk", "rk", F.levenshtein("ls", "rs").alias("dist"))
            .collect(),
        )
    )
    assert got == want
    # all left/right payload columns survive the join
    assert set(fuzzy_join(l, r, "ls", "rs", 1).columns) == {"lk", "ls", "rk", "rs", "dist"}


def test_fuzzy_no_cartesian_plan(spark):
    from ray_beam_runner_spark.plans.explain import formatted_plan

    df = _corpus(spark, n=20)
    plan = formatted_plan(edit_distance_pairs(df, "id", "s", 3))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, (
        plan[:3000]
    )


def test_hot_key_cap_returns_subset(spark):
    df = _corpus(spark)
    exact = set(map(tuple, edit_distance_pairs(df, "id", "s", 2).collect()))
    capped = set(
        map(tuple, edit_distance_pairs(df, "id", "s", 2, max_key_freq=5).collect())
    )
    assert capped <= exact  # bounded recall, never false pairs
    # every surviving pair is a true pair at the right distance
    for _, _, dist in capped:
        assert 1 <= dist <= 2


def test_fuzzy_join_rejects_column_collisions(spark):
    """Regression (round-10 advisor): the join-back preserves all
    columns of both inputs — a shared name (or a pre-existing 'dist')
    must be rejected loudly, not emitted as an ambiguous duplicate."""
    import pytest

    from ray_beam_runner_spark.functions.fuzzy import fuzzy_join

    a = spark.createDataFrame([(1, "abc")], "doc_id int, s string")
    b = spark.createDataFrame([(2, "abd")], "doc_id int, t string")
    with pytest.raises(ValueError, match="share column"):
        fuzzy_join(a, b, "s", "t", max_dist=1)
    c = spark.createDataFrame([(2, "abd", 0)], "other_id int, t string, dist int")
    with pytest.raises(ValueError, match="reserved"):
        fuzzy_join(a.withColumnRenamed("doc_id", "l_id"), c, "s", "t", max_dist=1)
