"""Join operators.

The reference has **no dedicated join operator** — joins in the Beam model
are CoGroupByKey (shuffle) or side-input lookups (broadcast); see SURVEY.md
§2.3 and `/root/reference/ray_beam_runner/portability/ray_runner_test.py:163-361`
(side inputs). This module exposes the full Spark join family plus the
time-series joins Spark lacks as built-ins (as-of join, range-bucket join),
implemented shuffle-minimally for 100 TB scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = ["asof_join", "interval_overlap_join", "keyed_join", "range_bucket_join"]


def _epoch_seconds(c: Column, dtype=None) -> Column:
    """Numeric epoch seconds for numeric, TIMESTAMP, or TIMESTAMP_NTZ
    columns. TIMESTAMP_NTZ cannot cast straight to double (Spark 4
    rejects it); for NTZ only, an intermediate TIMESTAMP cast interprets
    the wall time in the session timezone, which cancels out in the
    deltas and bucket ids these joins compute. Every other type casts
    straight to double, so numerics round-trip unchanged (routing them
    through TIMESTAMP would overflow under ANSI at epoch-nanos scale
    and truncate sub-microsecond fractions). Pass ``dtype`` (the
    column's DataType from the frame schema) to get the NTZ routing;
    without it, NTZ input raises Spark's cast error.

    PRECONDITION (enforced by callers via :func:`_check_time_bases`): all
    time columns compared within one join must share a base — all NTZ or
    all TIMESTAMP. The session-timezone interpretation cancels in deltas
    and bucket ids only when BOTH sides route the same way; a mixed
    NTZ-vs-TIMESTAMP pair would compute epochs offset by the tz shift
    and mis-bucket matches."""
    from pyspark.sql.types import TimestampNTZType

    if isinstance(dtype, TimestampNTZType):
        return c.cast("timestamp").cast("double")
    return c.cast("double")


def _check_time_bases(named_types: Sequence[tuple[str, object]], op: str) -> None:
    """Reject a mix of TIMESTAMP_NTZ and TIMESTAMP time columns in one
    join: their epoch bases differ by the session-tz offset, silently
    mis-matching rows. The caller must normalize one side first (e.g.
    ``col.cast('timestamp_ntz')`` when the wall clocks are known to agree)."""
    from pyspark.sql.types import TimestampNTZType, TimestampType

    ntz = [n for n, t in named_types if isinstance(t, TimestampNTZType)]
    tz = [n for n, t in named_types if isinstance(t, TimestampType)]
    if ntz and tz:
        raise ValueError(
            f"{op}: time columns mix TIMESTAMP_NTZ ({ntz}) with TIMESTAMP "
            f"({tz}); their epoch bases differ by the session timezone "
            "offset, which would mis-bucket matches. Cast one side so all "
            "time columns share a type."
        )


def _check_reserved(
    left: DataFrame, right: DataFrame, names: Sequence[str], op: str
) -> None:
    """Loudly reject inputs that already carry one of the operator's
    reserved working-column names — the alternative is a silent
    overwrite followed by a drop that destroys the user's column
    (round-10 advisor finding)."""
    hit = sorted({*names} & ({*left.columns} | {*right.columns}))
    if hit:
        raise ValueError(
            f"{op}: input already has reserved working column(s) {hit}; "
            "rename them before calling (they would be overwritten and "
            "dropped from the output)"
        )


def keyed_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] | Column,
    how: str = "inner",
    broadcast_right: bool | None = None,
) -> DataFrame:
    """Keyed join helper. ``broadcast_right=None`` lets Catalyst/AQE decide
    (autoBroadcastJoinThreshold + runtime stats); force ``True`` for small
    dims the optimizer can't size (e.g. post-filter dimension tables)."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=on, how=how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_time: str,
    right_time: str,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of join: attach to each left row the right row with the greatest
    ``right_time <= left_time`` (direction='backward'; 'forward' = smallest
    ``right_time >= left_time``) within the same key group.

    Implementation: union both sides with a side tag, single window pass
    per key ordered by time filling the last (or next) non-null right
    payload. Exactly ONE shuffle on the key — no O(|L|x|R|) range join, no
    per-key collect. At 100 TB this is the same cost as a sort-merge join
    on the key and is skew-tolerant via AQE.

    Left columns are kept as-is; right payload columns (everything except
    the keys) are appended, null when no match exists (left-outer
    semantics). Right payload column names must not collide with left's.
    """
    on_cols = [on] if isinstance(on, str) else list(on)
    left_payload = [c for c in left.columns if c not in on_cols]
    right_payload = [c for c in right.columns if c not in on_cols]
    collisions = set(left_payload) & set(right_payload)
    if collisions:
        raise ValueError(f"column collision between sides: {sorted(collisions)}")

    right_types = {f.name: f.dataType for f in right.schema.fields}
    left_types = {f.name: f.dataType for f in left.schema.fields}

    # Tag and align both sides to one schema; right rows carry null left
    # payload and vice versa.
    l = left.select(
        *on_cols,
        *left_payload,
        *[F.lit(None).cast(right_types[c]).alias(c) for c in right_payload],
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
    )
    r = right.select(
        *on_cols,
        *[F.lit(None).cast(left_types[c]).alias(c) for c in left_payload],
        *right_payload,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
    )
    u = l.unionByName(r)

    if direction == "backward":
        # Right rows sort before left rows at equal time → "at or before".
        order = [F.col("__t").asc(), F.col("__is_left").asc()]
        frame = (W.unboundedPreceding, W.currentRow)
    elif direction == "forward":
        order = [F.col("__t").desc(), F.col("__is_left").asc()]
        frame = (W.unboundedPreceding, W.currentRow)
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    w = W.partitionBy(*on_cols).orderBy(*order).rowsBetween(*frame)
    matched_t = F.last(F.when(F.col("__is_left") == 0, F.col("__t")), ignorenulls=True).over(w)
    filled = u.select(
        *on_cols,
        *left_payload,
        "__is_left",
        matched_t.alias("__matched_t"),
        *[F.last(F.when(F.col("__is_left") == 0, F.col(c)), ignorenulls=True).over(w).alias(c)
          for c in right_payload],
    ).filter(F.col("__is_left") == 1)

    if tolerance_seconds is not None:
        left_time_type = left.schema[left_time].dataType
        right_time_type = right.schema[right_time].dataType
        _check_time_bases(
            [(left_time, left_time_type), (right_time, right_time_type)],
            "asof_join",
        )
        delta = F.abs(
            _epoch_seconds(F.col(left_time), left_time_type)
            - _epoch_seconds(F.col("__matched_t"), right_time_type)
        )
        within = delta <= F.lit(float(tolerance_seconds))
        filled = filled.select(
            *on_cols,
            *left_payload,
            *[F.when(within, F.col(c)).alias(c) for c in right_payload],
        )
    else:
        filled = filled.select(*on_cols, *left_payload, *right_payload)
    return filled


def range_bucket_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int,
    extra_on: Sequence[str] = (),
) -> DataFrame:
    """Interval join (left.point in [right.start, right.end)) without a
    nested-loop: both sides are exploded to coarse time buckets and
    equi-joined on the bucket (+ optional extra keys), then the exact range
    predicate filters. Turns an O(|L|x|R|) BroadcastNestedLoopJoin into a
    shuffle hash join whose fan-out is bounded by interval/bucket ratio."""
    lp_t = left.schema[left_point].dataType
    rs_t = right.schema[right_start].dataType
    re_t = right.schema[right_end].dataType
    _check_time_bases(
        [(left_point, lp_t), (right_start, rs_t), (right_end, re_t)],
        "range_bucket_join",
    )
    _check_reserved(left, right, ("_rbj_bucket", "_rbj_buckets"), "range_bucket_join")
    lb = left.withColumn(
        "_rbj_bucket", F.floor(_epoch_seconds(F.col(left_point), lp_t) / bucket_seconds).cast("long")
    )
    rb = right.withColumn(
        "_rbj_buckets",
        F.sequence(
            F.floor(_epoch_seconds(F.col(right_start), rs_t) / bucket_seconds).cast("long"),
            F.floor(_epoch_seconds(F.col(right_end), re_t) / bucket_seconds).cast("long"),
        ),
    ).withColumn("_rbj_bucket", F.explode("_rbj_buckets")).drop("_rbj_buckets")
    joined = lb.join(rb, [*extra_on, "_rbj_bucket"]).drop("_rbj_bucket")
    return joined.filter(
        (F.col(left_point) >= F.col(right_start)) & (F.col(left_point) < F.col(right_end))
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int,
    extra_on: Sequence[str] = (),
) -> DataFrame:
    """Interval x interval OVERLAP join: every (left, right) pair whose
    half-open ranges intersect (l.start < r.end AND r.start < l.end) —
    concurrent sessions, conflicting reservations, co-occurring
    incidents. Both sides explode their interval's coarse time buckets
    and equi-join on the bucket (+ optional extra keys), so the plan is
    a shuffle hash join with fan-out bounded by interval/bucket ratio,
    never a BroadcastNestedLoopJoin.

    A pair whose intervals share several buckets would match once per
    shared bucket; instead of a post-join ``distinct`` (a second
    shuffle over the full result), each pair is emitted ONLY in its
    first shared bucket — the bucket of ``greatest(l.start, r.start)``,
    which both sides provably cover whenever the intervals overlap.
    One equality predicate, zero extra shuffles, exactly-once pairs.

    Zero-length intervals [x, x) are treated as instants (they match
    ranges strictly containing x), matching the half-open point
    semantics of :func:`range_bucket_join`."""
    ls_t = left.schema[left_start].dataType
    le_t = left.schema[left_end].dataType
    rs_t = right.schema[right_start].dataType
    re_t = right.schema[right_end].dataType
    _check_time_bases(
        [(left_start, ls_t), (left_end, le_t), (right_start, rs_t), (right_end, re_t)],
        "interval_overlap_join",
    )

    _check_reserved(left, right, ("_ivj_bucket",), "interval_overlap_join")

    def buckets(s: Column, s_t, e: Column, e_t) -> Column:
        return F.sequence(
            F.floor(_epoch_seconds(s, s_t) / bucket_seconds).cast("long"),
            F.floor(_epoch_seconds(e, e_t) / bucket_seconds).cast("long"),
        )

    lb = left.withColumn(
        "_ivj_bucket",
        F.explode(buckets(F.col(left_start), ls_t, F.col(left_end), le_t)),
    )
    rb = right.withColumn(
        "_ivj_bucket",
        F.explode(buckets(F.col(right_start), rs_t, F.col(right_end), re_t)),
    )
    joined = lb.join(rb, [*extra_on, "_ivj_bucket"])
    anchor = F.greatest(
        _epoch_seconds(F.col(left_start), ls_t), _epoch_seconds(F.col(right_start), rs_t)
    )
    return joined.filter(
        (F.col(left_start) < F.col(right_end))
        & (F.col(right_start) < F.col(left_end))
        & (F.col("_ivj_bucket") == F.floor(anchor / bucket_seconds).cast("long"))
    ).drop("_ivj_bucket")
