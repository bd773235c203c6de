"""Extended scalar-function coverage (SURVEY.md §2.6): math, string,
datetime, array, regex, null-handling. The reference implements none of
these — all scalar logic is user Python inside DoFns; Spark's built-in
function library supersedes it wholesale, and each family is oracle-checked
against the DuckDB equivalent (dialect-parity notes inline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ray_beam_runner_spark.queries import query, t


@query(
    "q_scalar_math2",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sqrt(l_quantity), 6)            AS sqrt_qty,
           round(ln(l_extendedprice), 6)         AS ln_price,
           round(exp(l_discount), 6)             AS exp_disc,
           round(log10(l_extendedprice), 6)      AS log10_price,
           round(pow(l_tax, 2.0), 6)             AS tax_sq,
           mod(l_orderkey, 7)                    AS key_mod,
           CAST(sign(l_quantity - 25) AS INT)    AS qty_sign
    FROM lineitem WHERE l_linenumber = 1
    """,
)
def q_scalar_math2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions (sqrt/ln/exp/log10/pow/mod/sign). sign: Spark signum
    returns DOUBLE, DuckDB INTEGER — both cast to INT."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
        F.round(F.log10("l_extendedprice"), 6).alias("log10_price"),
        F.round(F.pow("l_tax", F.lit(2.0)), 6).alias("tax_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.signum(F.col("l_quantity") - 25).cast("int").alias("qty_sign"),
    )


@query(
    "q_scalar_string2",
    oracle="""
    SELECT s_suppkey,
           lpad(s_name, 25, '*')                 AS padded,
           trim(s_name)                          AS trimmed,
           reverse(s_name)                       AS rev,
           repeat(left(s_name, 2), 3)            AS rep,
           split_part(s_name, '#', 1)            AS name_head,
           strpos(s_name, 'r')                   AS r_pos,
           translate(s_name, 'aeiou', 'AEIOU')   AS vowels_up,
           right(s_name, 3)                      AS tail
    FROM supplier
    """,
)
def q_scalar_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions (pad/trim/reverse/repeat/split_part/instr/
    translate/left/right). Spark instr == DuckDB strpos (1-based, 0 when
    absent)."""
    s = t(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.lpad("s_name", 25, "*").alias("padded"),
        F.trim("s_name").alias("trimmed"),
        F.reverse("s_name").alias("rev"),
        F.repeat(F.expr("left(s_name, 2)"), 3).alias("rep"),
        F.split_part(F.col("s_name"), F.lit("#"), F.lit(1)).alias("name_head"),
        F.instr("s_name", "r").cast("long").alias("r_pos"),
        F.translate("s_name", "aeiou", "AEIOU").alias("vowels_up"),
        F.expr("right(s_name, 3)").alias("tail"),
    )


@query(
    "q_scalar_datetime2",
    oracle="""
    SELECT o_orderkey,
           date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since,
           strftime(last_day(o_orderdate), '%Y-%m-%d')           AS month_end,
           isodow(o_orderdate) - 1                               AS weekday_mon0,
           quarter(o_orderdate)                                  AS q,
           week(o_orderdate)                                     AS iso_week,
           epoch(o_orderdate)::BIGINT                            AS epoch_s
    FROM orders
    """,
)
def q_scalar_datetime2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime functions. Dialect notes: Spark weekday() is 0=Monday ==
    DuckDB isodow-1; Spark weekofyear == DuckDB week (both ISO); Spark
    unix_timestamp == DuckDB epoch (UTC session)."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).cast("long").alias("days_since"),
        # string form: Spark DATE vs DuckDB->pandas datetime64 render
        # differently after canonicalization
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.weekday("o_orderdate").cast("long").alias("weekday_mon0"),
        F.quarter("o_orderdate").cast("long").alias("q"),
        F.weekofyear("o_orderdate").cast("long").alias("iso_week"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@query(
    "q_array_funcs",
    oracle="""
    SELECT vec_id,
           len(embedding)                                          AS dim,
           round(embedding[1]::DOUBLE, 6)                          AS first_val,
           round(list_max(embedding)::DOUBLE, 6)                   AS max_val,
           round(list_min(embedding)::DOUBLE, 6)                   AS min_val,
           array_to_string(list_slice(
             list_transform(list_sort(list_transform(embedding, x -> round(x::DOUBLE, 4))),
                            x -> x::VARCHAR), 1, 3), ',')          AS low3,
           list_contains(list_transform(embedding, x -> x > 0), true) AS has_positive
    FROM embeddings
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions (size/element_at/array_max/min/sort/slice/transform/
    contains). Array-valued outputs serialize via array_to_string so the
    comparison is format-independent; floats rounded before sorting so the
    order itself is reproducible."""
    e = t(spark, sf_dir, "embeddings")
    rounded = F.transform(F.col("embedding"), lambda x: F.round(x.cast("double"), 4))
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_val"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("min_val"),
        F.concat_ws(
            ",", F.slice(F.transform(F.sort_array(rounded), lambda x: x.cast("string")), 1, 3)
        ).alias("low3"),
        F.array_contains(F.transform(F.col("embedding"), lambda x: x > 0), True).alias(
            "has_positive"
        ),
    )


@query(
    "q_regex_funcs",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)', 1)                   AS first_word,
           len(regexp_extract_all(text, '[0-9]+'))               AS n_numbers,
           regexp_matches(text, 'join|merge')                    AS mentions_join,
           left(regexp_replace(text, '\\s+', '_', 'g'), 40)      AS slug40
    FROM documents
    """,
)
def q_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex functions over the shared Java/RE2-compatible subset."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), F.lit(0))).cast("long").alias("n_numbers"),
        F.col("text").rlike("join|merge").alias("mentions_join"),
        F.expr("left(regexp_replace(text, '\\\\s+', '_'), 40)").alias("slug40"),
    )


@query(
    "q_null_handling",
    oracle="""
    SELECT o_orderstatus,
           count(*)                                              AS n,
           count(nullif(o_orderpriority, '3-MEDIUM'))            AS n_non_medium,
           sum(CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END)::BIGINT AS n_large,
           coalesce(min(nullif(o_orderpriority, '1-URGENT')), 'ALL-URGENT') AS min_non_urgent
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics: nullif/coalesce interplay with aggregates (count
    skips nulls; min over all-null group yields null → coalesce)."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM"))).alias("n_non_medium"),
        F.sum(F.when(F.col("o_totalprice") > 300000, 1).otherwise(0)).alias("n_large"),
        F.coalesce(
            F.min(F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT"))), F.lit("ALL-URGENT")
        ).alias("min_non_urgent"),
    )
