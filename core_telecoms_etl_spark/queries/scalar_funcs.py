"""Scalar-function queries (SURVEY.md §2.8 F1–F9, §2.11).

All hot-path expressions are built-in `pyspark.sql.functions` (JVM-side,
inside whole-stage codegen). The one deliberate exception is
`pandas_udf_scalar`, which demonstrates the sanctioned slow-path pattern:
Arrow-batched vectorized UDF, never row-at-a-time Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from core_telecoms_etl_spark.queries import (  # noqa: E501
    query,
    metric_events,
    with_finite_events,
)
from core_telecoms_etl_spark.sources.readers import load_table


@query(
    "string_funcs",
    oracle="""SELECT c_custkey,
                     trim('  ' || c_name || '  ')                  AS trimmed,
                     ltrim('  ' || c_name)                         AS lefttrimmed,
                     upper(c_name)                                 AS name_upper,
                     lower(c_mktsegment)                           AS segment_lower,
                     CASE WHEN c_name IS NOT NULL
                          THEN split_part(c_name, '#', 2)
                     END                                           AS name_num,
                     CAST(length(c_name) AS BIGINT)                AS name_len,
                     substr(c_name, 1, 8)                          AS name_prefix,
                     regexp_replace(c_mktsegment, '[AEIOU]', '', 'g') AS seg_consonants,
                     c_mktsegment || '-' || CAST(c_nationkey AS VARCHAR) AS seg_nation
              FROM customer""",
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1–F4 in one projection — trim (ref: per-column strip lambda,
    plugins/transform.py:104-107, replaced by codegen'd F.trim), case
    conversion (ref: identifier upper-casing, plugins/snowflake_load.py:
    152-154), split/substring/regexp/concat (ref: key rsplit + basename
    rewrites, plugins/s3_copy.py:97, plugins/transform.py:159). One scan,
    one codegen stage.

    NULL mirror (r14, NULL-name corpus): DuckDB's split_part is
    NULL-SWALLOWING — split_part(NULL, '#', 2) = '' (same as its
    out-of-bounds convention) where Spark's propagates NULL; the
    oracle's CASE pins Spark's NULL-in→NULL-out, the saner contract.
    Every other function here propagates identically on both
    engines."""
    c = load_table(spark, sf_dir, "customer")
    padded = F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))
    return c.select(
        "c_custkey",
        F.trim(padded).alias("trimmed"),
        F.ltrim(F.concat(F.lit("  "), F.col("c_name"))).alias("lefttrimmed"),
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("segment_lower"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_num"),
        F.length("c_name").cast("long").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.regexp_replace("c_mktsegment", "[AEIOU]", "").alias("seg_consonants"),
        # F.concat, not concat_ws: '||' propagates NULL in the oracle
        # while concat_ws silently SKIPS null parts ('12' vs NULL under
        # r8 NULL injection) — concat matches the SQL operator exactly
        F.concat(
            F.col("c_mktsegment"),
            F.lit("-"),
            F.col("c_nationkey").cast("string"),
        ).alias("seg_nation"),
    )


@query(
    "date_funcs",
    oracle="""SELECT o_orderkey,
                     CAST(o_orderdate AS DATE)                   AS order_date,
                     CAST(year(o_orderdate) AS BIGINT)           AS order_year,
                     CAST(month(o_orderdate) AS BIGINT)          AS order_month,
                     date_trunc('month', o_orderdate)            AS month_start,
                     CAST(o_orderdate AS DATE) + 30              AS plus_30d,
                     CAST(date_diff('day', CAST(o_orderdate AS DATE),
                                    DATE '1999-01-01') AS BIGINT) AS days_to_1999
              FROM orders""",
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 — typed date handling. The ref stores all dates as VARCHAR
    (snowflake_load.py:147-154 type collapse); here they are real
    DATE/TIMESTAMP with to_date/date_trunc/datediff arithmetic."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("order_date"),
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.date_add(F.to_date("o_orderdate"), 30).alias("plus_30d"),
        F.datediff(F.lit("1999-01-01").cast("date"), F.to_date("o_orderdate"))
        .cast("long")
        .alias("days_to_1999"),
    )


@query(
    "math_funcs",
    oracle="""SELECT p_partkey,
                     p_retailprice * 1.1                      AS bumped,
                     CAST(floor(p_retailprice) AS BIGINT)     AS floor_price,
                     CAST(ceil(p_retailprice)  AS BIGINT)     AS ceil_price,
                     abs(p_retailprice - 1500.0)              AS dist_from_1500,
                     sqrt(p_retailprice)                      AS sqrt_price,
                     CAST(p_partkey % 7 AS BIGINT)            AS key_mod7
              FROM part""",
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 — arithmetic/rounding. Row-level IEEE ops on identical input
    doubles are bit-deterministic across engines — no rounding needed."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        (F.col("p_retailprice") * 1.1).alias("bumped"),
        F.floor("p_retailprice").cast("long").alias("floor_price"),
        F.ceil("p_retailprice").cast("long").alias("ceil_price"),
        F.abs(F.col("p_retailprice") - 1500.0).alias("dist_from_1500"),
        F.sqrt("p_retailprice").alias("sqrt_price"),
        (F.col("p_partkey") % 7).cast("long").alias("key_mod7"),
    )


@query(
    "json_funcs",
    oracle="""SELECT event_id, event_type,
                     CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
                     CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
                     json_extract_string(props, '$.s') AS s,
                     CAST(json_extract_string(props, '$.f') AS DOUBLE) AS f
              FROM events""",
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 — both JSON surfaces in one projection (ref: record-JSON
    complaint parsing, plugins/s3_copy.py:113-114): path extraction via
    get_json_object (one field, no full parse) AND typed from_json into a
    struct (one parse per row, then struct field access — cheaper than
    repeated get_json_object when several fields are read)."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("k_value"),
        F.from_json("props", "k long, s string, f double").alias("p"),
    )
    return parsed.select(
        "event_id",
        "event_type",
        "k_value",
        F.col("p.k").alias("k"),
        F.col("p.s").alias("s"),
        F.col("p.f").alias("f"),
    )


@query(
    "null_handling",
    oracle="""SELECT coalesce(nullif(l_returnflag, 'N'), 'UNKNOWN') AS flag,
                     count(*) AS n
              FROM lineitem GROUP BY 1""",
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 — NULL normalization (ref: null_if=["NULL",""] load rule,
    aws_infrastructure/snowflake.tf:86, + dropna)."""
    li = load_table(spark, sf_dir, "lineitem")
    flag = F.when(F.col("l_returnflag") == "N", None).otherwise(
        F.col("l_returnflag")
    )
    return (
        li.select(F.coalesce(flag, F.lit("UNKNOWN")).alias("flag"))
        .groupBy("flag")
        .count()
        .withColumnRenamed("count", "n")
    )


@query(
    "array_funcs",
    oracle="""SELECT vec_id,
                     CAST(len(embedding) AS BIGINT) AS n_dims,
                     CAST(embedding[1] AS DOUBLE)   AS first_elem,
                     CASE WHEN embedding IS NULL THEN NULL
                          ELSE round(list_reduce(
                            list_prepend(0.0,
                                         CAST(embedding AS DOUBLE[])),
                            (a, b) -> a + b), 4)
                     END AS vec_sum
              FROM embeddings""",
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 — array ops on the embedding column (size / element access /
    fold), all JVM-side higher-order functions. Pins the per-row array
    NULL contract on the r15 tri-modal corpus: element access via
    F.get (ANSI [0] RAISES on an empty array; get -> NULL matches
    DuckDB's out-of-bounds NULL), and the oracle's sum is the
    list_reduce fold mirror — DuckDB's list_aggregate 'sum' SKIPS NULL
    components and yields NULL on empty lists, both opposite to
    Spark's aggregate fold (NULL component poisons -> NULL; empty ->
    the 0.0 init); the NULL-list CASE exists because DuckDB's
    list_prepend(0.0, NULL) is [0.0], not NULL."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("n_dims"),
        F.get("embedding", 0).cast("double").alias("first_elem"),
        F.round(
            F.aggregate(
                "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double")
            ),
            4,
        ).alias("vec_sum"),
    )


@query(
    "pandas_udf_scalar",
    oracle="""SELECT l_orderkey, l_linenumber,
                     l_extendedprice * (1 - l_discount) AS net_price
              FROM lineitem""",
)
def pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.11 — Arrow-vectorized scalar UDF (the sanctioned slow path; the
    ref's row-wise strip lambda, plugins/transform.py:107, is the anti-
    pattern). Same IEEE ops as the oracle → bit-identical, no rounding."""

    @F.pandas_udf("double")
    def net_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1.0 - discount)

    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        net_price("l_extendedprice", "l_discount").alias("net_price"),
    )


@query(
    "grouped_map_zscore",
    oracle=with_finite_events("""SELECT event_id, user_id, value,
                     round((value - avg(value) OVER w)
                           / stddev_samp(value) OVER w, 4) AS zscore
              FROM events
              WINDOW w AS (PARTITION BY user_id)"""),
)
def grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map pandas UDF (applyInPandas): per-user z-score of event
    values. The UDF path exists to show the full-group-in-pandas shape —
    for THIS computation the window-function plan (the oracle) is what
    you'd ship at 100 TB; applyInPandas earns its cost only when the
    per-group logic can't be expressed relationally. Rounded at 4dp to
    absorb summation-order noise between pandas and SQL aggregation."""
    import pandas as pd

    from core_telecoms_etl_spark.sources.readers import load_table

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        m = pdf["value"].mean()
        s = pdf["value"].std(ddof=1)
        out = pdf[["event_id", "user_id", "value"]].copy()
        out["zscore"] = ((pdf["value"] - m) / s).round(4)
        return out

    return (
        metric_events(spark, sf_dir)
        .select("event_id", "user_id", "value")
        .groupBy("user_id")
        .applyInPandas(
            zscore,
            schema="event_id long, user_id long, value double, zscore double",
        )
    )


@query(
    "string_funcs_extended",
    oracle="""SELECT p_partkey,
                     regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head,
                     lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS padded_key,
                     replace(p_name, ' ', '-') AS hyphenated,
                     left(p_name, 5) AS name_prefix,
                     CAST(instr(p_name, 'a') AS BIGINT) AS first_a,
                     reverse(p_brand) AS brand_rev,
                     repeat(p_brand, 2) AS brand_twice
              FROM part""",
)
def string_funcs_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wider scalar-string surface (regexp_extract / lpad / replace /
    substring / instr / reverse / repeat) — all codegen'd JVM expressions
    with exact ANSI equivalents on the oracle."""
    from core_telecoms_etl_spark.sources.readers import load_table

    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_type", r"^([A-Z]+)", 1).alias("type_head"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias(
            "padded_key"
        ),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("-")).alias(
            "hyphenated"
        ),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.instr("p_name", "a").cast("long").alias("first_a"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat("p_brand", 2).alias("brand_twice"),
    )


