"""Event-analytics queries (funnel, cohort retention) and deterministic
dataset splitting — the complaint-analytics capability the reference's
star schema exists for (README.md:5-7) plus the training-data split a
100 TB pipeline needs. All full-oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from core_telecoms_etl_spark.operators.sampling import dataset_split
from core_telecoms_etl_spark.queries import query
from core_telecoms_etl_spark.sources.readers import load_table


@query(
    "funnel",
    oracle="""WITH s AS (
                SELECT user_id, min(ts) AS t1 FROM events
                WHERE event_type = 'signup' GROUP BY user_id),
              c AS (
                SELECT e.user_id, min(e.ts) AS t2
                FROM events e JOIN s ON e.user_id = s.user_id
                WHERE e.event_type = 'click' AND e.ts > s.t1
                GROUP BY e.user_id),
              p AS (
                SELECT e.user_id, min(e.ts) AS t3
                FROM events e JOIN c ON e.user_id = c.user_id
                WHERE e.event_type = 'purchase' AND e.ts > c.t2
                GROUP BY e.user_id)
              SELECT (SELECT count(*) FROM s) AS n_signup,
                     (SELECT count(*) FROM c) AS n_signup_click,
                     (SELECT count(*) FROM p) AS n_signup_click_purchase""",
)
def funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-stage funnel (signup -> click -> purchase) in ONE
    shuffle: per-user sorted event fold through the stage chain
    (operators/funnel.py) instead of one join per stage."""
    from core_telecoms_etl_spark.operators.funnel import funnel_counts

    ev = load_table(spark, sf_dir, "events")
    return funnel_counts(ev, ["signup", "click", "purchase"]).select(
        F.col("n_signup"),
        F.col("n_signup_click"),
        F.col("n_signup_click_purchase"),
    )


@query(
    "cohort_retention",
    oracle="""WITH first AS (
                SELECT user_id,
                       CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
                FROM events GROUP BY user_id),
              act AS (
                SELECT DISTINCT e.user_id,
                       CAST(date_trunc('week', e.ts) AS DATE) AS wk
                FROM events e)
              SELECT f.cohort,
                     CAST(date_diff('day', f.cohort, a.wk) // 7 AS BIGINT)
                       AS week_offset,
                     CAST(count(DISTINCT a.user_id) AS BIGINT)
                       AS n_active_users
              FROM first f JOIN act a ON f.user_id = a.user_id
              GROUP BY f.cohort, week_offset""",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week, counted
    in each subsequent active week. Week offsets are exact because both
    engines Monday-truncate then integer-divide the day gap."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort")
    )
    act = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("wk")
    ).distinct()
    return (
        first.join(act, "user_id")
        .select(
            "cohort",
            (F.datediff("wk", "cohort") / 7)
            .cast("long")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active_users"))
    )


@query(
    "dataset_split",
    oracle="""SELECT CASE
                WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                          AS BIGINT) % 1000000 < 800000 THEN 'train'
                WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                          AS BIGINT) % 1000000 < 900000 THEN 'val'
                ELSE 'test' END AS split,
                count(*) AS n_docs
              FROM documents GROUP BY 1""",
)
def dataset_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (md5-bucket, salt-able):
    the same doc lands in the same split on every run, engine, and
    cluster size — unlike seeded RNG sampling. Oracle runs the identical
    hash arithmetic in SQL."""
    d = dataset_split(
        load_table(spark, sf_dir, "documents"), "doc_id"
    )
    return d.groupBy("split").agg(F.count("*").alias("n_docs"))
