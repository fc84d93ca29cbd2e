"""Data-quality queries (SURVEY.md §2.12) — the dbt schema tests
(Q1/Q2: not_null / unique on business keys, dbt facts/schema.yml:7-26,
dimensions/schema.yml:5-9) as DataFrame aggregations returning violation
counts, executed against the driver tables in the same fact/dim roles
(orders/lineitem as facts, customer as dim), plus the r6 audit
extensions (Q3–Q6): referential-integrity orphan counts, day-grid
completeness gaps, the Benford first-digit screen, and MAD robust
outliers — the checks a production lake runs beyond dbt's schema tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from core_telecoms_etl_spark.queries import (  # noqa: E501
    query,
    metric_events,
    with_finite_events,
)
from core_telecoms_etl_spark.sources.readers import load_table, load_tables


@query(
    "dq_suite",
    oracle="""SELECT 'not_null' AS check_type, 'orders.' || col AS target,
                     v AS violations, v = 0 AS passed
              FROM (
                SELECT unnest(['o_orderkey', 'o_custkey', 'o_totalprice']) AS col,
                       unnest([
                         CAST(coalesce(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT),
                         CAST(coalesce(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT),
                         CAST(coalesce(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT)
                       ]) AS v
                FROM orders)
              UNION ALL
              SELECT 'unique', 'orders.o_orderkey',
                     CAST(coalesce(sum(c - 1), 0) AS BIGINT),
                     coalesce(sum(c - 1), 0) = 0
              FROM (SELECT count(*) AS c FROM orders
                    GROUP BY o_orderkey HAVING count(*) > 1)
              UNION ALL
              SELECT 'unique', 'lineitem.l_orderkey+l_linenumber',
                     CAST(coalesce(sum(c - 1), 0) AS BIGINT),
                     coalesce(sum(c - 1), 0) = 0
              FROM (SELECT count(*) AS c FROM lineitem
                    GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)
              UNION ALL
              SELECT 'accepted_values', 'orders.o_orderstatus',
                     CAST(count(*) FILTER (
                       o_orderstatus NOT IN ('O', 'F', 'P')) AS BIGINT),
                     count(*) FILTER (o_orderstatus NOT IN ('O', 'F', 'P')) = 0
              FROM orders""",
)
def dq_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1+Q2 — the dbt schema-test suite as ONE relation of
    (check_type, target, violations, passed):

    - not_null on three orders columns, fused into a single table scan
      (vs one compiled query per dbt test), unpivoted via stack();
    - unique on a single key (orders.o_orderkey) and a composite key
      (lineitem.l_orderkey+l_linenumber) — excess-duplicate-row counts,
      one partial-agg'd hash aggregate per key;
    - accepted_values on orders.o_orderstatus — domain violations in the
      same scan-and-aggregate shape.

    Per-branch scans stay independent so each check still pushes its own
    column pruning to parquet; the union is a plan concat, not a shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    # not_null: one scan, all columns aggregated at once, then unpivot
    nn_cols = ["o_orderkey", "o_custkey", "o_totalprice"]
    nn_counts = orders.agg(
        *[
            # coalesce: empty batch = 0 violations, checks PASS (r8
            # empty-facts differential); oracle mirrors
            F.coalesce(
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)), F.lit(0)
            )
            .cast("long")
            .alias(c)
            for c in nn_cols
        ]
    )
    stack_expr = ", ".join(f"'orders.{c}', {c}" for c in nn_cols)
    not_null = nn_counts.selectExpr(
        f"stack({len(nn_cols)}, {stack_expr}) as (target, violations)"
    ).select(
        F.lit("not_null").alias("check_type"),
        "target",
        "violations",
        (F.col("violations") == 0).alias("passed"),
    )

    def dup_count(df: DataFrame, key_name: str, *cols: str) -> DataFrame:
        excess = F.coalesce(F.sum(F.col("count") - 1), F.lit(0)).cast("long")
        return (
            df.groupBy(*cols)
            .count()
            .filter(F.col("count") > 1)
            .agg(
                F.lit("unique").alias("check_type"),
                F.lit(key_name).alias("target"),
                excess.alias("violations"),
                (excess == 0).alias("passed"),
            )
            .select("check_type", "target", "violations", "passed")
        )

    uniq = dup_count(orders, "orders.o_orderkey", "o_orderkey").unionByName(
        dup_count(
            lineitem,
            "lineitem.l_orderkey+l_linenumber",
            "l_orderkey",
            "l_linenumber",
        )
    )

    av_viol = F.coalesce(
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(
                0
            )
        ),
        F.lit(0),
    ).cast("long")
    accepted = orders.agg(
        F.lit("accepted_values").alias("check_type"),
        F.lit("orders.o_orderstatus").alias("target"),
        av_viol.alias("violations"),
        (av_viol == 0).alias("passed"),
    )

    return not_null.unionByName(uniq).unionByName(accepted)


@query(
    "profile_table",
    oracle="""WITH base AS (SELECT * FROM lineitem)
              SELECT 'l_quantity' AS "column", count(*) AS n_rows,
                     count(*) - count(l_quantity) AS n_nulls,
                     count(DISTINCT l_quantity) AS n_distinct,
                     CAST(min(l_quantity) AS DOUBLE) AS min_num,
                     CAST(max(l_quantity) AS DOUBLE) AS max_num,
                     CAST(NULL AS VARCHAR) AS min_str,
                     CAST(NULL AS VARCHAR) AS max_str
              FROM base
              UNION ALL
              SELECT 'l_extendedprice', count(*),
                     count(*) - count(l_extendedprice),
                     count(DISTINCT l_extendedprice),
                     CAST(min(l_extendedprice) AS DOUBLE),
                     CAST(max(l_extendedprice) AS DOUBLE), NULL, NULL
              FROM base
              UNION ALL
              SELECT 'l_orderkey', count(*),
                     count(*) - count(l_orderkey),
                     count(DISTINCT l_orderkey),
                     CAST(min(l_orderkey) AS DOUBLE),
                     CAST(max(l_orderkey) AS DOUBLE), NULL, NULL
              FROM base
              UNION ALL
              SELECT 'l_returnflag', count(*),
                     count(*) - count(l_returnflag),
                     count(DISTINCT l_returnflag), NULL, NULL,
                     min(l_returnflag), max(l_returnflag)
              FROM base
              UNION ALL
              SELECT 'l_linestatus', count(*),
                     count(*) - count(l_linestatus),
                     count(DISTINCT l_linestatus), NULL, NULL,
                     min(l_linestatus), max(l_linestatus)
              FROM base""",
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ/dbt-profile-style per-column statistics (operators/dq.py
    profile_columns): null counts, exact distinct counts, typed extrema
    for five lineitem columns — one hash-aggregated Expand pass plus a
    sort-free 2-column string-extrema pass broadcast back (see the
    operator docstring for why string min/max must not ride the Expand
    aggregate; the oracle's five UNION ALL scans compute the same
    relation)."""
    from core_telecoms_etl_spark.operators.dq import profile_columns

    return profile_columns(
        load_table(spark, sf_dir, "lineitem"),
        numeric_cols=("l_quantity", "l_extendedprice", "l_orderkey"),
        string_cols=("l_returnflag", "l_linestatus"),
    )


@query(
    "referential_integrity",
    oracle="""SELECT 'lineitem->orders' AS relationship,
                     CAST((SELECT count(*) FROM lineitem l
                           WHERE NOT EXISTS (
                             SELECT 1 FROM orders o
                             WHERE o.o_orderkey = l.l_orderkey))
                          AS BIGINT) AS n_orphans
              UNION ALL
              SELECT 'orders->customer',
                     CAST((SELECT count(*) FROM orders o
                           WHERE NOT EXISTS (
                             SELECT 1 FROM customer c
                             WHERE c.c_custkey = o.o_custkey))
                          AS BIGINT)
              UNION ALL
              SELECT 'customer->nation',
                     CAST((SELECT count(*) FROM customer c
                           WHERE NOT EXISTS (
                             SELECT 1 FROM nation n
                             WHERE n.n_nationkey = c.c_nationkey))
                          AS BIGINT)""",
)
def referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key orphan audit across the star schema (the dbt
    relationship test the reference's schema.yml stops short of):
    per-edge anti-join counts, small side broadcast (orders' key set
    for lineitem at scale would use the shuffle path — AQE decides;
    customer/nation are genuine broadcasts). Three independent
    1-row aggregates unioned — each edge prunes to its two key
    columns at the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")

    def orphans(name, child, ckey, parent, pkey):
        return (
            child.select(ckey)
            .join(
                parent.select(pkey),
                F.col(ckey) == F.col(pkey),
                "left_anti",
            )
            .agg(
                F.lit(name).alias("relationship"),
                F.count("*").cast("long").alias("n_orphans"),
            )
        )

    return (
        orphans("lineitem->orders", li, "l_orderkey", o, "o_orderkey")
        .unionByName(
            orphans("orders->customer", o, "o_custkey", c, "c_custkey")
        )
        .unionByName(
            orphans("customer->nation", c, "c_nationkey", n, "n_nationkey")
        )
    )


@query(
    "completeness_gaps",
    oracle="""WITH b AS (
                SELECT CAST(date_trunc('day', min(ts)) AS DATE) AS d0,
                       CAST(date_trunc('day', max(ts)) AS DATE) AS d1
                FROM events),
              grid AS (
                SELECT unnest(generate_series(d0, d1,
                              INTERVAL 1 DAY))::DATE AS day
                FROM b),
              daily AS (
                SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                       CAST(count(*) AS BIGINT) AS n
                FROM events GROUP BY 1)
              SELECT g.day, coalesce(d.n, 0) AS n_events,
                     CAST(coalesce(d.n, 0) = 0 AS BIGINT) AS is_gap
              FROM grid g LEFT JOIN daily d ON g.day = d.day""",
)
def completeness_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-completeness audit: the full [first, last] day grid
    (sequence+explode from a 1-row min/max aggregate — bounded by the
    span, never a calendar table join) left-joined to daily counts,
    flagging zero-row days. The freshness/continuity check every
    scheduled pipeline needs; daily counts are map-side combined and
    the day grid is tiny."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("d0"),
        F.date_trunc("day", F.max("ts")).cast("date").alias("d1"),
    )
    grid = b.select(
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("__day")
    ).agg(F.count("*").cast("long").alias("__n"))
    return grid.join(
        daily, F.col("day") == F.col("__day"), "left"
    ).select(
        "day",
        F.coalesce(F.col("__n"), F.lit(0)).cast("long").alias("n_events"),
        (F.coalesce(F.col("__n"), F.lit(0)) == 0)
        .cast("long")
        .alias("is_gap"),
    )


@query(
    "benford_profile",
    oracle="""WITH d AS (
                SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100)
                                         AS BIGINT) AS VARCHAR), 1, 1)
                            AS BIGINT) AS digit
                FROM lineitem),
              c AS (
                SELECT digit, CAST(count(*) AS BIGINT) AS n
                FROM d GROUP BY digit),
              t AS (SELECT sum(n) AS total FROM c)
              SELECT digit, n,
                     CAST(n AS DOUBLE) / total AS p_observed,
                     CASE digit
                       WHEN 1 THEN 0.3010299956639812E0
                       WHEN 2 THEN 0.17609125905568124E0
                       WHEN 3 THEN 0.12493873660829993E0
                       WHEN 4 THEN 0.09691001300805642E0
                       WHEN 5 THEN 0.07918124604762482E0
                       WHEN 6 THEN 0.06694678963061322E0
                       WHEN 7 THEN 0.05799194697768673E0
                       WHEN 8 THEN 0.05115252244738129E0
                       WHEN 9 THEN 0.04575749056067514E0
                     END AS p_benford
              FROM c CROSS JOIN t""",
)
def benford_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit (Benford) profile of the money column —
    the classic fabricated-amounts screen. The digit comes from the
    STRING form of the exact cent-grid BIGINT (first significant
    digit is invariant under the x100 decimal shift; integer-to-string
    is engine-identical, where floor(x/10^floor(log10 x)) would ride
    on libm's last-ulp behavior). Expected Benford shares are literal
    doubles, not engine log10 calls, for the same reason. One scan,
    9-row output, observed share = exact-int division."""
    li = load_table(spark, sf_dir, "lineitem")
    digit = F.substring(
        F.round(F.col("l_extendedprice") * 100)
        .cast("long")
        .cast("string"),
        1,
        1,
    ).cast("long")
    c = li.select(digit.alias("digit")).groupBy("digit").agg(
        F.count("*").cast("long").alias("n")
    )
    t = c.agg(F.sum("n").alias("total"))
    benford = F.create_map(
        *[
            x
            for d, p in [
                (1, 0.3010299956639812),
                (2, 0.17609125905568124),
                (3, 0.12493873660829993),
                (4, 0.09691001300805642),
                (5, 0.07918124604762482),
                (6, 0.06694678963061322),
                (7, 0.05799194697768673),
                (8, 0.05115252244738129),
                (9, 0.04575749056067514),
            ]
            for x in (F.lit(d), F.lit(p))
        ]
    )
    return c.join(F.broadcast(t)).select(
        "digit",
        "n",
        (F.col("n").cast("double") / F.col("total")).alias("p_observed"),
        benford[F.col("digit")].alias("p_benford"),
    )


@query(
    "mad_outliers",
    oracle=with_finite_events("""WITH med AS (
                SELECT event_type,
                       quantile_cont(value, 0.5) AS med
                FROM events GROUP BY event_type),
              dev AS (
                SELECT e.event_type, e.value, m.med,
                       abs(e.value - m.med) AS d
                FROM events e JOIN med m
                  ON e.event_type = m.event_type),
              mad AS (
                SELECT event_type, quantile_cont(d, 0.5) AS mad
                FROM dev GROUP BY event_type)
              SELECT v.event_type,
                     CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(CASE WHEN v.d > 4.4478 * a.mad
                                   THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_outliers,
                     min(v.med) AS med,
                     min(a.mad) AS mad
              FROM dev v JOIN mad a ON v.event_type = a.event_type
              GROUP BY v.event_type"""),
)
def mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier screen per event type: median absolute deviation
    (the estimator a 3-sigma rule can't poison — one huge value moves
    a mean/stddev threshold, not a median one), flagging
    |x − med| > 4.4478·MAD (3σ-equivalent under normality; single
    literal constant so both engines multiply identically). Exact
    interpolated medians via the proven percentile↔quantile_cont
    pairing; two aggregate passes with 1-per-group results broadcast
    back — no window over fact rows, no sort."""
    ev = metric_events(spark, sf_dir)
    med = ev.groupBy(F.col("event_type").alias("__t1")).agg(
        F.percentile("value", 0.5).alias("med")
    )
    dev = ev.join(
        F.broadcast(med), F.col("event_type") == F.col("__t1")
    ).select(
        "event_type",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("d"),
    )
    mad = dev.groupBy(F.col("event_type").alias("__t2")).agg(
        F.percentile("d", 0.5).alias("mad")
    )
    return (
        dev.join(
            F.broadcast(mad), F.col("event_type") == F.col("__t2")
        )
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(
                F.when(
                    F.col("d") > F.lit(4.4478) * F.col("mad"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
            F.min("med").alias("med"),
            F.min("mad").alias("mad"),
        )
    )


@query(
    "iqr_outliers",
    oracle=with_finite_events("""WITH q AS (
                SELECT event_type,
                       quantile_cont(value, 0.25) AS q1,
                       quantile_cont(value, 0.75) AS q3
                FROM events GROUP BY event_type)
              SELECT e.event_type,
                     CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(CASE WHEN e.value
                                     < q.q1 - 1.5 * (q.q3 - q.q1)
                                   THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_low,
                     CAST(sum(CASE WHEN e.value
                                     > q.q3 + 1.5 * (q.q3 - q.q1)
                                   THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_high,
                     min(q.q1) AS q1, min(q.q3) AS q3
              FROM events e JOIN q ON e.event_type = q.event_type
              GROUP BY e.event_type"""),
)
def iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence (IQR) outlier counts per event type — the boxplot
    rule, completing the outlier-screen family (rolling z-score for
    time series, MAD for contaminated groups, IQR for the classic
    report). Exact interpolated quartiles via the proven
    percentile↔quantile_cont pairing; fences mirrored token-for-token
    (q1 − 1.5·(q3−q1)); one aggregate pass broadcast back, no
    fact-row sort."""
    ev = metric_events(spark, sf_dir)
    # one shared percentile buffer per group via the array form (r15
    # optimization round; values bit-identical — same interpolation
    # over the same state)
    q = (
        ev.groupBy(F.col("event_type").alias("__t"))
        .agg(F.percentile("value", [0.25, 0.75]).alias("__q"))
        .select(
            "__t",
            F.col("__q")[0].alias("q1"),
            F.col("__q")[1].alias("q3"),
        )
    )
    iqr = F.col("q3") - F.col("q1")
    lo = F.col("q1") - F.lit(1.5) * iqr
    hi = F.col("q3") + F.lit(1.5) * iqr
    return (
        ev.join(F.broadcast(q), F.col("event_type") == F.col("__t"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.when(F.col("value") < lo, 1).otherwise(0))
            .cast("long")
            .alias("n_low"),
            F.sum(F.when(F.col("value") > hi, 1).otherwise(0))
            .cast("long")
            .alias("n_high"),
            F.min("q1").alias("q1"),
            F.min("q3").alias("q3"),
        )
    )


@query(
    "erasure_cascade",
    oracle="""WITH erase AS (
                SELECT DISTINCT c_custkey FROM customer
                WHERE c_acctbal < 0),
              ord AS (
                SELECT o_orderkey FROM orders
                WHERE o_custkey IN (SELECT c_custkey FROM erase))
              SELECT 'customer' AS entity,
                     CAST(count(*) AS BIGINT) AS n_rows
              FROM customer
              WHERE c_custkey IN (SELECT c_custkey FROM erase)
              UNION ALL
              SELECT 'orders', CAST(count(*) AS BIGINT) FROM ord
              UNION ALL
              SELECT 'lineitem', CAST(count(*) AS BIGINT)
              FROM lineitem
              WHERE l_orderkey IN (SELECT o_orderkey FROM ord)""",
)
def erasure_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure impact report (GDPR Art. 17 / CCPA delete):
    given a subject key set (here: negative-balance customers), count
    every row that a cascading delete would purge across the
    foreign-key chain customer → orders → lineitem — the dry-run
    report a governed lake produces BEFORE rewriting files. Plan:
    the subject key set is distinct-collapsed once and broadcast into
    LEFT SEMI joins down the chain; the derived order-key set feeds
    the lineitem leg as a PLANNER-CHOSEN semi join — it is a constant
    fraction of the orders fact, so forcing a broadcast would ship an
    unbounded key set (and hit Spark's broadcast hard limit) at
    exactly the scale this report exists for. AQE broadcasts it when
    it measures small, shuffles when it doesn't. The ord_keys subtree
    is consumed twice (its count + the lineitem leg) — both are
    column-pruned scans of orders against the broadcast subject set,
    deliberately recomputed rather than pinned in cache. The same
    chain with `left_anti` IS the purge (writers.write_parquet on
    the survivors)."""
    cust, orders, li = load_tables(
        spark, sf_dir, "customer", "orders", "lineitem"
    )
    erase = (
        cust.filter(F.col("c_acctbal") < 0)
        .select("c_custkey")
        .distinct()
    )
    ord_keys = orders.join(
        F.broadcast(erase), orders["o_custkey"] == erase["c_custkey"],
        "left_semi",
    ).select("o_orderkey")
    n_cust = cust.join(
        F.broadcast(erase), "c_custkey", "left_semi"
    ).agg(F.count("*").cast("long").alias("n_rows"))
    n_ord = ord_keys.agg(F.count("*").cast("long").alias("n_rows"))
    n_li = li.join(
        ord_keys,
        li["l_orderkey"] == ord_keys["o_orderkey"],
        "left_semi",
    ).agg(F.count("*").cast("long").alias("n_rows"))
    return (
        n_cust.select(F.lit("customer").alias("entity"), "n_rows")
        .unionAll(n_ord.select(F.lit("orders").alias("entity"), "n_rows"))
        .unionAll(
            n_li.select(F.lit("lineitem").alias("entity"), "n_rows")
        )
    )


@query(
    "order_price_consistency",
    oracle="""WITH per_line AS (
                SELECT l_orderkey,
                       CAST(round(l_extendedprice * 100) AS BIGINT)
                       * CAST(round((1 - l_discount) * 100) AS BIGINT)
                       * CAST(round((1 + l_tax) * 100) AS BIGINT) AS g6
                FROM lineitem),
              per_order AS (
                SELECT l_orderkey,
                       CAST(sum(g6) AS BIGINT) AS comp_g6
                FROM per_line GROUP BY 1),
              cmp AS (
                SELECT o_orderpriority,
                       CAST(round(o_totalprice * 100) AS BIGINT) AS head_cents,
                       CAST(round(CAST(comp_g6 AS DOUBLE) / 1e4) AS BIGINT)
                         AS comp_cents
                FROM orders JOIN per_order ON o_orderkey = l_orderkey)
              SELECT o_orderpriority,
                     count(*) AS n_orders,
                     CAST(sum(CASE WHEN head_cents <> comp_cents
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
                     CAST(max(abs(head_cents - comp_cents)) AS BIGINT)
                       AS max_abs_diff_cents,
                     round(CAST(CAST(sum(head_cents - comp_cents) AS BIGINT)
                           AS DOUBLE) / 100, 2) AS total_drift
              FROM cmp GROUP BY 1 ORDER BY 1""",
)
def order_price_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 — cross-table arithmetic consistency audit: does the order
    header's o_totalprice equal the recomputed
    Σ extendedprice·(1−discount)·(1+tax) over its lines? The classic
    "header vs detail drift" DQ check every revenue pipeline runs
    (the reference's dbt tests only cover nulls/uniqueness —
    `models/facts/schema.yml`; this is the arithmetic layer they
    skip). Per priority: order count, mismatch count, worst absolute
    gap, signed total drift.

    Exactness: the recomputed total accumulates on the exact 6-decimal
    grid (three 2-dec factors as BIGINTs, ≈1e12/line — int64 holds
    ~10⁶ lines/order), snapped to cents with ONE mirrored
    divide-and-round; header cents are exact. Every reported number is
    then integer-derived.

    Scale: one lineitem shuffle to order grain (map-side combined),
    one join to headers, a |priorities|-row rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    g6 = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * F.round((F.lit(1) - F.col("l_discount")) * 100).cast("long")
        * F.round((F.lit(1) + F.col("l_tax")) * 100).cast("long")
    )
    per_order = li.groupBy("l_orderkey").agg(F.sum(g6).alias("comp_g6"))
    cmp_df = orders.join(
        per_order, orders.o_orderkey == per_order.l_orderkey
    ).select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("head_cents"),
        F.round(F.col("comp_g6").cast("double") / F.lit(1e4))
        .cast("long")
        .alias("comp_cents"),
    )
    diff = F.col("head_cents") - F.col("comp_cents")
    return (
        cmp_df.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            # when/otherwise, not a bare cast: a NULL head (or comp)
            # makes the comparison NULL, which the oracle's CASE counts
            # as 0 while sum-over-cast SKIPS — equal totals until a
            # group is ALL null comparisons (the r15 tombstone rows
            # made the NULL-priority group exactly that) and Spark
            # returns NULL where DuckDB returns 0. A row with no
            # header price is not a mismatch; it is unauditable.
            F.sum(
                F.when(
                    F.col("head_cents") != F.col("comp_cents"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_mismatch"),
            F.max(F.abs(diff)).cast("long").alias("max_abs_diff_cents"),
            F.round(F.sum(diff).cast("double") / F.lit(100), 2).alias(
                "total_drift"
            ),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "functional_dependency",
    oracle="""WITH checks AS (
                SELECT 'n_nationkey->n_regionkey' AS fd,
                       CAST(n_nationkey AS VARCHAR) AS lhs,
                       CAST(n_regionkey AS VARCHAR) AS rhs
                FROM nation
                UNION ALL
                SELECT 'p_type->p_size',
                       p_type, CAST(p_size AS VARCHAR) FROM part
                UNION ALL
                SELECT 'o_orderstatus->o_orderpriority',
                       o_orderstatus, o_orderpriority FROM orders),
              cells AS (
                SELECT fd, lhs, rhs, count(*) AS n
                FROM checks GROUP BY 1, 2, 3),
              grp AS (
                SELECT fd, lhs,
                       count(*) AS n_rhs,
                       CAST(sum(n) AS BIGINT) AS n_rows,
                       CAST(max(n) AS BIGINT) AS n_major
                FROM cells GROUP BY 1, 2)
              SELECT fd,
                     count(*) AS n_lhs,
                     CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_violating_lhs,
                     CAST(sum(n_rows - n_major) AS BIGINT) AS min_repair_rows,
                     CAST(CASE WHEN sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END)
                               = 0 THEN 1 ELSE 0 END AS BIGINT) AS holds
              FROM grp GROUP BY 1 ORDER BY 1""",
)
def functional_dependency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 — functional-dependency audit: for each declared candidate
    FD X→Y, how many X-groups carry more than one Y, and the MINIMAL
    number of row repairs (rows outside each group's majority Y) to
    make it hold — the schema-inference/constraint-mining DQ check
    (reference capability gap: dbt's `schema.yml` can only assert
    declared uniqueness, not discover dependency violations). Checked
    here: nation→region (holds), part type→size and order
    status→priority (violated by construction).

    Exactness: pure BIGINT counting at (fd, lhs, rhs) grain; the
    majority count is max-of-counts (well-defined under ties).

    Scale: each FD is one map-side-combined shuffle of its OWN
    table's two columns (the union happens after projection — three
    narrow scans, no fact-wide union); then a tiny per-lhs rollup."""
    nat = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")
    orders = load_table(spark, sf_dir, "orders")
    checks = (
        nat.select(
            F.lit("n_nationkey->n_regionkey").alias("fd"),
            F.col("n_nationkey").cast("string").alias("lhs"),
            F.col("n_regionkey").cast("string").alias("rhs"),
        )
        .unionByName(
            part.select(
                F.lit("p_type->p_size").alias("fd"),
                F.col("p_type").alias("lhs"),
                F.col("p_size").cast("string").alias("rhs"),
            )
        )
        .unionByName(
            orders.select(
                F.lit("o_orderstatus->o_orderpriority").alias("fd"),
                F.col("o_orderstatus").alias("lhs"),
                F.col("o_orderpriority").alias("rhs"),
            )
        )
    )
    cells = checks.groupBy("fd", "lhs", "rhs").agg(F.count("*").alias("n"))
    grp = cells.groupBy("fd", "lhs").agg(
        F.count("*").alias("n_rhs"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("n_major"),
    )
    viol = F.sum((F.col("n_rhs") > 1).cast("int")).cast("long")
    return (
        grp.groupBy("fd")
        .agg(
            F.count("*").alias("n_lhs"),
            viol.alias("n_violating_lhs"),
            F.sum(F.col("n_rows") - F.col("n_major"))
            .cast("long")
            .alias("min_repair_rows"),
            (viol == 0).cast("long").alias("holds"),
        )
        .orderBy("fd")
    )


@query(
    "psi_drift",
    oracle=with_finite_events("""WITH v AS (
                SELECT event_type, epoch_us(ts) AS e,
                       CAST(round(value * 100) AS BIGINT) AS x
                FROM events),
              st AS (
                SELECT event_type,
                       min(e) AS emn, max(e) AS emx,
                       min(x) AS xmn, max(x) AS xmx
                FROM v GROUP BY 1),
              b AS (
                SELECT v.event_type,
                       CASE WHEN e <= (emn + emx) // 2
                            THEN 0 ELSE 1 END AS period,
                       (x - xmn) // ((xmx - xmn) // 10 + 1) AS bin
                FROM v JOIN st USING (event_type)),
              c AS (
                SELECT event_type, bin,
                       CAST(sum(CASE WHEN period = 0 THEN 1 ELSE 0 END)
                            AS BIGINT) AS c1,
                       CAST(sum(CASE WHEN period = 1 THEN 1 ELSE 0 END)
                            AS BIGINT) AS c2
                FROM b GROUP BY 1, 2),
              grid AS (
                SELECT st.event_type, g.bin,
                       coalesce(c1, 0) AS c1, coalesce(c2, 0) AS c2
                FROM st CROSS JOIN range(10) g(bin)
                LEFT JOIN c
                  ON c.event_type = st.event_type AND c.bin = g.bin),
              n AS (
                SELECT event_type,
                       CAST(sum(c1) AS BIGINT) AS n1,
                       CAST(sum(c2) AS BIGINT) AS n2
                FROM grid GROUP BY 1),
              t AS (
                SELECT g.event_type, n1, n2,
                       ((CAST(c1 + 1 AS DOUBLE) / CAST(n1 + 10 AS DOUBLE))
                        - (CAST(c2 + 1 AS DOUBLE) / CAST(n2 + 10 AS DOUBLE)))
                       * ln((CAST(c1 + 1 AS DOUBLE) / CAST(n1 + 10 AS DOUBLE))
                            / (CAST(c2 + 1 AS DOUBLE)
                               / CAST(n2 + 10 AS DOUBLE))) AS term
                FROM grid g JOIN n USING (event_type))
              SELECT event_type,
                     CAST(max(n1) AS BIGINT) AS n_first,
                     CAST(max(n2) AS BIGINT) AS n_second,
                     round(sum(term), 6) AS psi,
                     round(sum(term), 6) > 0.1 AS drifted
              FROM t GROUP BY 1 ORDER BY 1"""),
)
def psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index drift audit (Q10, extension): per
    event type, compare the value distribution of the first half of the
    time range against the second half over ten equal-width bins —
    PSI = Σ (p−q)·ln(p/q) with add-one smoothing, flagged at the
    industry 0.1 "investigate" threshold. The model-monitoring /
    feature-drift check every scoring pipeline runs between retrain
    cycles; none of the reference's dbt tests look at distribution
    shape at all.

    Exactness: the time split compares exact BIGINT epoch-micros to the
    integer midpoint (Spark `unix_micros` ↔ DuckDB `epoch_us`; `div` ↔
    `//` truncate identically on non-negatives), and bin assignment is
    pure integer arithmetic on the cent grid — width w = (max−min) div
    10 + 1 guarantees bin ∈ [0,9] with no least() clamp (R div w ≤ 9
    since w > R/10). Smoothed p/q are mirrored double expressions from
    exact BIGINT counts; the 10-term PSI sum rounds at 6dp and the
    drift flag compares that same ROUNDED value, so the boolean cannot
    straddle an ulp. Empty bins matter (smoothing gives them mass) —
    the |types|×10 grid is restored via CROSS JOIN before the fold.

    Scale: two fact-scan aggregations, both map-side combined — (type)
    min/max stats, then (type, period, bin) counts with the tiny stats
    relation broadcast onto the fact scan; everything after runs on the
    |types|×10 grid. No windows, no collect, no fact-row sort."""
    ev = metric_events(spark, sf_dir)
    v = ev.select(
        "event_type",
        F.unix_micros(F.col("ts")).alias("e"),
        F.round(F.col("value") * 100).cast("long").alias("x"),
    )
    st = v.groupBy("event_type").agg(
        F.min("e").alias("emn"),
        F.max("e").alias("emx"),
        F.min("x").alias("xmn"),
        F.max("x").alias("xmx"),
    )
    b = v.join(F.broadcast(st), "event_type").select(
        "event_type",
        F.when(F.col("e") <= F.expr("(emn + emx) div 2"), F.lit(0))
        .otherwise(F.lit(1))
        .alias("period"),
        F.expr("(x - xmn) div ((xmx - xmn) div 10 + 1)").alias("bin"),
    )
    c = b.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("period") == 0, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("period") == 1, 1).otherwise(0)).alias("c2"),
    )
    bins = spark.range(10).select(F.col("id").cast("long").alias("bin"))
    grid = (
        st.select("event_type")
        .crossJoin(F.broadcast(bins))
        .join(c, ["event_type", "bin"], "left")
        .select(
            "event_type",
            "bin",
            F.coalesce(F.col("c1"), F.lit(0)).alias("c1"),
            F.coalesce(F.col("c2"), F.lit(0)).alias("c2"),
        )
    )
    n = grid.groupBy("event_type").agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    p = (F.col("c1") + 1).cast("double") / (F.col("n1") + 10).cast("double")
    q = (F.col("c2") + 1).cast("double") / (F.col("n2") + 10).cast("double")
    term = (p - q) * F.log(p / q)
    return (
        grid.join(F.broadcast(n), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n1").cast("long").alias("n_first"),
            F.max("n2").cast("long").alias("n_second"),
            F.round(F.sum(term), 6).alias("psi"),
            (F.round(F.sum(term), 6) > 0.1).alias("drifted"),
        )
        .orderBy("event_type")
    )
