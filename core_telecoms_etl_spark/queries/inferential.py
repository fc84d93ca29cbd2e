"""Inferential / distribution statistics over the star schema — the
analyst follow-ups one step past `queries/analytics.py`'s descriptive
readouts (reference capability: the dbt marts end at grouped counts,
`dbt/coretelecom/models/facts/*.sql`; a telecom analytics stack also
asks "is the association real, where did the level shift, what's the
trend"). All full-oracle, all capability *extensions* (SURVEY §2.14).

Determinism design (repo rules, `queries/__init__.py`):
- Every row-indexed accumulation is BIGINT (counts, cent/4-dec-grid
  money, integer month indexes) — engine summation order can't matter.
- Derived doubles come from those exact integers through token-mirrored
  expressions, so both engines divide/multiply bit-identical doubles.
- The few genuine cross-row FLOAT sums (chi-square's 25 cell terms,
  entropy's ≤5 category terms) are rounded at 6dp, the repo's standard
  absorption for sub-ulp association wobble (same as tf_idf/surprisal).

Scale design: every query aggregates facts FIRST (one map-side-combined
shuffle) and runs its windows/folds on the bounded aggregated relation —
cells (|segments|×|priorities|), calendar days, nation×month, duration
grain, replicate ids — never on fact rows. The single-partition windows
(CUSUM, Kaplan–Meier, EWMA) are over calendar/duration relations,
bounded by the date span, and use the repo's pmod partition idiom; the
rank-weighted sums (Gini) and rank-sum CDFs (Mann–Whitney) use the
two-level range-bucketed prefix sum so no fact- or entity-sized
relation ever sorts in one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from core_telecoms_etl_spark.functions import expressions as xp
from core_telecoms_etl_spark.queries import (  # noqa: E501
    query,
    metric_events,
    with_finite_events,
)
from core_telecoms_etl_spark.queries.relational import (
    _disc_price_grid,
)
from core_telecoms_etl_spark.sources.readers import load_table


@query(
    "chi_square_independence",
    oracle="""WITH cells AS (
                SELECT c_mktsegment AS seg, o_orderpriority AS pri,
                       count(*) AS n
                FROM orders JOIN customer ON o_custkey = c_custkey
                WHERE c_mktsegment IS NOT NULL
                  AND o_orderpriority IS NOT NULL
                GROUP BY 1, 2),
              rt AS (SELECT seg, CAST(sum(n) AS BIGINT) AS rn
                     FROM cells GROUP BY 1),
              ct AS (SELECT pri, CAST(sum(n) AS BIGINT) AS cn
                     FROM cells GROUP BY 1),
              tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM cells),
              grid AS (
                SELECT rt.seg, ct.pri, rt.rn, ct.cn,
                       coalesce(cells.n, 0) AS n
                FROM rt CROSS JOIN ct
                LEFT JOIN cells
                  ON cells.seg = rt.seg AND cells.pri = ct.pri),
              terms AS (
                SELECT nt, rn, cn, (nt * n - rn * cn) AS dev
                FROM grid CROSS JOIN tot)
              SELECT coalesce(max(nt), 0) AS n_rows,
                     CAST(greatest((SELECT count(*) FROM rt) - 1, 0)
                          AS BIGINT)
                       * CAST(greatest((SELECT count(*) FROM ct) - 1, 0)
                              AS BIGINT) AS dof,
                     round(sum(CAST(dev AS DOUBLE) * CAST(dev AS DOUBLE)
                           / (CAST(nt AS DOUBLE) * CAST(rn AS DOUBLE)
                              * CAST(cn AS DOUBLE))), 6) AS chi2,
                     round(sqrt(sum(CAST(dev AS DOUBLE) * CAST(dev AS DOUBLE)
                           / (CAST(nt AS DOUBLE) * CAST(rn AS DOUBLE)
                              * CAST(cn AS DOUBLE)))
                           / (CAST(max(nt) AS DOUBLE)
                              * least((SELECT count(*) FROM rt) - 1,
                                      (SELECT count(*) FROM ct) - 1))), 6)
                       AS cramers_v
              FROM terms""",
)
def chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between customer market
    segment and order priority (capability extension: "is the priority
    mix actually different across segments?"), plus Cramér's V effect
    size.

    Exactness: observed cell counts, row/column totals, and the
    deviation `dev = N·o − r·c` are all BIGINT (|dev| ≤ N·o ≈ 2.3e10 at
    sf0.1 — exactly double-representable; beyond ~sf100 cast dev to
    DECIMAL(38,0)). Each cell's term is one mirrored double expression;
    the 25-term sum is rounded at 6dp (absolute wobble ~1e-13).

    Scale: one fact shuffle (orders⋈customer → 25-cell hash agg with
    map-side combine); everything after runs on the 25-row relation
    (two 5-row rollups broadcast back). No windows, no collect."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    cells = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        # a NULL category is a MISSING observation, not a sixth level:
        # count_distinct excludes NULL where the oracle's rollup count
        # included its group (dof 16 vs 25 under r8 NULL injection) —
        # standard chi-square practice drops incomplete rows; mirrored
        .filter(
            F.col("c_mktsegment").isNotNull()
            & F.col("o_orderpriority").isNotNull()
        )
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count("*").alias("n"))
    )
    rt = cells.groupBy("seg").agg(F.sum("n").alias("rn"))
    ct = cells.groupBy("pri").agg(F.sum("n").alias("cn"))
    tot = cells.agg(
        F.sum("n").alias("nt"),
        F.count_distinct("seg").alias("r"),
        F.count_distinct("pri").alias("c"),
    )
    # structural-zero cells matter: groupBy only yields OBSERVED cells,
    # but an empty (seg, pri) cell still contributes (0−e)²/e — build
    # the full margin grid and left-join the observed counts
    grid = (
        rt.crossJoin(F.broadcast(ct))  # |segments|×|priorities| margin grid
        .join(cells, ["seg", "pri"], "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
    )
    terms = grid.join(F.broadcast(tot)).withColumn(
        "dev", F.col("nt") * F.col("n") - F.col("rn") * F.col("cn")
    )
    term = (
        F.col("dev").cast("double")
        * F.col("dev").cast("double")
        / (
            F.col("nt").cast("double")
            * F.col("rn").cast("double")
            * F.col("cn").cast("double")
        )
    )
    # empty contingency contract: 0 rows, dof 0, NULL statistics —
    # mirrored via coalesce/greatest (r8 empty-facts differential)
    return terms.agg(
        F.coalesce(F.max("nt"), F.lit(0)).alias("n_rows"),
        F.coalesce(
            (F.max("r") - F.lit(1)) * (F.max("c") - F.lit(1)), F.lit(0)
        )
        .cast("long")
        .alias("dof"),
        F.round(F.sum(term), 6).alias("chi2"),
        F.round(
            F.sqrt(
                F.sum(term)
                / (
                    F.max("nt").cast("double")
                    * F.least(F.max("r") - F.lit(1), F.max("c") - F.lit(1))
                )
            ),
            6,
        ).alias("cramers_v"),
    )


@query(
    "entropy_by_group",
    oracle="""WITH cells AS (
                SELECT c_mktsegment AS segment, o_orderpriority AS pri,
                       count(*) AS n
                FROM orders JOIN customer ON o_custkey = c_custkey
                GROUP BY 1, 2),
              seg AS (
                SELECT segment,
                       CAST(sum(n) AS BIGINT) AS n_rows,
                       count(*) AS n_cats,
                       round(sum(CAST(n AS DOUBLE)
                                 * ln(CAST(n AS DOUBLE))), 6) AS s_nlogn
                FROM cells GROUP BY 1)
              SELECT segment, n_rows, n_cats,
                     round(ln(CAST(n_rows AS DOUBLE))
                           - s_nlogn / CAST(n_rows AS DOUBLE), 6) AS entropy,
                     CASE WHEN n_cats > 1 THEN
                       round((ln(CAST(n_rows AS DOUBLE))
                              - s_nlogn / CAST(n_rows AS DOUBLE))
                             / ln(CAST(n_cats AS DOUBLE)), 6)
                     END AS norm_entropy
              FROM seg""",
)
def entropy_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (and normalized entropy) of each market
    segment's order-priority mix — the "how concentrated is this
    group's behavior" screen (capability extension; pairs with the
    Pareto/Gini concentration views).

    Exactness: H = ln(T) − (Σ n·ln n)/T from exact BIGINT counts; the
    per-segment Σ n·ln n runs over ≤ |priorities| terms and is rounded
    at 6dp BEFORE the mirrored final expression, so both engines
    combine the identical rounded intermediate (ln wobble absorbed the
    same way tf_idf does).

    Scale: one fact shuffle to the (segment, priority) cell grid; the
    entropy fold is a second tiny hash agg over the cell relation —
    category-bounded, never fact-sized."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    cells = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count("*").alias("n"))
    )
    seg = cells.groupBy("segment").agg(
        F.sum("n").alias("n_rows"),
        F.count("*").alias("n_cats"),
        F.round(
            F.sum(F.col("n").cast("double") * F.log(F.col("n").cast("double"))),
            6,
        ).alias("s_nlogn"),
    )
    h_raw = F.log(F.col("n_rows").cast("double")) - F.col("s_nlogn") / F.col(
        "n_rows"
    ).cast("double")
    return seg.select(
        "segment",
        "n_rows",
        "n_cats",
        F.round(h_raw, 6).alias("entropy"),
        # all-integer guard: a single-category group has ln(1)=0 in the
        # denominator — NULL on both engines, not ANSI error / NaN
        F.when(
            F.col("n_cats") > 1,
            F.round(h_raw / F.log(F.col("n_cats").cast("double")), 6),
        ).alias("norm_entropy"),
    )


@query(
    "cusum_changepoint",
    oracle="""WITH daily AS (
                SELECT CAST(l_shipdate AS DATE) AS d,
                       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                            * CAST(round((1 - l_discount) * 100) AS BIGINT))
                            AS BIGINT) AS x
                FROM lineitem WHERE l_shipdate IS NOT NULL
                GROUP BY 1),
              g AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS t
                    FROM daily),
              c AS (SELECT d,
                           CAST(sum(x) OVER (ORDER BY d
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                             AS BIGINT) AS cx,
                           row_number() OVER (ORDER BY d) AS i
                    FROM daily)
              SELECT c.d AS change_date,
                     g.n AS n_days,
                     CAST(CAST(g.n AS HUGEINT) * c.cx
                          - CAST(c.i AS HUGEINT) * g.t AS DOUBLE)
                       AS s_scaled,
                     round(CAST(CAST(g.n AS HUGEINT) * c.cx
                                - CAST(c.i AS HUGEINT) * g.t AS DOUBLE)
                           / (CAST(g.n AS DOUBLE) * 1e4), 2) AS cusum_money
              FROM c CROSS JOIN g
              ORDER BY abs(CAST(g.n AS HUGEINT) * c.cx
                           - CAST(c.i AS HUGEINT) * g.t) DESC, c.d
              LIMIT 1""",
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM level-shift detection on the daily revenue series: the day
    where the cumulative deviation from the overall mean peaks (the
    classic "when did the level change" audit). Returns ONE row:
    change date, day count, the exact scaled statistic, and its money
    magnitude.

    Exactness: with C_i the cumulative daily 4-dec-grid revenue and T
    the grand total, S_i = C_i − i·T/n is evaluated as the all-integer
    S'_i = n·C_i − i·T in 128-bit (Spark DECIMAL(38,0) ↔ DuckDB
    HUGEINT) — argmax|S'| needs no floats at all. The r12 sf10 decade
    cashed the prediction the earlier version of this docstring made:
    n·C_i ≈ 2,435 days × 2.2e16 unscaled grand total ≈ 5.4e19 blew the
    BIGINT form (ANSI ARITHMETIC_OVERFLOW, both engines); DECIMAL(38)
    holds to ~sf10^20. S' is EMITTED as double (one correctly-rounded
    cast of the identical exact value on both sides — int64 can no
    longer carry it); the argmax ORDER still compares the exact
    128-bit values.

    Scale: one fact shuffle to the calendar-day grain; the running sum
    and row_number run single-partition over the day relation — bounded
    by the date span (~2.4k rows for 6.5 years), NOT data volume, the
    same justification as the repo's bucket-offset tables. TakeOrdered
    (LIMIT 1) ships one row to the driver."""
    li = load_table(spark, sf_dir, "lineitem")
    # a calendar series has no NULL day: a NULL l_shipdate group would
    # land at OPPOSITE ends of the two engines' order-dependent folds
    # (Spark NULLS FIRST vs DuckDB NULLS LAST — caught by the r8
    # NULL-injection differential); oracles mirror the filter
    daily = li.filter(F.col("l_shipdate").isNotNull()).groupBy(
        F.col("l_shipdate").cast("date").alias("d")
    ).agg(F.sum(_disc_price_grid()).alias("x"))
    g = daily.agg(F.count("*").alias("n"), F.sum("x").alias("t"))
    # single-partition by construction (pmod idiom): the day relation is
    # calendar-bounded, so one task scanning ~2.4k rows is the plan we
    # want — not a fact-sized global window
    w = (
        Window.partitionBy(xp.single_partition("d"))
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wo = Window.partitionBy(xp.single_partition("d")).orderBy("d")
    c = daily.select(
        "d",
        F.sum("x").over(w).alias("cx"),
        F.row_number().over(wo).cast("long").alias("i"),
    )
    d38 = "decimal(38,0)"
    s_scaled = (
        F.col("n").cast(d38) * F.col("cx").cast(d38)
        - F.col("i").cast(d38) * F.col("t").cast(d38)
    )
    return (
        c.join(F.broadcast(g))
        .select(
            F.col("d").alias("change_date"),
            F.col("n").alias("n_days"),
            s_scaled.cast("double").alias("s_scaled"),
            F.round(
                s_scaled.cast("double") / (F.col("n").cast("double") * F.lit(1e4)),
                2,
            ).alias("cusum_money"),
            s_scaled.alias("__s_exact"),
        )
        .orderBy(F.abs(F.col("__s_exact")).desc(), "change_date")
        .limit(1)
        .drop("__s_exact")
    )


@query(
    "grouped_trend",
    oracle="""WITH monthly AS (
                SELECT n_name,
                       CAST((year(l_shipdate) - 1995) * 12
                            + (month(l_shipdate) - 1) AS BIGINT) AS mi,
                       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                            * CAST(round((1 - l_discount) * 100) AS BIGINT))
                            AS BIGINT) AS y
                FROM lineitem
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
                GROUP BY 1, 2),
              s AS (SELECT n_name, count(*) AS n,
                           CAST(sum(mi) AS BIGINT) AS sx,
                           CAST(sum(y) AS BIGINT) AS sy,
                           CAST(sum(mi * y) AS BIGINT) AS sxy,
                           CAST(sum(mi * mi) AS BIGINT) AS sxx
                    FROM monthly GROUP BY 1)
              SELECT n_name, n AS n_months,
                     round(CAST(n * sxy - sx * sy AS DOUBLE)
                           / (CAST(n * sxx - sx * sx AS DOUBLE) * 1e4), 4)
                       AS slope_money_per_month,
                     round((CAST(sy AS DOUBLE)
                            - CAST(n * sxy - sx * sy AS DOUBLE)
                              / CAST(n * sxx - sx * sx AS DOUBLE)
                              * CAST(sx AS DOUBLE))
                           / (CAST(n AS DOUBLE) * 1e4), 4)
                       AS intercept_money
              FROM s
              WHERE n > 1 AND n * sxx - sx * sx <> 0
              ORDER BY n_name""",
)
def grouped_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier-nation OLS revenue trend: slope and intercept of
    monthly revenue against a month index, closed-form from the five
    classic sums (capability extension: "which markets are growing?").

    Exactness: x (month index) and y (4-dec-grid monthly revenue) are
    BIGINT, so n, Σx, Σy, Σxy, Σx² are exact on both engines
    (Σxy ≤ months²·grid ≈ 6e15 at sf0.1 — DECIMAL(38,0) beyond ~sf10);
    slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) and the intercept chain are
    single mirrored double expressions over those integers — closed
    form, never DuckDB's regr_* internals (engine-specific running
    algorithms). Degenerate groups (one month / zero x-variance) are
    excluded by an all-integer guard both engines evaluate identically.

    Scale: one fact shuffle to (nation, month) grain — supplier and
    nation are broadcast below it — then a |nations|-row rollup. No
    windows."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    monthly = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy(
            "n_name",
            (
                (F.year("l_shipdate") - F.lit(1995)) * F.lit(12)
                + (F.month("l_shipdate") - F.lit(1))
            )
            .cast("long")
            .alias("mi"),
        )
        .agg(F.sum(_disc_price_grid()).alias("y"))
    )
    s = monthly.groupBy("n_name").agg(
        F.count("*").alias("n"),
        F.sum("mi").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("mi") * F.col("y")).alias("sxy"),
        F.sum(F.col("mi") * F.col("mi")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope_grid = num.cast("double") / den.cast("double")
    return (
        s.filter((F.col("n") > 1) & (den != 0))
        .select(
            "n_name",
            F.col("n").alias("n_months"),
            F.round(
                num.cast("double") / (den.cast("double") * F.lit(1e4)), 4
            ).alias("slope_money_per_month"),
            F.round(
                (F.col("sy").cast("double") - slope_grid * F.col("sx").cast("double"))
                / (F.col("n").cast("double") * F.lit(1e4)),
                4,
            ).alias("intercept_money"),
        )
        .orderBy("n_name")
    )


@query(
    "mann_whitney_u",
    oracle="""WITH pv AS (
                SELECT value AS v,
                       CAST(sum(CASE WHEN event_type = 'click'
                                THEN 1 ELSE 0 END) AS BIGINT) AS a,
                       CAST(sum(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) AS BIGINT) AS b
                FROM events
                WHERE event_type IN ('click', 'purchase')
                  AND value IS NOT NULL
                GROUP BY 1),
              c AS (
                SELECT a, (a + b) AS t,
                       CAST(sum(a + b) OVER (ORDER BY v
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         - (a + b) AS BIGINT) AS cb
                FROM pv),
              s AS (
                SELECT CAST(sum(a * (2 * cb + t + 1)) AS BIGINT) AS s2r,
                       CAST(sum(t * t * t - t) AS BIGINT) AS ties,
                       CAST(sum(a) AS BIGINT) AS na,
                       CAST(sum(t) - sum(a) AS BIGINT) AS nb,
                       count(*) AS nvals
                FROM c)
              SELECT na AS n_a, nb AS n_b,
                     (s2r - na * (na + 1)) AS u2_scaled,
                     CAST(s2r - na * (na + 1) AS DOUBLE) / 2.0 AS u_a,
                     CASE WHEN na > 0 AND nb > 0 AND nvals > 1 THEN
                       (CAST(s2r - na * (na + 1) AS DOUBLE)
                        - CAST(na AS DOUBLE) * nb)
                       / (2.0 * sqrt((CAST(na AS DOUBLE) * nb / 12.0)
                           * (CAST(na + nb + 1 AS DOUBLE)
                              - CAST(ties AS DOUBLE)
                                / (CAST(na + nb AS DOUBLE)
                                   * (na + nb - 1)))))
                     END AS z,
                     CAST(CASE WHEN na > 0 AND nb > 0 AND nvals > 1 THEN
                       abs((CAST(s2r - na * (na + 1) AS DOUBLE)
                            - CAST(na AS DOUBLE) * nb)
                           / (2.0 * sqrt((CAST(na AS DOUBLE) * nb / 12.0)
                               * (CAST(na + nb + 1 AS DOUBLE)
                                  - CAST(ties AS DOUBLE)
                                    / (CAST(na + nb AS DOUBLE)
                                       * (na + nb - 1)))))) > 1.96
                     END AS BIGINT) AS reject_h0
              FROM s""",
)
def mann_whitney_u_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U rank-sum test between click and purchase event
    values (operators/stats.py mann_whitney_u — exact doubled integer
    statistic + tie-corrected z; the oracle's single-node window and
    the engine's two-level bucketed prefix sum produce the identical
    BIGINT 2·U)."""
    from core_telecoms_etl_spark.operators.stats import mann_whitney_u

    ev = load_table(spark, sf_dir, "events")
    return mann_whitney_u(
        ev,
        value_col="value",
        group_col="event_type",
        group_a="click",
        group_b="purchase",
    )


@query(
    "gini_concentration",
    oracle="""WITH pc AS (
                SELECT o_custkey AS k,
                       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                            AS BIGINT) AS x
                FROM orders GROUP BY 1),
              s AS (SELECT c_mktsegment AS segment, k, x
                    FROM pc JOIN customer ON k = c_custkey
                    WHERE c_mktsegment IS NOT NULL),
              r AS (SELECT segment, x,
                           row_number() OVER (PARTITION BY segment
                                              ORDER BY x, k) AS i
                    FROM s),
              g AS (SELECT segment, count(*) AS n,
                           CAST(sum(x) AS BIGINT) AS sx,
                           CAST(sum(CAST(i AS HUGEINT) * x) AS HUGEINT) AS a
                    FROM r GROUP BY 1)
              SELECT segment, n AS n_customers,
                     round(CAST(sx AS DOUBLE) / 100, 2) AS total_revenue,
                     CASE WHEN sx > 0 THEN
                       round(CAST(2 * a - (CAST(n AS HUGEINT) + 1) * sx
                                  AS DOUBLE)
                             / (CAST(n AS DOUBLE) * sx), 6)
                     END AS gini
              FROM g ORDER BY segment""",
)
def gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer lifetime revenue per market segment
    — "how concentrated is this segment's revenue" (pairs with
    `pareto_classes`; a telecom revenue-assurance staple).

    Exactness: G = (2·Σiｘᵢ − (n+1)·Σx)/(n·Σx) over cent-grid BIGINT
    revenues and exact ranks — the i-weighted sum is tie-invariant
    (equal x values contribute identically under any tie order), so
    the engines' different tie placements cannot diverge; one final
    mirrored double division. The rank-weighted accumulations run in
    128-bit (Spark DECIMAL(38,0) ↔ DuckDB HUGEINT): Σiｘᵢ ≈ n²·x̄/2
    reached ~8.5e18 at sf10's 300k-customer segments and the BIGINT
    form overflowed exactly where the earlier bound note predicted
    (caught live, r12 decade).

    Scale: ranks come from the same two-level range-bucketed prefix
    sum as KS/MWU, PARTITIONED BY SEGMENT: within-(segment, bucket)
    row_numbers parallelize and only the segments×B bucket-count table
    windows single-partition; Σiｘᵢ folds per bucket as
    off·Σx + Σrᵢₙｘ — the global rank is never materialized per row
    outside its bucket."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    n_buckets = 256
    pc = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("x")
    )
    # an unassigned (NULL) segment is excluded, mirrored in the oracle:
    # the bucket-span equi-join drops NULL keys on the Spark side while
    # DuckDB's windows kept the NULL partition (r8 NULL injection)
    s = (
        pc.join(cust, pc.k == cust.c_custkey)
        .filter(F.col("c_mktsegment").isNotNull())
        .select(F.col("c_mktsegment").alias("segment"), "k", "x")
    )
    span = s.groupBy("segment").agg(
        F.min("x").alias("lo"), F.max("x").alias("hi")
    )
    bucketed = s.join(F.broadcast(span), "segment").withColumn(
        "bkt",
        F.when(
            F.col("hi") > F.col("lo"),
            F.least(
                F.lit(n_buckets - 1),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.col("x") - F.col("lo"))
                        * F.lit(n_buckets)
                        / (F.col("hi") - F.col("lo"))
                    ).cast("long"),
                ),
            ),
        ).otherwise(F.lit(0)),
    )
    w_in = Window.partitionBy("segment", "bkt").orderBy("x", "k")
    per_bkt = (
        bucketed.withColumn("r_in", F.row_number().over(w_in).cast("long"))
        .groupBy("segment", "bkt")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("x").alias("sx"),
            # per-term r·x fits long (≤ ~3e15); the ACCUMULATIONS from
            # here up run 128-bit — see docstring bound note
            F.sum(
                (F.col("r_in") * F.col("x")).cast("decimal(38,0)")
            ).alias("srx"),
        )
    )
    w_off = (
        Window.partitionBy("segment")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_off = per_bkt.withColumn(
        "off", F.sum("cnt").over(w_off) - F.col("cnt")
    )
    d38 = "decimal(38,0)"
    g = with_off.groupBy("segment").agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum("sx").alias("sx"),
        F.sum(
            F.col("off").cast(d38) * F.col("sx").cast(d38) + F.col("srx")
        ).alias("a"),
    )
    num = (
        F.lit(2).cast(d38) * F.col("a")
        - (F.col("n") + F.lit(1)).cast(d38) * F.col("sx").cast(d38)
    )
    return g.select(
        "segment",
        F.col("n").alias("n_customers"),
        F.round(F.col("sx").cast("double") / F.lit(100), 2).alias(
            "total_revenue"
        ),
        F.when(
            F.col("sx") > 0,
            F.round(
                num.cast("double") / (F.col("n").cast("double") * F.col("sx")),
                6,
            ),
        ).alias("gini"),
    ).orderBy("segment")


@query(
    "seasonal_naive_forecast",
    oracle="""WITH monthly AS (
                SELECT l_returnflag AS flag,
                       CAST((year(l_shipdate) - 1995) * 12
                            + (month(l_shipdate) - 1) AS BIGINT) AS mi,
                       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                            * CAST(round((1 - l_discount) * 100) AS BIGINT))
                            AS BIGINT) AS y
                FROM lineitem GROUP BY 1, 2),
              bt AS (
                SELECT m.flag, count(*) AS n,
                       CAST(sum(abs(m.y - p.y)) AS BIGINT) AS sae,
                       CAST(sum(m.y) AS BIGINT) AS sy,
                       CAST(sum(p.y) AS BIGINT) AS sf
                FROM monthly m
                JOIN monthly p ON p.flag = m.flag AND p.mi = m.mi - 12
                GROUP BY 1)
              SELECT flag AS l_returnflag, n AS n_months_tested,
                     CASE WHEN sy > 0 THEN
                       round(CAST(sae AS DOUBLE) / CAST(sy AS DOUBLE), 6)
                     END AS wape,
                     CASE WHEN sf > 0 THEN
                       round(CAST(sy - sf AS DOUBLE) / CAST(sf AS DOUBLE), 6)
                     END AS bias
              FROM bt ORDER BY flag""",
)
def seasonal_naive_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each month's revenue
    per return flag as the same month LAST YEAR and score WAPE
    (Σ|err|/Σactual) + bias over the overlap — the baseline every
    real forecasting pipeline must beat, as a query.

    Exactness: monthly revenue is the 4-dec-grid BIGINT; the backtest
    lookup is an exact RANGE frame on the integer month index
    (rangeBetween(-12, -12) — a value-offset window, robust to gaps
    exactly like the equi-join form it replaces, where lag(12) over a
    dense rank is not); Σ|err|, Σy are BIGINT; WAPE/bias are single
    mirrored divisions. Guards all-int. The tested-months filter is
    the frame's ROW count (count(1), not count(y)), so a NULL-revenue
    month still matches exactly as the inner join matched it.

    Scale: ONE fact shuffle to (flag, month) grain — the previous
    self-join form aggregated the fact TWICE (the two canonical sides
    prune identically but ReuseExchange did not fire on them; measured
    0.75 → 0.57 s at sf0.1) — then a value-range window and a
    |flags|-row rollup over the tiny month matrix."""
    li = load_table(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        (
            (F.year("l_shipdate") - F.lit(1995)) * F.lit(12)
            + (F.month("l_shipdate") - F.lit(1))
        )
        .cast("long")
        .alias("mi"),
    ).agg(F.sum(_disc_price_grid()).alias("y"))
    wr = Window.partitionBy("flag").orderBy("mi").rangeBetween(-12, -12)
    m = monthly.select(
        "flag",
        "y",
        F.max("y").over(wr).alias("py"),
        F.count(F.lit(1)).over(wr).alias("pc"),
    ).filter(F.col("pc") > 0)
    bt = m.groupBy("flag").agg(
        F.count("*").alias("n"),
        F.sum(F.abs(F.col("y") - F.col("py"))).alias("sae"),
        F.sum(F.col("y")).alias("sy"),
        F.sum(F.col("py")).alias("sf"),
    )
    return bt.select(
        F.col("flag").alias("l_returnflag"),
        F.col("n").alias("n_months_tested"),
        F.when(
            F.col("sy") > 0,
            F.round(F.col("sae").cast("double") / F.col("sy").cast("double"), 6),
        ).alias("wape"),
        F.when(
            F.col("sf") > 0,
            F.round(
                (F.col("sy") - F.col("sf")).cast("double")
                / F.col("sf").cast("double"),
                6,
            ),
        ).alias("bias"),
    ).orderBy("l_returnflag")


@query(
    "kaplan_meier",
    oracle="""WITH pu AS (
                SELECT user_id,
                       date_diff('day', min(ts), max(ts)) AS dur,
                       CASE WHEN arg_max(event_type, ts) = 'error'
                            THEN 1 ELSE 0 END AS observed
                FROM events WHERE event_type IS NOT NULL
                GROUP BY user_id),
              byt AS (
                SELECT CAST(dur AS BIGINT) AS t,
                       CAST(sum(observed) AS BIGINT) AS d,
                       count(*) AS c
                FROM pu GROUP BY 1),
              tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM byt),
              km AS (
                SELECT t, d,
                       n - (CAST(sum(c) OVER w AS BIGINT) - c) AS nr
                FROM byt CROSS JOIN tot
                WINDOW w AS (ORDER BY t
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
              lt AS (
                SELECT t, d, nr,
                       CAST(max(CASE WHEN nr = d THEN 1 ELSE 0 END)
                            OVER w AS BIGINT) AS hit_zero,
                       sum(CASE WHEN nr > d AND d > 0 THEN
                             ln(CAST(nr - d AS DOUBLE) / CAST(nr AS DOUBLE))
                           ELSE 0.0 END) OVER w AS lsum
                FROM km
                WINDOW w AS (ORDER BY t
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
              SELECT t AS duration_days, nr AS n_risk, d AS n_events,
                     CASE WHEN hit_zero = 1 THEN 0.0
                          ELSE round(exp(lsum), 6) END AS survival
              FROM lt WHERE d > 0 ORDER BY t""",
)
def kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival estimate of user lifetime (first event →
    last event), where a lifetime ending in an 'error' event counts as
    an observed churn and anything else is right-censored — the
    standard retention/survival curve, as a query. One row per event
    time: duration, risk-set size, churn count, S(t).

    Input contract: (user_id, ts) unique (holds for the events table;
    max_by tie order is otherwise engine-specific).

    Exactness: durations, risk sets and event counts are exact BIGINT
    (n_risk via the cumulative-below trick, no per-row subqueries);
    S(t) = exp(Σ ln((nᵢ−dᵢ)/nᵢ)) where each log term derives from
    exact integers and the cumulative sum runs in the SAME ascending
    expanding frame on both engines, rounded at 6dp (the repo's ln
    absorption). A risk set consumed to zero pins S = 0.0 exactly via
    an all-integer flag instead of ln(0).

    Scale: one shuffle to per-user grain, one to the duration grain;
    the expanding windows run single-partition over the DURATION
    relation — bounded by the day span, not user count (pmod idiom
    suppresses the global-window warn)."""
    ev = load_table(spark, sf_dir, "events")
    # type-less events are malformed for survival semantics: Spark's
    # max_by would surface a NULL type (making `observed` NULL) where
    # DuckDB's arg_max skips NULL args — r8 NULL-injection divergence;
    # oracles mirror the filter
    pu = ev.filter(F.col("event_type").isNotNull()).groupBy("user_id").agg(
        F.datediff(F.max("ts"), F.min("ts")).cast("long").alias("dur"),
        # the == 'error' comparison moves INSIDE max_by so the
        # aggregation buffer is (long, timestamp) — fixed-width, so the
        # whole per-user pass plans HashAggregate; with the string
        # value in the buffer it demoted to SortAggregate with full
        # sorts of the event relation on both sides of the exchange
        # (r15 optimization round). (user_id, ts) unique ⇒ the selected
        # event is identical, so the flag is bit-identical.
        F.max_by(
            (F.col("event_type") == F.lit("error")).cast("long"), F.col("ts")
        ).alias("observed"),
    )
    byt = pu.groupBy(F.col("dur").alias("t")).agg(
        F.sum("observed").alias("d"), F.count("*").alias("c")
    )
    tot = byt.agg(F.sum("c").alias("n"))
    w = (
        Window.partitionBy(xp.single_partition("t"))
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    km = (
        byt.join(F.broadcast(tot))
        .withColumn(
            "nr", F.col("n") - (F.sum("c").over(w) - F.col("c"))
        )
        .withColumn(
            "hit_zero",
            F.max((F.col("nr") == F.col("d")).cast("long")).over(w),
        )
        .withColumn(
            "lsum",
            F.sum(
                F.when(
                    (F.col("nr") > F.col("d")) & (F.col("d") > 0),
                    F.log(
                        (F.col("nr") - F.col("d")).cast("double")
                        / F.col("nr").cast("double")
                    ),
                ).otherwise(F.lit(0.0))
            ).over(w),
        )
    )
    return (
        km.filter(F.col("d") > 0)
        .select(
            F.col("t").alias("duration_days"),
            F.col("nr").alias("n_risk"),
            F.col("d").alias("n_events"),
            F.when(F.col("hit_zero") == 1, F.lit(0.0))
            .otherwise(F.round(F.exp(F.col("lsum")), 6))
            .alias("survival"),
        )
        .orderBy("duration_days")
    )


# Poisson(1) CDF literals for the bootstrap weights — fixed literal
# doubles on BOTH engines (never engine exp()/factorial), same idiom as
# benford's literal shares
_POIS1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
)
_BOOT_B = 200


def _pois_w_sql(u: str) -> str:
    return " + ".join(
        f"CASE WHEN {u} > {t!r} THEN 1 ELSE 0 END" for t in _POIS1_CDF
    )


_BOOTSTRAP_ORACLE = f"""WITH pc AS (
                 SELECT o_custkey AS k,
                        CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                             AS BIGINT) AS x
                 FROM orders GROUP BY 1),
               reps AS (SELECT unnest(generate_series(1, {_BOOT_B})) AS rep),
               drawn AS (
                 SELECT rep, x,
                        (CAST(('0x' || substr(md5('bs:' ||
                               CAST(rep AS VARCHAR) || ':' ||
                               CAST(k AS VARCHAR)), 1, 8)) AS UBIGINT)
                         + 1.0) / 4294967296.0 AS u
                 FROM pc CROSS JOIN reps),
               w AS (SELECT rep, x, {_pois_w_sql('u')} AS wt FROM drawn),
               means AS (
                 SELECT rep,
                        CAST(sum(wt) AS BIGINT) AS n_r,
                        CAST(sum(wt * x) AS BIGINT) AS s_r
                 FROM w GROUP BY 1),
               dist AS (
                 SELECT CAST(s_r AS DOUBLE) / n_r / 100 AS m
                 FROM means WHERE n_r > 0),
               point AS (
                 SELECT count(*) AS n_customers,
                        CAST(sum(x) AS BIGINT) AS sx
                 FROM pc)
               SELECT n_customers,
                      CAST({_BOOT_B} AS BIGINT) AS b_reps,
                      round(CAST(sx AS DOUBLE) / n_customers / 100, 2)
                        AS mean_revenue,
                      round(quantile_cont(m, 0.025), 2) AS ci_lo,
                      round(quantile_cont(m, 0.975), 2) AS ci_hi
               FROM point CROSS JOIN dist
               GROUP BY n_customers, sx"""


@query("bootstrap_ci", oracle=_BOOTSTRAP_ORACLE)
def bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap 95% confidence interval for mean customer
    lifetime revenue — the uncertainty band descriptive marts never
    ship, computed WITHOUT replacement-resampling shuffles: each
    (customer, replicate) draws a Poisson(1) weight (the standard
    large-N bootstrap approximation, exact as N→∞) from a
    deterministic md5 uniform, so the draw is retry-stable and the
    oracle replays the identical arithmetic.

    Exactness: weights come from comparing the mirrored md5 uniform
    against LITERAL Poisson CDF thresholds (never engine exp());
    per-replicate Σw and Σw·x are BIGINT; each replicate mean is one
    mirrored division and the CI bounds use the proven
    percentile↔quantile_cont pairing over the B=200 replicate means.

    Scale: the replicate expansion happens on the AGGREGATED
    per-customer relation (|customers|·B narrow rows, map-side
    combined straight down to B partials); at extreme scale flip to
    one-pass per-partition elementwise array partials instead of row
    expansion — same statistic, no B× row blowup."""
    orders = load_table(spark, sf_dir, "orders")
    pc = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("x")
    )
    # spread the B× row expansion: AQE coalesces the small per-customer
    # aggregate to one partition, and explode is a narrow op — without a
    # rebalance the whole |customers|·B md5/conv codegen expansion runs
    # in a single task (same finding as bootstrap_ci_partials' Arrow
    # stage, r13; the exchange carries two narrow columns)
    n_par = pc.sparkSession.sparkContext.defaultParallelism
    drawn = pc.repartition(n_par).select(
        "k",
        "x",
        F.explode(F.sequence(F.lit(1), F.lit(_BOOT_B))).alias("rep"),
    ).select(
        "rep",
        "x",
        (
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("bs:"),
                                F.col("rep").cast("string"),
                                F.lit(":"),
                                F.col("k").cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("double")
                + F.lit(1.0)
            )
            / F.lit(4294967296.0)
        ).alias("u"),
    )
    wt = None
    for t in _POIS1_CDF:
        term = F.when(F.col("u") > F.lit(t), 1).otherwise(0)
        wt = term if wt is None else wt + term
    means = (
        drawn.withColumn("wt", wt)
        .groupBy("rep")
        .agg(
            F.sum("wt").cast("long").alias("n_r"),
            F.sum(F.col("wt") * F.col("x")).cast("long").alias("s_r"),
        )
        .filter(F.col("n_r") > 0)
        .select(
            (F.col("s_r").cast("double") / F.col("n_r") / F.lit(100)).alias(
                "m"
            )
        )
    )
    point = pc.agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("x").alias("sx"),
    )
    # the filter makes the empty-input shapes agree: Spark's global agg
    # over zero replicate means still yields one all-NULL row, while the
    # oracle's dist is a plain projection (0 rows) — an empty corpus has
    # no bootstrap distribution, so emit nothing (r8 empty-facts
    # differential)
    dist = means.agg(
        F.round(F.percentile("m", 0.025), 2).alias("ci_lo"),
        F.round(F.percentile("m", 0.975), 2).alias("ci_hi"),
    ).filter(F.col("ci_lo").isNotNull())
    return point.join(F.broadcast(dist)).select(
        "n_customers",
        F.lit(_BOOT_B).cast("long").alias("b_reps"),
        F.round(
            F.col("sx").cast("double") / F.col("n_customers") / F.lit(100), 2
        ).alias("mean_revenue"),
        "ci_lo",
        "ci_hi",
    )


@query("bootstrap_ci_partials", oracle=_BOOTSTRAP_ORACLE)
def bootstrap_ci_partials(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The extreme-scale variant `bootstrap_ci`'s docstring promises:
    one-pass per-partition elementwise ARRAY partials instead of the
    B× row expansion. An Arrow-batched `mapInPandas` receives only the
    per-customer (k, x) relation, computes each customer's B-length
    Poisson weight vector IN PYTHON (hashlib md5 is bit-identical to
    the JVM md5 expression, the literal CDF thresholds fold via
    np.searchsorted — strict `u > t` ⇔ side='left'), and folds every
    batch to ONE row of two B-length int64 partial arrays; the only
    exchange of the whole bootstrap carries (#batches × B) narrow rows
    to the replicate-grain reduce.

    Why Python here when the repo's rule is JVM-side: the B-per-row
    weight vector has no codegen'd JVM form — `transform` lambdas run
    on the INTERPRETED expression path (measured 20.6s for the md5
    fold at sf0.1) and unrolling B literal expression trees blows up
    planning/codegen (42.5s, 10 MiB task binaries); numpy + hashlib
    inside the sanctioned Arrow batch path computes the same draws
    vectorized-per-batch. bootstrap_ci's exploded form stays the
    codegen baseline; this variant exists for the regime where the
    |customers|·B row stream itself is the bottleneck.

    Exactness: identical statistic to bootstrap_ci BIT-FOR-BIT
    (pytest-pinned; the oracle is bootstrap_ci's verbatim) — same
    "bs:{rep}:{k}" md5 draw, same literal thresholds; per-batch
    partial sums are int64 (wt ≤ 7, cents ≤ ~2⁴⁰, batch ≤ 10⁴ rows);
    the replicate reduce and CI tail are bootstrap_ci's verbatim."""
    orders = load_table(spark, sf_dir, "orders")
    pc = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("x")
    )

    def partials(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        thr = np.asarray(_POIS1_CDF)
        reps = [str(r).encode() for r in range(1, _BOOT_B + 1)]
        for pdf in batches:
            if not len(pdf):
                continue
            x = pdf["x"].to_numpy(dtype=np.int64)[:, None]
            u = np.empty((len(pdf), _BOOT_B), dtype=np.float64)
            for i, k in enumerate(pdf["k"].astype(str)):
                kb = (":" + k).encode()
                u[i] = [
                    int.from_bytes(
                        hashlib.md5(b"bs:" + r + kb).digest()[:4], "big"
                    )
                    for r in reps
                ]
            u = (u + 1.0) / 4294967296.0
            w = np.searchsorted(thr, u, side="left").astype(np.int64)
            yield pd.DataFrame(
                {
                    "n_arr": [w.sum(axis=0).tolist()],
                    "s_arr": [(w * x).sum(axis=0).tolist()],
                }
            )

    # AQE coalesces the small per-customer aggregate to ONE partition
    # (measured: 15k rows -> 1 at sf0.1), which would serialize the
    # |customers|×B md5 expansion — the query's dominant cost — on a
    # single Python worker (3.2 s isolated, r13). Round-robin the tiny
    # relation across the session's cores first: the extra exchange
    # carries two narrow columns and is ~100x cheaper than the Python
    # work it parallelizes, at every scale (when |customers| is large
    # enough for the exchange to matter, AQE wasn't coalescing anyway
    # and the repartition is a near-no-op rebalance).
    n_par = pc.sparkSession.sparkContext.defaultParallelism
    part = pc.repartition(n_par).mapInPandas(
        partials, schema="n_arr array<bigint>, s_arr array<bigint>"
    )
    means = (
        part.select(
            F.posexplode(F.arrays_zip("n_arr", "s_arr")).alias("rep", "z")
        )
        .select(
            "rep",
            F.col("z.n_arr").alias("n_p"),
            F.col("z.s_arr").alias("s_p"),
        )
        .groupBy("rep")
        .agg(
            F.sum("n_p").cast("long").alias("n_r"),
            F.sum("s_p").cast("long").alias("s_r"),
        )
        .filter(F.col("n_r") > 0)
        .select(
            (F.col("s_r").cast("double") / F.col("n_r") / F.lit(100)).alias(
                "m"
            )
        )
    )
    point = pc.agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("x").alias("sx"),
    )
    # the filter makes the empty-input shapes agree: Spark's global agg
    # over zero replicate means still yields one all-NULL row, while the
    # oracle's dist is a plain projection (0 rows) — an empty corpus has
    # no bootstrap distribution, so emit nothing (r8 empty-facts
    # differential)
    dist = means.agg(
        F.round(F.percentile("m", 0.025), 2).alias("ci_lo"),
        F.round(F.percentile("m", 0.975), 2).alias("ci_hi"),
    ).filter(F.col("ci_lo").isNotNull())
    return point.join(F.broadcast(dist)).select(
        "n_customers",
        F.lit(_BOOT_B).cast("long").alias("b_reps"),
        F.round(
            F.col("sx").cast("double") / F.col("n_customers") / F.lit(100), 2
        ).alias("mean_revenue"),
        "ci_lo",
        "ci_hi",
    )


@query(
    "ewma_control_chart",
    oracle="""WITH daily AS (
                SELECT CAST(l_shipdate AS DATE) AS d,
                       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                            AS BIGINT) AS cents
                FROM lineitem WHERE l_shipdate IS NOT NULL
                GROUP BY 1),
              m AS (SELECT d, CAST(cents AS DOUBLE) / 100 AS x FROM daily),
              w AS (
                SELECT d, x,
                       list_reduce(list(x) OVER (ORDER BY d
                         ROWS BETWEEN 29 PRECEDING AND CURRENT ROW),
                         (a, b) -> a * 0.8 + 0.2 * b) AS ew
                FROM m)
              SELECT d AS day, round(x, 2) AS revenue,
                     ew AS ewma30,
                     CAST(x > 1.15 * ew OR x < 0.85 * ew AS BIGINT)
                       AS band_breach
              FROM w ORDER BY d""",
)
def ewma_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart (α=0.2) on daily revenue with a ±15% breach
    flag — the smoothed process-control companion to the rolling-z
    anomaly screen (EWMA reacts to small sustained shifts a 3σ rule
    misses).

    Exactness: the EWMA recursion acc←0.8·acc+0.2·x is an ORDER-
    SENSITIVE left fold — both engines run the IDENTICAL fold over the
    identically-ordered trailing-30 window (Spark: `aggregate` seeded
    with the window's first element over `sort_array`ed (day, x)
    structs; DuckDB: `list_reduce`, whose seed is also the first
    element), on per-day money values derived from exact cent sums —
    bit-identical. The EWMA itself is emitted UNROUNDED: it is not a
    grid value (0.8/0.2-weighted folds land on arbitrary doubles), and
    a display round(·,2) only ADDS a divergence channel — Spark rounds
    the shortest decimal repr HALF_UP while DuckDB rounds the true
    binary value, and the two disagree one cent either side of a
    repr-boundary (caught live at sf10: one of 2,499 days landed on
    one; exposure is luck-of-draw, not scale). `revenue` stays rounded
    — cents/100 IS a grid value, never repr-ambiguous. The breach flag
    compares the same doubles against literal band factors.

    Scale: one fact shuffle to the calendar-day grain; the trailing
    window runs single-partition over the DAY relation (date-span
    bounded, pmod idiom) with a 30-element array per row — O(days·30)
    work total."""
    li = load_table(spark, sf_dir, "lineitem")
    # NULL-day filter: see cusum_changepoint (order-dependent fold)
    daily = li.filter(F.col("l_shipdate").isNotNull()).groupBy(
        F.col("l_shipdate").cast("date").alias("d")
    ).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "cents"
        )
    )
    m = daily.select("d", (F.col("cents").cast("double") / F.lit(100)).alias("x"))
    w = (
        Window.partitionBy(xp.single_partition("d"))
        .orderBy("d")
        .rowsBetween(-29, Window.currentRow)
    )
    # sort_array pins frame order explicitly (struct sorts by day first)
    arr = F.transform(
        F.sort_array(F.collect_list(F.struct("d", "x")).over(w)),
        lambda s: s["x"],
    )
    ew = F.aggregate(
        F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
        F.element_at(arr, 1),
        lambda acc, x: acc * F.lit(0.8) + F.lit(0.2) * x,
    )
    out = m.select("d", "x", ew.alias("ew"))
    return out.select(
        F.col("d").alias("day"),
        F.round("x", 2).alias("revenue"),
        F.col("ew").alias("ewma30"),
        (
            (F.col("x") > F.lit(1.15) * F.col("ew"))
            | (F.col("x") < F.lit(0.85) * F.col("ew"))
        )
        .cast("long")
        .alias("band_breach"),
    ).orderBy("day")


@query(
    "log_rank_test",
    oracle="""WITH pu AS (
                SELECT user_id,
                       date_diff('day', min(ts), max(ts)) AS dur,
                       CASE WHEN arg_max(event_type, ts) = 'error'
                            THEN 1 ELSE 0 END AS observed,
                       CASE WHEN bool_or(event_type = 'purchase')
                            THEN 1 ELSE 0 END AS grp_a
                FROM events WHERE event_type IS NOT NULL
                GROUP BY user_id),
              byt AS (
                SELECT CAST(dur AS BIGINT) AS t,
                       CAST(sum(observed) AS BIGINT) AS d,
                       CAST(sum(observed * grp_a) AS BIGINT) AS d1,
                       count(*) AS c,
                       CAST(sum(grp_a) AS BIGINT) AS c1
                FROM pu GROUP BY 1),
              tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                             CAST(sum(c1) AS BIGINT) AS n1tot FROM byt),
              km AS (
                SELECT t, d, d1,
                       n - (CAST(sum(c) OVER w AS BIGINT) - c) AS nr,
                       n1tot - (CAST(sum(c1) OVER w AS BIGINT) - c1) AS nr1
                FROM byt CROSS JOIN tot
                WINDOW w AS (ORDER BY t
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
              s AS (
                SELECT CAST(sum(d1) AS BIGINT) AS o1,
                       round(sum(CAST(d AS DOUBLE) * nr1
                                 / CAST(nr AS DOUBLE)), 6) AS e1,
                       round(sum(CASE WHEN nr > 1 THEN
                               CAST(d AS DOUBLE) * nr1 / CAST(nr AS DOUBLE)
                               * (1.0 - CAST(nr1 AS DOUBLE) / nr)
                               * (nr - d) / (nr - 1)
                             ELSE 0.0 END), 6) AS v
                FROM km WHERE d > 0)
              SELECT (SELECT n1tot FROM tot) AS n_a,
                     (SELECT n - n1tot FROM tot) AS n_b,
                     o1 AS observed_a, e1 AS expected_a,
                     CASE WHEN v > 0 THEN
                       round((CAST(o1 AS DOUBLE) - e1)
                             * (CAST(o1 AS DOUBLE) - e1) / v, 6)
                     END AS chi2
              FROM s""",
)
def log_rank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test: does churn-time survival differ between users who
    ever purchased (group A) and those who never did? The standard
    two-cohort survival comparison that completes the Kaplan–Meier
    family (same lifetime/censoring definitions as `kaplan_meier`;
    same (user_id, ts)-unique input contract).

    Exactness: risk sets (n, n₁), event counts (d, d₁) and O₁ are
    exact BIGINT via the cumulative-below trick; E₁ and the
    hypergeometric variance are duration-grain float sums of mirrored
    int-derived terms, rounded at 6dp before the final mirrored
    (O−E)²/V; an all-float-guard (V > 0 on the rounded value) keeps
    degenerate data NULL on both engines.

    Scale: identical shape to `kaplan_meier` — two grain-reducing
    shuffles, then duration-bounded single-partition windows (pmod
    idiom)."""
    ev = load_table(spark, sf_dir, "events")
    # type-less events are malformed for survival semantics: Spark's
    # max_by would surface a NULL type (making `observed` NULL) where
    # DuckDB's arg_max skips NULL args — r8 NULL-injection divergence;
    # oracles mirror the filter
    pu = ev.filter(F.col("event_type").isNotNull()).groupBy("user_id").agg(
        F.datediff(F.max("ts"), F.min("ts")).cast("long").alias("dur"),
        # fixed-width max_by buffer — see kaplan_meier (same idiom,
        # same bit-identical selection under the (user_id, ts)
        # uniqueness contract; keeps this pass in HashAggregate)
        F.max_by(
            (F.col("event_type") == F.lit("error")).cast("long"), F.col("ts")
        ).alias("observed"),
        F.max((F.col("event_type") == "purchase").cast("long")).alias(
            "grp_a"
        ),
    )
    byt = pu.groupBy(F.col("dur").alias("t")).agg(
        F.sum("observed").alias("d"),
        F.sum(F.col("observed") * F.col("grp_a")).alias("d1"),
        F.count("*").alias("c"),
        F.sum("grp_a").alias("c1"),
    )
    tot = byt.agg(
        F.sum("c").alias("n"), F.sum("c1").alias("n1tot")
    )
    w = (
        Window.partitionBy(xp.single_partition("t"))
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    km = (
        byt.join(F.broadcast(tot))
        .withColumn("nr", F.col("n") - (F.sum("c").over(w) - F.col("c")))
        .withColumn(
            "nr1", F.col("n1tot") - (F.sum("c1").over(w) - F.col("c1"))
        )
    )
    e_term = (
        F.col("d").cast("double")
        * F.col("nr1")
        / F.col("nr").cast("double")
    )
    v_term = F.when(
        F.col("nr") > 1,
        F.col("d").cast("double")
        * F.col("nr1")
        / F.col("nr").cast("double")
        * (F.lit(1.0) - F.col("nr1").cast("double") / F.col("nr"))
        * (F.col("nr") - F.col("d"))
        / (F.col("nr") - F.lit(1)),
    ).otherwise(F.lit(0.0))
    s = km.filter(F.col("d") > 0).agg(
        F.sum("d1").alias("o1"),
        F.round(F.sum(e_term), 6).alias("e1"),
        F.round(F.sum(v_term), 6).alias("v"),
    )
    return (
        s.join(F.broadcast(tot))
        .select(
            F.col("n1tot").alias("n_a"),
            (F.col("n") - F.col("n1tot")).alias("n_b"),
            F.col("o1").alias("observed_a"),
            F.col("e1").alias("expected_a"),
            F.when(
                F.col("v") > 0,
                F.round(
                    (F.col("o1").cast("double") - F.col("e1"))
                    * (F.col("o1").cast("double") - F.col("e1"))
                    / F.col("v"),
                    6,
                ),
            ).alias("chi2"),
        )
    )


@query(
    "moments_profile",
    oracle=with_finite_events("""WITH v AS (
                SELECT event_type,
                       CAST(round(value * 100) AS BIGINT) AS x
                FROM events),
              s AS (
                SELECT event_type,
                       CAST(count(*) AS HUGEINT) AS n,
                       CAST(sum(x) AS HUGEINT) AS s1,
                       CAST(sum(x * x) AS HUGEINT) AS s2,
                       CAST(sum(CAST(x AS HUGEINT) * x * x) AS HUGEINT)
                         AS s3,
                       CAST(sum(CAST(x AS HUGEINT) * x * x * x) AS HUGEINT)
                         AS s4
                FROM v GROUP BY 1),
              c AS (
                SELECT event_type, n, s1,
                       CAST(s1 AS VARCHAR) AS s1_anchor,
                       CAST(s2 AS VARCHAR) AS s2_anchor,
                       CAST(s3 AS VARCHAR) AS s3_anchor,
                       CAST(s4 AS VARCHAR) AS s4_anchor,
                       CAST(n AS DOUBLE) AS nd, CAST(s1 AS DOUBLE) AS s1d,
                       CAST(s2 AS DOUBLE) AS s2d, CAST(s3 AS DOUBLE) AS s3d,
                       CAST(s4 AS DOUBLE) AS s4d
                FROM s),
              k AS (
                SELECT event_type, n, s1, nd, s2d,
                       s1_anchor, s2_anchor, s3_anchor, s4_anchor,
                       (nd * s2d - s1d * s1d) AS k2,
                       (nd * nd * s3d - 3 * nd * s1d * s2d
                        + 2 * s1d * s1d * s1d) AS k3,
                       (nd * nd * nd * s4d - 4 * nd * nd * s1d * s3d
                        + 6 * nd * s1d * s1d * s2d
                        - 3 * s1d * s1d * s1d * s1d) AS k4
                FROM c)
              SELECT event_type,
                     CAST(n AS BIGINT) AS n_events,
                     round(CAST(s1 AS DOUBLE) / nd / 100, 4)
                       AS mean_value,
                     CASE WHEN k2 > 1e-12 * nd * s2d THEN
                       round(sqrt(greatest(k2, 0.0)) / nd / 100, 4)
                     ELSE 0.0 END AS std_value,
                     CASE WHEN k2 > 1e-12 * nd * s2d THEN
                       round(k3 / (k2 * sqrt(k2)), 6)
                     END AS skewness,
                     CASE WHEN k2 > 1e-12 * nd * s2d THEN
                       round(k4 / (k2 * k2) - 3.0, 6)
                     END AS excess_kurtosis,
                     s1_anchor, s2_anchor, s3_anchor, s4_anchor
              FROM k
              ORDER BY event_type"""),
)
def moments_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-moment distribution profile per event type: mean, std,
    skewness g₁ and excess kurtosis g₂ — the shape screen behind the
    "is this metric even normal-ish" question every control chart and
    z-test silently assumes.

    Exactness: on the cent grid the four power sums Σx..Σx⁴ accumulate
    EXACTLY in 128-bit integers (Spark DECIMAL(38,0) ↔ DuckDB
    HUGEINT), and the cumulant identities reduce to the engine-neutral
    closed forms g₁ = K₃/K₂^{3/2}, g₂ = K₄/K₂² − 3 with
    K₂ = nΣ₂−Σ₁², K₃ = n²Σ₃−3nΣ₁Σ₂+2Σ₁³,
    K₄ = n³Σ₄−4n²Σ₁Σ₃+6nΣ₁²Σ₂−3Σ₁⁴ — never the engines' own
    streaming-moment aggregates (skewness()/kurtosis() internals
    differ). The K combinations themselves run in DOUBLE on both
    sides: the all-integer forms overflow any fixed-width type as n
    grows (n³Σ₄ ≈ 1.6e44 at sf10 — caught live, r12), while identical
    exact sums cast to identical doubles through identical expression
    trees stay hash-equal at every scale. √ via sqrt
    (correctly-rounded IEEE), never pow(x,1.5) (libm ulp).

    Zero-variance groups: fl(n·s2) − fl(s1²) can land NEGATIVE (or
    spuriously tiny-positive) for a truly constant group — double
    cancellation noise is ~5e-16·n·Σ₂ in magnitude, and sqrt of the
    negative draw raised in DuckDB while a tiny-positive draw passed a
    naive k2 > 0 guard and emitted astronomically wrong shape stats
    (ADVICE r12). Both hazards are closed by a MAGNITUDE-RELATIVE
    guard mirrored on both engines: shape stats (and a nonzero std)
    are emitted only when k2 > 1e-12·n·Σ₂ — three decades above the
    cancellation floor — else std→0.0 and skew/kurtosis→NULL, exactly
    the values the all-integer form produced for constant groups. The
    root is additionally clamped (sqrt(greatest(k2, 0))) so no
    negative ever reaches sqrt on either engine.

    Exact anchors through the gate (ADVICE r12): the 128-bit power
    sums are kept as output columns s1_anchor…s4_anchor, emitted as
    STRINGS on both engines (DECIMAL(38,0) ↔ HUGEINT print the same
    digits; numeric compare of the two types is hash-fragile) — cf.
    cusum's __s_exact. The 4/6dp rounds of noise-scale cumulants sit
    near .5 boundaries, so without an exact anchor a future engine
    change could flip a round and slip through as a coin-toss; with
    the sums compared digit-for-digit any upstream divergence is a
    loud value diff. Anchoring the RAW k-doubles instead is not
    possible cross-engine: DuckDB's HUGEINT→DOUBLE cast is not
    correctly rounded (upper·2⁶⁴+lower in double arithmetic, two
    roundings) while Spark's Decimal→double is, so the k4 doubles
    already differ at the ulp (measured 3.5e-16 relative at sf0.01) —
    which is also why the shape stats round at 4/6dp rather than
    comparing raw. The anchors thread through the oracle's CTE chain
    rather than re-joining on event_type: the r13 form's
    `JOIN sa USING (event_type)` silently dropped the NULL-typed
    group (NULL never equi-joins) while the engine's single pipeline
    kept it — 6 vs 5 rows on the NULL-injected corpus (caught by the
    r14 adversarial re-sweep, the exact class it exists for).

    Scale: ONE map-side-combined shuffle carrying five numeric
    accumulators per group — the entire query."""
    ev = metric_events(spark, sf_dir)
    d = "decimal(38,0)"
    x = F.round(F.col("value") * 100).cast("long")
    v = ev.select("event_type", x.alias("x"))
    s = v.groupBy("event_type").agg(
        F.count("*").cast(d).alias("n"),
        F.sum(F.col("x").cast(d)).cast(d).alias("s1"),
        F.sum(F.col("x").cast(d) * F.col("x")).cast(d).alias("s2"),
        F.sum(F.col("x").cast(d) * F.col("x") * F.col("x")).cast(d).alias("s3"),
        F.sum(F.col("x").cast(d) * F.col("x") * F.col("x") * F.col("x"))
        .cast(d)
        .alias("s4"),
    )
    nd, s1d, s2d, s3d, s4d = (
        F.col(c).cast("double") for c in ("n", "s1", "s2", "s3", "s4")
    )
    # cumulant COMBINATIONS in double from the exact 128-bit power
    # sums: the all-integer k3/k4 forms overflow ANY fixed-width type
    # once n grows — n³Σ₄ ≈ 1.6e44 at sf10's 2M-row groups blew
    # DECIMAL(38) (caught live, r12 decade). Both engines cast the
    # identical exact sums (correctly-rounded → identical doubles) and
    # run the identical expression trees, so the doubles — and the
    # 4/6dp rounds — still hash-match; the mild cancellation (terms
    # ~1e41 vs k4 ~1e40 at sf10) costs ~1 of 16 digits, far inside
    # the rounding grids.
    k = s.select(
        "event_type",
        F.col("n"),
        F.col("s1"),
        F.col("s1").cast("string").alias("s1_anchor"),
        F.col("s2").cast("string").alias("s2_anchor"),
        F.col("s3").cast("string").alias("s3_anchor"),
        F.col("s4").cast("string").alias("s4_anchor"),
        nd.alias("nd"),
        s2d.alias("s2d"),
        (nd * s2d - s1d * s1d).alias("k2"),
        (nd * nd * s3d - F.lit(3) * nd * s1d * s2d
         + F.lit(2) * s1d * s1d * s1d).alias("k3"),
        (
            nd * nd * nd * s4d
            - F.lit(4) * nd * nd * s1d * s3d
            + F.lit(6) * nd * s1d * s1d * s2d
            - F.lit(3) * s1d * s1d * s1d * s1d
        ).alias("k4"),
    )
    k2d = F.col("k2")
    # magnitude-relative zero test: double cancellation noise in k2 is
    # ~5e-16·nd·s2d, so 1e-12·nd·s2d separates "constant group" from
    # real variance with three decades of margin on each side
    guard = k2d > F.lit(1e-12) * F.col("nd") * F.col("s2d")
    return k.select(
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        F.round(
            F.col("s1").cast("double") / F.col("nd") / F.lit(100),
            4,
        ).alias("mean_value"),
        F.when(
            guard,
            F.round(
                F.sqrt(F.greatest(k2d, F.lit(0.0)))
                / F.col("nd")
                / F.lit(100),
                4,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("std_value"),
        F.when(
            guard,
            F.round(F.col("k3") / (k2d * F.sqrt(k2d)), 6),
        ).alias("skewness"),
        F.when(
            guard,
            F.round(
                F.col("k4") / (k2d * k2d) - F.lit(3.0), 6
            ),
        ).alias("excess_kurtosis"),
        F.col("s1_anchor"),
        F.col("s2_anchor"),
        F.col("s3_anchor"),
        F.col("s4_anchor"),
    ).orderBy("event_type")


@query(
    "mutual_information",
    oracle="""WITH cells AS (
                SELECT c_mktsegment AS seg, o_orderpriority AS pri,
                       count(*) AS n
                FROM orders JOIN customer ON o_custkey = c_custkey
                GROUP BY 1, 2),
              rt AS (SELECT seg, CAST(sum(n) AS BIGINT) AS rn
                     FROM cells GROUP BY 1),
              ct AS (SELECT pri, CAST(sum(n) AS BIGINT) AS cn
                     FROM cells GROUP BY 1),
              tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM cells),
              hr AS (SELECT round(sum(CAST(rn AS DOUBLE)
                                      * ln(CAST(rn AS DOUBLE))), 6)
                            AS s_r FROM rt),
              hc AS (SELECT round(sum(CAST(cn AS DOUBLE)
                                      * ln(CAST(cn AS DOUBLE))), 6)
                            AS s_c FROM ct),
              mi AS (
                SELECT round(sum((CAST(n AS DOUBLE) / CAST(nt AS DOUBLE))
                                 * ln(CAST(nt AS DOUBLE) * CAST(n AS DOUBLE)
                                      / (CAST(rn AS DOUBLE)
                                         * CAST(cn AS DOUBLE)))), 6) AS mi,
                       max(nt) AS nt
                FROM cells
                JOIN rt USING (seg) JOIN ct USING (pri) CROSS JOIN tot)
              SELECT CAST(nt AS BIGINT) AS n_rows,
                     mi AS mutual_info,
                     round(ln(CAST(nt AS DOUBLE))
                           - s_r / CAST(nt AS DOUBLE), 6) AS h_segment,
                     round(ln(CAST(nt AS DOUBLE))
                           - s_c / CAST(nt AS DOUBLE), 6) AS h_priority,
                     CASE WHEN s_r / CAST(nt AS DOUBLE)
                               < ln(CAST(nt AS DOUBLE))
                           AND s_c / CAST(nt AS DOUBLE)
                               < ln(CAST(nt AS DOUBLE)) THEN
                       round(mi / sqrt((ln(CAST(nt AS DOUBLE))
                                        - s_r / CAST(nt AS DOUBLE))
                                       * (ln(CAST(nt AS DOUBLE))
                                          - s_c / CAST(nt AS DOUBLE))), 6)
                     END AS nmi
              FROM mi CROSS JOIN hr CROSS JOIN hc""",
)
def mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(segment; priority) with marginal entropies
    and the geometric-mean normalized MI — the effect-size companion to
    `chi_square_independence` on the SAME contingency cells (capability
    extension: chi2 says "is the association real", MI says "how many
    nats does knowing the segment buy you").

    Exactness: all cell/margin counts are exact BIGINT; only OBSERVED
    cells contribute (lim p→0 of p·ln(…) = 0, so structural zeros drop
    out — no margin grid needed, unlike chi-square). Each term is one
    token-mirrored double expression; the ≤25-term MI sum and the
    5-term marginal-entropy sums are rounded at 6dp before entering the
    final mirrored NMI expression, so both engines combine identical
    rounded intermediates. NMI guards degenerate marginals (H=0) to
    NULL via the mirrored ln/total comparison, not a float == 0 test.

    Scale: one fact shuffle (orders⋈customer → ≤25-cell hash agg with
    map-side combine); margins and totals are tiny rollups of the cell
    relation, broadcast back. No windows, no collect."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    cells = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count("*").alias("n"))
    )
    rt = cells.groupBy("seg").agg(F.sum("n").alias("rn"))
    ct = cells.groupBy("pri").agg(F.sum("n").alias("cn"))
    tot = cells.agg(F.sum("n").alias("nt"))
    hr = rt.agg(
        F.round(
            F.sum(F.col("rn").cast("double") * F.log(F.col("rn").cast("double"))),
            6,
        ).alias("s_r")
    )
    hc = ct.agg(
        F.round(
            F.sum(F.col("cn").cast("double") * F.log(F.col("cn").cast("double"))),
            6,
        ).alias("s_c")
    )
    nt_d = F.col("nt").cast("double")
    term = (F.col("n").cast("double") / nt_d) * F.log(
        nt_d
        * F.col("n").cast("double")
        / (F.col("rn").cast("double") * F.col("cn").cast("double"))
    )
    mi = (
        cells.join(rt, "seg")
        .join(F.broadcast(ct), "pri")
        .join(F.broadcast(tot))
        .agg(F.round(F.sum(term), 6).alias("mi"), F.max("nt").alias("nt"))
    )
    h_seg = F.log(nt_d) - F.col("s_r") / nt_d
    h_pri = F.log(nt_d) - F.col("s_c") / nt_d
    return (
        mi.join(F.broadcast(hr))
        .join(F.broadcast(hc))
        .select(
            F.col("nt").cast("long").alias("n_rows"),
            F.col("mi").alias("mutual_info"),
            F.round(h_seg, 6).alias("h_segment"),
            F.round(h_pri, 6).alias("h_priority"),
            F.when(
                (F.col("s_r") / nt_d < F.log(nt_d))
                & (F.col("s_c") / nt_d < F.log(nt_d)),
                F.round(F.col("mi") / F.sqrt(h_seg * h_pri), 6),
            ).alias("nmi"),
        )
    )


@query(
    "runs_test",
    oracle="""WITH daily AS (
                SELECT CAST(l_shipdate AS DATE) AS d,
                       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                            * CAST(round((1 - l_discount) * 100) AS BIGINT))
                            AS BIGINT) AS x
                FROM lineitem WHERE l_shipdate IS NOT NULL
                GROUP BY 1),
              g AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS t
                    FROM daily),
              s AS (SELECT d,
                           CASE WHEN g.n * x > g.t THEN 1 ELSE 0 END AS sgn
                    FROM daily CROSS JOIN g
                    WHERE g.n * x <> g.t),
              r AS (SELECT sgn, lag(sgn) OVER (ORDER BY d) AS prev FROM s),
              agg AS (SELECT
                        CAST(coalesce(sum(CASE WHEN prev IS NULL
                                               OR sgn <> prev
                                      THEN 1 ELSE 0 END), 0) AS BIGINT)
                          AS runs,
                        CAST(coalesce(sum(sgn), 0) AS BIGINT) AS n1,
                        CAST(coalesce(sum(1 - sgn), 0) AS BIGINT) AS n2
                      FROM r)
              SELECT (n1 + n2) AS n_days, n1 AS n_above, n2 AS n_below,
                     runs,
                     CASE WHEN n1 + n2 > 0 THEN
                       round(1.0 + 2.0 * CAST(n1 AS DOUBLE)
                             * CAST(n2 AS DOUBLE)
                             / CAST(n1 + n2 AS DOUBLE), 6)
                     END AS expected_runs,
                     CASE WHEN 2 * n1 * n2 * (2 * n1 * n2 - (n1 + n2)) > 0
                          THEN round(
                       (CAST(runs AS DOUBLE)
                        - (1.0 + 2.0 * CAST(n1 AS DOUBLE)
                           * CAST(n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)))
                       / sqrt(CAST(2 * n1 * n2 AS DOUBLE)
                              * CAST(2 * n1 * n2 - (n1 + n2) AS DOUBLE)
                              / (CAST(n1 + n2 AS DOUBLE)
                                 * CAST(n1 + n2 AS DOUBLE)
                                 * CAST(n1 + n2 - 1 AS DOUBLE))), 6)
                     END AS z_score
              FROM agg""",
)
def runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test on the daily revenue series: is the
    above/below-mean sign sequence random, or does it cluster (trend /
    level shift) or alternate (overdifferencing)? The residual-
    randomness companion to `cusum_changepoint` and
    `ewma_control_chart` on the same daily relation. Returns ONE row:
    sign counts, observed runs, expected runs, and the normal-
    approximation z.

    Exactness: the above/below split never touches floats — day i is
    "above" iff n·x_i > T in exact BIGINT (mean-tie days are excluded
    by the same integer comparison, so neither engine ever evaluates
    x̄ as a double). Runs count via lag over the sign sequence is pure
    integer. E[R] and Var[R] come from n1/n2 through token-mirrored
    double expressions (the variance numerator 2n1n2(2n1n2−n) is
    BIGINT-exact and also guards degenerate one-sided sequences →
    NULL z); final round at 6dp.

    Scale: one fact shuffle to the calendar-day grain; the lag window
    runs single-partition over the day relation — bounded by the date
    span (pmod idiom), never data volume."""
    li = load_table(spark, sf_dir, "lineitem")
    # NULL-day filter: see cusum_changepoint (order-dependent fold)
    daily = li.filter(F.col("l_shipdate").isNotNull()).groupBy(
        F.col("l_shipdate").cast("date").alias("d")
    ).agg(F.sum(_disc_price_grid()).alias("x"))
    g = daily.agg(F.count("*").alias("n"), F.sum("x").alias("t"))
    s = (
        daily.join(F.broadcast(g))
        .where(F.col("n") * F.col("x") != F.col("t"))
        .select(
            "d",
            F.when(F.col("n") * F.col("x") > F.col("t"), 1)
            .otherwise(0)
            .alias("sgn"),
        )
    )
    wo = Window.partitionBy(xp.single_partition("d")).orderBy("d")
    r = s.select("sgn", F.lag("sgn").over(wo).alias("prev"))
    agg = r.agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("prev").isNull() | (F.col("sgn") != F.col("prev")),
                    1,
                ).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("runs"),
        F.coalesce(F.sum("sgn"), F.lit(0)).cast("long").alias("n1"),
        F.coalesce(F.sum(F.lit(1) - F.col("sgn")), F.lit(0))
        .cast("long")
        .alias("n2"),
    )
    n1, n2, runs = F.col("n1"), F.col("n2"), F.col("runs")
    n1d, n2d = n1.cast("double"), n2.cast("double")
    nd = (n1 + n2).cast("double")
    expected = F.lit(1.0) + F.lit(2.0) * n1d * n2d / nd
    var_num = F.lit(2) * n1 * n2 * (F.lit(2) * n1 * n2 - (n1 + n2))
    z = (runs.cast("double") - expected) / F.sqrt(
        (F.lit(2) * n1 * n2).cast("double")
        * (F.lit(2) * n1 * n2 - (n1 + n2)).cast("double")
        / (nd * nd * (n1 + n2 - 1).cast("double"))
    )
    return agg.select(
        (n1 + n2).alias("n_days"),
        n1.alias("n_above"),
        n2.alias("n_below"),
        runs.alias("runs"),
        F.when(n1 + n2 > 0, F.round(expected, 6)).alias("expected_runs"),
        F.when(var_num > 0, F.round(z, 6)).alias("z_score"),
    )
