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
cells (|segments|×|priorities|), calendar days, nation×month — never on
fact rows. The one single-partition window (CUSUM) is over the
calendar-day relation, bounded by the date span, and uses the repo's
pmod partition idiom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from core_telecoms_etl_spark.queries import query
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
              SELECT max(nt) AS n_rows,
                     CAST((SELECT count(*) FROM rt) - 1 AS BIGINT)
                       * CAST((SELECT count(*) FROM ct) - 1 AS BIGINT) AS dof,
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
        rt.crossJoin(ct)
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
    return terms.agg(
        F.max("nt").alias("n_rows"),
        ((F.max("r") - F.lit(1)) * (F.max("c") - F.lit(1)))
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
                FROM lineitem GROUP BY 1),
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
                     (g.n * c.cx - c.i * g.t) AS s_scaled,
                     round(CAST(g.n * c.cx - c.i * g.t AS DOUBLE)
                           / (CAST(g.n AS DOUBLE) * 1e4), 2) AS cusum_money
              FROM c CROSS JOIN g
              ORDER BY abs(g.n * c.cx - c.i * g.t) DESC, c.d
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
    S'_i = n·C_i − i·T — argmax|S'| needs no floats at all; only the
    reported magnitude divides exact ints once (n·C_i ≤ 4e17 at sf0.1;
    cast the cumulative product to DECIMAL(38,0) beyond ~sf10).

    Scale: one fact shuffle to the calendar-day grain; the running sum
    and row_number run single-partition over the day relation — bounded
    by the date span (~2.4k rows for 6.5 years), NOT data volume, the
    same justification as the repo's bucket-offset tables. TakeOrdered
    (LIMIT 1) ships one row to the driver."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        F.col("l_shipdate").cast("date").alias("d")
    ).agg(F.sum(_disc_price_grid()).alias("x"))
    g = daily.agg(F.count("*").alias("n"), F.sum("x").alias("t"))
    # single-partition by construction (pmod idiom): the day relation is
    # calendar-bounded, so one task scanning ~2.4k rows is the plan we
    # want — not a fact-sized global window
    w = (
        Window.partitionBy(F.pmod(F.lit(0), F.lit(1)))
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wo = Window.partitionBy(F.pmod(F.lit(0), F.lit(1))).orderBy("d")
    c = daily.select(
        "d",
        F.sum("x").over(w).alias("cx"),
        F.row_number().over(wo).cast("long").alias("i"),
    )
    s_scaled = F.col("n") * F.col("cx") - F.col("i") * F.col("t")
    return (
        c.join(F.broadcast(g))
        .select(
            F.col("d").alias("change_date"),
            F.col("n").alias("n_days"),
            s_scaled.alias("s_scaled"),
            F.round(
                s_scaled.cast("double") / (F.col("n").cast("double") * F.lit(1e4)),
                2,
            ).alias("cusum_money"),
        )
        .orderBy(F.abs(F.col("s_scaled")).desc(), "change_date")
        .limit(1)
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
