"""Experiment & customer-scoring statistics (capability extensions: the
reference stops at descriptive star-schema aggregates — a telecom
analytics stack also ships experiment readouts and customer-value
segmentation on the same tables).

Determinism design (the repo-wide rules, `queries/__init__.py`):
- Accumulations run in BIGINT on integer-valued metrics (event counts,
  decimal-grid money), never float sums — both engines produce the
  exact same integers regardless of partitioning/summation order.
- Derived doubles (means, variances, z-scores) are computed FROM those
  exact integers with a token-for-token mirrored expression, so the
  IEEE results are bit-identical across engines.

Scale design: the A/B readout, correlation, and rollup merge are plain
groupBy aggregations (one shuffle each, map-side combined, a handful
of longs per group); the A/B readout ends in a 2-row
conditional-aggregate fold. RFM's quartile windows partition by
market segment — at extreme cardinality swap the in-segment ntile for
pre-computed (approx) boundary joins. The KS test builds its global
CDF order with the two-level range-bucketed prefix sum (packing.py
shape) — never a fact-sized single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from core_telecoms_etl_spark.operators.sampling import hash_bucket

__all__ = [
    "ab_test_zscore",
    "rfm_segments",
    "merge_partial_rollup",
    "ks_two_sample",
    "mann_whitney_u",
]


def ab_test_zscore(
    events: DataFrame,
    *,
    unit_col: str = "user_id",
    success_type: str = "purchase",
    type_col: str = "event_type",
    salt: str = "ab",
    critical: float = 1.96,
) -> DataFrame:
    """Two-sample z-test readout for a hash-randomized experiment:
    units are split 50/50 by stable md5 bucket (`sampling.hash_bucket`
    — the same portable assignment the dataset splitter uses, so a
    unit's arm never changes across runs or engines), the per-unit
    metric is its `success_type` event count, and the readout is the
    classic Welch z on the two arm means.

    Returns ONE row: per-arm unit counts and means, the z statistic,
    and a 0/1 `significant` flag at the given critical value.

    Exactness: per-unit counts, arm sums Σx and Σx² are all BIGINT;
    mean and sample variance are derived from those integers with the
    mirrored expression  var = (n·Σx² − (Σx)²) / (n·(n−1))  so both
    engines divide bit-identical doubles. Bounds: int64 holds n·Σx²
    up to ~10⁸ units at ~10³ events each; beyond that cast the two
    accumulators to DECIMAL(38,0) (DuckDB is already 128-bit).

    Scale: two shuffles total — per-unit count (map-side combined),
    then a 2-group aggregate folded to one row by conditional
    aggregation. No window, no collect."""
    per_unit = (
        events.groupBy(F.col(unit_col).alias("__u"))
        .agg(
            F.sum(
                F.when(F.col(type_col) == success_type, 1).otherwise(0)
            )
            .cast("long")
            .alias("__x")
        )
        .select(
            hash_bucket(F.col("__u"), 2, salt).alias("__arm"), "__x"
        )
    )
    arms = per_unit.groupBy("__arm").agg(
        F.count("*").alias("__n"),
        F.sum("__x").alias("__s"),
        F.sum(F.col("__x") * F.col("__x")).alias("__ss"),
    )

    def pick(arm: int, col: str):
        return F.max(F.when(F.col("__arm") == arm, F.col(col)))

    one = arms.agg(
        pick(0, "__n").alias("n_a"),
        pick(0, "__s").alias("s_a"),
        pick(0, "__ss").alias("ss_a"),
        pick(1, "__n").alias("n_b"),
        pick(1, "__s").alias("s_b"),
        pick(1, "__ss").alias("ss_b"),
    )

    def mean(s, n):
        return F.col(s).cast("double") / F.col(n)

    def var(n, s, ss):
        num = F.col(n) * F.col(ss) - F.col(s) * F.col(s)
        den = F.col(n).cast("double") * (F.col(n) - F.lit(1))
        return num.cast("double") / den

    mean_a, mean_b = mean("s_a", "n_a"), mean("s_b", "n_b")
    se = F.sqrt(
        var("n_a", "s_a", "ss_a") / F.col("n_a")
        + var("n_b", "s_b", "ss_b") / F.col("n_b")
    )

    def vnum(n, s, ss):
        return F.col(n) * F.col(ss) - F.col(s) * F.col(s)

    # z is NULL (not an ANSI divide-by-zero, not an engine-specific
    # inf/nan) when either arm is degenerate (n<=1) or both arms have
    # zero variance — the guard is all-integer, so both engines take
    # the same branch; CASE evaluates only the taken branch
    guard = (
        (F.col("n_a") > 1)
        & (F.col("n_b") > 1)
        & ((vnum("n_a", "s_a", "ss_a") + vnum("n_b", "s_b", "ss_b")) > 0)
    )
    z = F.when(guard, (mean_a - mean_b) / se)
    return one.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        mean_a.alias("mean_a"),
        mean_b.alias("mean_b"),
        z.alias("z_stat"),
        (F.abs(z) > F.lit(critical)).cast("long").alias("significant"),
    )


def rfm_segments(
    orders: DataFrame,
    lineitem: DataFrame,
    customer: DataFrame,
    *,
    grid: int = 100,
) -> DataFrame:
    """RFM (recency / frequency / monetary) quartile segmentation, the
    classic customer-value scoring: per customer, days since last
    order (vs the corpus max order date — reproducible, not wall
    clock), order count, and lifetime revenue on the cent grid; each
    scored 1–4 by ntile quartile WITHIN the customer's market segment
    (best quartile = 1), then segment×score cells are counted.

    Exactness: recency/frequency are integers; monetary accumulates
    round(l_extendedprice·grid) BIGINTs — no float sums anywhere, and
    ntile over a fully tie-broken order (metric, custkey) is
    SQL-standard-deterministic in both engines. Output is all
    BIGINT/text.

    Scale: revenue aggregates lineitem by orderkey-joined customer —
    map-side combined, one shuffle per join/agg; the corpus max date
    is a 1-row broadcast; the three ntile windows share ONE exchange
    (same partition key, per-segment sort). In-segment quartiles keep
    windows off the global-sort path; at extreme per-segment
    cardinality replace ntile with broadcast boundary joins from
    (approx) percentiles."""
    ref = orders.agg(F.max("o_orderdate").alias("__ref"))
    per_cust = (
        orders.join(
            lineitem,
            orders["o_orderkey"] == lineitem["l_orderkey"],
        )
        .groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("__last"),
            F.countDistinct("o_orderkey").alias("frequency"),
            F.sum(
                F.round(F.col("l_extendedprice") * grid).cast("long")
            ).alias("__m_grid"),
        )
        .join(F.broadcast(ref))
        .select(
            "o_custkey",
            F.datediff("__ref", "__last").cast("long").alias("recency"),
            F.col("frequency").cast("long").alias("frequency"),
            "__m_grid",
        )
    )
    seg = per_cust.join(
        customer.select("c_custkey", "c_mktsegment"),
        per_cust["o_custkey"] == customer["c_custkey"],
    )

    def quartile(metric, asc: bool):
        order = [
            F.col(metric).asc() if asc else F.col(metric).desc(),
            F.col("c_custkey").asc(),
        ]
        w = Window.partitionBy("c_mktsegment").orderBy(*order)
        return F.ntile(4).over(w)

    scored = seg.select(
        "c_mktsegment",
        quartile("recency", asc=True).cast("long").alias("r_score"),
        quartile("frequency", asc=False).cast("long").alias("f_score"),
        quartile("__m_grid", asc=False).cast("long").alias("m_score"),
    )
    return scored.groupBy(
        "c_mktsegment", "r_score", "f_score", "m_score"
    ).agg(F.count("*").cast("long").alias("n_customers"))


def merge_partial_rollup(
    partials,
    *,
    key_cols: list[str],
    sum_cols: list[str],
    count_col: str = "n",
) -> "DataFrame":
    """Merge partial-aggregate state tables (each holding per-key SUMs
    and COUNTs) into one rollup WITHOUT rescanning the rows that
    produced them — the incremental-aggregation pattern: keep a small
    state table per grain, aggregate only the new batch, merge. Sums
    and counts are algebraic (merge = re-sum), so the merged result is
    exactly the full recompute as long as the partials accumulate in
    BIGINT (integer re-summation is order-insensitive; float partials
    would not be).

    Scale: the state tables are |keys|-sized, not |rows|-sized —
    merging shuffles only per-key partial rows. This is the batch
    analogue of the streaming CMS/HLL merge path and works for any
    sum/count/min/max-decomposable aggregate (avg = merged sum /
    merged count)."""
    if not partials:
        raise ValueError("merge_partial_rollup needs >= 1 partial")
    out = partials[0]
    for p in partials[1:]:
        out = out.unionByName(p)
    return out.groupBy(*key_cols).agg(
        *[F.sum(c).cast("long").alias(c) for c in sum_cols],
        F.sum(count_col).cast("long").alias(count_col),
    )


def ks_two_sample(
    df: DataFrame,
    *,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    n_buckets: int = 256,
    critical: float = 1.358,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov test, distribution-shift
    detection between two cohorts (did this week's purchase amounts
    drift from last week's?). Returns ONE row: n_a, n_b, the scaled
    integer statistic, D, and a reject flag at the given critical
    coefficient (1.358 ≈ α=0.05).

    Exactness: D = max_v |F_a(v) − F_b(v)| is computed as the
    all-integer max |n_b·C_a(v) − n_a·C_b(v)| over per-value
    cumulative counts — no float CDFs, so any engine that sums the
    same integers gets the identical statistic; only the final
    D = scaled/(n_a·n_b) and threshold are (mirrored) IEEE. Bounds:
    n_b·C_a ≤ n_a·n_b keeps int64 to ~3×10⁹ rows per side; beyond
    that cast the two cumulative products to DECIMAL(38,0).

    Scale: the cumulative CDFs need a GLOBAL value order — built with
    the repo's two-level prefix sum (packing.py shape), not a
    single-partition window: per-value counts shuffle once on value,
    values range-bucket by mirrored width arithmetic, within-bucket
    running sums parallelize across buckets, and only the B-row
    bucket-total table prefix-sums single-partition before
    broadcasting back. A plain `Window.orderBy(value)` would pull
    every distinct value through one task. The per-value relation is
    referenced by several branches (CDF window, bucket totals, sample
    sizes); Spark's runtime exchange reuse dedups the repeated
    shuffle (verified: 4 ReusedExchange nodes in the final adaptive
    plan at sf0.1), and sample sizes fold from the B-row bucket
    totals rather than a fresh fact pass."""
    # NULL values must not enter the CDF: Spark orders NULLS FIRST asc,
    # DuckDB NULLS LAST, so a surviving NULL value-group would land at
    # opposite ends of the two engines' prefix sums and corrupt the
    # cumulative counts. Callers' oracles mirror this with
    # `AND <value> IS NOT NULL`.
    filt = df.filter(
        F.col(group_col).isin([group_a, group_b])
        & F.col(value_col).isNotNull()
    )
    per_value = filt.groupBy(F.col(value_col).alias("__v")).agg(
        F.sum(
            F.when(F.col(group_col) == group_a, 1).otherwise(0)
        ).alias("__a"),
        F.sum(
            F.when(F.col(group_col) == group_b, 1).otherwise(0)
        ).alias("__b"),
    )
    span = per_value.agg(
        F.min("__v").alias("__lo"), F.max("__v").alias("__hi")
    )
    # bucket only needs MONOTONICITY in __v (floats: -, *, / by a
    # positive constant are all non-strictly monotone), not any
    # cross-engine agreement — the oracle never sees it; degenerate
    # single-value spans collapse to bucket 0 instead of dividing by 0
    bucketed = per_value.join(F.broadcast(span)).withColumn(
        "__bkt",
        F.when(
            F.col("__hi") > F.col("__lo"),
            F.least(
                F.lit(n_buckets - 1),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.col("__v") - F.col("__lo"))
                        * n_buckets
                        / (F.col("__hi") - F.col("__lo"))
                    ).cast("long"),
                ),
            ),
        ).otherwise(F.lit(0)),
    )
    w_in = (
        Window.partitionBy("__bkt")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = bucketed.select(
        "__bkt",
        "__v",
        F.sum("__a").over(w_in).alias("__ca_in"),
        F.sum("__b").over(w_in).alias("__cb_in"),
    )
    totals = bucketed.groupBy("__bkt").agg(
        F.sum("__a").alias("__ta"), F.sum("__b").alias("__tb")
    )
    # B-row offsets table: deliberately single-partition (B ≪ N); the
    # pmod partition key suppresses the spurious global-window warning
    # (same idiom as packing.py)
    wg = (
        Window.partitionBy(F.pmod(F.col("__bkt"), F.lit(1)))
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.select(
        "__bkt",
        (F.sum("__ta").over(wg) - F.col("__ta")).alias("__oa"),
        (F.sum("__tb").over(wg) - F.col("__tb")).alias("__ob"),
    )
    # sample sizes fold from the B-row bucket totals — never a third
    # pass over the fact rows
    n = totals.agg(
        F.sum("__ta").cast("long").alias("n_a"),
        F.sum("__tb").cast("long").alias("n_b"),
    )
    scaled = (
        cum.join(F.broadcast(offsets), "__bkt")
        .join(F.broadcast(n))
        .select(
            F.abs(
                F.col("n_b") * (F.col("__oa") + F.col("__ca_in"))
                - F.col("n_a") * (F.col("__ob") + F.col("__cb_in"))
            ).alias("__s")
        )
        .agg(F.max("__s").cast("long").alias("d_scaled"))
    )
    na, nb = F.col("n_a"), F.col("n_b")
    prod = na.cast("double") * nb
    # all-integer guard: an empty side means there is no test — NULL
    # D/flag instead of an ANSI 0/0 divide error
    ok = (na > 0) & (nb > 0)
    d = F.when(ok, F.col("d_scaled").cast("double") / prod)
    thresh = F.lit(critical) * F.sqrt((na.cast("double") + nb) / prod)
    return (
        scaled.join(F.broadcast(n))
        .select(
            "n_a",
            "n_b",
            "d_scaled",
            d.alias("d_stat"),
            (d > thresh).cast("long").alias("reject_h0"),
        )
    )


def mann_whitney_u(
    df: DataFrame,
    *,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    n_buckets: int = 256,
    critical: float = 1.96,
) -> DataFrame:
    """Mann–Whitney U rank-sum test (normal approximation with tie
    correction) — the nonparametric "are these two cohorts' values from
    the same distribution" companion to `ks_two_sample`. Returns ONE
    row: n_a, n_b, the exact doubled statistic 2·U_a (integer), U_a,
    the tie-corrected z, and a 0/1 reject flag at `critical`.

    Exactness: with per-value counts t(v) = a(v)+b(v) and C<(v) the
    cumulative count strictly below v, the doubled rank sum is the
    all-integer  2R_a = Σ_v a(v)·(2·C<(v) + t(v) + 1)  (average ranks
    fold to integers at 2×), so 2U_a = 2R_a − n_a(n_a+1) and the tie
    term Σ(t³−t) are engine-exact; only σ and z are (mirrored) IEEE.
    Bounds: 2R_a ≤ 2n² and t³ ≤ n³ keep int64 to n ≈ 2×10⁶ rows in the
    test — beyond that cast the two accumulators to DECIMAL(38,0).

    Scale: identical shape to `ks_two_sample` — one shuffle to
    per-value counts, the global C<(v) order built with the two-level
    range-bucketed prefix sum (within-bucket windows parallelize, only
    the B-row bucket-totals table prefix-sums single-partition), and
    every post-CDF fold runs on bucket totals, never fact rows."""
    # NULL values must not enter the CDF: Spark orders NULLS FIRST asc,
    # DuckDB NULLS LAST, so a surviving NULL value-group would land at
    # opposite ends of the two engines' prefix sums and corrupt the
    # cumulative counts. Callers' oracles mirror this with
    # `AND <value> IS NOT NULL`.
    filt = df.filter(
        F.col(group_col).isin([group_a, group_b])
        & F.col(value_col).isNotNull()
    )
    per_value = filt.groupBy(F.col(value_col).alias("__v")).agg(
        F.sum(
            F.when(F.col(group_col) == group_a, 1).otherwise(0)
        ).alias("__a"),
        F.sum(
            F.when(F.col(group_col) == group_b, 1).otherwise(0)
        ).alias("__b"),
    )
    span = per_value.agg(
        F.min("__v").alias("__lo"), F.max("__v").alias("__hi")
    )
    bucketed = per_value.join(F.broadcast(span)).withColumn(
        "__bkt",
        F.when(
            F.col("__hi") > F.col("__lo"),
            F.least(
                F.lit(n_buckets - 1),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.col("__v") - F.col("__lo"))
                        * n_buckets
                        / (F.col("__hi") - F.col("__lo"))
                    ).cast("long"),
                ),
            ),
        ).otherwise(F.lit(0)),
    )
    w_in = (
        Window.partitionBy("__bkt")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = F.col("__a") + F.col("__b")
    cum = bucketed.select(
        "__bkt",
        "__a",
        t.alias("__t"),
        (F.sum(t).over(w_in) - t).alias("__cin"),  # strictly-below, in-bucket
    )
    totals = bucketed.groupBy("__bkt").agg(
        F.sum("__a").alias("__ta"),
        F.sum("__b").alias("__tb"),
        F.sum(t).alias("__tt"),
        F.count("*").alias("__nv"),
    )
    wg = (
        Window.partitionBy(F.pmod(F.col("__bkt"), F.lit(1)))
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.select(
        "__bkt", (F.sum("__tt").over(wg) - F.col("__tt")).alias("__off")
    )
    n = totals.agg(
        F.sum("__ta").cast("long").alias("n_a"),
        F.sum("__tb").cast("long").alias("n_b"),
        F.sum("__nv").cast("long").alias("__nvals"),
    )
    sums = (
        cum.join(F.broadcast(offsets), "__bkt")
        .agg(
            F.sum(
                F.col("__a")
                * (
                    F.lit(2) * (F.col("__off") + F.col("__cin"))
                    + F.col("__t")
                    + F.lit(1)
                )
            )
            .cast("long")
            .alias("__s2r"),
            F.sum(
                F.col("__t") * F.col("__t") * F.col("__t") - F.col("__t")
            )
            .cast("long")
            .alias("__ties"),
        )
    )
    na, nb = F.col("n_a"), F.col("n_b")
    nn = na + nb
    s2u = F.col("__s2r") - na * (na + F.lit(1))
    # tie-corrected variance, every operand derived from exact integers
    sigma2 = (na.cast("double") * nb / F.lit(12.0)) * (
        (nn + F.lit(1)).cast("double")
        - F.col("__ties").cast("double")
        / (nn.cast("double") * (nn - F.lit(1)))
    )
    # all-integer guard: both sides non-empty AND >1 distinct value
    # (all-tied data has sigma = 0 — no test, NULL instead of 0/0)
    ok = (na > 0) & (nb > 0) & (F.col("__nvals") > 1)
    z = F.when(
        ok,
        (s2u.cast("double") - na.cast("double") * nb)
        / (F.lit(2.0) * F.sqrt(sigma2)),
    )
    return (
        sums.join(F.broadcast(n))
        .select(
            "n_a",
            "n_b",
            s2u.alias("u2_scaled"),
            (s2u.cast("double") / F.lit(2.0)).alias("u_a"),
            z.alias("z"),
            (F.abs(z) > F.lit(critical)).cast("long").alias("reject_h0"),
        )
    )
