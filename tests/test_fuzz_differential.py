"""Seeded randomized differential: generate filter+groupBy+agg specs
over lineitem, build each BOTH as a Spark DataFrame plan and as DuckDB
SQL from the same spec object, and compare exact results.

This covers the composition space between the 206 hand-written oracle
pairs: the fixed registry pins each operator once, the fuzzer checks
that arbitrary conjunctions of predicates, grouping keys, and integer
aggregates agree too. Deterministic (seeded PRNG, no time/entropy), so
a failure is replayable from the printed spec.

All aggregates are integer-exact (COUNT, BIGINT cent-grid SUM, MIN/MAX,
COUNT DISTINCT) — no float accumulation order to absorb, so equality is
exact, not tolerance-based.
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from core_telecoms_etl_spark.sources.readers import load_table

# (name, spark_builder, sql_fragment)
_PREDICATES = [
    (
        "qty_lt",
        lambda v: F.col("l_quantity") < v,
        lambda v: f"l_quantity < {v}",
        lambda rng: rng.randint(5, 45),
    ),
    (
        "qty_ge",
        lambda v: F.col("l_quantity") >= v,
        lambda v: f"l_quantity >= {v}",
        lambda rng: rng.randint(5, 45),
    ),
    (
        "flag_eq",
        lambda v: F.col("l_returnflag") == v,
        lambda v: f"l_returnflag = '{v}'",
        lambda rng: rng.choice(["A", "N", "R"]),
    ),
    (
        "status_eq",
        lambda v: F.col("l_linestatus") == v,
        lambda v: f"l_linestatus = '{v}'",
        lambda rng: rng.choice(["O", "F"]),
    ),
    (
        "ship_lt",
        lambda v: F.col("l_shipdate") < F.lit(v).cast("timestamp"),
        lambda v: f"l_shipdate < TIMESTAMP '{v} 00:00:00'",
        lambda rng: rng.choice(
            ["1993-06-01", "1995-01-01", "1996-09-15", "1998-03-01"]
        ),
    ),
    (
        "part_mod",
        lambda v: F.pmod(F.col("l_partkey"), F.lit(v[0])) == v[1],
        lambda v: f"l_partkey % {v[0]} = {v[1]}",
        lambda rng: (lambda m: (m, rng.randint(0, m - 1)))(
            rng.choice([3, 7, 10])
        ),
    ),
]

_GROUP_KEYS = [
    ("l_returnflag", lambda: F.col("l_returnflag"), "l_returnflag"),
    ("l_linestatus", lambda: F.col("l_linestatus"), "l_linestatus"),
    (
        "l_linenumber",
        lambda: F.col("l_linenumber").cast("long"),
        "CAST(l_linenumber AS BIGINT)",
    ),
    (
        "okey_bucket",
        lambda: F.pmod(F.col("l_orderkey"), F.lit(10)),
        "l_orderkey % 10",
    ),
]

_AGGS = [
    ("n_rows", lambda: F.count("*"), "count(*)"),
    (
        "sum_cents",
        lambda: F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")),
        "sum(CAST(round(l_extendedprice * 100) AS BIGINT))",
    ),
    (
        "min_qty",
        lambda: F.min(F.col("l_quantity").cast("long")),
        "min(CAST(l_quantity AS BIGINT))",
    ),
    (
        "max_qty",
        lambda: F.max(F.col("l_quantity").cast("long")),
        "max(CAST(l_quantity AS BIGINT))",
    ),
    (
        "n_supp",
        lambda: F.count_distinct(F.col("l_suppkey")),
        "count(DISTINCT l_suppkey)",
    ),
]


def _gen_spec(rng: random.Random) -> dict:
    preds = rng.sample(_PREDICATES, rng.randint(0, 2))
    return {
        "preds": [(p[0], p[3](rng), p[1], p[2]) for p in preds],
        "keys": rng.sample(_GROUP_KEYS, rng.randint(1, 2)),
        "aggs": rng.sample(_AGGS, rng.randint(1, 3)),
    }


def _spec_repr(spec: dict) -> str:
    return (
        f"preds={[(n, v) for n, v, _, _ in spec['preds']]} "
        f"keys={[k[0] for k in spec['keys']]} "
        f"aggs={[a[0] for a in spec['aggs']]}"
    )


@pytest.mark.parametrize("seed", [20260814])
def test_random_relational_specs_match_duckdb(spark, sf_dir, seed):
    rng = random.Random(seed)
    li = load_table(spark, sf_dir, "lineitem")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS "
        f"SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    for i in range(25):
        spec = _gen_spec(rng)
        df = li
        wheres = []
        for _, v, build, sql in spec["preds"]:
            df = df.filter(build(v))
            wheres.append(sql(v))
        gb_cols = [c().alias(n) for n, c, _ in spec["keys"]]
        agg_cols = [c().alias(n) for n, c, _ in spec["aggs"]]
        out = df.groupBy(*gb_cols).agg(*agg_cols)
        got = sorted(
            tuple(r) for r in out.collect()
        )

        where = f"WHERE {' AND '.join(wheres)}" if wheres else ""
        keys_sql = ", ".join(f"{s} AS {n}" for n, _, s in spec["keys"])
        aggs_sql = ", ".join(f"{s} AS {n}" for n, _, s in spec["aggs"])
        group_sql = ", ".join(str(j + 1) for j in range(len(spec["keys"])))
        q = (
            f"SELECT {keys_sql}, {aggs_sql} FROM lineitem {where} "
            f"GROUP BY {group_sql}"
        )
        want = sorted(tuple(r) for r in con.execute(q).fetchall())
        assert got == want, f"spec #{i}: {_spec_repr(spec)}\nsql: {q}"


@pytest.mark.parametrize("seed", [414243])
def test_random_join_specs_match_duckdb(spark, sf_dir, seed):
    """Same differential, join edition: lineitem ⋈ orders under random
    predicates from BOTH tables, grouped on either side's keys. Checks
    that join + pushdown composition agrees with DuckDB exactly."""
    rng = random.Random(seed)
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS "
        f"SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'"
    )
    o_preds = [
        (
            "prio_eq",
            lambda v: F.col("o_orderpriority") == v,
            lambda v: f"o_orderpriority = '{v}'",
            lambda rng: rng.choice(
                ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
            ),
        ),
        (
            "status_eq",
            lambda v: F.col("o_orderstatus") == v,
            lambda v: f"o_orderstatus = '{v}'",
            lambda rng: rng.choice(["O", "F", "P"]),
        ),
        (
            "price_ge",
            lambda v: F.col("o_totalprice") >= v,
            lambda v: f"o_totalprice >= {v}",
            lambda rng: rng.choice([50000, 150000, 300000]),
        ),
    ]
    o_keys = [
        ("o_orderstatus", lambda: F.col("o_orderstatus"), "o_orderstatus"),
        (
            "o_orderpriority",
            lambda: F.col("o_orderpriority"),
            "o_orderpriority",
        ),
    ]
    for i in range(12):
        spec = {
            "li_preds": [
                (p[0], p[3](rng), p[1], p[2])
                for p in rng.sample(_PREDICATES, rng.randint(0, 1))
            ],
            "o_preds": [
                (p[0], p[3](rng), p[1], p[2])
                for p in rng.sample(o_preds, rng.randint(0, 1))
            ],
            "keys": rng.sample(_GROUP_KEYS + o_keys, rng.randint(1, 2)),
            "aggs": rng.sample(_AGGS, rng.randint(1, 2)),
        }
        ldf, odf, wheres = li, o, []
        for _, v, build, sql in spec["li_preds"]:
            ldf = ldf.filter(build(v))
            wheres.append(sql(v))
        for _, v, build, sql in spec["o_preds"]:
            odf = odf.filter(build(v))
            wheres.append(sql(v))
        j = ldf.join(odf, ldf.l_orderkey == odf.o_orderkey)
        out = j.groupBy(
            *[c().alias(n) for n, c, _ in spec["keys"]]
        ).agg(*[c().alias(n) for n, c, _ in spec["aggs"]])
        got = sorted(tuple(r) for r in out.collect())

        where = f"WHERE {' AND '.join(wheres)}" if wheres else ""
        keys_sql = ", ".join(f"{s} AS {n}" for n, _, s in spec["keys"])
        aggs_sql = ", ".join(f"{s} AS {n}" for n, _, s in spec["aggs"])
        group_sql = ", ".join(str(k + 1) for k in range(len(spec["keys"])))
        q = (
            f"SELECT {keys_sql}, {aggs_sql} FROM lineitem "
            f"JOIN orders ON l_orderkey = o_orderkey {where} "
            f"GROUP BY {group_sql}"
        )
        want = sorted(tuple(r) for r in con.execute(q).fetchall())
        assert got == want, f"join spec #{i}\nsql: {q}"


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_moments_guard_boundary_fuzz(spark, tmp_path, seed):
    """ADVICE r12 guard-boundary fuzz: random event tables biased
    toward the zero-variance cancellation regime (constant groups at
    large magnitudes, near-constant groups, n=1 groups) through BOTH
    engines — the Spark moments_profile plan vs its registered DuckDB
    oracle over the same parquet. Pre-fix, a constant large-value
    group crashed DuckDB (sqrt of negative cancellation noise) or
    emitted garbage shape stats behind a k2 > 0 guard; post-fix both
    engines must agree exactly, NULLs included."""
    import duckdb as _dd

    from core_telecoms_etl_spark.queries import REGISTRY, _load_all
    from core_telecoms_etl_spark.queries.inferential import moments_profile

    rng = random.Random(seed)
    rows = []
    eid = 0
    for g in range(6):
        et = f"t{g}"
        kind = rng.choice(
            ["const_small", "const_big", "near_const", "normal", "single"]
        )
        n = 1 if kind == "single" else rng.randint(50, 4000)
        if kind == "const_small":
            base = rng.randint(1, 999) / 100
            vals = [base] * n
        elif kind == "const_big":
            base = rng.randint(10_000_000, 99_999_999) / 100
            vals = [base] * n
        elif kind == "near_const":
            base = rng.randint(1_000_000, 9_999_999) / 100
            vals = [base] * (n - 1) + [base + 0.01]
        elif kind == "single":
            vals = [rng.randint(1, 10_000_000) / 100]
        else:
            vals = [rng.randint(1, 100_000) / 100 for _ in range(n)]
        for v in vals:
            rows.append((eid, et, v))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )
    d = tmp_path / "star"
    ev.write.parquet(str(d / "events.parquet"))

    got = [
        tuple(r)
        for r in moments_profile(spark, str(d))
        .orderBy("event_type")
        .collect()
    ]
    _load_all()
    con = _dd.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{d}/events.parquet/*.parquet'"
    )
    want = con.execute(REGISTRY["moments_profile"].oracle).fetchall()
    assert len(got) == len(want)
    for gr, wr in zip(got, want):
        assert gr == tuple(wr), (gr, wr)
