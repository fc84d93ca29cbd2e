"""Fuzzy record-linkage operator tests."""

from __future__ import annotations

from core_telecoms_etl_spark.operators.linkage import (
    canonicalize,
    fuzzy_pairs,
    link_best_match,
)


def _people(spark):
    return spark.createDataFrame(
        [
            (1, "jon smith", "NY"),
            (2, "john smith", "NY"),
            (3, "jane smyth", "NY"),
            (4, "john smith", "CA"),  # same name, other block
            (5, "completely different", "NY"),
        ],
        "id long, name string, state string",
    )


def test_fuzzy_pairs_within_block_only(spark):
    out = fuzzy_pairs(_people(spark), "id", "name", "state", max_dist=2)
    pairs = {(r.id_a, r.id_b): r.edit_dist for r in out.collect()}
    assert pairs[(1, 2)] == 1  # jon/john
    assert (2, 4) not in pairs  # identical names but different block
    assert (1, 5) not in pairs  # beyond max_dist
    assert all(a < b for a, b in pairs)  # triangle cut, no dup pairs


def test_fuzzy_pairs_normalize(spark):
    df = _people(spark).union(
        _people(spark)
        .limit(0)
        .sparkSession.createDataFrame(
            [(6, "  JON   SMITH ", "NY")], "id long, name string, state string"
        )
    )
    out = fuzzy_pairs(df, "id", "name", "state", max_dist=0, normalize=True)
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    assert (1, 6) in pairs  # case/whitespace noise removed before compare


def test_canonicalize(spark):
    row = (
        spark.createDataFrame([("  A   B\tC ",)], "s string")
        .select(canonicalize("s").alias("c"))
        .collect()[0]
    )
    assert row.c == "a b c"


def test_link_best_match_picks_lowest_distance(spark):
    left = _people(spark).filter("id = 1")
    right = spark.createDataFrame(
        [
            (10, "john smith", "NY"),  # dist 1
            (11, "jon smith", "NY"),  # dist 0 — best
            (12, "jon smith", "NY"),  # dist 0, higher id loses the tie
        ],
        "rid long, rname string, rstate string",
    )
    out = link_best_match(
        left,
        right,
        ("id", "rid"),
        ("name", "rname"),
        ("state", "rstate"),
    ).collect()
    assert len(out) == 1
    assert (out[0].rid, out[0].edit_dist) == (11, 0)


def test_fuzzy_pairs_plan_is_blocked_join_not_cartesian(spark):
    plan = (
        fuzzy_pairs(_people(spark), "id", "name", "state")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_pairs_mass_tripwire_raises(spark):
    """The fixed-B wall (r13 sf10 decade finding): a block key whose
    cardinality does not grow with the data makes the within-block
    comparison mass quadratic. max_block_pairs must estimate that mass
    from the block-count table and raise LOUDLY — naming the dominant
    block and the re-blocking escalation — instead of launching the
    grind; a budget above the mass passes through untouched."""
    import pytest

    from core_telecoms_etl_spark.operators.linkage import fuzzy_pairs

    rows = [(i, f"name{i:03d}", i % 2) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, name string, blk long")
    # mass = 2 blocks x C(20,2) = 380
    with pytest.raises(RuntimeError, match="within-block pairs"):
        fuzzy_pairs(
            df, "id", "name", "blk", max_dist=2, max_block_pairs=100
        ).collect()
    out = fuzzy_pairs(
        df, "id", "name", "blk", max_dist=2, max_block_pairs=1_000
    )
    assert out.count() > 0  # adjacent name{i} ids are within 2 edits
