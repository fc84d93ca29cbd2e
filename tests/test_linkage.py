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


def test_deletion_keys_count_and_membership(spark):
    """|keys| = 1 + L + C(L,2) for an all-distinct-character name, and
    the neighborhood contains the strings a real deletion produces."""
    from pyspark.sql import functions as F

    from core_telecoms_etl_spark.operators.linkage import deletion_keys

    df = spark.createDataFrame([("abcde",), (None,)], "name string")
    rows = df.select(
        deletion_keys(F.col("name"), 2).alias("ks")
    ).collect()
    ks = rows[0].ks
    assert len(ks) == 1 + 5 + 10  # 0-del + 1-del + 2-del, all distinct
    for expect in ("abcde", "bcde", "abde", "abc", "cde", "ace"):
        assert expect in ks, expect
    assert rows[1].ks is None  # NULL name -> NULL neighborhood


def test_fuzzy_pairs_deletion_is_lossless(spark):
    """The deletion-neighborhood theorem in practice: the compound arm
    must find EVERY ≤2-edit pair the exact arm finds, including the
    equal-length shift class (delete one char, append another) that
    breaks positional segment blocking — and nothing else (candidates
    are exactly verified)."""
    from core_telecoms_etl_spark.operators.linkage import (
        fuzzy_pairs,
        fuzzy_pairs_deletion,
    )

    rows = [
        (1, "jon smith", "NY"),
        (2, "john smith", "NY"),  # 1 insertion
        (3, "jane smyth", "NY"),
        (4, "john smith", "CA"),  # other block
        (5, "completely different", "NY"),
        # the shift class: delete the head char, append a new one —
        # every character position differs, yet lev = 2
        (6, "123456789", "NY"),
        (7, "234567891", "NY"),
        # substitution-only pair
        (8, "123456780", "NY"),
    ]
    df = spark.createDataFrame(rows, "id long, name string, state string")
    exact = {
        (r.id_a, r.id_b, r.edit_dist)
        for r in fuzzy_pairs(df, "id", "name", "state", max_dist=2).collect()
    }
    compound = {
        (r.id_a, r.id_b, r.edit_dist)
        for r in fuzzy_pairs_deletion(
            df, "id", "name", "state", max_dist=2
        ).collect()
    }
    assert (6, 7, 2) in exact  # the corpus really contains a shift pair
    assert compound == exact


def test_fuzzy_pairs_segmented_catches_substitution_pairs(spark):
    """The modular-projection arm's pigeonhole contract: every
    ≤2-SUBSTITUTION pair is found (≤2 substituted positions touch ≤2
    residue classes, so one projection is untouched). ANY
    insertion/deletion — length-changing or equal-length shift —
    misaligns the residues past the edit point and CAN be missed:
    that is the documented recall caveat (measured, not silently
    lost; fuzzy_pairs_deletion is the lossless arm)."""
    from core_telecoms_etl_spark.operators.linkage import (
        fuzzy_pairs_segmented,
    )

    rows = [
        (1, "abcdefghi", "NY"),
        (2, "abcdefghX", "NY"),  # 1 sub, tail
        (3, "Xbcdefghi", "NY"),  # 1 sub, head
        (4, "aXcdefgXi", "NY"),  # 2 subs, residues 1 and 1
        (5, "123456789", "NY"),
        (6, "234567891", "NY"),  # equal-length shift: documented miss
        (7, "jon smith", "NY"),
        (8, "john smith", "NY"),  # single INSERT: also documented miss
    ]
    df = spark.createDataFrame(rows, "id long, name string, state string")
    got = {
        (r.id_a, r.id_b)
        for r in fuzzy_pairs_segmented(
            df, "id", "name", "state", max_dist=2
        ).collect()
    }
    assert {(1, 2), (1, 3), (1, 4)} <= got
    assert (5, 6) not in got  # the shift class is the known trade
    assert (7, 8) not in got  # length-changing edits too — use the
    #                           deletion arm when those matter


def test_fuzzy_pairs_deletion_mass_tripwire(spark):
    """Constant names collapse every deletion neighborhood into one
    block — the guard must estimate the collision mass from the
    compound block counts and raise before the join."""
    import pytest

    from core_telecoms_etl_spark.operators.linkage import (
        fuzzy_pairs_deletion,
    )

    rows = [(i, "same name", 0) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, name string, blk long")
    with pytest.raises(RuntimeError, match="deletion"):
        fuzzy_pairs_deletion(
            df, "id", "name", "blk", max_block_pairs=100
        ).collect()
    out = fuzzy_pairs_deletion(
        df, "id", "name", "blk", max_block_pairs=10_000_000
    )
    assert out.count() == 30 * 29 // 2  # all-identical corpus


def test_fuzzy_pairs_auto_routes_on_measured_mass(spark):
    """Below the budget the plan is the plain blocked join (no
    neighborhood Generate); above it the deletion arm (a Generate over
    the 172-key explode). Both routes return the identical pair set —
    the deletion arm is lossless — so only the plan changes."""
    from core_telecoms_etl_spark.operators.linkage import fuzzy_pairs_auto

    df = _people(spark)

    def plan(out):
        return (
            out._jdf.queryExecution().executedPlan().toString()
        )

    small = fuzzy_pairs_auto(df, "id", "name", "state")
    assert "Generate" not in plan(small)  # plain arm: no explode
    forced = fuzzy_pairs_auto(
        df, "id", "name", "state", exact_mass_budget=0
    )
    assert "Generate" in plan(forced)  # deletion arm: 172-key explode
    assert {(r.id_a, r.id_b) for r in small.collect()} == {
        (r.id_a, r.id_b) for r in forced.collect()
    }


def test_link_best_match_deletion_blocking_matches_plain(spark):
    """The deletion-blocked two-sided link must attach the SAME best
    match as the plain block join (lossless candidates + identical
    tie-break), including for a shift-pair name the block key alone
    would also pair (same block) — only the candidate generator
    differs."""
    from core_telecoms_etl_spark.operators.linkage import link_best_match

    left = spark.createDataFrame(
        [(1, "jon smith", "NY"), (2, "jane smyth", "NY"),
         (3, "123456789", "NY")],
        "lid long, lname string, lstate string",
    )
    right = spark.createDataFrame(
        [(10, "john smith", "NY"), (11, "jane smith", "NY"),
         (12, "234567891", "NY"), (13, "unrelated name", "NY")],
        "rid long, rname string, rstate string",
    )
    args = (left, right, ("lid", "rid"), ("lname", "rname"),
            ("lstate", "rstate"))
    plain = {
        (r.lid, r.rid, r.edit_dist)
        for r in link_best_match(*args, max_dist=2).collect()
    }
    deletion = {
        (r.lid, r.rid, r.edit_dist)
        for r in link_best_match(
            *args, max_dist=2, blocking="deletion"
        ).collect()
    }
    assert (3, 12, 2) in plain  # the shift pair is really in play
    assert deletion == plain


def test_fuzzy_pairs_deletion_tripwire_pins_neighborhood(spark):
    """With max_block_pairs set, the guard's .first() materializes the
    172-way neighborhood build — the operator must pin it (scoped
    slot) so the candidate join reads the cache instead of rebuilding
    the dominant pre-join stage (the incremental_dedup r13 ADVICE
    class)."""
    from core_telecoms_etl_spark import caching
    from core_telecoms_etl_spark.operators.linkage import (
        fuzzy_pairs_deletion,
    )

    caching.release_caches()
    out = fuzzy_pairs_deletion(
        _people(spark), "id", "name", "state",
        max_block_pairs=10_000_000,
    )
    pinned = caching._SCOPED_CACHES.get("linkage.deletion.proj")
    assert pinned is not None
    lvl = pinned.storageLevel
    assert lvl.useMemory or lvl.useDisk
    assert out.count() > 0
    caching.release_caches()


def test_fuzzy_pairs_segmented_short_name_fallback(spark):
    """Names shorter than max_dist+1 break the pigeonhole (fewer
    residue classes than edits to spare) and empty names emit no
    projection at all — the r14 ADVICE gap. The constant short-class
    fallback key (_seg_i = s) restores the pure-substitution contract
    at every length: identical empty names pair at lev 0, a 2-char
    fully-substituted pair is found at max_dist=2, and long names
    never ride the fallback."""
    from core_telecoms_etl_spark.operators.linkage import (
        fuzzy_pairs_segmented,
    )

    rows = [
        (1, "", "NY"),
        (2, "", "NY"),           # identical empties: lev 0
        (3, "ab", "NY"),
        (4, "xy", "NY"),         # both chars substituted: lev 2
        (5, "ab", "NY"),         # exact short duplicate of 3
        (10, "abcdefghi", "NY"),
        (11, "abcdefghX", "NY"),  # normal projection path still works
    ]
    df = spark.createDataFrame(rows, "id long, name string, state string")
    out = {
        (r.id_a, r.id_b): r.edit_dist
        for r in fuzzy_pairs_segmented(
            df, "id", "name", "state", max_dist=2
        ).collect()
    }
    assert out[(1, 2)] == 0
    assert out[(3, 4)] == 2
    assert out[(3, 5)] == 0
    assert (10, 11) in out
    # short/long pairs are not pure-substitution (lengths differ) and
    # stay outside the contract; the fallback must not cross lengths
    # past max_dist — nothing pairs "" with the 9-char names
    assert not any(a in (1, 2) and b in (10, 11) for a, b in out)


def test_fuzzy_pairs_auto_max_dist3_always_plain(spark):
    """max_dist > 2 exceeds the deletion arm's k support — the router
    must take the plain arm on BOTH sides of the mass budget (r14
    ADVICE: routing into a 'k must be 1 or 2' ValueError above the
    budget made behavior depend on measured mass for the same
    arguments), with identical results."""
    from core_telecoms_etl_spark.operators.linkage import fuzzy_pairs_auto

    rows = [
        (1, "abcdefghi", "NY"),
        (2, "abcXeXgXi", "NY"),  # 3 substitutions: lev 3
        (3, "unrelated string!", "NY"),
    ]
    df = spark.createDataFrame(rows, "id long, name string, state string")

    def plan(out):
        return out._jdf.queryExecution().executedPlan().toString()

    below = fuzzy_pairs_auto(df, "id", "name", "state", max_dist=3)
    above = fuzzy_pairs_auto(
        df, "id", "name", "state", max_dist=3, exact_mass_budget=0
    )
    assert "Generate" not in plan(below)
    assert "Generate" not in plan(above)  # NOT the deletion explode
    got_b = {(r.id_a, r.id_b, r.edit_dist) for r in below.collect()}
    got_a = {(r.id_a, r.id_b, r.edit_dist) for r in above.collect()}
    assert got_b == got_a == {(1, 2, 3)}
