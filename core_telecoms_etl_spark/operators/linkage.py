"""Fuzzy record-linkage (entity resolution) operators — the "same
real-world entity, slightly different string" problem that every CRM /
customer-master ETL hits (typos, legacy-system renames, re-keyed
imports).

Scale design: never the naive all-pairs cross join. Candidate pairs come
from an equi-join on a BLOCKING key (a deterministic coarse partition of
the record space — a region key, a name prefix, a phonetic code), so the
shuffle is an ordinary hash join on the block and the quadratic edit-
distance work is confined to each block. With B blocks of roughly even
size, cost drops from N²/2 to N²/(2B); skewed blocks are visible as
ordinary join skew and fixable with the same AQE/salting machinery as
any other join. The edit distance itself uses Spark's bounded
`levenshtein(l, r, threshold)` (JVM codegen, early-exits once the
running distance exceeds the bound) — at threshold k the DP cost is
O(k·len) instead of O(len²).

THE FIXED-B WALL (found live at the r13 sf10 decade): N²/(2B) is still
Θ(N²) when the block key's cardinality does not grow with the data — a
25-nation block over 1.5M customers is 4.5e10 within-block comparisons,
and the TRUE ≤2-edit pair relation over sequential numeric names is
itself ~10⁸ rows, so no candidate generator can make the job small: the
OUTPUT is quadratic-ish on this corpus. The production posture is the
same as the near-dup family's: (1) choose a COMPOUND block key whose
cardinality scales with N (nation × name-length × phonetic code, or a
PassJoin segment scheme) so per-block mass stays bounded; (2) pass
`max_block_pairs` so an under-blocked run RAISES with the measured mass
and the dominant block instead of grinding for hours — the estimate is
one metadata-scale count aggregate over the block relation, the same
loud-failure contract as `dedup.incremental_dedup(max_candidates=…)`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def canonicalize(col: Column | str) -> Column:
    """Normalization applied before any fuzzy compare: lowercase, trim,
    collapse internal whitespace runs. Cheap, deterministic, and removes
    the edit-distance noise that isn't entity identity."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_col: str,
    *,
    max_dist: int = 2,
    normalize: bool = False,
    max_block_pairs: int | None = None,
) -> DataFrame:
    """Candidate duplicate pairs within each block: records whose
    (optionally canonicalized) names are within `max_dist` edits.
    Returns (id_a, id_b, name_a, name_b, edit_dist) with id_a < id_b so
    each unordered pair appears once.

    The join condition is equality on `block_col` ONLY — Catalyst plans
    a shuffled hash join on the block key; the `id_a < id_b` triangle cut
    and the bounded levenshtein run as post-join filters inside the same
    stage. Records outside every block pair with nothing, which is the
    semantics you want from blocking (recall is bounded by block
    assignment — pick the block key accordingly, or union several
    blocking passes).

    `max_block_pairs`: mass tripwire for the fixed-B wall (module
    docstring). The within-block comparison count Σ_b C(n_b, 2) is
    estimated from the block-count table (one metadata-scale
    aggregate) and the operator RAISES with the measured mass and the
    dominant block before launching a join that cannot finish —
    re-block on a compound key or raise the budget."""
    name = canonicalize(name_col) if normalize else F.col(name_col)
    if max_block_pairs is not None:
        row = (
            df.groupBy(F.col(block_col).alias("_blk"))
            .agg(F.count("*").alias("_n"))
            .agg(
                F.sum(
                    F.col("_n").cast("decimal(38,0)") * (F.col("_n") - 1) / 2
                ).alias("_m"),
                F.max(
                    F.col("_n").cast("decimal(38,0)") * (F.col("_n") - 1) / 2
                ).alias("_mx"),
            )
            .first()
        )
        mass = int(row["_m"] or 0)
        if mass > max_block_pairs:
            raise RuntimeError(
                "fuzzy_pairs: the blocked join would compare "
                f"~{mass:.3g} within-block pairs "
                f"(max_block_pairs={max_block_pairs:.3g}; the largest "
                f"single block contributes {int(row['_mx'] or 0):.3g}) "
                "— the block key's cardinality is too coarse for this "
                "corpus size (the fixed-B wall; see operators/linkage "
                "module docstring). Re-block on a compound key whose "
                "cardinality scales with the data, or raise "
                "max_block_pairs."
            )
    a = df.select(
        F.col(id_col).alias("id_a"),
        name.alias("name_a"),
        F.col(block_col).alias("_blk"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        name.alias("name_b"),
        F.col(block_col).alias("_blk"),
    )
    dist = F.levenshtein("name_a", "name_b", max_dist)
    return (
        a.join(b, "_blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("edit_dist", dist)
        .filter(F.col("edit_dist") >= 0)  # bounded form returns -1 above k
        .drop("_blk")
    )


def link_best_match(
    left: DataFrame,
    right: DataFrame,
    id_cols: tuple[str, str],
    name_cols: tuple[str, str],
    block_cols: tuple[str, str],
    *,
    max_dist: int = 2,
) -> DataFrame:
    """Link each left record to its single best fuzzy match on the right
    (lowest edit distance, ties broken by right id): the master-data
    "attach the canonical entity" step. Same blocked-join shape as
    `fuzzy_pairs`, then one window min per left id — two shuffles total,
    both on bounded keys."""
    lid, rid = id_cols
    lname, rname = name_cols
    lblk, rblk = block_cols
    cand = (
        left.select(lid, F.col(lname).alias("_ln"), F.col(lblk).alias("_blk"))
        .join(
            right.select(
                rid, F.col(rname).alias("_rn"), F.col(rblk).alias("_blk")
            ),
            "_blk",
        )
        .withColumn("edit_dist", F.levenshtein("_ln", "_rn", max_dist))
        .filter(F.col("edit_dist") >= 0)
    )
    from pyspark.sql import Window

    w = Window.partitionBy(lid).orderBy("edit_dist", rid)
    return (
        cand.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            lid,
            F.col("_ln").alias("left_name"),
            rid,
            F.col("_rn").alias("right_name"),
            "edit_dist",
        )
    )
