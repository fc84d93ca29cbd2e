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
    blocking passes)."""
    name = canonicalize(name_col) if normalize else F.col(name_col)
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
