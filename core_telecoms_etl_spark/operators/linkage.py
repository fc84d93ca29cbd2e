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
cardinality scales with N so per-block mass stays bounded —
`fuzzy_pairs_segmented` below is the built-in arm (base block ×
modular-projection segments, a pigeonhole scheme); (2) pass
`max_block_pairs` so an under-blocked run RAISES with the measured mass
and the dominant block instead of grinding for hours — the estimate is
one metadata-scale count aggregate over the block relation, the same
loud-failure contract as `dedup.incremental_dedup(max_candidates=…)`.

WHY MODULAR PROJECTIONS, NOT CONTIGUOUS SEGMENTS: classic PassJoin
splits the string into k+1 contiguous segments (≤k edits leave one
untouched → block on its value). On ID-shaped names
("Customer#000012345") the head segment is near-constant — its value
blocks degenerate to the whole corpus and the scheme buys nothing.
Segment i = the characters at positions ≡ i (mod k+1) instead: the
pigeonhole argument is unchanged for SUBSTITUTIONS (≤k substituted
positions touch ≤k residue classes, so one projection is untouched),
and every projection samples the high-entropy tail digits, so block
values stay selective no matter where the entropy sits in the string.
The trade: ANY insertion or deletion misaligns the residue classes
past the edit point — a single-insert pair ("jon smith" vs
"john smith", lev=1), a head deletion, and the equal-length
shift pairs (delete a leading zero, append a digit) can all be
missed. Only pure-SUBSTITUTION recall is exact by construction;
total recall is MEASURED against the exact arm and carried as a flag
(the ANN family's contract), not assumed. When length-changing edits
matter — they usually do for human-typed names — use
`fuzzy_pairs_deletion`, which is lossless for every edit mix.
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
        _block_mass_guard(
            df.select(F.col(block_col).alias("_blk")),
            ["_blk"],
            max_block_pairs,
            "fuzzy_pairs",
            "the block key's cardinality is too coarse for this "
            "corpus size (the fixed-B wall; see operators/linkage "
            "module docstring). Re-block on a compound key whose "
            "cardinality scales with the data "
            "(fuzzy_pairs_deletion is the lossless built-in), or "
            "raise max_block_pairs.",
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


def _block_mass_guard(
    blocked: DataFrame,
    key_cols: list[str],
    max_block_pairs: int,
    what: str,
    hint: str,
) -> None:
    """Shared mass tripwire: estimate the within-block comparison count
    Σ_b C(n_b, 2) from the block-count table (one metadata-scale
    aggregate over `blocked`) and raise with the measured mass and the
    dominant block if it exceeds the budget."""
    row = (
        blocked.groupBy(*key_cols)
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
            f"{what}: the blocked join would compare ~{mass:.3g} "
            f"within-block pairs (max_block_pairs={max_block_pairs:.3g}; "
            f"the largest single block contributes "
            f"{int(row['_mx'] or 0):.3g}) — {hint}"
        )


def deletion_keys(name: Column | str, k: int = 2) -> Column:
    """All strings obtainable from `name` by deleting at most `k`
    characters (k ∈ {1, 2}), duplicates removed — the SymSpell-style
    blocking neighborhood. THEOREM (what makes blocking on these keys
    LOSSLESS): lev(A, B) ≤ k ⟹ A and B reach a common string by
    deleting ≤ k characters each — charge each edit to one deletion
    per side (substitution: delete the differing character from both;
    insertion/deletion: delete the inserted character from the side
    that has it). So two names within k edits ALWAYS share a deletion
    key, for any corpus, any alphabet, any edit mix — including the
    equal-length shift pairs that break positional segment schemes.
    |keys| = 1 + L + C(L, 2) at k=2 (172 at L=18). NULL name → NULL
    (falls out of the blocking join, like every other arm)."""
    if k not in (1, 2):
        raise ValueError(f"deletion_keys: k must be 1 or 2, got {k}")
    c = F.col(name) if isinstance(name, str) else name
    L = F.length(c)
    zero = F.array(c)
    one = F.when(
        L >= 1,
        F.transform(
            F.sequence(F.lit(1), L),
            lambda i: F.concat(
                F.substring(c, F.lit(1), i - 1),
                F.substring(c, i + 1, L - i),
            ),
        ),
    ).otherwise(F.array())
    parts = [zero, one]
    if k == 2:
        two = F.when(
            L >= 2,
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), L - 1),
                    lambda i: F.transform(
                        F.sequence(i + 1, L),
                        lambda j: F.concat(
                            F.substring(c, F.lit(1), i - 1),
                            F.substring(c, i + 1, j - i - 1),
                            F.substring(c, j + 1, L - j),
                        ),
                    ),
                )
            ),
        ).otherwise(F.array())
        parts.append(two)
    # NULL name -> NULL (not [NULL]: xxhash64(NULL) is a CONSTANT, so a
    # [NULL] neighborhood would block every null-named record together)
    return F.when(c.isNotNull(), F.array_distinct(F.concat(*parts)))


def fuzzy_pairs_deletion(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_col: str,
    *,
    max_dist: int = 2,
    normalize: bool = False,
    max_block_pairs: int | None = None,
) -> DataFrame:
    """LOSSLESS compound-key arm of `fuzzy_pairs` (the production path
    past the fixed-B wall): candidates come from equality on
    (block_col, xxhash64(deletion key)) over each record's ≤max_dist
    deletion neighborhood (`deletion_keys` — theorem there), then every
    candidate is verified with the same bounded levenshtein. Kept pairs
    are never wrong (exact verify) and no true pair is missed (shared
    deletion key guaranteed; a 64-bit hash collision only ADDS
    candidates, which verification kills). Same output schema as
    `fuzzy_pairs`.

    Cost: 172 blocking rows per record at L=18 hashed to 8-byte longs
    (the shuffle carries (block, long, id, name), never the key
    strings), then an equi-join whose per-key groups are small by
    construction — deletion keys inherit the name's entropy. Measured
    on the sequential-name corpus: sf0.1 candidate mass 1.27M vs the
    nation block's 4.5e8 (354×), identical 163,383-pair output; the
    sf10 decade readings live in BASELINE.md (nation wall 4.5e10).

    `max_block_pairs` guards the neighborhood join's own collision
    mass, same loud contract as the other arms."""
    name = canonicalize(name_col) if normalize else F.col(name_col)
    # rebalance BEFORE the 172-way explode: the input relation is small
    # (a dim-table scan — one or two parquet partitions; at sf10 the
    # whole 1.5M-row customer table is 24 MB), so the narrow
    # neighborhood expansion — the dominant pre-join cost — would
    # otherwise run on the scan's 1-2 partitions (the r13
    # AQE/narrow-expansion class: measured 2-core occupancy on 32 at
    # the decade). The fixed repartition cost scales with N, not the
    # 172N expansion.
    n_par = df.sparkSession.sparkContext.defaultParallelism
    proj = df.repartition(n_par).select(
        F.col(id_col).alias("_id"),
        name.alias("_name"),
        F.col(block_col).alias("_blk0"),
        F.explode(
            F.transform(
                deletion_keys(name, max_dist), lambda s: F.xxhash64(s)
            )
        ).alias("_kh"),
    )
    if max_block_pairs is not None:
        # the guard's .first() materializes the 172-way neighborhood
        # build, which the candidate join then consumes AGAIN — pin it
        # so the dominant pre-join cost runs once (the same class as
        # incremental_dedup's r13 ADVICE fix; scoped slot, next
        # invocation or release_caches evicts)
        from core_telecoms_etl_spark.caching import cache_scoped

        proj = cache_scoped("linkage.deletion.proj", proj)
        _block_mass_guard(
            proj,
            ["_blk0", "_kh"],
            max_block_pairs,
            "fuzzy_pairs_deletion",
            "the name distribution collapses the deletion "
            "neighborhoods (near-constant names). Add another blocking "
            "dimension or raise max_block_pairs.",
        )
    a = proj.select(
        F.col("_id").alias("id_a"),
        F.col("_name").alias("name_a"),
        "_blk0",
        "_kh",
    )
    b = proj.select(
        F.col("_id").alias("id_b"),
        F.col("_name").alias("name_b"),
        "_blk0",
        "_kh",
    )
    cand = (
        a.join(b, ["_blk0", "_kh"])
        .filter(F.col("id_a") < F.col("id_b"))
        # a pair sharing several deletion keys appears once per shared
        # key — dedupe BEFORE the (more expensive) verify
        .select("id_a", "id_b", "name_a", "name_b")
        .distinct()
    )
    dist = F.levenshtein("name_a", "name_b", max_dist)
    return cand.withColumn("edit_dist", dist).filter(
        F.col("edit_dist") >= 0
    )


def modular_segment(name: Column | str, i: int, s: int) -> Column:
    """Projection segment i of s: the characters of `name` at 1-based
    positions i+1, i+1+s, i+1+2s, … concatenated in order. NULL when
    the name is NULL or shorter than i+1 characters (a NULL segment
    equi-joins with nothing — short names simply fall out of that
    projection's blocking pass, mirroring the oracle's CASE guard)."""
    c = F.col(name) if isinstance(name, str) else name
    return F.when(
        F.length(c) >= 1 + i,
        F.array_join(
            F.transform(
                F.sequence(F.lit(1 + i), F.length(c), F.lit(s)),
                lambda p: F.substring(c, p, F.lit(1)),
            ),
            "",
        ),
    )


def fuzzy_pairs_segmented(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_col: str,
    *,
    max_dist: int = 2,
    normalize: bool = False,
    max_block_pairs: int | None = None,
) -> DataFrame:
    """Compound-key arm of `fuzzy_pairs`: candidates come from equality
    on (block_col, projection index, modular projection value) — see
    the module docstring for the pigeonhole argument — then every
    candidate pair is verified with the same bounded levenshtein, so
    kept pairs are never wrong. Same output schema as `fuzzy_pairs`
    (id_a < id_b, name_a, name_b, edit_dist).

    Cost: each record emits max_dist+1 blocking rows; the join runs on
    the compound key, whose cardinality grows with the data (distinct
    projection values), so per-block mass stays bounded where the base
    block alone walls out. Measured on the sequential-name corpus at
    the sf10 decade: the nation block admits 4.5e10 comparisons, the
    compound key ~1e9.

    RECALL CONTRACT (module docstring): exact ONLY for
    pure-substitution pairs — at every length, including names shorter
    than max_dist+1, which ride the constant short-class fallback key
    below (r14 ADVICE: without it the pigeonhole has fewer than s
    residue classes to spare and the claim silently failed for short
    names; empty names never paired at all). Any insertion/deletion
    (length-changing OR equal-length shift) can still be missed —
    measured 94.4% total recall at sf0.01 on the fixed-length corpus,
    whose misses are all shift pairs. This arm is the cheap screen;
    `fuzzy_pairs_deletion` is the lossless production path and the
    declared query.

    `max_block_pairs` guards the compound key's own collision mass
    (Σ over compound blocks of C(n,2), multiplicity across the s
    projections included — that is the join work): estimated from the
    block-count table before the join, raising with the dominant block,
    the same loud contract as `fuzzy_pairs`."""
    s = max_dist + 1
    name = canonicalize(name_col) if normalize else F.col(name_col)
    # rebalance before the projection explode (see fuzzy_pairs_deletion)
    n_par = df.sparkSession.sparkContext.defaultParallelism
    df = df.repartition(n_par)
    # Fallback blocking row for names SHORTER than s = max_dist+1
    # (r14 ADVICE): residue classes past the string length yield NULL
    # segments, so a length-≤max_dist name can have EVERY surviving
    # projection touched by substitutions (pigeonhole needs s classes)
    # and empty names emit no key at all — even identical ones never
    # paired. Any two names of length ≤ max_dist are trivially within
    # max_dist substitutions of each other, so one constant key
    # (_seg_i = s, disjoint from the real projections by index) blocks
    # the whole short class together per base block; the exact verify
    # decides. Short names are rare by definition, so the C(n,2) mass
    # this admits is negligible — and the pure-substitution exactness
    # claim now holds at EVERY length (equal-length short pairs share
    # the fallback; a short/long pair can't be pure-substitution).
    # NULL names still fall out: length(NULL) < s is NULL → no row.
    fallback = F.when(F.length(name) < s, F.lit(""))
    proj = df.select(
        F.col(id_col).alias("_id"),
        name.alias("_name"),
        F.col(block_col).alias("_blk0"),
        F.posexplode(
            F.array(
                *[modular_segment(name, i, s) for i in range(s)],
                fallback,
            )
        ).alias("_seg_i", "_seg"),
    ).filter(F.col("_seg").isNotNull())
    if max_block_pairs is not None:
        # pin before the guard's .first() — see fuzzy_pairs_deletion
        from core_telecoms_etl_spark.caching import cache_scoped

        proj = cache_scoped("linkage.segmented.proj", proj)
        _block_mass_guard(
            proj,
            ["_blk0", "_seg_i", "_seg"],
            max_block_pairs,
            "fuzzy_pairs_segmented",
            "the name distribution collapses the projections "
            "(near-constant names). Add another blocking dimension "
            "or raise max_block_pairs.",
        )
    a = proj.select(
        F.col("_id").alias("id_a"),
        F.col("_name").alias("name_a"),
        "_blk0",
        "_seg_i",
        "_seg",
    )
    b = proj.select(
        F.col("_id").alias("id_b"),
        F.col("_name").alias("name_b"),
        "_blk0",
        "_seg_i",
        "_seg",
    )
    cand = (
        a.join(b, ["_blk0", "_seg_i", "_seg"])
        .filter(F.col("id_a") < F.col("id_b"))
        # a pair agreeing on several projections appears once per
        # agreement — dedupe BEFORE the (more expensive) verify
        .select("id_a", "id_b", "name_a", "name_b")
        .distinct()
    )
    dist = F.levenshtein("name_a", "name_b", max_dist)
    return cand.withColumn("edit_dist", dist).filter(
        F.col("edit_dist") >= 0
    )


def fuzzy_pairs_auto(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_col: str,
    *,
    max_dist: int = 2,
    normalize: bool = False,
    exact_mass_budget: int = 100_000_000,
    max_block_pairs: int | None = None,
) -> DataFrame:
    """Route between the plain blocked join and the deletion arm on the
    MEASURED base-block comparison mass — the `auto_topk` convention
    (route on what the data says, not on what the caller guessed). The
    estimate is the same metadata-scale block-count aggregate the
    tripwires use (one tiny job); below `exact_mass_budget` the plain
    arm wins on constants (no 172-way neighborhood build, no candidate
    dedupe shuffle), above it the deletion arm's sub-wall candidate
    mass dominates. Default crossover 1e8: measured on the
    sequential-name corpus the plain arm clears 4.5e8 comparisons in
    ~28 s on 32 cores (~16M cmp/s/core·s) while the deletion arm's
    fixed cost is ~8 s at the same scale, so 1e8 (~6 s plain) is the
    indifference point with a safety margin on the wall side. Both
    routes return the identical pair set (the deletion arm is lossless
    — `deletion_keys` theorem), so routing never changes results, only
    the plan; `max_block_pairs` passes through to BOTH routes (the
    plain arm's fixed-B tripwire, the deletion arm's collapse guard) —
    the caller's budget contract holds whichever way the router
    goes.

    max_dist > 2 always takes the plain arm: the deletion route only
    supports k ∈ {1, 2} (`deletion_keys` raises — |neighborhood| is
    O(L^k)), and routing into a ValueError above the mass budget would
    make the router's BEHAVIOR depend on measured mass for the same
    arguments (r14 ADVICE). The plain arm still carries the caller's
    `max_block_pairs` tripwire, so an over-mass run fails loud with
    the measured count, not a k-constraint error."""
    if max_dist > 2:
        return fuzzy_pairs(
            df, id_col, name_col, block_col,
            max_dist=max_dist, normalize=normalize,
            max_block_pairs=max_block_pairs,
        )
    row = (
        df.groupBy(F.col(block_col).alias("_blk"))
        .agg(F.count("*").alias("_n"))
        .agg(
            F.sum(
                F.col("_n").cast("decimal(38,0)") * (F.col("_n") - 1) / 2
            ).alias("_m")
        )
        .first()
    )
    mass = int(row["_m"] or 0)
    if mass <= exact_mass_budget:
        return fuzzy_pairs(
            df, id_col, name_col, block_col,
            max_dist=max_dist, normalize=normalize,
            max_block_pairs=max_block_pairs,
        )
    return fuzzy_pairs_deletion(
        df, id_col, name_col, block_col,
        max_dist=max_dist, normalize=normalize,
        max_block_pairs=max_block_pairs,
    )


def link_best_match(
    left: DataFrame,
    right: DataFrame,
    id_cols: tuple[str, str],
    name_cols: tuple[str, str],
    block_cols: tuple[str, str],
    *,
    max_dist: int = 2,
    blocking: str = "block",
) -> DataFrame:
    """Link each left record to its single best fuzzy match on the right
    (lowest edit distance, ties broken by right id): the master-data
    "attach the canonical entity" step. Same blocked-join shape as
    `fuzzy_pairs`, then one window min per left id — two shuffles total,
    both on bounded keys.

    `blocking="deletion"` swaps the candidate generator for the
    lossless deletion-neighborhood join (`deletion_keys` theorem) —
    the escalation path when the plain block key hits the fixed-B wall
    on a two-sided link, same trade as fuzzy_pairs vs
    fuzzy_pairs_deletion: identical matches, sub-wall candidate mass,
    172 blocking rows per record."""
    lid, rid = id_cols
    lname, rname = name_cols
    lblk, rblk = block_cols
    if blocking not in ("block", "deletion"):
        raise ValueError(
            f"link_best_match: unknown blocking {blocking!r} "
            "(expected 'block' or 'deletion')"
        )
    if blocking == "deletion":
        n_par = left.sparkSession.sparkContext.defaultParallelism
        kh = lambda name: F.explode(  # noqa: E731
            F.transform(
                deletion_keys(F.col(name), max_dist),
                lambda s: F.xxhash64(s),
            )
        ).alias("_kh")
        lp = left.repartition(n_par).select(
            lid, F.col(lname).alias("_ln"),
            F.col(lblk).alias("_blk"), kh(lname),
        )
        rp = right.repartition(n_par).select(
            rid, F.col(rname).alias("_rn"),
            F.col(rblk).alias("_blk"), kh(rname),
        )
        cand = (
            lp.join(rp, ["_blk", "_kh"])
            .select(lid, "_ln", rid, "_rn")
            .distinct()
            .withColumn("edit_dist", F.levenshtein("_ln", "_rn", max_dist))
            .filter(F.col("edit_dist") >= 0)
        )
    else:
        cand = (
            left.select(
                lid, F.col(lname).alias("_ln"), F.col(lblk).alias("_blk")
            )
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
