"""Count-min sketch as a first-class DataFrame state table.

Spark ships `count_min_sketch` as an opaque binary aggregate with no SQL
point-query function, so the engine builds the sketch from relational
primitives instead: the counter matrix IS a (depth × width)-row
DataFrame — readable, persistable, and mergeable with plain operators.

Why this matters at 100 TB: exact per-key counting (`groupBy(key)`)
shuffles and stores state proportional to the DISTINCT KEY SPACE —
unbounded for tokens/URLs/user-agents. The CMS counter table is FIXED
SIZE (depth·width rows, e.g. 4×8192) no matter how many distinct keys
stream through: the heavy-hitter pattern over an unbounded vocabulary.
Guarantees (Cormode & Muthukrishnan 2005): estimates NEVER
under-count, and over-count ≤ e·N/width with probability 1−e^-depth.

- build: one explode(depth) + hash-bucket groupBy — a single shuffle of
  depth·width partial counters (map-side combine collapses almost all
  rows before the exchange).
- merge: element-wise sum of counter tables (`cms_merge`) — daily
  sketches roll up to monthly without rescanning, like the HLL/KLL/theta
  rollups (`queries/relational.py`).
- query: min over depth of the probed cells — a broadcast join against
  the tiny counter table, never a rescan of the data.

Determinism: xxhash64 with the row index as an extra hashed column
derives the depth hash functions — no RNG anywhere, so counters are
bit-stable across retries/engines given the same input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column, seed: Column, width: int) -> Column:
    # xxhash64 over (key, seed) == a seeded hash family; pmod keeps the
    # bucket non-negative
    return F.pmod(F.xxhash64(key, seed), F.lit(width))


def cms_build(
    df: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 8192,
    weight_col: str | None = None,
) -> DataFrame:
    """(seed, bucket, count) counter matrix over `df[key_col]`.

    Missing (seed, bucket) cells are zero by convention — `cms_estimate`
    coalesces them — so the table never materializes empty cells."""
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    seeds = F.array(*[F.lit(i) for i in range(depth)])
    return (
        df.select(F.col(key_col).alias("__key"), w.alias("__w"))
        .select(F.explode(seeds).alias("seed"), "__key", "__w")
        .select(
            "seed",
            _bucket(F.col("__key"), F.col("seed"), width).alias("bucket"),
            "__w",
        )
        .groupBy("seed", "bucket")
        .agg(F.sum("__w").alias("count"))
    )


def cms_merge(*counters: DataFrame) -> DataFrame:
    """Element-wise sum of counter tables built with the SAME
    depth/width — the mergeable-state property: union then one tiny
    groupBy over ≤ depth·width rows."""
    if not counters:
        raise ValueError("cms_merge needs at least one counter table")
    out = counters[0]
    for c in counters[1:]:
        out = out.unionByName(c)
    return out.groupBy("seed", "bucket").agg(F.sum("count").alias("count"))


def cms_estimate(
    counters: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    width: int,
    est_col: str = "cms_est",
) -> DataFrame:
    """Point-query estimates for every row of `keys[key_col]`: min over
    the depth probed cells. The counter table is broadcast (≤ depth·width
    rows by construction); the probe is a broadcast hash join, no
    shuffle of the key side."""
    depth_rows = counters.select("seed").distinct()
    probes = (
        keys.select(F.col(key_col))
        .crossJoin(F.broadcast(depth_rows))
        .select(
            key_col,
            "seed",
            _bucket(F.col(key_col), F.col("seed"), width).alias("bucket"),
        )
    )
    return (
        probes.join(F.broadcast(counters), ["seed", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("count"), F.lit(0))).alias(est_col))
    )


# ---------------------------------------------------------------------------
# Theta sketches (distinct-count set algebra) — thin parameterized
# wrappers over Spark 4's builtin theta functions.
# ---------------------------------------------------------------------------

# Measured accuracy of theta_sketch_agg by lgNomEntries (BASELINE.md
# "Sketch estimation-mode probe", 145k distinct keys, deep estimation
# mode): 12 → 4.3% error, 14 → 1.16%, 16 → 0.09%. The builtin default
# (12) sits inside a 5% tolerance "without margin" (VERDICT r6) — at
# cluster scale the operand sketches should be built at ≥ 14, so that
# is the engine default here. Cost: sketch state doubles per +1 lg
# (2^lg 8-byte hashes max), still KB-scale — negligible next to the
# scan it summarizes.
THETA_DEFAULT_LG_NOM_ENTRIES = 14


def theta_agg(col: str, lg_nom_entries: int = THETA_DEFAULT_LG_NOM_ENTRIES) -> Column:
    """theta_sketch_agg(col, lg_nom_entries) as a Column.

    `col` is a SQL expression string (so conditional sketches like
    `CASE WHEN … THEN key END` work); lg_nom_entries ∈ [4, 26] per the
    DataSketches spec — validated here so a typo fails at plan build,
    not executor runtime."""
    if not 4 <= lg_nom_entries <= 26:
        raise ValueError(
            f"lg_nom_entries must be in [4, 26], got {lg_nom_entries}"
        )
    return F.expr(f"theta_sketch_agg({col}, {lg_nom_entries})")


def theta_estimate(col: str) -> Column:
    """theta_sketch_estimate over a sketch column/expression string."""
    return F.expr(f"theta_sketch_estimate({col})")


def theta_union_estimate(a: str, b: str) -> Column:
    return F.expr(f"theta_sketch_estimate(theta_union({a}, {b}))")


def theta_intersection_estimate(a: str, b: str) -> Column:
    return F.expr(f"theta_sketch_estimate(theta_intersection({a}, {b}))")


def theta_difference_estimate(a: str, b: str) -> Column:
    """|A \\ B| estimate. Error scales with the OPERAND sketches, not
    the (possibly tiny) result — bound tolerance relative to |A|."""
    return F.expr(f"theta_sketch_estimate(theta_difference({a}, {b}))")


# ---------------------------------------------------------------------------
# Bloom filter (set-membership pruning) — relational build, literal-array
# probe. Spark's own bloom machinery (`bloom_filter_agg`/`might_contain`)
# is internal-only (not SQL-registered, probed r7), and the runtime
# bloom-join rule only fires on shuffle joins it selects itself — so the
# engine exposes an explicit, deterministic bloom for semi-join pruning.
# ---------------------------------------------------------------------------


def bloom_build(
    df: DataFrame,
    key_col: str,
    *,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
    key_type: str = "bigint",
) -> list[int]:
    """Build a bloom bitmask over `df[key_col]`, returned as a list of
    n_bits/64 long words.

    Plan: explode each key into `n_hashes` (xxhash64(key, seed) mod
    n_bits) positions, groupBy word-index with a map-side-combined
    bit_or — ONE shuffle of at most n_bits/64 tiny rows regardless of
    input size — then collect the words (n_bits=2^20 → 16384 longs =
    128 KB, the same DQ-sized-aggregate collect budget as
    operators/dq.py). The mask ships to probes as a LITERAL array
    inside the plan (broadcast with it), so the probe side is pure
    codegen'd JVM expression work: zero extra shuffles, zero joins.

    Determinism: xxhash64 + seed column — no RNG, bit-stable across
    retries and engines. False-positive rate ≈ (1-e^{-kn/m})^k; at the
    default m=2^20, k=5 it stays < 1% up to ~10^5 keys — size m to the
    expected distinct-key count, the collect stays KB-scale to m=2^27.

    `key_type` pins the hash input type on BOTH sides: xxhash64 is
    type-sensitive (xxhash64(7::INT) != xxhash64(7::BIGINT)), so a mask
    built over an int column and probed with a bigint column would
    false-negative on EVERY key. Build and probe therefore cast to the
    same declared type (default bigint; pass "string" for text keys) —
    the never-false-negative guarantee is enforced, not assumed.
    """
    if n_bits % 64:
        raise ValueError("n_bits must be a multiple of 64")
    seeds = F.explode(
        F.array(*[F.lit(i) for i in range(n_hashes)])
    ).alias("seed")
    pos = F.pmod(
        F.xxhash64(F.col(key_col).cast(key_type), F.col("seed")),
        F.lit(n_bits),
    )
    words = (
        df.select(F.col(key_col), seeds)
        .select(pos.alias("pos"))
        .select(
            (F.col("pos") / 64).cast("long").alias("word"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (F.col("pos") % 64).cast("int"),
            ).alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("mask"))
        .collect()
    )
    out = [0] * (n_bits // 64)
    for r in words:
        out[r.word] = r.mask
    return out


def bloom_might_contain(
    key: Column | str,
    mask: list[int],
    *,
    n_hashes: int = 5,
    key_type: str = "bigint",
) -> Column:
    """Membership-test Column against a `bloom_build` mask: AND over
    the n_hashes probed bits, each an element_at + bitwise-and on the
    literal word array — whole-stage-codegen JVM work, no shuffle, no
    join. NEVER false-negative — PROVIDED `key_type` matches the
    build's (both default bigint); the cast pins xxhash64's
    type-sensitive input so int-vs-bigint column drift cannot silently
    zero the probe. False positives per the build's rate, so exact
    semantics require a verifying join AFTER this prune."""
    c = (F.col(key) if isinstance(key, str) else key).cast(key_type)
    n_bits = len(mask) * 64
    arr = F.lit(mask)
    cond = F.lit(True)
    for seed in range(n_hashes):
        pos = F.pmod(F.xxhash64(c, F.lit(seed)), F.lit(n_bits))
        word = F.element_at(arr, ((pos / 64).cast("int") + 1))
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
        )
        cond = cond & (word.bitwiseAND(bit) != 0)
    return cond


# --- domain-safe exact top-k by count (VERDICT r10 ask #1) -----------------

# Ceiling on the frequent-items sketch's tracked-item budget when it is
# used in EXACT mode. This is Spark's own hard engine limit: any higher
# maxItemsTracked fails the whole job with
# APPROX_TOP_K_MAX_ITEMS_TRACKED_EXCEEDS_LIMIT (verified live against
# pyspark 4.1 — so the r10 hard-coded 1M was already AT the ceiling,
# and no sketch parameterization can cover a >500k-key domain at 2×
# headroom). Past this, the plain two-stage groupBy IS the scalable
# exact plan: its shuffle state per task is only the distinct keys of
# that task's partition range, and it is exact at any domain.
MAX_EXACT_TRACKED_DEFAULT = 1_000_000


def exact_top_k_by_count(
    df: DataFrame,
    key_col: str,
    k: int,
    *,
    domain_size: int,
    max_tracked: int = MAX_EXACT_TRACKED_DEFAULT,
) -> DataFrame:
    """Exact top-k keys by row count, with the physical strategy chosen
    from the KEY DOMAIN rather than hard-coded (VERDICT r10: the r10
    query pinned maxItemsTracked=1M, which the sf10 part-key domain
    ~2M silently blows through — approx_top_k past its tracked budget
    on near-uniform data honestly reports "no heavy hitters", i.e. 0
    rows, the wrong MODE for an exact-top-k query).

    NULL keys are excluded in BOTH arms (ADVICE r11: approx_top_k
    ignores nulls while groupBy counts NULL as a group, so a nullable
    key would change the emitted rows depending solely on which arm
    the domain routed to — the arm choice must never be observable).

    `domain_size` is the caller's bound on the distinct-key count —
    for a foreign key, the referenced dimension's row count (cheap:
    one metadata-ish count of the dim, never a distinct over the
    fact). Strategy:

    - tracked = max(65536, 2·domain_size) ≤ `max_tracked` → single-pass
      `approx_top_k` (DataSketches frequent-items): one narrow agg, no
      key-grain shuffle, mergeable partials; EXACT while tracked ≥
      distinct keys. The 2× headroom absorbs dirty FKs beyond the dim.
    - otherwise → plain `groupBy(key).count()` top-k: two-stage agg
      (map-side partial → key-grain exchange → bounded per-task
      TakeOrdered), exact at ANY domain. At 100 TB with a 10^9-key
      domain this is the right plan — the sketch's fixed-size state
      pitch is void once "fixed" must exceed the domain.

    The sketch arm executes its single-row aggregate EAGERLY (a
    bounded driver read: one row whose array carries ≤ fetch entries)
    because two properties are only checkable from the result:

    - loud tripwires (the r10-sf1 failure class): a non-empty input
      with an empty sketch RAISES, and approx_count_distinct(key) >
      tracked RAISES (partial purging — counts may be estimates — is
      caught before it empties the result; acd's ~5% rsd is far
      inside the 2× headroom). Both ride the same aggregation as the
      sketch — no extra pass.
    - deterministic tie enclosure (ADVICE r11): the contract is the
      (n desc, item) cut, but when the tie group AT the k-th count is
      not fully inside the fetched prefix, approx_top_k hands back an
      arbitrary subset of the tied items — plausible on the
      near-uniform distributions this operator is aimed at. The cut
      is deterministic iff the boundary is ENCLOSED: fewer than
      `fetch` items came back (the sketch returned everything), or
      the last fetched count is strictly below the k-th count (every
      item ≥ the k-th count is then provably present). On an
      unenclosed boundary the fetch is escalated ×4 (re-running the
      one aggregate; ≤ log₄(tracked/fetch₀) retries, and
      fetch = tracked encloses by construction since the acd tripwire
      bounds the true domain by tracked).

    Returns (item, n) under the deterministic (n desc, item) order,
    limit k. The sketch arm materializes the ≤ k rows it already
    holds driver-side via createDataFrame rather than re-running the
    scan; the groupBy arm stays fully lazy.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if domain_size < 0:
        raise ValueError(f"domain_size must be >= 0, got {domain_size}")
    df = df.where(F.col(key_col).isNotNull())
    # the engine ceiling binds even if the caller asks for more — a
    # bigger budget is not a choice Spark offers (see constant above)
    max_tracked = min(max_tracked, MAX_EXACT_TRACKED_DEFAULT)
    tracked = max(65536, 2 * domain_size)
    if tracked > max_tracked:
        return (
            df.groupBy(F.col(key_col).alias("item"))
            .agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), "item")
            .limit(k)
        )
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("item", df.schema[key_col].dataType, True),
            StructField("n", LongType(), False),
        ]
    )
    fetch = min(max(4 * k, 100), tracked)
    while True:
        row = df.agg(
            F.expr(
                f"approx_top_k({key_col}, {fetch}, {tracked})"
            ).alias("tk"),
            F.count("*").alias("n_in"),
            F.approx_count_distinct(key_col).alias("acd"),
        ).first()
        if row.n_in == 0:
            return df.sparkSession.createDataFrame([], out_schema)
        if not row.tk:
            raise RuntimeError(
                "exact_top_k_by_count: approx_top_k returned an empty "
                f"sketch for {row.n_in} input rows (tracked={tracked})"
                " — the key domain exceeds the tracked budget; fix "
                "domain_size or raise max_tracked"
            )
        if row.acd > tracked:
            raise RuntimeError(
                f"exact_top_k_by_count: ~{row.acd} distinct keys "
                f"exceed the tracked budget {tracked} "
                f"(domain_size={domain_size} was too small) — sketch "
                "counts may be purged estimates, not exact"
            )
        items = sorted(
            ((e["item"], e["count"]) for e in row.tk),
            key=lambda t: (-t[1], t[0]),
        )
        enclosed = (
            len(items) < fetch
            or len(items) <= k
            or items[-1][1] < items[k - 1][1]
        )
        if enclosed or fetch >= tracked:
            return df.sparkSession.createDataFrame(
                items[:k], out_schema
            )
        fetch = min(4 * fetch, tracked)
