"""Stage-decomposed profile of minhash_near_dup (VERDICT r10 ask #3).

The r10 sf1 sweep measured minhash_near_dup at 313.8s — SLOWER than the
exact posting-join baseline near_dedup (270.2s), even though the
8×-replica probe shows the right growth shape (1.5× vs 11.9× at 8×).
An approximate index losing to its own exact baseline at 80k docs has
an unexplained constant; this tool decomposes the pipeline so the
dominant term is measured, not guessed:

  1. shingle+hash posting explode (shared prefix of every stage)
  2. minhash signature build (the 64-way min aggregation)
  3. band-bucket self-join → distinct candidate pairs
  4. signature-join est_jaccard filter
  5. exact verify (refine_pairs_exact)
  plus the end-to-end query for cross-checking the sum.

Each stage is timed as min-of-N noop writes of a plan cut at that
stage, cache cleared between stages so no stage rides another's
storage. Usage:

    SF_DIR=/root/testdata/sf0.1 python tools/minhash_profile.py
    SF_DIR=/tmp/spark_graft_sf1 python tools/minhash_profile.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from core_telecoms_etl_spark import get_spark  # noqa: E402
from core_telecoms_etl_spark.caching import release_caches  # noqa: E402
from core_telecoms_etl_spark.operators import dedup as dd  # noqa: E402
from core_telecoms_etl_spark.operators.dedup import (  # noqa: E402
    _shingled,
    minhash_signature,
    refine_pairs_exact,
)


def _time(df, n_runs=3) -> float:
    runs = []
    for _ in range(n_runs):
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        runs.append(time.time() - t0)
    return round(min(runs), 3)


def main() -> None:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("minhash_profile", shuffle_partitions=32)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    out: dict[str, float] = {}

    k, bands, n = 64, 16, 3
    r = k // bands

    # 1. shared prefix: shingle + hash posting explode (explode_outer —
    # see _shingled's EXPLODE CAVEAT; the plain-explode form of this
    # stage is what the first run of this profiler caught at 4.5s)
    sh = _shingled(dd._ensure_parallelism(docs), "doc_id", "text", n)
    posts = (
        sh.select("doc", F.explode_outer("shingles").alias("__s"))
        .filter(F.col("__s").isNotNull())
        .withColumn("__h", F.xxhash64("__s"))
    )
    spark.catalog.clearCache()
    out["1_postings"] = _time(posts)

    # 2. signature build (includes its own posting pass)
    sig_plan = minhash_signature(docs, "doc_id", "text", n=n, k=k)
    spark.catalog.clearCache()
    out["2_signature"] = _time(sig_plan)

    # 3. band-bucket self-join -> distinct candidates (signature cached
    # so this stage times the JOIN, not a signature recompute)
    sig = sig_plan.cache()
    sig.count()
    banded = sig.select(
        "doc",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        "_",
                        F.slice("sig", b * r + 1, r).cast("array<string>"),
                    )
                ),
            )
        ).alias("band", "bucket"),
    )
    cand = (
        banded.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc") < F.col("y.doc")),
        )
        .select(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"))
        .distinct()
    )
    out["3_band_join"] = _time(cand)
    n_cand = cand.count()

    # 4. est filter (candidates + signatures cached)
    candc = cand.cache()
    candc.count()
    sa = sig.select(F.col("doc").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc").alias("doc_b"), F.col("sig").alias("sig_b"))
    est = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda a, b: a == b), lambda m: m
        )
    ) / F.lit(float(k))
    filt = (
        candc.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", est.alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= 0.5)
    )
    out["4_est_filter"] = _time(filt)
    filtc = filt.cache()
    n_filt = filtc.count()

    # 5. exact verify on the (cached) filtered candidates
    ver = refine_pairs_exact(docs, filtc, "doc_id", "text", n=n, threshold=0.8)
    out["5_verify"] = _time(ver)
    n_pairs = ver.count()

    # end-to-end (fresh, nothing cached) for cross-check
    spark.catalog.clearCache()
    release_caches()
    full = refine_pairs_exact(
        docs,
        dd.minhash_lsh_pairs(
            docs, "doc_id", "text", n=n, k=k, bands=bands, est_threshold=0.5
        ),
        "doc_id",
        "text",
        n=n,
        threshold=0.8,
    )
    out["end_to_end"] = _time(full)

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_docs": n_docs,
                "n_candidates": n_cand,
                "n_est_filtered": n_filt,
                "n_pairs": n_pairs,
                "stages_sec": out,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
