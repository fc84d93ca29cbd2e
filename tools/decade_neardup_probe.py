"""sf10 near-dup decade probe (VERDICT r11 ask #1, r12 session).

At sf10 (500k docs) the exact-jaccard pair relation is off the table
on BOTH engines: the 31-word generator vocab saturates the 3-shingle
space (29,791 distinct shingles, 26.5M postings, max df 1,118,
Σdf² = 2.36e10 → 1.2e10 naive posting-join candidates — measured, see
BASELINE.md r12). So the full-oracle gate for the quadratic declared
baselines runs at sf3, and THIS probe supplies the sf10 evidence for
the declared scale path:

  1. minhash banding candidate mass (Σ C(bucket,2)) — the statistic
     that decides whether the banding join is launchable at all;
  2. minhash_lsh_pairs → refine_pairs_exact end-to-end wall time and
     the refined pair count at the declared geometry (n=3, t=0.8);
  3. connected_components over the refined sf10 pair relation — the
     dedup_clusters CC half at decade scale (its declared input, the
     exact pair relation, is the sf3 job);
  4. prefix-filter candidate mass estimate: Σ_s df_prefix(s)² over
     the ACTUAL prefix postings (cheap aggregation, no join) — the
     honest answer to "why is PPJoin not the sf10 baseline on this
     corpus" (no rare shingles → prefix df stays huge).

Usage: python tools/decade_neardup_probe.py [SF_DIR]
Prints one JSON line; readings recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf10"
    from core_telecoms_etl_spark import get_spark
    from core_telecoms_etl_spark.operators import dedup as dd
    from core_telecoms_etl_spark.operators.graph import connected_components

    spark = get_spark(
        "decade-neardup-probe",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.cleaner.periodicGC.interval": "2min",
        },
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out: dict = {"sf_dir": sf_dir, "docs": docs.count()}

    # -- 1. banding candidate mass (the launchability statistic) -----
    t0 = time.time()
    sig = dd.minhash_signature(docs, "doc_id", "text", n=3, k=64)
    bands, r = 16, 4
    banded = sig.select(
        "doc",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        "_", F.slice("sig", b * r + 1, r).cast("array<string>")
                    )
                ),
            )
        ).alias("band", "bucket"),
    )
    m = banded.groupBy("band", "bucket").count()
    st = m.agg(
        F.max("count").alias("max_bucket"),
        F.expr("sum(count*(count-1)/2)").alias("cand_mass"),
    ).first()
    out["band_max_bucket"] = int(st.max_bucket)
    out["band_cand_mass"] = int(st.cand_mass)
    out["t_band_mass_s"] = round(time.time() - t0, 1)

    # -- 2. minhash -> exact refine end-to-end ------------------------
    t0 = time.time()
    cands = dd.minhash_lsh_pairs(docs, "doc_id", "text", n=3, k=64)
    refined = dd.refine_pairs_exact(
        docs, cands, "doc_id", "text", n=3, threshold=0.8
    ).select("doc_a", "doc_b")
    refined = refined.persist()
    out["minhash_pairs"] = refined.count()
    out["t_minhash_refine_s"] = round(time.time() - t0, 1)

    # -- 3. CC over the refined decade pair relation ------------------
    t0 = time.time()
    cc = connected_components(refined, src="doc_a", dst="doc_b")
    out["cc_nodes"] = cc.count()
    out["cc_components"] = cc.select("component").distinct().count()
    out["t_cc_s"] = round(time.time() - t0, 1)
    refined.unpersist()

    # -- 4. prefix-postings df^2 mass (why PPJoin is not the decade
    #       baseline on a saturated-vocab corpus) ---------------------
    t0 = time.time()
    sh = dd._shingled(docs, "doc_id", "text", 3)
    ex = sh.select(
        "doc",
        F.size("shingles").alias("n_sh"),
        F.explode_outer("shingles").alias("s"),
    ).where(F.col("s").isNotNull())
    df_tbl = ex.groupBy("s").agg(F.count("*").alias("df"))
    ranked = ex.join(df_tbl, "s").withColumn(
        "rk",
        F.row_number().over(
            __import__(
                "pyspark.sql.window", fromlist=["Window"]
            ).Window.partitionBy("doc").orderBy("df", "s")
        ),
    )
    # PPJoin jaccard-0.8 prefix: |s| - ceil(t/(1+t)*(1+|s|)) + 1 kept
    pref = ranked.where(
        F.col("rk")
        <= F.col("n_sh") - F.ceil(F.lit(0.8 / 1.8) * (F.col("n_sh") + 1)) + 1
    )
    pst = (
        pref.groupBy("s")
        .agg(F.count("*").alias("pdf"))
        .agg(
            F.expr("sum(pdf*(pdf-1)/2)").alias("prefix_cand_mass"),
            F.max("pdf").alias("max_prefix_df"),
        )
        .first()
    )
    out["prefix_cand_mass"] = int(pst.prefix_cand_mass)
    out["max_prefix_df"] = int(pst.max_prefix_df)
    out["t_prefix_mass_s"] = round(time.time() - t0, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
