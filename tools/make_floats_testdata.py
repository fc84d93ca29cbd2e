"""Build the FLOAT-SPECIALS differential corpus: copy an SF dir with a
deterministic ~1% of metric values poisoned with NaN / +Inf / -Inf
(hash-masked — bit-reproducible, like the NULL corpus):

    python tools/make_floats_testdata.py             # sf0.01 -> /tmp
    SF_DIR=/tmp/spark_graft_floats python tools/check_oracle.py --jobs 6

Why it exists (r15): a realistic 100 TB metric feed always carries a
few nonfinite rows (div-by-zero upstream, sensor overflow, bad JSON
number), and the first sweep of this corpus failed **15/210** queries:
nine died mid-job with ANSI CAST_OVERFLOW at their cent-grid casts
(the exact 40-hours-in crash shape this corpus exists to prevent), two
oracles crashed in DuckDB (NaN→INT64, STDDEV out of range), and four
diverged silently (pandas NA-skipping vs SQL NaN-propagating state,
NaN-cosine rank flips in the LSH candidate set). The engine-wide
contract that closed all 15 — NONFINITE METRIC VALUES CARRY NO
MAGNITUDE AND SCOPE OUT EXACTLY LIKE NULLs — lives in
`operators/cleaning.finite/finite_or_null`, is adopted per-query via
`queries.metric_events` + `queries.with_finite_events`, extends
`similarity.conformant_vectors` (a NaN/Inf component has no cosine),
and pins `quantize_vectors`' NULL-output arm for nonfinite-component
vectors.

Injection plan: `events.value` gets NaN (1/400), +Inf (1/400), -Inf
(1/400); `embeddings` gets a NaN first component for ~1% of vectors.
MONEY columns (o_totalprice / l_extendedprice) stay clean by GENERATOR
CONTRACT: they live on the 2-decimal grid, and a nonfinite price is an
upstream DQ failure the dq_suite catches, not a value the revenue
pipeline should silently scope out.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_floats"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem documents"
    ).split():
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    con.execute(
        f"""COPY (SELECT event_id, ts, user_id, event_type,
              CASE WHEN hash(event_id + 13) % 400 = 0 THEN 'NaN'::DOUBLE
                   WHEN hash(event_id + 13) % 400 = 1
                     THEN 'Infinity'::DOUBLE
                   WHEN hash(event_id + 13) % 400 = 2
                     THEN '-Infinity'::DOUBLE
                   ELSE value END AS value, props
            FROM '{src}/events.parquet')
            TO '{dst}/events.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (SELECT vec_id,
              CASE WHEN hash(vec_id + 13) % 100 = 0
                   THEN ['NaN'::FLOAT] || embedding[2:]
                   ELSE embedding END AS embedding, label
            FROM '{src}/embeddings.parquet')
            TO '{dst}/embeddings.parquet' (FORMAT PARQUET)"""
    )
    n_nan, n_inf = con.sql(
        f"SELECT sum(CASE WHEN isnan(value) THEN 1 ELSE 0 END), "
        f"sum(CASE WHEN isinf(value) THEN 1 ELSE 0 END) "
        f"FROM '{dst}/events.parquet'"
    ).fetchone()
    n_vec = con.sql(
        f"SELECT count(*) FROM '{dst}/embeddings.parquet' "
        f"WHERE isnan(embedding[1])"
    ).fetchone()[0]
    print(
        f"events: {n_nan} NaN + {n_inf} Inf values; "
        f"embeddings: {n_vec} NaN-component vectors"
    )
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
