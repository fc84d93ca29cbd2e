"""Build the NULL-injection differential corpus: copy an SF dir with a
deterministic 1% of nullable non-key columns nulled (hash-masked on a
key, so the corpus is bit-reproducible). Run the full oracle sweep
against it to hunt cross-engine NULL-handling divergences:

    python tools/make_null_testdata.py               # sf0.01 -> /tmp
    SF_DIR=/tmp/spark_graft_nulls python tools/check_oracle.py --jobs 6

The r8 campaign caught 11 real divergences this way (NULL series keys
in order-dependent folds, max_by/arg_max NULL-arg asymmetry,
NULL-group cardinality, concat_ws-vs-|| semantics, silent predicate
row loss) — see BASELINE.md "NULL-injection differential".
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

# table -> (null-mask key expression, columns to null at 1%)
PLANS = {
    "events": ("event_id", ["value", "event_type", "props"]),
    "lineitem": ("l_orderkey*10+l_linenumber", ["l_shipdate", "l_discount"]),
    "orders": ("o_orderkey", ["o_orderpriority"]),
    "documents": ("doc_id", ["text", "lang"]),
    # c_name added r14: the linkage family (fuzzy_pairs*, levenshtein
    # verify, deletion neighborhoods) had ZERO NULL-name differential
    # coverage — every corpus kept names non-null
    "customer": ("c_custkey", ["c_mktsegment", "c_name"]),
}
COPY_ONLY = ["region", "nation", "supplier", "part", "embeddings"]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_nulls"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_ONLY:
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    for t, (key, cols) in PLANS.items():
        desc = con.sql(f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()
        sel = []
        for (c, *_rest) in desc:
            if c in cols:
                sel.append(
                    f"CASE WHEN hash({key} + 7919) % 100 = 0 "
                    f"THEN NULL ELSE {c} END AS {c}"
                )
            else:
                sel.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(sel)} FROM '{src}/{t}.parquet') "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(
            f"SELECT count(*) FROM '{dst}/{t}.parquet' "
            f"WHERE {cols[0]} IS NULL"
        ).fetchone()[0]
        print(f"{t}: {n} NULLs injected into {cols[0]} (and {cols[1:]})")
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
