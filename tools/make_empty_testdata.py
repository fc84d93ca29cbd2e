"""Build the empty-facts differential corpus: all five fact tables at
0 rows (schema preserved), dimensions intact — the "empty ingest day"
every production pipeline eventually sees. Sweep with:

    python tools/make_empty_testdata.py
    SF_DIR=/tmp/spark_graft_empty python tools/check_oracle.py --jobs 6

The r8 campaign caught 15 real empty-input defects this way (crashes on
empty corpora, NULL-vs-0 empty aggregates, agg-shape asymmetries) —
see BASELINE.md "Empty-facts differential".
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

DIMS = ["region", "nation", "supplier", "part", "customer"]
FACTS = ["lineitem", "orders", "events", "documents", "embeddings"]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_empty"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in DIMS:
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    for t in FACTS:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet' LIMIT 0) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    print(f"wrote {dst} (facts empty, dims copied)")


if __name__ == "__main__":
    main()
