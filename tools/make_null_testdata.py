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

r15 widening (the r14 verdict ask — every previous widening found a
real divergence): `part`, `supplier`, and the MONEY columns
(`o_totalprice`, `l_extendedprice`) are now nulled, giving the 22
TPC-H report shapes their first NULL differential coverage; and
`embeddings` carries a TRI-MODAL plan — NULL embedding vs empty array
vs NULL element — because those are three DIFFERENT vector contracts
(a missing row, a zero-dimensional vector, and a poisoned component)
and the whole vector family had zero coverage of any of them. `label`
is also nulled (the kNN vote paths). Only `region`/`nation` stay
verbatim: 25/5 rows of pure join keys — nulling a PK breaks referential
identity, not NULL semantics.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

# table -> (null-mask key expression, columns to null at 1%)
PLANS = {
    "events": ("event_id", ["value", "event_type", "props"]),
    "lineitem": (
        "l_orderkey*10+l_linenumber",
        ["l_shipdate", "l_discount", "l_extendedprice"],
    ),
    "orders": ("o_orderkey", ["o_orderpriority", "o_totalprice"]),
    "documents": ("doc_id", ["text", "lang"]),
    # c_name added r14: the linkage family (fuzzy_pairs*, levenshtein
    # verify, deletion neighborhoods) had ZERO NULL-name differential
    # coverage — every corpus kept names non-null
    "customer": ("c_custkey", ["c_mktsegment", "c_name"]),
    # r15: the TPC-H report shapes read these dims on every path
    "part": ("p_partkey", ["p_brand", "p_type", "p_retailprice"]),
    "supplier": ("s_suppkey", ["s_name", "s_acctbal"]),
}

# table -> list of (column, replacement SQL) applied INSTEAD of the
# simple CASE..NULL (full-expression injections for non-scalar
# contracts; the mask key is still the table's PLANS-style key)
EXPR_PLANS = {
    "embeddings": (
        "vec_id",
        {
            # tri-modal: ~1% each of NULL vector / empty vector /
            # first-component NULL — three distinct vector contracts
            "embedding": (
                "CASE WHEN hash(vec_id + 7919) % 100 = 0 THEN NULL "
                "WHEN hash(vec_id + 7919) % 100 = 1 THEN []::FLOAT[] "
                "WHEN hash(vec_id + 7919) % 100 = 2 "
                "THEN [NULL::FLOAT] || embedding[2:] "
                "ELSE embedding END"
            ),
            "label": (
                "CASE WHEN hash(vec_id + 7919) % 100 = 3 THEN NULL "
                "ELSE label END"
            ),
        },
    ),
}

COPY_ONLY = ["region", "nation"]


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
                # r15: per-column salt so sibling columns null
                # INDEPENDENTLY (~1%) — the r14 shared mask made every
                # planned column of a row null together, so "priority
                # NULL but totalprice present" was never tested — PLUS
                # a shared 0.2% tombstone mask that nulls the whole
                # planned set of a row at once: the all-NULL-group
                # corner is what caught order_price_consistency's
                # NULL-vs-0 n_mismatch divergence, keep it reachable
                i = cols.index(c)
                sel.append(
                    f"CASE WHEN hash({key} * 131 + {i * 1000003}) "
                    f"% 100 = 0 OR hash({key} + 7919) % 500 = 0 "
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
    for t, (key, exprs) in EXPR_PLANS.items():
        desc = con.sql(f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()
        sel = [
            f"{exprs[c]} AS {c}" if c in exprs else c for (c, *_r) in desc
        ]
        con.execute(
            f"COPY (SELECT {', '.join(sel)} FROM '{src}/{t}.parquet') "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        stats = con.sql(
            f"""SELECT
                  sum(CASE WHEN embedding IS NULL THEN 1 ELSE 0 END),
                  sum(CASE WHEN len(embedding) = 0 THEN 1 ELSE 0 END),
                  sum(CASE WHEN embedding[1] IS NULL
                            AND embedding IS NOT NULL
                            AND len(embedding) > 0 THEN 1 ELSE 0 END),
                  sum(CASE WHEN label IS NULL THEN 1 ELSE 0 END)
                FROM '{dst}/{t}.parquet'"""
        ).fetchone()
        print(
            f"{t}: {stats[0]} NULL vectors, {stats[1]} empty vectors, "
            f"{stats[2]} NULL-element vectors, {stats[3]} NULL labels"
        )
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
