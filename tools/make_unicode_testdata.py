"""Build the UNICODE-injection differential corpus: copy an SF dir with a
deterministic ~2% of text-bearing columns mutated to carry non-ASCII
content (hash-masked on a key — bit-reproducible, like the NULL corpus):

    python tools/make_unicode_testdata.py            # sf0.01 -> /tmp
    SF_DIR=/tmp/spark_graft_unicode python tools/check_oracle.py --jobs 6

Why it exists (r15): every corpus the differential program had eaten so
far is pure ASCII, so the text/linkage/JSON families' cross-engine
unicode contracts were completely untested — and the r15 probe already
measured two REAL engine divergences awaiting data that exercises them:

- DuckDB `levenshtein` is BYTE-based (levenshtein('café','cafe') = 2 —
  é is two UTF-8 bytes) where Spark's is CODEPOINT-based (= 1). Any
  fuzzy-linkage pair whose edits touch a multibyte character diverges.
- DuckDB `upper('straße')` is 'STRAẞE' (capital sharp s) where Spark's
  full case mapping gives 'STRASSE'.

INJECTION DICTIONARY (fixed, small, and load-bearing): the linkage
oracles mirror Spark's codepoint distance by `translate`-ing every
dictionary codepoint to a distinct single ASCII byte that never occurs
in the column (see queries/analytics.py `_LEV`) — byte-level distance
over the translated strings EQUALS codepoint distance over the
originals, exactly, because the mapping is injective and 1:1 per
codepoint. That mirror is only sound for codepoints in the dictionary,
so the generator must draw from it and nothing else for levenshtein-
bearing columns (`c_name`); free-form unicode (emoji, CJK sentences)
goes only into columns no oracle runs levenshtein over
(documents.text, events.props).
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

# levenshtein-safe dictionary (c_name): each codepoint has an ASCII
# stand-in for the oracle translate-mirror — keep in sync with
# queries/analytics.py _UNI / _UNI_ASCII
NAME_UNI = "éüñç"
# free-form suite for non-levenshtein text columns
TEXT_SUITE = " café naïve 中文文本 \U0001f44d Übung straße"
CJK_SENTENCE = "中文文本分析测试数据"


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_unicode"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    tables = (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split()
    plans: dict[str, list[tuple[str, str]]] = {
        # ~2% of names get a dictionary codepoint APPENDED (pairs of
        # mutated names keep small true distances), ~1% get one
        # SUBSTITUTED into the digit tail (edits that cross the
        # multibyte/ASCII boundary — the byte-vs-codepoint trigger)
        "customer": [
            (
                "c_name",
                f"""CASE
                     WHEN hash(c_custkey * 7 + 11) % 50 = 0 THEN
                       c_name
                       || substr('{NAME_UNI}',
                                 1 + CAST(hash(c_custkey) % 4 AS INT), 1)
                     WHEN hash(c_custkey * 7 + 11) % 100 = 2 THEN
                       substr(c_name, 1, length(c_name) - 1)
                       || substr('{NAME_UNI}',
                                 1 + CAST(hash(c_custkey) % 4 AS INT), 1)
                     ELSE c_name
                   END""",
            )
        ],
        # free-form unicode: appended suite (~2%) or full-CJK text
        # (~1% — exercises the language-ID CJK path on real CJK)
        "documents": [
            (
                "text",
                f"""CASE
                     WHEN hash(doc_id * 7 + 11) % 50 = 0 THEN
                       text || '{TEXT_SUITE}'
                     WHEN hash(doc_id * 7 + 11) % 100 = 2 THEN
                       '{CJK_SENTENCE}'
                     ELSE text
                   END""",
            )
        ],
        # unicode inside JSON string values (~2%)
        "events": [
            (
                "props",
                """CASE
                     WHEN hash(event_id * 7 + 11) % 50 = 0 THEN
                       '{"k": ' || CAST(hash(event_id) % 100 AS INT)
                       || ', "note": "café 中文"}'
                     ELSE props
                   END""",
            )
        ],
    }
    for t in tables:
        if t not in plans:
            shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
            continue
        exprs = dict(plans[t])
        desc = con.sql(f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()
        sel = [
            f"{exprs[c]} AS {c}" if c in exprs else c for (c, *_r) in desc
        ]
        con.execute(
            f"COPY (SELECT {', '.join(sel)} FROM '{src}/{t}.parquet') "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        col = next(iter(exprs))
        n = con.sql(
            f"SELECT count(*) FROM '{dst}/{t}.parquet' "
            f"WHERE octet_length(encode({col})) > length({col})"
        ).fetchone()[0]
        print(f"{t}: {n} rows now carry non-ASCII {col}")
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
