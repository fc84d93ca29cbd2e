"""Generate the sf1 differential corpus (~6M lineitem rows) — VERDICT r8
ask #3: "the honest next decade" above sf0.1, organic data rather than
the adversarial 8× self-replica (which duplicates content and so
inflates every near-dup pair relation ~64×).

The driver's generator is not available, so this reproduces sf0.1's
MEASURED marginals at 10× (schema-identical parquet, same physical
types). The Spark-vs-DuckDB differential is self-contained — both
engines read the same files — so generator parity with the driver
matters only through the distributions the data-dependent flag queries
see. Measured targets (sf0.1 → sf1):

- customer 15k→150k, supplier 1k→10k, part 20k→200k, orders
  150k→1.5M, lineitem 600k→6M, events 100k→1M (users 1.5k→15k,
  linear in sf), documents 5k→50k, embeddings 2k→8k (the observed
  sublinear 4×/decade law), region/nation copied (fixed dims).
- money on the exact 2-decimal grid (randint/100 — the registry's
  grid-sum discipline requires it); discounts 0.00–0.10 and tax
  0.00–0.08 in 1% steps; quantities integers 1–50 as double.
- per-order line count: the 17-bucket empirical CDF measured at sf0.1
  (mean ≈ 4); l_shipdate independent of o_orderdate (measured: the
  source generator draws them independently — diffs span ±2400 days).
- events.value ~ Exp(mean 50) rounded to cents (measured p50 34.8 ≈
  50·ln2, p99 228 ≈ 50·ln100, max 560 ≈ 50·ln1e5); ts uniform over
  Jan 2024; props = '{"k": <0..99>}'.
- documents: 10–100 uniform words from the exact 31-word vocab,
  lang 40% en / 15% each other, source = src(doc_id % 20),
  ~0.16% exact-dup injection (text seed collapsed onto doc_id % 50),
  plus ~0.6% MUTATED near-duplicates (VERDICT r10 ask #2: token-level
  substitutions of a base doc's text targeting distinct-3-shingle
  jaccard ≈ 0.75–0.92, seeded child streams, engine-independent) so
  the post-exact-collapse pair relation is NON-EMPTY at sf1 and
  minhash/prefix/containment do real recall work — the r10 sweep's
  `near_dedup_layered` row was vacuously green (exact copies only).
- embeddings: unit-normalized 64-dim standard gaussians (measured:
  ||v|| = 1.0 ± 3e-8, component std 1/8), label = geometry-independent
  uniform 0–9 (measured same-label vs diff-label cosine both ≈ 0).

Deterministic: one numpy PCG64(seed=42) stream in a fixed generation
order. Usage:

    python tools/make_sf1_testdata.py [/tmp/spark_graft_sf1] [mult]
    SF_DIR=/tmp/spark_graft_sf1 python tools/check_oracle.py --jobs 8

`mult` (default 1) scales every row count linearly above sf1 —
`mult=10` is the sf10 decade (VERDICT r11 ask #1: each decade so far
caught defects the gate scale cannot see) — EXCEPT embeddings, which
follow the observed sublinear 4x/decade law (8k·mult^log10(4)), and
the fixed dims region/nation. mult=1 reproduces sf1 byte-for-byte
(same single main-stream draw order). Date/time spans stay FIXED at
every mult (denser days — the realistic scale-up shape: history
doesn't stretch because volume grew), so grid-shaped queries
(time_grid_*) scale in keys, not span."""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
SEED = 42

N_CUST, N_SUPP, N_PART = 150_000, 10_000, 200_000
N_ORDERS, N_EVENTS, N_USERS = 1_500_000, 1_000_000, 15_000
N_DOCS, N_EMB = 50_000, 8_000

# measured sf0.1 per-order line-count histogram (1..17 lines)
LINES_PMF = np.array(
    [11016, 21814, 29500, 29097, 23631, 15625, 8941, 4407, 1959, 818,
     292, 93, 29, 10, 1, 2, 1],
    dtype=float,
)
LINES_PMF /= LINES_PMF.sum()

VOCAB = (
    "a agg batch big column customer data dup fast filter group hash "
    "join key line merge order part query row scan slow small sort "
    "spark stream table the value vector window"
).split()
MKTSEG = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PNAMES = [
    f"{a} {b}"
    for a in "blue cold hot large new old red small".split()
    for b in "anvil bolt gear gizmo plate ring rod widget".split()
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]
ETYPES = ["click", "error", "purchase", "signup", "view"]


def money(rng, n, lo_cents, hi_cents):
    """Exact 2-decimal-grid doubles in [lo, hi) — integer cents / 100."""
    return rng.integers(lo_cents, hi_cents, n) / 100.0


def days_uniform(rng, n, start, end):
    """Uniform timestamps (midnight) between two dates, as datetime64[us]."""
    span = (np.datetime64(end) - np.datetime64(start)).astype(int) + 1
    d = rng.integers(0, span, n)
    return np.datetime64(start) + d.astype("timedelta64[D]")


def write(df: pd.DataFrame, schema: pa.Schema, path: str) -> None:
    pq.write_table(
        pa.Table.from_pandas(df, schema=schema, preserve_index=False), path
    )


def main() -> None:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    # rebind the module-level counts at `mult`x (mult=1 keeps sf1
    # byte-identical: same values, same draw order)
    global N_CUST, N_SUPP, N_PART, N_ORDERS, N_EVENTS, N_USERS
    global N_DOCS, N_EMB
    N_CUST, N_SUPP, N_PART = N_CUST * mult, N_SUPP * mult, N_PART * mult
    N_ORDERS, N_EVENTS = N_ORDERS * mult, N_EVENTS * mult
    N_USERS, N_DOCS = N_USERS * mult, N_DOCS * mult
    # embeddings: sublinear 4x/decade (8k at sf1 → 32k at sf10)
    N_EMB = int(round(N_EMB * 4 ** np.log10(mult)))
    os.makedirs(dst, exist_ok=True)
    rng = np.random.default_rng(SEED)

    for t in ("region", "nation"):
        shutil.copy(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")

    # customer ------------------------------------------------------------
    ck = np.arange(N_CUST, dtype=np.int64)
    write(
        pd.DataFrame(
            {
                "c_custkey": ck,
                "c_name": [f"Customer#{i:09d}" for i in ck],
                "c_nationkey": rng.integers(0, 25, N_CUST).astype(np.int32),
                "c_acctbal": money(rng, N_CUST, -100_000, 1_000_000),
                "c_mktsegment": np.array(MKTSEG)[
                    rng.integers(0, 5, N_CUST)
                ],
            }
        ),
        pa.schema(
            [
                ("c_custkey", pa.int64()),
                ("c_name", pa.string()),
                ("c_nationkey", pa.int32()),
                ("c_acctbal", pa.float64()),
                ("c_mktsegment", pa.string()),
            ]
        ),
        f"{dst}/customer.parquet",
    )

    # supplier ------------------------------------------------------------
    sk = np.arange(N_SUPP, dtype=np.int64)
    write(
        pd.DataFrame(
            {
                "s_suppkey": sk,
                "s_name": [f"Supplier#{i:09d}" for i in sk],
                "s_nationkey": rng.integers(0, 25, N_SUPP).astype(np.int32),
                "s_acctbal": money(rng, N_SUPP, -100_000, 1_000_000),
            }
        ),
        pa.schema(
            [
                ("s_suppkey", pa.int64()),
                ("s_name", pa.string()),
                ("s_nationkey", pa.int32()),
                ("s_acctbal", pa.float64()),
            ]
        ),
        f"{dst}/supplier.parquet",
    )

    # part ----------------------------------------------------------------
    pk = np.arange(N_PART, dtype=np.int64)
    write(
        pd.DataFrame(
            {
                "p_partkey": pk,
                "p_name": np.array(PNAMES)[rng.integers(0, 64, N_PART)],
                "p_brand": np.array(
                    [f"Brand#{i}" for i in range(1, 26)]
                )[rng.integers(0, 25, N_PART)],
                "p_type": np.array(PTYPES)[rng.integers(0, 6, N_PART)],
                "p_size": rng.integers(1, 51, N_PART).astype(np.int32),
                "p_retailprice": 900.0 + (pk % 1000) / 10.0,
            }
        ),
        pa.schema(
            [
                ("p_partkey", pa.int64()),
                ("p_name", pa.string()),
                ("p_brand", pa.string()),
                ("p_type", pa.string()),
                ("p_size", pa.int32()),
                ("p_retailprice", pa.float64()),
            ]
        ),
        f"{dst}/part.parquet",
    )

    # orders --------------------------------------------------------------
    ok = np.arange(N_ORDERS, dtype=np.int64)
    write(
        pd.DataFrame(
            {
                "o_orderkey": ok,
                "o_custkey": rng.integers(0, N_CUST, N_ORDERS),
                "o_orderstatus": np.array(["F", "O", "P"])[
                    rng.integers(0, 3, N_ORDERS)
                ],
                "o_totalprice": money(rng, N_ORDERS, 100_000, 50_000_000),
                "o_orderdate": days_uniform(
                    rng, N_ORDERS, "1995-01-01", "2001-08-01"
                ),
                "o_orderpriority": np.array(PRIO)[
                    rng.integers(0, 5, N_ORDERS)
                ],
            }
        ),
        pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_orderstatus", pa.string()),
                ("o_totalprice", pa.float64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_orderpriority", pa.string()),
            ]
        ),
        f"{dst}/orders.parquet",
    )

    # lineitem ------------------------------------------------------------
    n_lines = rng.choice(np.arange(1, 18), size=N_ORDERS, p=LINES_PMF)
    lk = np.repeat(ok, n_lines)
    n_li = len(lk)
    linenum = (
        np.arange(n_li) - np.repeat(np.cumsum(n_lines) - n_lines, n_lines) + 1
    ).astype(np.int32)
    write(
        pd.DataFrame(
            {
                "l_orderkey": lk,
                "l_partkey": rng.integers(0, N_PART, n_li),
                "l_suppkey": rng.integers(0, N_SUPP, n_li),
                "l_linenumber": linenum,
                "l_quantity": rng.integers(1, 51, n_li).astype(float),
                "l_extendedprice": money(rng, n_li, 90_000, 10_500_000),
                "l_discount": rng.integers(0, 11, n_li) / 100.0,
                "l_tax": rng.integers(0, 9, n_li) / 100.0,
                "l_returnflag": np.array(["A", "N", "R"])[
                    rng.integers(0, 3, n_li)
                ],
                "l_linestatus": np.array(["F", "O"])[
                    rng.integers(0, 2, n_li)
                ],
                "l_shipdate": days_uniform(
                    rng, n_li, "1995-01-02", "2001-11-04"
                ),
            }
        ),
        pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_partkey", pa.int64()),
                ("l_suppkey", pa.int64()),
                ("l_linenumber", pa.int32()),
                ("l_quantity", pa.float64()),
                ("l_extendedprice", pa.float64()),
                ("l_discount", pa.float64()),
                ("l_tax", pa.float64()),
                ("l_returnflag", pa.string()),
                ("l_linestatus", pa.string()),
                ("l_shipdate", pa.timestamp("us")),
            ]
        ),
        f"{dst}/lineitem.parquet",
    )

    # events ----------------------------------------------------------------
    span_us = int((np.datetime64("2024-01-31") - np.datetime64("2024-01-01"))
                  / np.timedelta64(1, "us"))
    ts = np.datetime64("2024-01-01") + rng.integers(
        0, span_us, N_EVENTS
    ).astype("timedelta64[us]")
    write(
        pd.DataFrame(
            {
                "event_id": np.arange(N_EVENTS, dtype=np.int64),
                "ts": ts,
                "user_id": rng.integers(0, N_USERS, N_EVENTS),
                "event_type": np.array(ETYPES)[
                    rng.integers(0, 5, N_EVENTS)
                ],
                "value": np.round(
                    rng.exponential(50.0, N_EVENTS), 2
                ),
                "props": [
                    '{"k": %d}' % k
                    for k in rng.integers(0, 100, N_EVENTS)
                ],
            }
        ),
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        ),
        f"{dst}/events.parquet",
    )

    # documents --------------------------------------------------------------
    # per-doc word seed; ~1/600 docs collapse onto one of the first 50
    # texts (the measured ~0.16% exact-dup rate)
    seeds = np.arange(N_DOCS, dtype=np.int64)
    dup_mask = rng.random(N_DOCS) < (1 / 600)
    seeds[dup_mask] = seeds[dup_mask] % 50
    # NOTE: word counts come from each seed's child stream inside
    # text_of(); the main stream draws NOTHING for documents beyond
    # seeds/dup_mask/lang. (A dead n_words draw removed in r10 — ADVICE
    # r9 — shifts the main-RNG stream, so lang/events differ from any
    # pre-r10 sf1 regeneration byte-for-byte; regenerate, don't mix.)
    # deterministic per-seed text: an rng child stream per seed value
    texts: dict[int, str] = {}

    def text_of(seed: int) -> str:
        if seed not in texts:
            r = np.random.default_rng(SEED * 1_000_003 + seed)
            k = int(r.integers(10, 101))
            texts[seed] = " ".join(
                np.array(VOCAB)[r.integers(0, len(VOCAB), k)]
            )
        return texts[seed]

    # organic near-duplicates (VERDICT r10 ask #2): ~0.6% of docs get a
    # MUTATED copy of a guaranteed-present base text (bases 0..49 are
    # their own docs' seeds and are excluded from mutation), built by
    # m token substitutions sized for a target distinct-3-shingle
    # jaccard drawn uniform in [0.75, 0.92]: an isolated substitution
    # removes ≤3 shingles and adds ≤3, so j ≈ (s-3m)/(s+3m) with
    # s = w-2 distinct shingles → m = round(s(1-j)/(3(1+j))). Short
    # docs land below the 0.8 threshold — deliberate sub-threshold
    # mass, so recall filters have something to reject. NOTE: this adds
    # one main-stream draw, so lang/embeddings differ byte-for-byte
    # from any pre-r11 sf1 — regenerate, don't mix (established rule).
    near_mask = (~dup_mask) & (rng.random(N_DOCS) < (1 / 166))
    near_mask[:200] = False

    def mutated_text(base_seed: int, doc_id: int) -> str:
        r = np.random.default_rng(SEED * 2_000_003 + doc_id)
        toks = text_of(base_seed).split()
        w = len(toks)
        j_target = r.uniform(0.75, 0.92)
        m = max(
            1, int(round((w - 2) * (1 - j_target) / (3 * (1 + j_target))))
        )
        for p in r.choice(w, size=min(m, w), replace=False):
            cur = toks[p]
            alt = cur
            while alt == cur:
                alt = VOCAB[int(r.integers(0, len(VOCAB)))]
            toks[p] = alt
        return " ".join(toks)

    doc_text = [
        mutated_text(i % 50, i) if near_mask[i] else text_of(int(s))
        for i, s in enumerate(seeds)
    ]
    write(
        pd.DataFrame(
            {
                "doc_id": np.arange(N_DOCS, dtype=np.int64),
                "text": doc_text,
                "lang": np.array(LANGS)[
                    rng.choice(5, N_DOCS, p=LANG_P)
                ],
                "source": [f"src{i % 20}" for i in range(N_DOCS)],
                "n_chars": np.array(
                    [len(t) for t in doc_text], dtype=np.int64
                ),
            }
        ),
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text", pa.string()),
                ("lang", pa.string()),
                ("source", pa.string()),
                ("n_chars", pa.int64()),
            ]
        ),
        f"{dst}/documents.parquet",
    )

    # embeddings ---------------------------------------------------------
    g = rng.standard_normal((N_EMB, 64))
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    write(
        pd.DataFrame(
            {
                "vec_id": np.arange(N_EMB, dtype=np.int64),
                "embedding": list(g.astype(np.float32)),
                "label": rng.integers(0, 10, N_EMB).astype(np.int32),
            }
        ),
        pa.schema(
            [
                ("vec_id", pa.int64()),
                ("embedding", pa.list_(pa.float32())),
                ("label", pa.int32()),
            ]
        ),
        f"{dst}/embeddings.parquet",
    )

    print(f"wrote {dst}: lineitem {n_li} rows")


if __name__ == "__main__":
    main()
