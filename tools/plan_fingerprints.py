"""Per-query physical-plan fingerprints — the mechanical "did this
query's behavior change since the round base?" signal behind
tests/test_entry.py::test_changed_plans_enter_the_window.

Why plans, not source bytes: the r15 rotation miss (VERDICT r15 #1)
happened because the window head was frozen by commit, then late
optimization batches changed 18 queries' OPERATORS — no per-query
source diff exists at function granularity (a query's behavior lives in
its operators too), while file granularity (queries/relational.py holds
~60 queries) would flag far more queries than a 50-slot window holds.
The normalized `explain("formatted")` string is exactly the right
granularity: it changes when (and only when) the query's physical
behavior changes — through its own bytes OR any operator it calls —
and is invariant to docstring/comment edits.

Normalization strips the environment-dependent tokens so fingerprints
compare across sessions and boxes: expression ids (#123), plan ids,
file locations, and the session's shuffle-partition count inside
partitioning specs.

Usage:
  python tools/plan_fingerprints.py OUT.json   # fingerprint HEAD's code

To snapshot the ROUND BASE (the last driver-verified commit), run this
script from a clean checkout of that commit but write into the live
repo, e.g.:
  git clone -q /root/repo /tmp/base && git -C /tmp/base checkout -q <sha>
  cd /tmp/base && python tools/plan_fingerprints.py \
      /root/repo/plans/fingerprints_base.json --meta-commit <sha>
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
SHUFFLE_PARTITIONS = 4  # mirror tests/conftest.py's session


def _split_top(s: str) -> list[str]:
    """Split on commas at bracket/paren depth 0."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "[(":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur).strip())
    return parts


def _sort_brackets(s: str) -> str:
    """Recursively sort the elements of every [...] list.

    Catalyst's distinct-aggregate rewrite (Expand) orders its projection
    groups by expression hash, which varies with the session's exprId
    history — the SET of elements is stable, the order is not. Sorting
    bracket lists makes the fingerprint order-insensitive; the trade is
    that a pure reorder of a list (e.g. output column order) is not
    flagged — acceptable because schema-order changes are caught by the
    oracle's schema check, while order-only Expand variance would
    otherwise make every multi-distinct query a false positive."""
    out: list[str] = []
    i = 0
    while i < len(s):
        if s[i] == "[":
            depth, j = 1, i + 1
            while j < len(s) and depth:
                if s[j] == "[":
                    depth += 1
                elif s[j] == "]":
                    depth -= 1
                j += 1
            if depth:  # unbalanced — leave untouched
                out.append(s[i:])
                break
            inner = _sort_brackets(s[i + 1 : j - 1])
            # bare-integer elements are Expand gid literals whose values
            # depend on the (session-varying) group order — mask them
            parts = [
                "_INT" if p.isdigit() else p for p in _split_top(inner)
            ]
            out.append("[" + ", ".join(sorted(parts)) + "]")
            i = j
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


def normalize_plan(plan: str, n_shuffle: int = SHUFFLE_PARTITIONS) -> str:
    """Strip session/environment-dependent tokens from a formatted plan."""
    s = re.sub(r"#\d+", "#", plan)  # expression ids
    s = re.sub(r"\b(lambda \w+?)_\d+", r"\1_", s)  # HOF lambda counters
    s = re.sub(r"plan_id=\d+", "plan_id=", s)
    s = re.sub(r"\[id=[^\]]*\]", "[id=]", s)
    s = re.sub(r"RDD\[\d+\]", "RDD[]", s)  # createDataFrame RDD ids
    # RDD callsites ("at localCheckpoint at NativeMethodAccessorImpl
    # .java:0" vs "at <unknown>:0") vary with JVM reflection inlining
    s = re.sub(r" at [^,\s]+:\d+", " at :", s)
    s = re.sub(r"file:[^\]\s,]+", "file:", s)  # scan locations
    # shuffle-partition counts inside partitioning specs: the trailing
    # ", N)" where N is the session's shuffle.partitions value
    s = re.sub(rf", {n_shuffle}\)", ", _NSHUF)", s)
    # Expand gid literals: the distinct-group numbering varies with the
    # session's exprId history (Catalyst orders the groups by expression
    # hash), so gid comparisons and the gid column of each Expand row
    # are masked (rows themselves are sorted below)
    s = re.sub(r"gid# = \d+", "gid# = _", s)
    # hashpartitioning key order follows the same Expand group order —
    # sort the argument list (distribution guarantee is order-free)
    def _sort_hp(m: re.Match) -> str:
        return "hashpartitioning(" + ", ".join(
            sorted(_split_top(m.group(1)))
        ) + ")"

    s = re.sub(
        r"hashpartitioning\("
        r"((?:[^()]|\((?:[^()]|\((?:[^()]|\([^()]*\))*\))*\))*)\)",
        _sort_hp,
        s,
    )
    # bracket lists sorted line-by-line (Expand group order varies with
    # session exprId history — see _sort_brackets)
    s = "\n".join(_sort_brackets(line) for line in s.splitlines())
    return s


def fingerprint(plan: str, n_shuffle: int = SHUFFLE_PARTITIONS) -> str:
    return hashlib.sha256(
        normalize_plan(plan, n_shuffle).encode()
    ).hexdigest()[:16]


def compute_all(spark=None, sf_dir: str = SF_DIR) -> dict[str, str]:
    from core_telecoms_etl_spark import get_spark
    from core_telecoms_etl_spark.queries import queries

    if spark is None:
        spark = get_spark(
            "plan-fingerprints", shuffle_partitions=SHUFFLE_PARTITIONS
        )
    from core_telecoms_etl_spark.caching import release_caches

    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    out: dict[str, str] = {}
    for name, fn in queries().items():
        # rebuild cache_scoped pins fresh per query: a pin materialized
        # by an earlier query (or an earlier test in the session) is
        # returned by SAME-PLAN REUSE and explains as its AQE-FINAL
        # plan (AQEShuffleRead, resolved reuse) — session-history-
        # dependent text that would make fingerprints order-sensitive
        release_caches()
        spark.catalog.clearCache()
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        out[name] = fingerprint(plan, n_shuffle)
    return out


def main() -> None:
    args = sys.argv[1:]
    out_path = args[0] if args else "plans/fingerprints_base.json"
    commit = ""
    if "--meta-commit" in args:
        commit = args[args.index("--meta-commit") + 1]
    fps = compute_all()
    payload = {
        "_meta": {
            "commit": commit,
            "sf_dir": SF_DIR,
            "shuffle_partitions": SHUFFLE_PARTITIONS,
            "note": (
                "normalized-plan sha256[:16] per query at the ROUND BASE "
                "commit; tests/test_entry.py compares live plans against "
                "this snapshot and requires every changed query inside "
                "the 50-slot correctness window head"
            ),
        },
        "fingerprints": fps,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {out_path} ({len(fps)} fingerprints)")


if __name__ == "__main__":
    main()
