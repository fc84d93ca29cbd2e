"""Dump `explain("formatted")` for named queries to plans/<tag>/<name>_<suffix>.txt.

Usage: python tools/dump_one_plan.py TAG SUFFIX NAME [NAME...]
  e.g. python tools/dump_one_plan.py r15 before training_pipeline bigram_surprisal
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)

    from core_telecoms_etl_spark import get_spark
    from core_telecoms_etl_spark import queries as qmod

    spark = get_spark("dump-one-plan")
    qs = qmod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print("wrote", path)


if __name__ == "__main__":
    main()
