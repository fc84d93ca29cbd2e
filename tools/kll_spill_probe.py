"""Record kll_sliding_quantile's verification-band spill posture on the
one-hot-day skew corpus (VERDICT r15 #6 / ADVICE r15 #2).

The r15 rewrite funnels each day's raw values through the declared
single-partition sketch window as one collect_list array per day, with
a 7-day flatten (×7 duplication) per output row. This probe runs the
query on (a) the organic corpus and (b) the skew corpus (one day
holding ~20 % of events — tools/make_skew_testdata.py), with the Spark
UI status store enabled, and reports per-stage spill + peak execution
memory so the band's memory bound is a recorded number, not prose.

Usage:
  python tools/make_skew_testdata.py /root/testdata/sf0.1 /tmp/skew_sf0.1
  python tools/kll_spill_probe.py /root/testdata/sf0.1 /tmp/skew_sf0.1
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stage_metrics(ui_port: int) -> list[dict]:
    base = f"http://127.0.0.1:{ui_port}/api/v1"
    apps = json.load(urllib.request.urlopen(f"{base}/applications"))
    app_id = apps[0]["id"]
    return json.load(
        urllib.request.urlopen(f"{base}/applications/{app_id}/stages")
    )


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]

    from core_telecoms_etl_spark import get_spark
    from core_telecoms_etl_spark import queries as qmod

    spark = get_spark(
        "kll-spill-probe",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4049",
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    fn = qmod.queries()["kll_sliding_quantile"]
    for sf_dir in dirs:
        spark.catalog.clearCache()
        seen = {s["stageId"] for s in stage_metrics(4049)}
        df = fn(spark, sf_dir)
        spark.sparkContext.setJobDescription(f"kll_spill:{sf_dir}")
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        wall = time.time() - t0
        stages = [
            s for s in stage_metrics(4049) if s["stageId"] not in seen
        ]
        tot_mem_spill = sum(s.get("memoryBytesSpilled", 0) for s in stages)
        tot_disk_spill = sum(s.get("diskBytesSpilled", 0) for s in stages)
        peak = max(
            (s.get("peakExecutionMemory", 0) for s in stages), default=0
        )
        print(
            f"{sf_dir}: wall={wall:.2f}s mem_spill={tot_mem_spill/1e6:.1f}MB "
            f"disk_spill={tot_disk_spill/1e6:.1f}MB "
            f"peak_exec_mem={peak/1e6:.1f}MB stages={len(stages)}"
        )


if __name__ == "__main__":
    main()
