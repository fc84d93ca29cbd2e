"""Decade-scale state evidence for the streaming family (VERDICT r12
ask #4): the 100-TB claim for a stream operator is about STATE, not
wall time — a dedup whose state grows with stream lifetime OOMs no
matter how fast each batch runs. This probe drives the two state-
bearing stream shapes over the full events table in TIME-ORDERED
micro-batches and records, per batch: input rows, state-store rows,
state memory, and the peak JVM heap of the whole run.

  - stream_dedup shape: double-delivered source (union of two file
    streams — the replayed-offset shape of queries/events.stream_dedup
    and streaming/events.run_stream_dedup), 1 h watermark,
    dropDuplicatesWithinWatermark(event_id), noop sink. The design
    claim under test: state is O(events per watermark horizon)
    (~14k rows at sf10's 10M-events/30-days density), NOT O(rows
    seen) (20M delivered rows).
  - stream_cms shape: per-batch count-min build + merge
    (streaming/events.run_stream_cms) — state is the fixed
    depth×width counter table regardless of key cardinality or
    stream length.

Staging: the single harness events file is split into `--slices`
TIME-RANGE slices (ntile over ts) via the write-once fingerprint-keyed
protocol (`caching.build_once`), with ascending mtimes so the file
stream source replays them in event-time order — the realistic
arrival shape, and the one where the watermark actually advances
between batches and eviction is observable.

Usage:
  SF_DIR=/tmp/spark_graft_sf10 python tools/stream_state_probe.py
  MODE=churn    — r14: stateful TTL eviction + cap exactness on the
                  sliding-active-set corpus
  MODE=interval — r15: the stream-stream interval join's state
                  plateau vs event-time range width on the churn
                  corpus, the lifetime march under a missing
                  watermark, and StateBoundGuard replay parity;
                  plus the windowed-append in-flight window plateau
Prints one JSON line per probe.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stage_time_slices(spark, events_path: str, n_slices: int) -> str:
    """Write-once staging of the events table into n time-range slice
    files with ascending modification times (the file-stream source
    orders candidate files by mtime, so batches replay in event-time
    order)."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from core_telecoms_etl_spark.caching import build_once, path_fingerprint

    fp = path_fingerprint(events_path)

    def _build(stage: str) -> None:
        part_root = f"{stage}__parts"
        df = spark.read.parquet(events_path)
        # percentile boundaries on the raw ts column: one narrow pass;
        # ntile-via-boundaries avoids a global sort of the full table
        bounds = df.select(
            F.percentile_approx(
                "ts",
                [i / n_slices for i in range(1, n_slices)],
                10_000,
            ).alias("b")
        ).collect()[0]["b"]
        # slice id = #boundaries below ts, as ONE flat HOF expression:
        # the chained `+ (ts > b).cast(int)` form nests n_slices-1
        # Add nodes and blows the Catalyst stack past ~700 slices
        # (StackOverflowError, hit live by the r15 720-slice staging)
        slice_col = F.size(
            F.filter(
                F.array(*[F.lit(b) for b in bounds]),
                lambda b: F.col("ts") > b,
            )
        )
        (
            df.withColumn("__slice", slice_col)
            .repartition(n_slices, "__slice")
            .write.partitionBy("__slice")
            .mode("overwrite")
            .parquet(part_root)
        )
        os.makedirs(stage, exist_ok=True)
        now = time.time()
        for i in range(n_slices):
            for j, f in enumerate(
                sorted(glob.glob(f"{part_root}/__slice={i}/part-*.parquet"))
            ):
                dst = f"{stage}/slice{i:03d}_{j}.parquet"
                shutil.move(f, dst)
                os.utime(dst, (now + i, now + i))  # mtime = replay order
        shutil.rmtree(part_root)

    return build_once(f"ctes_tslices_{n_slices}_{fp}", _build)


class HeapSampler:
    """Background peak-JVM-heap sampler (driver+executors share one JVM
    on local[n])."""

    def __init__(self, spark, period: float = 0.25):
        self._rt = spark._jvm.java.lang.Runtime.getRuntime()
        self._period = period
        self.peak = 0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        while not self._stop.is_set():
            used = self._rt.totalMemory() - self._rt.freeMemory()
            self.peak = max(self.peak, used)
            time.sleep(self._period)

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._t.join()


def _progress_rows(q) -> list[dict]:
    out = []
    for p in q.recentProgress:
        so = (p.get("stateOperators") or [{}])[0]
        out.append(
            {
                "batch": p.get("batchId"),
                "input_rows": p.get("numInputRows"),
                "state_rows": so.get("numRowsTotal"),
                "state_mb": round(
                    (so.get("memoryUsedBytes") or 0) / 1e6, 1
                ),
            }
        )
    return [r for r in out if r["input_rows"]]


def probe_dedup(spark, stage_dir: str, schema) -> dict:
    from pyspark.sql import functions as F  # noqa: F401

    from core_telecoms_etl_spark.sources.readers import normalize_timestamps

    def _src():
        s = (
            spark.readStream.format("parquet")
            .schema(schema)
            .option("maxFilesPerTrigger", "1")
            .load(stage_dir)
        )
        return normalize_timestamps(s, nanos_bigint_cols=("ts",))

    deduped = (
        _src()
        .unionByName(_src())
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type", "value")
    )
    t0 = time.time()
    with HeapSampler(spark) as hs:
        q = (
            deduped.writeStream.outputMode("append")
            .format("noop")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
            rows = _progress_rows(q)
        finally:
            q.stop()
    return {
        "probe": "stream_dedup",
        "elapsed_sec": round(time.time() - t0, 1),
        "batches": rows,
        "peak_state_rows": max((r["state_rows"] or 0) for r in rows),
        "total_input_rows": sum(r["input_rows"] for r in rows),
        "peak_jvm_heap_gb": round(hs.peak / 1e9, 2),
    }


def probe_cms(spark, events_path: str) -> dict:
    from core_telecoms_etl_spark.operators import sketches as sk
    from core_telecoms_etl_spark.streaming.events import staged_key_slices

    stage = staged_key_slices(
        spark, events_path, key_col="user_id", n_slices=8
    )
    state: dict = {"counters": None}

    def on_batch(batch, batch_id):
        c = sk.cms_build(batch, "user_id", depth=4, width=1024)
        if state["counters"] is not None:
            c = sk.cms_merge(state["counters"], c)
        s = batch.sparkSession
        state["counters"] = s.createDataFrame(c.collect(), c.schema)

    stream = (
        spark.readStream.schema("user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
    )
    t0 = time.time()
    with HeapSampler(spark) as hs:
        q = (
            stream.writeStream.foreachBatch(on_batch)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
            rows = _progress_rows(q)
        finally:
            q.stop()
    n_state = state["counters"].count()
    return {
        "probe": "stream_cms_heavy_hitters",
        "elapsed_sec": round(time.time() - t0, 1),
        "batches": rows,
        "state_rows_fixed": n_state,  # depth*width, key-count-free
        "total_input_rows": sum(r["input_rows"] for r in rows),
        "peak_jvm_heap_gb": round(hs.peak / 1e9, 2),
    }


def probe_stateful(spark, stage_dir: str, schema, ttl_ms) -> dict:
    """Per-user running totals over the time-sliced replay — state is
    O(distinct users). With `ttl_ms` the r13 idle-key TTL evicts users
    idle past the horizon; the per-batch numRowsTotal readings show the
    bound in action (and its absence with ttl_ms=None). Stopped by
    observation: a processing-time-timeout stream never self-terminates."""
    import time as _t

    from core_telecoms_etl_spark.sources.readers import normalize_timestamps
    from core_telecoms_etl_spark.streaming.events import (
        stateful_user_totals,
    )

    src = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .load(stage_dir)
    )
    out = stateful_user_totals(
        normalize_timestamps(src, nanos_bigint_cols=("ts",)),
        idle_timeout_ms=ttl_ms,
    )
    t0 = time.time()
    with HeapSampler(spark) as hs:
        q = (
            out.writeStream.outputMode("update")
            .format("noop")
            .trigger(availableNow=True)
            .start()
        )
        try:
            if ttl_ms is None:
                q.awaitTermination()
            else:
                # drain data batches, then allow eviction batches to run
                deadline = _t.time() + 120
                while _t.time() < deadline and q.isActive:
                    p = q.lastProgress
                    so = (p.get("stateOperators") or [{}])[0] if p else {}
                    if p and not q.status["isDataAvailable"] and (
                        so.get("numRowsTotal") == 0
                    ):
                        break
                    _t.sleep(2)
            # keep ZERO-INPUT cleanup batches: with a TTL, evictions
            # happen there — the state drop is the measurement
            raw = list(q.recentProgress)
            rows = []
            for p in raw:
                so = (p.get("stateOperators") or [{}])[0]
                rows.append(
                    {
                        "batch": p.get("batchId"),
                        "input_rows": p.get("numInputRows"),
                        "state_rows": so.get("numRowsTotal"),
                        "removed": so.get("numRowsRemoved"),
                    }
                )
        finally:
            q.stop()
    return {
        "probe": f"stream_stateful(ttl={ttl_ms})",
        "elapsed_sec": round(time.time() - t0, 1),
        "batches": rows,
        "raw_progress": raw,
        "peak_state_rows": max((r["state_rows"] or 0) for r in rows),
        "final_state_rows": rows[-1]["state_rows"] if rows else None,
        "total_input_rows": sum(r["input_rows"] or 0 for r in rows),
        "peak_jvm_heap_gb": round(hs.peak / 1e9, 2),
    }


def stage_churn_corpus(
    spark, events_path: str, actives_per_day: int = 5_000
) -> str:
    """Derive a CHURN corpus from the events table: user ids are
    remapped to day·100000 + (user_id % actives_per_day), so each
    calendar day has `actives_per_day` active users and the active set
    SLIDES — lifetime distinct users = days × actives_per_day, but only
    one day's worth is ever live. The harness corpus keeps every user
    active for the whole stream, which makes TTL eviction a no-op
    (r13's probe measured the TTL machinery, not a bounded steady
    state); this is the arrival shape where idle_timeout_ms does real
    work. Write-once, fingerprint-keyed."""
    from pyspark.sql import functions as F

    from core_telecoms_etl_spark.caching import build_once, path_fingerprint
    from core_telecoms_etl_spark.sources.readers import normalize_timestamps

    fp = path_fingerprint(events_path)

    def _build(stage: str) -> None:
        df = normalize_timestamps(
            spark.read.parquet(events_path), nanos_bigint_cols=("ts",)
        )
        t_min = df.agg(F.min("ts")).collect()[0][0]  # 1-row scalar
        day = F.datediff(F.col("ts"), F.lit(t_min))
        # stride = actives_per_day: day d owns ids [d·A, (d+1)·A) —
        # collision-free for ANY actives_per_day (a fixed 100k stride
        # would silently alias users across days above it and fake the
        # sliding-set property this corpus exists to provide)
        churned = df.withColumn(
            "user_id",
            (
                day * actives_per_day + F.col("user_id") % actives_per_day
            ).cast("long"),
        )
        churned.repartition(8).write.mode("overwrite").parquet(stage)

    # "churn2": the remap formula is part of the corpus identity — a
    # formula change must not reuse a dir built under the old one
    return build_once(f"ctes_churn2_{actives_per_day}_{fp}", _build)


def probe_stateful_churn(spark, stage_dir: str, schema) -> dict:
    """The r14 decade ask: drive the stateful operator over the CHURN
    corpus (sliding active set) with a 1 ms processing-time TTL, so
    eviction does real work between micro-batches, and verify

    1. BOUNDED STEADY STATE: peak state rows track the per-batch
       active set (≈ slice-days × actives/day), far below the lifetime
       distinct-user count that the no-TTL arm saturates at;
    2. CAP EXACTNESS: `first_state_bound_violation` (the
       run_stream_stateful max_state_rows guard) trips at exactly the
       first batch whose recorded numRowsTotal exceeds the cap, and a
       cap at the measured peak does not trip."""
    from core_telecoms_etl_spark.streaming.events import (
        first_state_bound_violation,
    )

    ttl = probe_stateful(spark, stage_dir, schema, 1)
    no_ttl = probe_stateful(spark, stage_dir, schema, None)
    lifetime = no_ttl["peak_state_rows"]
    peak = ttl["peak_state_rows"]

    class _Replay:
        """Minimal recentProgress carrier: feeds the recorded sf10
        progress dicts through the REAL runner guard."""

        def __init__(self, progresses):
            self.recentProgress = progresses

    raw = no_ttl.pop("raw_progress")
    ttl.pop("raw_progress", None)
    trace = [
        (r["batch"], r["state_rows"])
        for r in no_ttl["batches"]
        if r["state_rows"] is not None
    ]
    expect_batch = next((b for b, s in trace if s > lifetime - 1), None)
    v_below = first_state_bound_violation(_Replay(raw), lifetime - 1)
    v_at = first_state_bound_violation(_Replay(raw), lifetime)
    return {
        "probe": "stream_stateful_churn",
        "lifetime_state_rows": lifetime,
        "ttl_peak_state_rows": peak,
        "bounded": bool(peak * 3 < lifetime),
        # the runner guard trips at the first over-cap batch and only
        # there: cap = lifetime-1 must name the batch the trace names;
        # cap = lifetime (the exact saturation) must not trip at all
        "guard_trips_at": v_below,
        "guard_trip_batch_matches_trace": bool(
            v_below is not None and v_below[0] == expect_batch
        ),
        "guard_at_exact_peak_trips": v_at is not None,
        "ttl_batches": ttl["batches"],
        "no_ttl_batches": no_ttl["batches"],
    }


def probe_interval_join(
    spark, stage_dir: str, schema, *, horizon_seconds: int,
    watermark: str | None, label: str,
) -> dict:
    """Drive the run_stream_stream_join shape (click→purchase interval
    join) over the time-sliced replay and record per-batch join state.
    The design claim under test (streaming/events.py): state holds
    only rows younger than watermark + the event-time range, so the
    per-batch numRowsTotal must PLATEAU at
    ≈ arrival_rate · (watermark + horizon) · 2 sides once the
    watermark starts advancing — and with `watermark=None` (the
    misconfiguration arm) it must MARCH with delivered rows instead:
    the exact failure mode StateBoundGuard exists to make loud."""
    from pyspark.sql import functions as F

    from core_telecoms_etl_spark.sources.readers import normalize_timestamps

    def _side(etype: str, prefix: str):
        src = (
            spark.readStream.format("parquet")
            .schema(schema)
            .option("maxFilesPerTrigger", "1")
            .load(stage_dir)
        )
        side = (
            normalize_timestamps(src, nanos_bigint_cols=("ts",))
            .filter(F.col("event_type") == etype)
            .select(
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("ts").alias(f"{prefix}_ts"),
            )
        )
        if watermark is not None:
            side = side.withWatermark(f"{prefix}_ts", watermark)
        return side

    joined = _side("click", "l").join(
        _side("purchase", "r"),
        F.expr(
            f"""l_user = r_user
                AND r_ts >= l_ts
                AND r_ts <= l_ts + INTERVAL {horizon_seconds} SECONDS"""
        ),
    )
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    t0 = time.time()
    try:
        with HeapSampler(spark) as hs:
            q = (
                joined.writeStream.outputMode("append")
                .format("noop")
                .trigger(availableNow=True)
                .start()
            )
            try:
                q.awaitTermination()
                raw = list(q.recentProgress)
            finally:
                q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    rows = []
    for pr in raw:
        sos = pr.get("stateOperators") or []
        rows.append(
            {
                "batch": pr.get("batchId"),
                "input_rows": pr.get("numInputRows"),
                "state_rows": sum(
                    int(so.get("numRowsTotal") or 0) for so in sos
                ),
                "removed": sum(
                    int(so.get("numRowsRemoved") or 0) for so in sos
                ),
            }
        )
    rows = [r for r in rows if r["input_rows"]]
    return {
        "probe": f"stream_interval_join({label})",
        "watermark": watermark,
        "horizon_seconds": horizon_seconds,
        "elapsed_sec": round(time.time() - t0, 1),
        "batches": rows,
        "raw_progress": raw,
        "peak_state_rows": max((r["state_rows"] or 0) for r in rows),
        "final_state_rows": rows[-1]["state_rows"] if rows else None,
        "total_input_rows": sum(r["input_rows"] or 0 for r in rows),
        "peak_jvm_heap_gb": round(hs.peak / 1e9, 2),
    }


def probe_windowed_append(spark, stage_dir: str, schema) -> dict:
    """Watermarked tumbling agg in APPEND mode over the replay: state is
    the in-flight (not yet watermark-closed) windows — bounded by
    (width + watermark) / width windows per key, independent of stream
    length. The per-batch numRowsTotal series shows closed windows
    leaving state as the watermark advances."""
    from pyspark.sql import functions as F

    from core_telecoms_etl_spark.sources.readers import normalize_timestamps

    src = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .load(stage_dir)
    )
    agg = (
        normalize_timestamps(src, nanos_bigint_cols=("ts",))
        .withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "15 minutes"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    t0 = time.time()
    with HeapSampler(spark) as hs:
        q = (
            agg.writeStream.outputMode("append")
            .format("noop")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
            rows = _progress_rows(q)
        finally:
            q.stop()
    return {
        "probe": "stream_windowed_append",
        "elapsed_sec": round(time.time() - t0, 1),
        "batches": rows,
        "peak_state_rows": max((r["state_rows"] or 0) for r in rows),
        "final_state_rows": rows[-1]["state_rows"] if rows else None,
        "total_input_rows": sum(r["input_rows"] for r in rows),
        "peak_jvm_heap_gb": round(hs.peak / 1e9, 2),
    }


def probe_interval_join_suite(
    spark, churn_path: str, *, fine_slices: int, coarse_slices: int
) -> dict:
    """The r15 decade ask: (1) plateau vs range width — the narrow and
    wide arms' peaks must scale ≈ (watermark + horizon), both far
    below (2) the missing-watermark arm's lifetime march; (3) guard
    parity — the recorded march replayed through the REAL runner guard
    (`first_state_bound_violation`) trips at a cap the bounded arm
    never reaches, and does NOT trip on the bounded arm's history.

    Two slicings on purpose: the bounded arms replay FINE time slices
    (~1 h of event time per micro-batch at sf10's 30-day span /
    fine_slices=720) because state-vs-width is only resolvable when
    the batch granule is at most the horizon — the watermark advances
    once per batch, so with multi-day slices the retained set is just
    the current slice and narrow/wide read identically (measured at
    sf0.1/8 slices: ratio 1.01). The march arm replays COARSE slices:
    lifetime growth is granularity-independent, and a fine-sliced
    march would pay per-batch state-store maintenance on millions of
    rows hundreds of times for the same reading."""
    from core_telecoms_etl_spark.streaming.events import (
        first_state_bound_violation,
    )

    schema = spark.read.parquet(churn_path).schema
    fine = stage_time_slices(spark, churn_path, fine_slices)
    coarse = stage_time_slices(spark, churn_path, coarse_slices)
    narrow = probe_interval_join(
        spark, fine, schema,
        horizon_seconds=1800, watermark="1 hour", label="narrow",
    )
    wide = probe_interval_join(
        spark, fine, schema,
        horizon_seconds=7200, watermark="1 hour", label="wide",
    )
    march = probe_interval_join(
        spark, coarse, schema,
        horizon_seconds=1800, watermark=None, label="no_watermark",
    )

    class _Replay:
        def __init__(self, progresses):
            self.recentProgress = progresses

    cap = narrow["peak_state_rows"] * 3
    raw_march = march.pop("raw_progress")
    raw_narrow = narrow.pop("raw_progress")
    wide.pop("raw_progress", None)
    trip = first_state_bound_violation(_Replay(raw_march), cap)
    no_trip = first_state_bound_violation(_Replay(raw_narrow), cap)
    return {
        "probe": "stream_interval_join_suite",
        "narrow": narrow,
        "wide": wide,
        "march": march,
        "plateau_ratio_wide_over_narrow": round(
            wide["peak_state_rows"] / max(narrow["peak_state_rows"], 1), 2
        ),
        "march_over_narrow": round(
            march["peak_state_rows"] / max(narrow["peak_state_rows"], 1), 1
        ),
        "guard_cap": cap,
        "guard_trips_on_march": trip,
        "guard_silent_on_bounded": no_trip is None,
        "windowed_append": probe_windowed_append(spark, coarse, schema),
    }


def main() -> int:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
    n_slices = int(os.environ.get("SLICES", "8"))
    mode = os.environ.get("MODE", "standard")
    from core_telecoms_etl_spark import get_spark
    from core_telecoms_etl_spark.sources.readers import ensure_session_confs

    spark = get_spark("stream-state-probe")
    ensure_session_confs(spark, nanos_as_long=True)
    # fine-sliced replays run >100 micro-batches; the default
    # recentProgress retention (100) would silently truncate the
    # recorded series (and the sf0.1 smoke measured exactly that:
    # input sums short by the evicted batches)
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "2000")
    events = f"{sf_dir}/events.parquet"
    if mode == "churn":
        churn = stage_churn_corpus(spark, events)
        stage = stage_time_slices(spark, churn, n_slices)
        schema = spark.read.parquet(churn).schema
        print(json.dumps(probe_stateful_churn(spark, stage, schema)))
        return 0
    if mode == "interval":
        churn = stage_churn_corpus(spark, events)
        fine = int(os.environ.get("FINE_SLICES", "720"))
        print(
            json.dumps(
                probe_interval_join_suite(
                    spark, churn,
                    fine_slices=fine, coarse_slices=n_slices,
                )
            )
        )
        return 0
    stage = stage_time_slices(spark, events, n_slices)
    schema = spark.read.parquet(events).schema
    print(json.dumps(probe_dedup(spark, stage, schema)))
    print(json.dumps(probe_cms(spark, events)))
    for ttl in (None, 1):
        # 1 ms TTL: every key idles between slices -> eviction flow
        r = probe_stateful(spark, stage, schema, ttl)
        r.pop("raw_progress", None)
        print(json.dumps(r))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
