"""Tests for the write-once scratch-dir protocol (caching.build_once)
— the two ADVICE r11 hardening items: publish-race diagnosis must not
swallow real rename failures, and stale fingerprint generations must
be garbage-collected on publish."""

from __future__ import annotations

import os

import pytest

from core_telecoms_etl_spark import caching


def _build_marker(stage: str) -> None:
    os.makedirs(stage)
    with open(os.path.join(stage, "marker"), "w") as f:
        f.write("built")


def test_build_once_builds_and_reuses(tmp_path, monkeypatch):
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    monkeypatch.setattr(tempfile, "tempdir", None)  # re-read TMPDIR
    calls = []

    def build(stage):
        calls.append(stage)
        _build_marker(stage)

    name = "tc_build_aaaaaaaaaaaa"
    p1 = caching.build_once(name, build)
    p2 = caching.build_once(name, build)
    assert p1 == p2 and os.path.isfile(os.path.join(p1, "marker"))
    assert len(calls) == 1  # second call reused the published dir


def test_build_once_gcs_stale_generations(tmp_path, monkeypatch):
    """Publishing fingerprint B must remove the same-prefix dir with
    fingerprint A (ADVICE r11: regenerated scratch corpora otherwise
    strand every previous generation in $TMPDIR forever) — and must
    NOT touch unrelated dirs or other prefixes."""
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    monkeypatch.setattr(tempfile, "tempdir", None)
    old = tmp_path / "tc_gen_111111111111"
    other_prefix = tmp_path / "tc_other_111111111111"
    unrelated = tmp_path / "tc_gen_notafingerprint"
    for d in (old, other_prefix, unrelated):
        d.mkdir()
    caching.build_once("tc_gen_222222222222", _build_marker)
    assert not old.exists()  # stale generation collected
    assert other_prefix.exists()  # different prefix untouched
    assert unrelated.exists()  # non-fingerprint suffix untouched
    assert (tmp_path / "tc_gen_222222222222").is_dir()


def test_build_once_reraises_real_rename_failure(tmp_path, monkeypatch):
    """A rename failing when the winner's dir does NOT exist is a real
    environmental error (permissions, EXDEV) — it must propagate, not
    be misdiagnosed as a lost publish race that silently destroys the
    build and returns a nonexistent path (ADVICE r11)."""
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    monkeypatch.setattr(tempfile, "tempdir", None)

    def broken_rename(src, dst):
        raise OSError(18, "Invalid cross-device link")

    monkeypatch.setattr(os, "rename", broken_rename)
    with pytest.raises(OSError, match="cross-device"):
        caching.build_once("tc_fail_333333333333", _build_marker)


def test_build_once_adopts_race_winner(tmp_path, monkeypatch):
    """If the rename loses but the winner's dir IS there, adopt it —
    the pre-existing behavior the re-raise must not break."""
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    monkeypatch.setattr(tempfile, "tempdir", None)
    name = "tc_race_444444444444"
    winner = tmp_path / name
    real_rename = os.rename

    def racing_rename(src, dst):
        if dst == str(winner):
            # simulate the other process publishing a beat earlier
            winner.mkdir()
            (winner / "marker").write_text("winner")
            raise OSError(39, "Directory not empty")
        return real_rename(src, dst)

    build_ran = []

    def slow_build(stage):
        build_ran.append(stage)
        _build_marker(stage)

    monkeypatch.setattr(os, "rename", racing_rename)
    got = caching.build_once(name, slow_build)
    assert got == str(winner)
    assert (winner / "marker").read_text() == "winner"
    assert build_ran  # we did build, then adopted the winner's
    # the loser's staging dir must be cleaned up
    assert not any(
        d.startswith(f"{name}.tmp.") for d in os.listdir(tmp_path)
    )


def test_cache_scoped_reuses_same_plan_and_evicts_different(spark):
    # SAME-PLAN REUSE: a second registration of a semantically
    # identical frame must return the EXISTING cached frame (no
    # eviction) — concurrent sweep threads sharing a slot otherwise
    # ping-pong the cache, each eviction forcing a full recompute of
    # the sibling's relation (found live at sf10, r12)
    from core_telecoms_etl_spark import caching

    a1 = spark.range(100).selectExpr("id", "id * 2 AS v")
    a2 = spark.range(100).selectExpr("id", "id * 2 AS v")
    c1 = caching.cache_scoped("test.reuse.slot", a1)
    c2 = caching.cache_scoped("test.reuse.slot", a2)
    assert c1 is c2  # reused, not re-cached
    assert c1.storageLevel.useMemory  # still pinned
    # a DIFFERENT plan in the same slot still evicts (bounded memory)
    b = spark.range(50).selectExpr("id", "id * 3 AS w")
    c3 = caching.cache_scoped("test.reuse.slot", b)
    assert c3 is not c1
    assert not c1.storageLevel.useMemory  # evicted
    assert c3.storageLevel.useMemory
    caching.release_caches()


def test_cache_scoped_repins_after_external_clear(spark):
    """VERDICT r12 defect: same-plan reuse must verify the pin is still
    ALIVE. After `spark.catalog.clearCache()` the registry's handle
    reads StorageLevel(False,...) — returning it hands every later
    caller a permanently-unpersisted frame that recomputes the pinned
    relation on each pass (measured 4.4x on triangle_count second
    passes). The reuse branch must evict the dead handle and re-pin."""
    from core_telecoms_etl_spark import caching

    a1 = spark.range(200).selectExpr("id", "id * 7 AS v")
    c1 = caching.cache_scoped("test.repin.slot", a1)
    assert c1.storageLevel.useMemory or c1.storageLevel.useDisk
    spark.catalog.clearCache()  # external unpersist — dead handle
    assert not (c1.storageLevel.useMemory or c1.storageLevel.useDisk)
    a2 = spark.range(200).selectExpr("id", "id * 7 AS v")
    c2 = caching.cache_scoped("test.repin.slot", a2)
    # the returned handle must be persisted again, not the dead one
    assert c2.storageLevel.useMemory or c2.storageLevel.useDisk
    caching.release_caches()


def test_release_caches_locked_drain(spark):
    """ADVICE r12: release_caches must snapshot-and-clear under the
    registry lock so a racing registration can neither break the
    iteration nor leak a just-registered pin past the clear. Single
    thread here exercises the drain path; the locking discipline is
    asserted structurally (registry empty after release, frames
    unpersisted)."""
    from core_telecoms_etl_spark import caching

    d1 = caching.cache_scoped("test.drain.a", spark.range(10))
    d2 = caching.cache_scoped("test.drain.b", spark.range(20))
    n = caching.release_caches()
    assert n == 2
    assert not caching._SCOPED_CACHES
    for d in (d1, d2):
        assert not (d.storageLevel.useMemory or d.storageLevel.useDisk)


def test_cache_scoped_concurrent_register_and_release(spark):
    """Hammer registrations (same-plan and distinct-plan) against
    concurrent release_caches from multiple threads: no exception may
    escape (the pre-fix drain raised 'dictionary changed size during
    iteration' under exactly this race) and afterward a full release
    leaves zero pinned relations — nothing leaked past a clear."""
    import threading

    from core_telecoms_etl_spark import caching

    errors = []

    def register(tid):
        try:
            for i in range(20):
                df = spark.range(100 + (i % 3)).selectExpr(
                    "id", f"id * {1 + i % 3} AS v"
                )
                caching.cache_scoped(f"test.race.{i % 4}", df)
        except Exception as e:  # pragma: no cover - failure channel
            errors.append(e)

    def release():
        try:
            for _ in range(10):
                caching.release_caches()
        except Exception as e:  # pragma: no cover - failure channel
            errors.append(e)

    threads = [threading.Thread(target=register, args=(t,)) for t in range(3)]
    threads += [threading.Thread(target=release) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    caching.release_caches()
    assert not caching._SCOPED_CACHES
    # registry drained AND the storage layer holds no scoped pins.
    # getRDDStorageInfo() yields py4j RDDInfo objects — iterate them
    # directly (tuple-unpacking passes vacuously when empty but raises
    # Py4JError on a real leak, hiding the list — ADVICE r13).
    leaked = [
        (x.id(), x.name())
        for x in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    ]
    assert not leaked, leaked
