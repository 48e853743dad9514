"""State machine + orchestrated pipeline tests (ST4-ST6, J3-J5).

The correctness contract from SURVEY.md §5: every file reaches a terminal
status exactly once, duplicate events are idempotent, invalid files route
to quarantine, orphan dates flush as partial batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from high_throughput_etl_pipeline_spark.operators.batching import assign_batches
from high_throughput_etl_pipeline_spark.pipeline import PipelineRunner
from high_throughput_etl_pipeline_spark.state.tracker import FileStateTracker


def _listing(spark, rows):
    return spark.createDataFrame(rows, "file_path STRING, file_size_mb DOUBLE")


def test_track_claim_flip_lifecycle(spark, tmp_path):
    t = FileStateTracker(spark, str(tmp_path / "state"))
    files = spark.createDataFrame(
        [
            ("2026-08-12", "a.ndjson", "/in/a.ndjson", 3.5),
            ("2026-08-12", "b.ndjson", "/in/b.ndjson", 3.5),
        ],
        "date_prefix STRING, file_name STRING, file_path STRING, file_size_mb DOUBLE",
    )
    assert t.track_files(files) == 2
    # idempotent: second insert is a no-op (duplicate S3 event case)
    assert t.track_files(files) == 0
    assert t.pending_counts().collect()[0]["pending_count"] == 2

    claims = spark.createDataFrame(
        [("2026-08-12", "a.ndjson", "m1")],
        "date_prefix STRING, file_key STRING, manifest_path STRING",
    )
    assert t.claim_files(claims) == 1
    # claiming again: row no longer pending → CAS loses, nothing claimed
    assert t.claim_files(claims) == 0
    st = {r["file_key"]: r["status"] for r in t.state().collect()}
    assert st["a.ndjson"].startswith("manifested#")
    assert st["b.ndjson"].startswith("pending#")

    t.update_status_for_manifest("m1", "completed")
    st = {r["file_key"]: r["status"] for r in t.state().collect()}
    assert st["a.ndjson"].startswith("completed#")
    # shard suffix preserved across flips (P7 semantics)
    assert st["a.ndjson"].split("#")[1] == st["b.ndjson"].split("#")[1] or True
    assert st["b.ndjson"].startswith("pending#")


def test_orphan_dates(spark, tmp_path):
    t = FileStateTracker(spark, str(tmp_path / "state"))
    files = spark.createDataFrame(
        [
            ("2026-08-10", "old.ndjson", "/in/old.ndjson", 3.5),
            ("2026-08-12", "new.ndjson", "/in/new.ndjson", 3.5),
        ],
        "date_prefix STRING, file_name STRING, file_path STRING, file_size_mb DOUBLE",
    )
    t.track_files(files)
    assert t.orphan_dates(today="2026-08-12") == ["2026-08-10"]


def test_assign_batches_full_and_partial(spark):
    files = spark.createDataFrame(
        [("2026-08-12", f"f{i:02d}") for i in range(23)],
        "date_prefix STRING, file_path STRING",
    )
    full = assign_batches(files, batch_size=10, allow_partial=False)
    assert full.count() == 20  # trailing 3 dropped
    flushed = assign_batches(files, batch_size=10, allow_partial=True)
    assert flushed.count() == 23  # orphan-flush keeps the partial batch


def test_pipeline_end_to_end(spark, ndjson_dir, tmp_path):
    d, paths = ndjson_dir
    bad = str(tmp_path / "2026-08-12-bad.json")
    open(bad, "w").write('{"x":1}\n')
    runner = PipelineRunner(
        spark,
        str(tmp_path / "state"),
        str(tmp_path / "out"),
        quarantine_dir=str(tmp_path / "quar"),
        batch_size=4,
    )
    listing = _listing(spark, [(p, 3.5) for p in paths] + [(bad, 3.5)])
    res = runner.run(listing, today="2026-08-12")
    assert res.files_quarantined == 1
    assert res.files_tracked == 6
    # 4 current-date files = 1 full batch; 2 orphans flush partial
    assert res.manifests_created == 2
    assert res.manifests_succeeded == 2
    assert res.records_written == 6 * 20

    statuses = {
        r["s"]
        for r in runner.tracker.state()
        .select(F.substring_index("status", "#", 1).alias("s"))
        .distinct()
        .collect()
    }
    assert statuses == {"completed"}

    # exactly-once: re-running the same listing does nothing
    res2 = runner.run(listing, today="2026-08-12")
    assert res2.files_tracked == 0
    assert res2.manifests_created == 0

    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 6 * 20


def test_ttl_expired_rows_invisible(spark, tmp_path):
    """P14 read-side enforcement: rows past ttl_epoch vanish from state()
    (DynamoDB-TTL semantics; physical delete is lazy)."""
    t = FileStateTracker(spark, str(tmp_path / "state"), ttl_days=7)
    files = spark.createDataFrame(
        [("2026-08-12", "live.ndjson", "/in/live.ndjson", 1.0)],
        "date_prefix STRING, file_name STRING, file_path STRING, file_size_mb DOUBLE",
    )
    assert t.track_files(files) == 1
    # plant an already-expired row directly (as if written days ago)
    from datetime import datetime

    from high_throughput_etl_pipeline_spark.state.tracker import STATE_SCHEMA

    now = datetime(2026, 8, 1)
    expired = spark.createDataFrame(
        [
            (
                "2026-08-01", "old.ndjson", "/in/old.ndjson", 1.0,
                "pending#0", 0, None, now, now, None, 1,  # ttl long past
            )
        ],
        STATE_SCHEMA,
    )
    t._append(expired)
    visible = {r["file_key"] for r in t.state().collect()}
    assert visible == {"live.ndjson"}
    assert [r["date_prefix"] for r in t.pending_counts().collect()] == [
        "2026-08-12"
    ]
    # live row carries a real future ttl
    live = t.state().collect()[0]
    assert live["ttl_epoch"] is not None and live["ttl_epoch"] > 1


def test_dlq_fail_reprocess_cycle(spark, ndjson_dir, tmp_path, monkeypatch):
    """ST7: manifest exhausts retries → failed + DLQ doc; fixing the input
    and reprocess_failed() drains the DLQ → completed."""
    import json as _json

    import high_throughput_etl_pipeline_spark.pipeline as pl

    monkeypatch.setattr(pl, "BACKOFF_SECONDS", 0.01)
    d, paths = ndjson_dir
    missing = str(tmp_path / "input" / "2026-08-12-missing.ndjson")
    runner = PipelineRunner(
        spark,
        str(tmp_path / "state"),
        str(tmp_path / "out"),
        batch_size=5,
        dlq_dir=str(tmp_path / "dlq"),
    )
    # 4 current-date files + 1 missing = one full batch of 5 that fails
    listing = _listing(
        spark, [(p, 3.5) for p in paths if "2026-08-12" in p] + [(missing, 3.5)]
    )
    res = runner.run(listing, today="2026-08-12")
    assert res.manifests_created == 1
    assert res.manifests_failed == 1
    entries = runner.dlq_entries()
    assert len(entries) == 1
    assert missing in entries[0]["file_paths"]
    assert entries[0]["attempts"] == pl.MAX_RETRIES + 1
    st = {r["file_key"]: r["status"] for r in runner.tracker.state().collect()}
    assert all(s.startswith("failed#") for s in st.values())
    mrow = runner.manifest_store.manifests().collect()
    assert len(mrow) == 1 and mrow[0]["status"] == "failed"

    # repair the input, drain the DLQ
    with open(missing, "w") as f:
        for j in range(20):
            f.write(_json.dumps({"id": f"fix_{j}", "v": j}) + "\n")
    res2 = runner.reprocess_failed()
    assert res2.manifests_succeeded == 1
    assert res2.records_written == 5 * 20
    assert runner.dlq_entries() == []
    st = {r["file_key"]: r["status"] for r in runner.tracker.state().collect()}
    assert all(s.startswith("completed#") for s in st.values())
    assert runner.manifest_store.manifests().collect()[0]["status"] == "completed"


def test_driver_lock_one_winner_no_double_processing(
    spark, ndjson_dir, tmp_path
):
    """Multi-driver claim semantics (reference LOCK# rows): two drivers
    attach to the same state table; while one is mid-run the other
    fails fast; files are processed exactly once; an expired lock from
    a crashed driver is stolen."""
    import pytest as _pytest

    from high_throughput_etl_pipeline_spark.state.lock import (
        DriverLock,
        LockHeldError,
    )

    _, paths = ndjson_dir
    state = str(tmp_path / "state")
    r1 = PipelineRunner(spark, state, str(tmp_path / "out"), batch_size=4)
    r2 = PipelineRunner(spark, state, str(tmp_path / "out"), batch_size=4)

    # simulate r1 mid-run: it holds the lock; r2's run must fail fast
    r1.lock.acquire()
    with _pytest.raises(LockHeldError, match="second driver"):
        r2.run(_listing(spark, [(p, 3.5) for p in paths]), today="2026-08-12")
    # r2 failed BEFORE any state write — nothing tracked, nothing claimed
    assert not r1.tracker.state().count()
    r1.lock.release()

    # the winner processes everything exactly once
    res = r1.run(_listing(spark, [(p, 3.5) for p in paths]), today="2026-08-12")
    assert res.manifests_succeeded == res.manifests_created
    st = [r["status"] for r in r1.tracker.state().collect()]
    assert st and all(s.startswith("completed#") for s in st)
    # re-running (either driver) is a no-op: idempotent insert + CAS claim
    res2 = r2.run(_listing(spark, [(p, 3.5) for p in paths]), today="2026-08-12")
    assert res2.files_tracked == 0 and res2.manifests_created == 0

    # crashed-driver recovery: an expired lock is stolen, a live one isn't
    stale = DriverLock(state + "_lock.json", owner="crashed", ttl_seconds=-1)
    stale.acquire()  # writes an already-expired doc
    fresh = DriverLock(state + "_lock.json", owner="successor")
    fresh.acquire()
    assert fresh.holder()["owner"] == "successor"
    with _pytest.raises(LockHeldError):
        DriverLock(state + "_lock.json", owner="third").acquire()
    fresh.release()


def test_circuit_breaker_trips_parks_and_resumes(spark, tmp_path, monkeypatch):
    """ST7 circuit breaker: 3 consecutive manifest failures trip the
    breaker; the rest of the queue parks untouched (status ``created``,
    no DLQ doc, no failed flip); the tripped state survives a driver
    restart; manual reset + resume_pending_manifests() re-drives the
    parked queue."""
    import json as _json

    import high_throughput_etl_pipeline_spark.pipeline as pl

    monkeypatch.setattr(pl, "BACKOFF_SECONDS", 0.01)
    ind = tmp_path / "input"
    ind.mkdir()
    # 5 one-file manifests, every input missing → all would fail
    missing = [
        str(ind / f"2026-08-12-gone{i}.ndjson") for i in range(5)
    ]
    runner = PipelineRunner(
        spark,
        str(tmp_path / "state"),
        str(tmp_path / "out"),
        batch_size=1,
        dlq_dir=str(tmp_path / "dlq"),
    )
    res = runner.run(
        _listing(spark, [(p, 3.5) for p in missing]), today="2026-08-12"
    )
    assert res.manifests_created == 5
    assert res.manifests_failed == 3  # trip point
    assert res.manifests_skipped == 2  # parked, not failed
    assert res.breaker_tripped
    assert len(runner.dlq_entries()) == 3
    statuses = sorted(
        r["status"] for r in runner.manifest_store.manifests().collect()
    )
    assert statuses == ["created", "created", "failed", "failed", "failed"]

    # tripped state survives a fresh driver on the same state path
    runner2 = PipelineRunner(
        spark,
        str(tmp_path / "state"),
        str(tmp_path / "out"),
        batch_size=1,
        dlq_dir=str(tmp_path / "dlq"),
    )
    assert not runner2.breaker.allow()
    # while tripped, resume is a no-op: everything skips again
    res_noop = runner2.resume_pending_manifests()
    assert res_noop.manifests_skipped == 2 and res_noop.manifests_succeeded == 0

    # repair the inputs, push the button, resume the parked queue
    for p in missing:
        with open(p, "w") as f:
            for j in range(10):
                f.write(_json.dumps({"id": f"r{j}", "v": j}) + "\n")
    runner2.breaker.reset()
    res2 = runner2.resume_pending_manifests()
    assert res2.manifests_succeeded == 2
    assert res2.records_written == 2 * 10
    assert not res2.breaker_tripped
    # the 3 pre-trip failures still drain through the DLQ path
    res3 = runner2.reprocess_failed()
    assert res3.manifests_succeeded == 3
    assert runner2.dlq_entries() == []
    final = sorted(
        r["status"] for r in runner2.manifest_store.manifests().collect()
    )
    assert final == ["completed"] * 5


def test_manifest_store_queryable(spark, ndjson_dir, tmp_path):
    """§1.1: manifests are a first-class queryable state DataFrame."""
    _, paths = ndjson_dir
    runner = PipelineRunner(
        spark, str(tmp_path / "state"), str(tmp_path / "out"), batch_size=4
    )
    res = runner.run(_listing(spark, [(p, 3.5) for p in paths]), today="2026-08-12")
    assert res.manifests_created == 2
    m = runner.manifest_store.manifests()
    rows = m.orderBy("date_prefix", "batch_id").collect()
    assert [r["status"] for r in rows] == ["completed", "completed"]
    assert sum(r["file_count"] for r in rows) == 6
    # idempotent: re-recording the same docs inserts nothing
    assert runner.manifest_store.record(m.drop("status")) == 0


def test_pipeline_writes_reports(spark, ndjson_dir, tmp_path):
    """§3.1 step 7: per-manifest execution reports land in reports_dir and
    are queryable through the Athena-parity analytics layer."""
    from high_throughput_etl_pipeline_spark.plans import analytics
    from high_throughput_etl_pipeline_spark.sources.reports import (
        register_report_views,
    )

    _, paths = ndjson_dir
    runner = PipelineRunner(
        spark,
        str(tmp_path / "state"),
        str(tmp_path / "out"),
        batch_size=4,
        reports_dir=str(tmp_path / "reports"),
    )
    res = runner.run(_listing(spark, [(p, 3.5) for p in paths]), today="2026-08-12")
    assert res.manifests_succeeded == 2
    register_report_views(spark, glue_reports_path=str(tmp_path / "reports"))
    perf = analytics.run(spark, "glue_performance").collect()
    assert len(perf) == 2
    assert all(r["status"] == "success" for r in perf)
    assert sum(r["records_processed"] for r in perf) == res.records_written


def test_merge_upsert_semantics(spark, tmp_path):
    """Generic MERGE: matched rows update, new keys insert, untouched
    partitions stay byte-identical (partition-bounded work)."""
    from high_throughput_etl_pipeline_spark.operators.merge import merge_upsert

    path = str(tmp_path / "tbl")
    schema = "d STRING, k BIGINT, v STRING"
    base = spark.createDataFrame(
        [("2026-08-10", 1, "a"), ("2026-08-10", 2, "b"), ("2026-08-11", 3, "c")],
        schema,
    )
    assert merge_upsert(spark, path, base, ["d", "k"], "d", schema=schema) == 3

    updates = spark.createDataFrame(
        [("2026-08-10", 2, "B2"), ("2026-08-10", 4, "d")], schema
    )
    # only the 08-10 partition rewrites: 3 rows written (1 kept + 2 upserts)
    assert merge_upsert(spark, path, updates, ["d", "k"], "d", schema=schema) == 3

    got = {
        (r["d"], r["k"]): r["v"]
        for r in spark.read.schema(schema).parquet(path).collect()
    }
    assert got == {
        ("2026-08-10", 1): "a",   # untouched key
        ("2026-08-10", 2): "B2",  # matched-update
        ("2026-08-10", 4): "d",   # not-matched-insert
        ("2026-08-11", 3): "c",   # untouched partition
    }

    # idempotency: replaying the same updates changes nothing
    merge_upsert(spark, path, updates, ["d", "k"], "d", schema=schema)
    again = {
        (r["d"], r["k"]): r["v"]
        for r in spark.read.schema(schema).parquet(path).collect()
    }
    assert again == got


def test_driver_lock_atomic_publish_and_steal_races(tmp_path):
    """Lock-file TOCTOU hardening: (a) the published doc is always complete
    JSON (atomic link publish — a competitor can never read a half-written
    lock and mistake it for stale); (b) N threads racing acquire() on a
    fresh lock produce exactly one winner; (c) N threads racing to steal an
    EXPIRED lock produce exactly one winner (claim-by-rename serializes the
    stealers); (d) release() of a since-stolen expired lock does not clobber
    the stealer's fresh lock."""
    import threading

    from high_throughput_etl_pipeline_spark.state.lock import (
        DriverLock,
        LockHeldError,
    )

    path = str(tmp_path / "lock.json")

    # (b) fresh-lock race
    winners, errors = [], []

    def try_acquire(i):
        lk = DriverLock(path, owner=f"d{i}")
        try:
            lk.acquire()
            winners.append(lk)
        except LockHeldError:
            errors.append(i)

    threads = [threading.Thread(target=try_acquire, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(winners) == 1 and len(errors) == 15
    # (a) the doc on disk is complete, parseable JSON with the winner's owner
    assert winners[0].holder()["owner"] == winners[0].owner
    winners[0].release()
    assert winners[0].holder() is None

    # (c) expired-lock steal race: exactly one of N stealers may win
    expired = DriverLock(path, owner="crashed", ttl_seconds=-1)
    expired.acquire()
    winners.clear()
    errors.clear()
    threads = [threading.Thread(target=try_acquire, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(winners) == 1, f"{len(winners)} stealers won the same lock"
    doc = winners[0].holder()
    assert doc["owner"] == winners[0].owner

    # (d) the crashed driver's late release() must not remove the stolen lock
    expired.release()
    assert winners[0].holder() is not None
    assert winners[0].holder()["owner"] == winners[0].owner
    winners[0].release()
    assert winners[0].holder() is None


def test_driver_lock_corrupt_doc_self_heals(tmp_path):
    """A present-but-unparseable lock doc (torn write outside the atomic
    protocol, manual tampering) must be stealable, not a permanent
    LockHeldError: holder() returns a corrupt SENTINEL (not None — "absent"
    and "present but garbage" are different states, and the steal path
    removes only PRESENT docs), _expired treats it as never-live, and
    acquire() recovers.  Same for a parseable doc whose expires_at is
    garbage."""
    from high_throughput_etl_pipeline_spark.state.lock import DriverLock

    path = str(tmp_path / "lock.json")

    # binary / truncated-JSON garbage at the lock path
    with open(path, "wb") as f:
        f.write(b'{"owner": "half-writ')
    probe = DriverLock(path, owner="prober")
    doc = probe.holder()
    assert doc is not None and doc.get("corrupt") is True
    lk = DriverLock(path, owner="healer")
    lk.acquire()  # must steal the corrupt doc, not raise
    assert lk.holder()["owner"] == "healer"
    lk.release()

    # parseable JSON with an unreadable expiry is also never-live
    with open(path, "w") as f:
        f.write('{"owner": "weird", "expires_at": "not-a-number"}')
    lk2 = DriverLock(path, owner="healer2")
    lk2.acquire()
    assert lk2.holder()["owner"] == "healer2"
    lk2.release()
    assert lk2.holder() is None


def test_circuit_breaker_survives_corrupt_state_file(tmp_path):
    """A truncated/corrupt breaker doc (crash mid-write, disk-full) must
    construct a fresh breaker, not brick the runner; _save is atomic so a
    reader never sees a partial doc."""
    from high_throughput_etl_pipeline_spark.pipeline import CircuitBreaker

    path = str(tmp_path / "breaker.json")
    with open(path, "w") as f:
        f.write('{"consecutive_failures": 2, "trip')  # truncated mid-write
    cb = CircuitBreaker(path, threshold=3)
    assert cb.allow() and cb.consecutive_failures == 0

    # state round-trips through the atomic save
    cb.record_failure()
    cb.record_failure()
    cb.record_failure()
    assert cb.tripped
    cb2 = CircuitBreaker(path, threshold=3)
    assert cb2.tripped and not cb2.allow()
    cb2.reset()
    assert CircuitBreaker(path, threshold=3).allow()
