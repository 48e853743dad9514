"""Orchestrated batch pipeline runner (SURVEY.md §3.1, §2.6 ST5/ST7).

The reference's control plane is S3→SQS→Lambda→DynamoDB→EventBridge→Step
Functions→Glue (DEVELOPER_GUIDE.md:83-122) with the state machine
UpdateStatusProcessing → StartGlueJob → UpdateStatusCompleted/Failed
(terraform/modules/step_functions/main.tf:49-228).  Collapsed here into a
single driver loop over DataFrame operations:

    discover → validate/quarantine → track (idempotent) → batch →
    claim (CAS) → transform+write per manifest (with retry) →
    status flip → execution report

Failure path (ST7): a manifest that exhausts MAX_RETRIES flips to
``failed`` AND lands in a dead-letter directory as a JSON document (the
reference's 3-receive SQS DLQ, terraform/modules/sqs/main.tf:27-66);
``reprocess_failed()`` drains the DLQ back through the processor
(reprocess-failed.sh).

Each stage is the operator documented in its own module; this file only
sequences them, mirroring the Step Functions definition.
"""

from __future__ import annotations

import json
import os
import time
import traceback
from dataclasses import dataclass, field
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from high_throughput_etl_pipeline_spark.ingest import process_manifest
from high_throughput_etl_pipeline_spark.operators.batching import (
    MAX_FILES_PER_MANIFEST,
    assign_batches,
)
from high_throughput_etl_pipeline_spark.operators.validation import (
    quarantine,
    valid_files,
    validate_files,
)
from high_throughput_etl_pipeline_spark.state.lock import DriverLock
from high_throughput_etl_pipeline_spark.state.manifest import (
    ManifestStore,
    build_manifest_docs,
)
from high_throughput_etl_pipeline_spark.state.tracker import FileStateTracker

MAX_RETRIES = 2  # SFN: Lambda 2 retries, backoff 2.0 (step_functions/main.tf)
BACKOFF_SECONDS = 1.0
BREAKER_THRESHOLD = 3  # consecutive manifest failures before tripping


@dataclass
class RunResult:
    files_seen: int = 0
    files_quarantined: int = 0
    files_tracked: int = 0
    manifests_created: int = 0
    manifests_succeeded: int = 0
    manifests_failed: int = 0
    manifests_skipped: int = 0
    records_written: int = 0
    breaker_tripped: bool = False
    errors: list[str] = field(default_factory=list)


class CircuitBreaker:
    """Trip-after-N-consecutive-failures guard for the manifest processor
    (ST7 residual — the reference's EventBridge failure-detection +
    fallback path, lambda_manifest_builder.py:124-185).

    A persistently failing sink (bad output volume, broken schema, dead
    downstream) makes every retry loop burn a full backoff cycle per
    manifest; the breaker stops feeding it after ``threshold``
    CONSECUTIVE manifest failures.  Tripped state parks the remaining
    queue untouched (manifests stay ``created``, files stay claimed) so
    nothing is double-processed or falsely failed, and persists as a
    JSON doc beside the state table so a restarted driver stays tripped.
    ``reset()`` is the deliberate human step that resumes dispatch —
    pair it with ``PipelineRunner.resume_pending_manifests()``.
    """

    def __init__(self, path: str, threshold: int = BREAKER_THRESHOLD):
        self.path = path
        self.threshold = threshold
        self.consecutive_failures = 0
        self.tripped = False
        if os.path.isfile(path):
            # a truncated/corrupt state doc (crash mid-write before _save
            # became atomic, disk-full) must degrade to fresh state, not
            # brick the runner at construction
            try:
                with open(path) as f:
                    d = json.load(f)
                self.consecutive_failures = int(d.get("consecutive_failures", 0))
                self.tripped = bool(d.get("tripped", False))
            except (json.JSONDecodeError, ValueError, TypeError, OSError):
                pass

    def _save(self) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        tmp = f"{self.path}.tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "consecutive_failures": self.consecutive_failures,
                    "tripped": self.tripped,
                    "threshold": self.threshold,
                },
                f,
            )
        os.replace(tmp, self.path)

    def allow(self) -> bool:
        return not self.tripped

    def record_success(self) -> None:
        self.consecutive_failures = 0
        self._save()

    def record_failure(self) -> None:
        self.consecutive_failures += 1
        if self.consecutive_failures >= self.threshold:
            self.tripped = True
        self._save()

    def reset(self) -> None:
        """Manual close (the operator pushed the button)."""
        self.consecutive_failures = 0
        self.tripped = False
        self._save()


class PipelineRunner:
    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        output_dir: str,
        quarantine_dir: str | None = None,
        batch_size: int = MAX_FILES_PER_MANIFEST,
        reports_dir: str | None = None,
        dlq_dir: str | None = None,
        ttl_days: int | None = None,
        breaker_threshold: int = BREAKER_THRESHOLD,
    ):
        self.spark = spark
        self.tracker = FileStateTracker(spark, state_path, ttl_days=ttl_days)
        self.manifest_store = ManifestStore(spark, state_path + "_manifests")
        self.output_dir = output_dir
        self.quarantine_dir = quarantine_dir
        self.batch_size = batch_size
        self.reports_dir = reports_dir
        self.dlq_dir = dlq_dir
        self.breaker = CircuitBreaker(
            state_path + "_breaker.json", threshold=breaker_threshold
        )
        # reference LOCK# semantics: one live driver per state table —
        # a second attach fails fast instead of interleaving Parquet
        # writes (state/lock.py); expired locks are stolen (crash safety)
        self.lock = DriverLock(state_path + "_lock.json")

    def run(
        self,
        file_listing: DataFrame,
        today: str | None = None,
        flush_orphans: bool = True,
        schema=None,
    ) -> RunResult:
        """One full pipeline pass over a file listing
        (columns: file_path, file_size_mb).  Holds the driver lock for
        the duration: a concurrent ``run()`` on the same state path
        raises :class:`~...state.lock.LockHeldError` (reference LOCK#
        rows — no two builders interleave state writes)."""
        with self.lock.hold():
            return self._run_locked(file_listing, today, flush_orphans, schema)

    def _run_locked(
        self,
        file_listing: DataFrame,
        today: str | None,
        flush_orphans: bool,
        schema,
    ) -> RunResult:
        res = RunResult()
        res.files_seen = file_listing.count()

        validated = validate_files(file_listing)
        bad = quarantine(validated)
        res.files_quarantined = bad.count()
        if self.quarantine_dir and res.files_quarantined:
            bad.write.mode("append").parquet(self.quarantine_dir)

        res.files_tracked = self.tracker.track_files(valid_files(validated))

        # batching: full batches for today's dates; orphan flush (ST2)
        # lets stale dates go out partial at threshold 1.
        pending = self.tracker.state().filter(
            F.col("status").startswith("pending")
        )
        if today is None:
            today = self.spark.sql(
                "SELECT date_format(current_date(), 'yyyy-MM-dd')"
            ).collect()[0][0]
        current = assign_batches(
            pending.filter(F.col("date_prefix") >= today),
            batch_size=self.batch_size,
            allow_partial=False,
        )
        parts = [current]
        if flush_orphans:
            parts.append(
                assign_batches(
                    pending.filter(F.col("date_prefix") < today),
                    batch_size=self.batch_size,
                    allow_partial=True,
                )
            )
        batched = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
        # one-pass manifest docs: materialize once, then reuse for the
        # driver-side loop, the meta-record table, AND the claim join
        docs = build_manifest_docs(batched).localCheckpoint(eager=True)
        manifests = docs.collect()
        res.manifests_created = len(manifests)
        if not manifests:
            return res
        self.manifest_store.record(docs)

        claims = batched.select("date_prefix", "batch_id", "file_key").join(
            docs.select("date_prefix", "batch_id", "manifest_path"),
            on=["date_prefix", "batch_id"],
        ).select("date_prefix", "file_key", "manifest_path")
        self.tracker.claim_files(claims)

        for m in manifests:
            self._drive_manifest(m, res, schema)
        res.breaker_tripped = not self.breaker.allow()
        return res

    def _drive_manifest(self, m, res: RunResult, schema) -> None:
        """Process one manifest through retry/flip/DLQ/report, guarded by
        the circuit breaker: while tripped, the manifest is left PARKED
        (store status ``created``, files claimed) — not failed, not
        DLQ'd — so a reset + resume_pending_manifests() re-drives it."""
        if not self.breaker.allow():
            res.manifests_skipped += 1
            return
        started = time.time()
        ok, err = self._process_with_retry(
            list(m["file_paths"]), m["date_prefix"], schema
        )
        if ok is not None:
            res.records_written += ok
            res.manifests_succeeded += 1
            self._flip(m["manifest_path"], "completed")
            self.breaker.record_success()
        else:
            res.manifests_failed += 1
            res.errors.append(err or "unknown")
            self._flip(m["manifest_path"], "failed", (err or "")[:1000])
            self._write_dlq_entry(m, err)
            self.breaker.record_failure()
        if self.reports_dir:
            self._write_run_report(m, ok, err, started)

    def resume_pending_manifests(self, schema=None) -> RunResult:
        """Drive manifests the tripped breaker left parked (store status
        still ``created``).  Call after ``breaker.reset()`` — with the
        breaker still open this is a no-op (everything skips again)."""
        with self.lock.hold():
            res = RunResult()
            parked = (
                self.manifest_store.manifests()
                .filter(F.col("status") == "created")
                .orderBy("date_prefix", "batch_id")
                .collect()
            )
            for m in parked:
                self._drive_manifest(m, res, schema)
            res.breaker_tripped = not self.breaker.allow()
            return res

    def _flip(
        self, manifest_path: str, status: str, error: str | None = None
    ) -> None:
        self.tracker.update_status_for_manifest(
            manifest_path, status, error_message=error
        )
        self.manifest_store.update_status(manifest_path, status, error)

    # -- dead-letter queue (ST7) ---------------------------------------

    def _write_dlq_entry(self, m, err: str | None) -> None:
        """Park an exhausted manifest in the DLQ as one JSON doc (the SQS
        dead-letter message shape; queryable via spark.read.json)."""
        if not self.dlq_dir:
            return
        os.makedirs(self.dlq_dir, exist_ok=True)
        name = m["manifest_path"].replace("/", "__").replace(".json", "")
        doc = {
            "manifest_path": m["manifest_path"],
            "date_prefix": m["date_prefix"],
            "file_paths": list(m["file_paths"]),
            "error": (err or "")[:4000],
            "attempts": MAX_RETRIES + 1,
            "failed_at": datetime.now(timezone.utc).isoformat(),
        }
        with open(os.path.join(self.dlq_dir, name + ".dlq.json"), "w") as f:
            json.dump(doc, f)

    def dlq_entries(self) -> list[dict]:
        if not self.dlq_dir or not os.path.isdir(self.dlq_dir):
            return []
        out = []
        for n in sorted(os.listdir(self.dlq_dir)):
            if n.endswith(".dlq.json"):
                with open(os.path.join(self.dlq_dir, n)) as f:
                    doc = json.load(f)
                doc["_dlq_file"] = os.path.join(self.dlq_dir, n)
                out.append(doc)
        return out

    def reprocess_failed(self, schema=None) -> RunResult:
        """Drain the DLQ (reprocess-failed.sh): re-run each parked
        manifest; success removes the DLQ doc and flips state to
        completed, failure leaves it parked with the fresh error."""
        with self.lock.hold():
            return self._reprocess_failed_locked(schema)

    def _reprocess_failed_locked(self, schema=None) -> RunResult:
        res = RunResult()
        for doc in self.dlq_entries():
            started = time.time()
            ok, err = self._process_with_retry(
                doc["file_paths"], doc["date_prefix"], schema
            )
            if ok is not None:
                res.records_written += ok
                res.manifests_succeeded += 1
                self._flip(doc["manifest_path"], "completed")
                os.remove(doc["_dlq_file"])
            else:
                res.manifests_failed += 1
                res.errors.append(err or "unknown")
                self._flip(doc["manifest_path"], "failed", (err or "")[:1000])
            if self.reports_dir:
                m = {
                    "manifest_path": doc["manifest_path"],
                    "date_prefix": doc["date_prefix"],
                    "file_paths": doc["file_paths"],
                }
                self._write_run_report(m, ok, err, started)
        return res

    def _write_run_report(self, m, ok, err, started: float) -> None:
        """§3.1 step 7 — per-manifest execution report (glue_batch_job.py
        :218-299), queryable via register_report_views + plans/analytics."""
        from datetime import datetime, timezone

        from high_throughput_etl_pipeline_spark.sources.reports import (
            build_run_report,
            write_report,
        )

        ended = time.time()
        iso = lambda t: datetime.fromtimestamp(t, tz=timezone.utc).isoformat()
        report = build_run_report(
            self.spark,
            manifest_path=m["manifest_path"],
            records_processed=ok or 0,
            parquet_files_created=0,
            errors=[err] if err else [],
            started_at=iso(started),
            ended_at=iso(ended),
            duration_seconds=ended - started,
        )
        write_report(report, self.reports_dir)

    def _process_with_retry(
        self, paths: list[str], date_prefix: str, schema
    ) -> tuple[int | None, str | None]:
        delay = BACKOFF_SECONDS
        last_err = None
        for attempt in range(MAX_RETRIES + 1):
            try:
                n = process_manifest(
                    self.spark, paths, self.output_dir,
                    date_prefix=date_prefix, schema=schema,
                )
                return n, None
            except Exception:
                last_err = traceback.format_exc()
                if attempt < MAX_RETRIES:
                    time.sleep(delay)
                    delay *= 2.0
        return None, last_err
