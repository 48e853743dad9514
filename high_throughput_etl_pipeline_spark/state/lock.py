"""Driver lock — multi-driver claim serialization (reference ``LOCK#``
rows, lambda_manifest_builder.py:1218-1229; DEVELOPER_GUIDE.md:154-163).

The reference serializes concurrent manifest builders with a DynamoDB
``LOCK#`` row: conditional-put to acquire, TTL so a crashed holder's lock
expires instead of deadlocking the pipeline.  The engine's state tables
are plain Parquet (no multi-writer transaction — tracker.py header), so
the lock is the piece that makes the single-driver assumption SAFE
rather than implicit: a second driver attaching to the same state path
fails fast at acquire instead of silently interleaving claim writes.

Mechanism: ``os.open(O_CREAT | O_EXCL)`` — an atomic create-if-absent on
any POSIX filesystem (and object stores with preconditions would use
if-none-match the same way).  The lock document records owner + expiry;
a later acquirer may STEAL only an expired lock (crashed-driver
recovery, same semantics as the reference's TTL'd lock row).  On a
lakehouse deployment the equivalent is a Delta/Iceberg conditional
commit; the API here is the part that stays.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from contextlib import contextmanager


class LockHeldError(RuntimeError):
    """Another live driver holds the lock."""


class DriverLock:
    def __init__(
        self,
        path: str,
        owner: str | None = None,
        ttl_seconds: float = 3600.0,
    ):
        self.path = path
        self.owner = owner or f"driver-{uuid.uuid4().hex[:12]}"
        self.ttl_seconds = ttl_seconds

    def holder(self) -> dict | None:
        """The current lock document, or None when unheld."""
        try:
            with open(self.path) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def _expired(self, doc: dict) -> bool:
        return time.time() >= float(doc.get("expires_at", 0))

    def acquire(self) -> None:
        """Take the lock or raise :class:`LockHeldError`.

        An expired lock (holder crashed without releasing) is stolen:
        the stale document is removed and acquisition retried once —
        the two stealers then race on the atomic create and exactly one
        wins.
        """
        doc = json.dumps(
            {
                "owner": self.owner,
                "acquired_at": time.time(),
                "expires_at": time.time() + self.ttl_seconds,
            }
        )
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        for _ in range(2):
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                with os.fdopen(fd, "w") as f:
                    f.write(doc)
                return
            except FileExistsError:
                held = self.holder()
                if held is None or self._expired(held):
                    # stale: remove and retry the atomic create once
                    try:
                        os.remove(self.path)
                    except FileNotFoundError:
                        pass
                    continue
                raise LockHeldError(
                    f"state lock held by {held.get('owner')!r} until "
                    f"{held.get('expires_at')}; a second driver must not "
                    "attach to a live state table"
                )
        raise LockHeldError("lost the steal race for an expired lock")

    def release(self) -> None:
        """Release only our own lock (never clobber a stealer's)."""
        held = self.holder()
        if held and held.get("owner") == self.owner:
            try:
                os.remove(self.path)
            except FileNotFoundError:
                pass

    @contextmanager
    def hold(self):
        self.acquire()
        try:
            yield self
        finally:
            self.release()
