"""Multi-writer commit lock for metadata maintenance (K7 at scale).

The reference's `_meta` analogue is DynamoDB, where every per-row
update is atomic and concurrent Lambda writers cannot lose updates
(index-data-lambda.py:165-172). The repo's parquet `_meta` swap
(engine._mark_indexed) is crash-safe but was single-writer: two
concurrent markers each compute their rewrite from a snapshot missing
the other's stamps, and the last swap wins — a lost update.

This module closes that with the simplest correct protocol for a
filesystem: an exclusive commit lock. `FileLock` creates the lock file
with O_CREAT|O_EXCL (atomic on POSIX filesystems and NFS; the local
analogue of S3 conditional PUT / If-None-Match, which is the documented
object-store port). A writer that dies mid-commit leaves a lock whose
mtime goes stale; the next writer steals it by RENAMING the stale file
to a unique name first — rename succeeds for exactly one contender —
then re-creating it.

Serializing writers is the right trade for metadata-sized tables (the
stamp job is seconds). The scale upgrade, documented not vendored, is
Delta/Iceberg optimistic concurrency: commit by conditional-PUT of
`_commits/<v+1>.json`, losers re-read and retry — same safety, no
waiting, needed only when commits contend for minutes.
"""

from __future__ import annotations

import os
import time
import uuid
from pathlib import Path


class FileLock:
    """Exclusive advisory lock backed by an O_EXCL-created file.

    `ttl` bounds how long a dead owner can block others: a lock file
    whose mtime is older than ttl seconds is considered abandoned and
    is stolen (rename-then-recreate, so only one contender wins)."""

    def __init__(self, path: str | Path, ttl: float = 60.0):
        self.path = Path(path)
        self.ttl = ttl
        self._held = False

    def _is_stale(self) -> bool:
        try:
            return (time.time() - self.path.stat().st_mtime) > self.ttl
        except FileNotFoundError:
            return False

    def held_elsewhere(self) -> bool:
        """True when a live (non-stale) owner other than us holds it."""
        return (not self._held) and self.path.exists() and not self._is_stale()

    def acquire(self, timeout: float = 120.0) -> None:
        deadline = time.time() + timeout
        while True:
            try:
                fd = os.open(
                    self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY
                )
                os.write(fd, f"{os.getpid()}\n".encode())
                os.close(fd)
                self._held = True
                return
            except FileExistsError:
                if self._is_stale():
                    # steal: exactly one contender wins the rename
                    try:
                        self.path.rename(
                            self.path.with_suffix(f".stale.{uuid.uuid4().hex}")
                        )
                    except FileNotFoundError:
                        pass  # someone else stole or released it
                    continue
                if time.time() > deadline:
                    raise TimeoutError(
                        f"could not acquire {self.path} within {timeout}s"
                    ) from None
                time.sleep(0.05)

    def release(self) -> None:
        if self._held:
            self._held = False
            try:
                self.path.unlink()
            except FileNotFoundError:
                pass  # stolen after we went stale — nothing to release

    def __enter__(self) -> "FileLock":
        self.acquire()
        return self

    def __exit__(self, *exc) -> None:
        self.release()
