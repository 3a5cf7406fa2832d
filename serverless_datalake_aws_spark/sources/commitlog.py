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

Liveness vs safety (round-6 hardening, ADVICE r5):

- Every acquire writes a unique OWNER TOKEN into the lock file. A
  holder only ever unlinks the lock after re-reading the token and
  confirming it is still its own, so a holder that was (wrongly or
  rightly) deemed stale and stolen can no longer delete the THIEF's
  lock and open the door to a third concurrent writer.
- While held, a daemon HEARTBEAT thread touches the file's mtime every
  ttl/4 seconds, so a *live* holder never goes stale no matter how long
  its commit takes — staleness now really means "the owning process is
  gone" (crashed, or SIGSTOPped longer than ttl, the one hole plain
  POSIX cannot close; `still_held()` lets a commit re-verify ownership
  immediately before publishing for exactly that case).

Serializing writers is the right trade for metadata-sized tables (the
stamp job is seconds). The scale upgrade, documented not vendored, is
Delta/Iceberg optimistic concurrency: commit by conditional-PUT of
`_commits/<v+1>.json`, losers re-read and retry — same safety, no
waiting, needed only when commits contend for minutes.
"""

from __future__ import annotations

import os
import threading
import time
import uuid
from pathlib import Path


class FileLock:
    """Exclusive advisory lock backed by an O_EXCL-created file.

    `ttl` bounds how long a DEAD owner can block others: a lock file
    whose mtime is older than ttl seconds is considered abandoned and
    is stolen (rename-then-recreate, so only one contender wins). A
    live owner's heartbeat keeps the mtime fresh, so ttl never expires
    under it; `heartbeat=0` disables the heartbeat (used by tests to
    simulate a crashed holder, and by callers that prefer a hard lease).
    """

    def __init__(
        self, path: str | Path, ttl: float = 60.0, heartbeat: float | None = None
    ):
        self.path = Path(path)
        self.ttl = ttl
        self._hb_interval = ttl / 4.0 if heartbeat is None else heartbeat
        self._held = False
        self._token: str | None = None
        self._hb_stop: threading.Event | None = None
        self._hb_thread: threading.Thread | None = None

    def _is_stale(self) -> bool:
        try:
            return (time.time() - self.path.stat().st_mtime) > self.ttl
        except FileNotFoundError:
            return False

    def _owner_token(self) -> str | None:
        """Token currently recorded in the lock file (None if absent)."""
        try:
            parts = self.path.read_text().split()
            return parts[-1] if parts else None
        except (FileNotFoundError, OSError):
            return None

    def held_elsewhere(self) -> bool:
        """True when a live (non-stale) owner other than us holds it."""
        return (not self._held) and self.path.exists() and not self._is_stale()

    def still_held(self) -> bool:
        """Re-verify ownership: the lock file still carries OUR token.

        A commit should call this immediately before its publish step —
        if a pathological stall (> ttl with the heartbeat also frozen,
        e.g. SIGSTOP) let a contender steal the lock, the commit must
        abort rather than race the thief."""
        return self._held and self._owner_token() == self._token

    def _heartbeat_loop(self, stop: threading.Event, interval: float) -> None:
        misses = 0
        while not stop.wait(interval):
            try:
                os.utime(self.path)
                misses = 0
            except FileNotFoundError:
                # transiently absent ≠ stolen: another holder's release
                # momentarily renames our live lock away before
                # restoring it (see release) — giving up on the first
                # miss would freeze our mtime and let a third party
                # steal a live lock after ttl. Persist a few beats.
                misses += 1
                if misses >= 3:
                    return  # genuinely stolen or released
            except OSError:
                return

    def _sweep_debris(self) -> None:
        """Reclaim abandoned rename artifacts (`<lock>.stale.<uuid>`
        from steals, `<lock>.rel.<uuid>` from crashed releases) older
        than ttl. Runs only while WE hold the lock, so no live
        contender's in-flight rename can be this old; unbounded debris
        would otherwise inflate every directory listing forever."""
        try:
            now = time.time()
            # rename artifacts come from with_suffix, which REPLACES
            # the lock's last suffix: <stem>.stale.<uuid> / .rel.<uuid>
            stem = self.path.stem
            for p in self.path.parent.iterdir():
                name = p.name
                if not name.startswith(stem + "."):
                    continue
                rest = name[len(stem) + 1 :]
                if not (rest.startswith("stale.") or rest.startswith("rel.")):
                    continue
                try:
                    if (now - p.stat().st_mtime) > self.ttl:
                        p.unlink(missing_ok=True)
                except OSError:
                    pass
        except OSError:
            pass

    def acquire(self, timeout: float = 120.0) -> None:
        deadline = time.time() + timeout
        token = uuid.uuid4().hex
        while True:
            try:
                fd = os.open(
                    self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY
                )
                os.write(fd, f"{os.getpid()} {token}\n".encode())
                os.close(fd)
                self._held = True
                self._token = token
                self._sweep_debris()
                if self._hb_interval > 0:
                    self._hb_stop = threading.Event()
                    self._hb_thread = threading.Thread(
                        target=self._heartbeat_loop,
                        args=(self._hb_stop, self._hb_interval),
                        daemon=True,
                    )
                    self._hb_thread.start()
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
        # Atomic-for-one-contender release (ADVICE r6): rename the lock
        # to a unique name FIRST — exactly one party can move the path,
        # so the read-token/delete pair below cannot interleave with a
        # steal the way a check-then-act on the live path could (a
        # steal landing between token read and unlink used to delete
        # the THIEF's lock). Verify the moved file carries OUR token:
        # ours → delete it; a thief's (we stalled past ttl and were
        # stolen) → put it back. The heartbeat keeps running until the
        # rename so our mtime never goes stale mid-release. Residual
        # window: restoring a thief's lock could overwrite a THIRD
        # contender's — strictly narrower than the old unlink race and
        # requires two stales in microseconds.
        if self._held:
            self._held = False
            moved: Path | None = self.path.with_suffix(
                f".rel.{uuid.uuid4().hex}"
            )
            try:
                self.path.rename(moved)
            except FileNotFoundError:
                moved = None  # stolen after we went stale — nothing left
            if moved is not None:
                try:
                    parts = moved.read_text().split()
                    tok = parts[-1] if parts else None
                except OSError:
                    tok = None
                if tok == self._token:
                    moved.unlink(missing_ok=True)
                else:
                    try:  # we moved a thief's live lock — restore it
                        moved.rename(self.path)
                    except OSError:
                        moved.unlink(missing_ok=True)
            self._token = None
        if self._hb_stop is not None:
            self._hb_stop.set()
            if self._hb_thread is not None:
                self._hb_thread.join(timeout=5.0)
            self._hb_stop = self._hb_thread = None

    def __enter__(self) -> "FileLock":
        self.acquire()
        return self

    def __exit__(self, *exc) -> None:
        self.release()
