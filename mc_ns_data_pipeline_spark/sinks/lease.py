"""Single-writer lease for staged-swap table sinks.

The reference gets per-file transactions from PostgreSQL
(file_processor.py:111 — every upsert rides a DB transaction). The
Spark-native sinks emulate MERGE/compact with staged-directory renames
(sinks/upsert.py, sinks/layout.py): crash-safe for ONE writer, but two
pipelines landing on the same table could interleave their
read-stage-swap cycles and silently lose one writer's rows (the last
swap wins over a merge that never saw the other's output).

This module makes the single-writer assumption ENFORCED instead of
implicit: an `O_CREAT | O_EXCL` lease file beside the table — atomic
on POSIX filesystems — held for the duration of the mutation. A second
writer fails fast with `TableLockedError` (naming the holder) rather
than corrupting; a lease whose holder crashed is reclaimed after its
TTL expires.

Scope honesty: this is local/NFS-filesystem advisory locking, matching
the sinks' own staged-rename reliance on atomic `os.rename`. On an
object store neither holds — there the Delta/Iceberg branch of
`merge_upsert` (a real transaction log) is the answer, and this lease
is simply unused.
"""

from __future__ import annotations

import json
import os
import socket
import threading
import time
import uuid
from contextlib import contextmanager

DEFAULT_TTL_S = 3600.0

#: Heartbeat cadence as a fraction of the TTL (bounded below/above in
#: `_heartbeat_interval`): a LIVE holder refreshes its lease mtime well
#: inside the TTL, so mutations longer than ttl_s (compact/merge on big
#: tables) are never evicted mid-write — only holders that stopped
#: beating (crash, SIGKILL, host death) age out.
_HEARTBEAT_FRACTION = 0.25


def _heartbeat_interval(ttl_s: float) -> float:
    return max(0.02, min(ttl_s * _HEARTBEAT_FRACTION, 60.0))


#: Hard cap on the pid-alive override: a live-but-not-beating holder
#: (SIGSTOP, wedged JVM, deadlock) keeps its lease only this many TTLs
#: past staleness before eviction. Keeps the override from removing the
#: guaranteed-progress property TTL exists to provide — a hung writer
#: blocks other writers for a bounded window, not forever.
_PID_ALIVE_GRACE_TTLS = 4.0


def _pid_start(pid: int) -> str | None:
    """Kernel start time of `pid` (clock ticks since boot, field 22 of
    /proc/<pid>/stat), or None where /proc is unavailable. (pid,
    start-time) names a process INCARNATION: a recycled pid gets a new
    start time, so a crashed writer's lease is never kept alive by the
    unrelated process that inherited its pid."""
    try:
        with open(f"/proc/{pid}/stat", "rb") as fh:
            data = fh.read()
        # comm (field 2) may contain spaces/parens — split after the
        # LAST ')': remaining fields start at 3, so starttime is
        # index 22 - 3 = 19.
        return data.rsplit(b")", 1)[1].split()[19].decode()
    except (OSError, IndexError):
        return None


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else
    except OSError:
        return False


class TableLockedError(RuntimeError):
    """Another writer holds the table lease (fail fast, don't corrupt)."""


def _lease_path(path: str) -> str:
    return f"{path.rstrip('/')}__lease"


def read_lease(path: str) -> dict | None:
    """The current lease record, or None (missing or unreadable —
    an unreadable/partial lease is treated as held until its TTL
    passes, erring on the safe side)."""
    try:
        with open(_lease_path(path)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return None
    except (json.JSONDecodeError, OSError):
        return {}


def _is_expired(lease_file: str, record: dict, now: float) -> bool:
    ttl = float(record.get("ttl_s", DEFAULT_TTL_S) or DEFAULT_TTL_S)
    try:
        age = now - os.stat(lease_file).st_mtime
    except FileNotFoundError:
        return False  # released between read and stat: not ours to reap
    if age <= ttl:
        return False
    # mtime-stale. The holder's heartbeat normally keeps mtime fresh,
    # so staleness means crash/SIGKILL — but a SIGSTOPped or
    # GC-paused same-host holder also stops beating, and evicting a
    # LIVE writer re-admits exactly the two-writer corruption the
    # lease exists to prevent. Keep the lease only when the recorded
    # pid is verifiably the SAME INCARNATION on THIS host (start-time
    # match rules out recycled pids), and only up to a bounded grace
    # window — past _PID_ALIVE_GRACE_TTLS x ttl a wedged holder is
    # evicted so TTL remains the guaranteed-progress backstop.
    pid = record.get("pid")
    if (record.get("host") == socket.gethostname()
            and isinstance(pid, int) and _pid_alive(pid)):
        recorded_start = record.get("pid_start")
        live_start = _pid_start(pid)
        same_incarnation = (recorded_start is None
                            or live_start is None
                            or recorded_start == live_start)
        if same_incarnation and age <= ttl * _PID_ALIVE_GRACE_TTLS:
            return False
    return True


@contextmanager
def table_lease(path: str, owner: str | None = None,
                ttl_s: float = DEFAULT_TTL_S, wait_s: float = 0.0,
                poll_s: float = 0.2):
    """Hold the exclusive writer lease for `path`'s mutation window.

    * acquisition is `O_CREAT | O_EXCL` — exactly one writer wins;
    * a live lease makes the second writer raise `TableLockedError`
      immediately (or after polling up to `wait_s`);
    * the holder HEARTBEATS: a daemon thread refreshes the lease
      mtime every `ttl_s/4` (≤60 s), so a mutation outlasting its TTL
      keeps its lease — only holders that stopped beating age out;
    * a lease older than its own declared TTL is reclaimed unless its
      recorded (pid, pid start-time) is a live same-host process
      incarnation — and even then only for a bounded grace window
      (`_PID_ALIVE_GRACE_TTLS` x ttl), so a wedged holder is eventually
      evicted and a recycled pid never inherits a dead writer's lease.
      Reclaim renames the stale file aside (itself atomic — only one
      reclaimer wins the rename) and acquisition retries;
    * release only removes the lease THIS acquisition created (token
      check), so a crashed-then-reclaimed writer cannot release the
      reclaimer's lease.
    """
    lease_file = _lease_path(path)
    os.makedirs(os.path.dirname(os.path.abspath(lease_file)),
                exist_ok=True)
    token = uuid.uuid4().hex
    record = {
        "owner": owner or f"pid-{os.getpid()}",
        "pid": os.getpid(),
        "pid_start": _pid_start(os.getpid()),
        "host": socket.gethostname(),
        "token": token,
        "ttl_s": ttl_s,
    }
    deadline = time.monotonic() + wait_s
    while True:
        try:
            fd = os.open(lease_file, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            with os.fdopen(fd, "w") as fh:
                json.dump(record, fh)
            break
        except FileExistsError:
            now = time.time()
            current = read_lease(path)
            if current is not None and _is_expired(lease_file, current,
                                                  now):
                # reclaim: atomic rename-aside; the loser of the race
                # just finds the file gone and retries the O_EXCL create
                try:
                    os.rename(lease_file, f"{lease_file}.stale.{token}")
                    os.remove(f"{lease_file}.stale.{token}")
                except FileNotFoundError:
                    pass
                continue
            if time.monotonic() >= deadline:
                holder = (current or {}).get("owner", "unknown")
                raise TableLockedError(
                    f"table {path} is being written by {holder!r} "
                    f"(lease {lease_file}); concurrent staged-swap "
                    "writes would corrupt — retry later or raise "
                    "wait_s"
                ) from None
            time.sleep(poll_s)
    stop = threading.Event()

    def _beat():
        # Refresh mtime only while the lease is still OURS: after a
        # (pathological) reclaim, touching the file would silently
        # extend the reclaimer's lease.
        while not stop.wait(_heartbeat_interval(ttl_s)):
            current = read_lease(path)
            if not current or current.get("token") != token:
                return
            try:
                os.utime(lease_file, None)
            except OSError:
                return

    beat = threading.Thread(target=_beat, name="table-lease-heartbeat",
                            daemon=True)
    beat.start()
    try:
        yield record
    finally:
        stop.set()
        beat.join(timeout=2.0)
        current = read_lease(path)
        if current and current.get("token") == token:
            try:
                os.remove(lease_file)
            except FileNotFoundError:
                pass
