"""TTL'd file leases: cross-process one-writer claims over a shared
filesystem — the crash-safe analog of the reference's TTL'd
pending-operations table (`ChannelMetaDataDAOImpl.java:2124-2144`).

Used by the decimation edge writer (`plans/jobs.py`, one writer per
(store, target) edge) and the pair-table maintenance stream
(`sources/pair_store.py`, one maintainer per (doc table, view) at a
time — round-11 review: without it, two concurrent streams silently
miss every cross-stream A-batch x B-batch pair).

Protocol (all steps atomic-exclusive renames through
:meth:`HadoopFS.rename_no_overwrite`):

* ACQUIRE: write a holder id to a hidden temp file, exclusive-rename it
  onto the lease path. Failure means a lease exists.
* STALE BREAK: a lease older than the TTL is broken by an atomic
  ELECTION — every breaker that observed the same stale lease renames
  it onto the same mtime-derived tombstone; exclusive rename lets
  exactly one win, so racing breakers can never both acquire. The
  tombstone is kept (touched to break time) so a long-paused breaker
  cannot re-break a NEWER lease with a recycled name; expired
  tombstones are swept by later successful acquirers. Residual window:
  a breaker crashing between its break and its claim AND the sweep AND
  a re-break all landing inside another breaker's pause — two
  independent crashes.
* RELEASE: delete only if the lease still carries our holder id (a
  breaker may have taken it from an over-TTL run).

A holder that runs longer than the TTL risks losing the lease to a
breaker — size ``ttl_s`` well above the slowest expected critical
section, or pass ``ttl_s <= 0`` to disable leasing entirely
(single-writer deployments).
"""

from __future__ import annotations

import contextlib
import os
import socket
import time
import uuid


class LeaseHeld(RuntimeError):
    """Another live holder owns the lease."""


@contextlib.contextmanager
def file_lease(
    fs,
    ldir: str,
    name: str,
    ttl_s: float,
    wait_s: float = 0.0,
    what: str = "lease",
):
    """Hold ``<ldir>/<name>.lease`` for the duration of the block.

    ``wait_s > 0``: instead of refusing immediately while another
    holder is live, retry roughly once a second until the deadline —
    the right mode for streaming maintainers, whose batches can simply
    queue behind a concurrent operator run. Refusal (or deadline) is a
    :class:`LeaseHeld`; ``ttl_s <= 0`` disables leasing."""
    if ttl_s <= 0:
        yield
        return
    deadline = time.time() + max(0.0, wait_s)
    while True:
        try:
            with _acquire_once(fs, ldir, name, ttl_s, what):
                yield
            return
        except LeaseHeld:
            if time.time() >= deadline:
                raise
            time.sleep(min(1.0, max(0.05, deadline - time.time())))


@contextlib.contextmanager
def _acquire_once(fs, ldir: str, name: str, ttl_s: float, what: str):
    path = f"{ldir}/{name}.lease"
    # cheap pre-probe (round-11 review): a waiting poller must not pay
    # the tmp-file create/rename/delete cycle just to discover the
    # lease is still live — two read RPCs answer the common case. The
    # authoritative decision is still the exclusive rename below.
    try:
        age0 = (time.time() * 1000 - fs.mtime_ms(path)) / 1000.0
    except Exception:  # noqa: BLE001 - absent: proceed to claim
        age0 = None
    if age0 is not None and age0 <= ttl_s:
        raise LeaseHeld(
            f"{what} is held by another writer "
            f"(lease age {age0:.0f}s <= ttl {ttl_s:.0f}s)"
        )
    holder = f"{socket.gethostname()}:{os.getpid()}:{uuid.uuid4().hex[:8]}"
    tmp = f"{ldir}/.tmp-lease-{uuid.uuid4().hex[:12]}"
    fs.mkdirs(ldir)
    fs.write_text(tmp, holder)
    acquired = False
    try:
        if not fs.rename_no_overwrite(tmp, path):
            # an existing lease: live, or a dead holder's leftovers?
            try:
                stale_mtime = fs.mtime_ms(path)
                age_s = (time.time() * 1000 - stale_mtime) / 1000.0
            except Exception:  # noqa: BLE001 - released between checks
                stale_mtime, age_s = None, None
            if age_s is not None and age_s <= ttl_s:
                raise LeaseHeld(
                    f"{what} is held by another writer "
                    f"(lease age {age_s:.0f}s <= ttl {ttl_s:.0f}s)"
                )
            if age_s is not None:
                # STALE: atomic breaker election (module docstring)
                tomb = f"{path}.break-{stale_mtime}"
                if not fs.rename_no_overwrite(path, tomb):
                    raise LeaseHeld(f"{what}: lost the stale-lease break race")
                # round-11 review, two hazards after winning the rename:
                # (a) the lease under `path` may no longer be the one we
                # observed — a release-and-reacquire in our pause window
                # put a FRESH lease there, and we just moved a live
                # holder aside: verify the moved file's mtime matches
                # the stale observation; (b) the tombstone must be
                # re-stamped to break time, or (carrying the stale
                # mtime) it is instantly sweep-eligible and its name
                # can be recycled by a paused second breaker. Either
                # failure => put the lease back and refuse.
                ok = False
                try:
                    if fs.mtime_ms(tomb) == stale_mtime:
                        fs.touch(tomb)
                        ok = True
                except Exception:  # noqa: BLE001
                    ok = False
                if not ok:
                    with contextlib.suppress(Exception):
                        fs.rename_no_overwrite(tomb, path)
                    raise LeaseHeld(
                        f"{what}: lease changed during the stale break"
                    )
            # (age_s None: the holder released between our claim and the
            # mtime read — the path is simply free now, claim it)
            if not fs.rename_no_overwrite(tmp, path):
                raise LeaseHeld(f"{what}: lost the stale-lease re-claim race")
        acquired = True
        # sweep expired break tombstones (bounded: one listdir; only a
        # crash between break and claim can strand one). Per-entry
        # suppression: a concurrent sweeper deleting an entry between
        # our listdir and mtime read must not abort the rest.
        with contextlib.suppress(Exception):
            now_ms = time.time() * 1000
            base = f"{name}.lease"
            entries = fs.listdir(ldir)
            for entry in entries:
                with contextlib.suppress(Exception):
                    if entry.startswith(f"{base}.break-") and (
                        now_ms - fs.mtime_ms(f"{ldir}/{entry}")
                        > ttl_s * 1000
                    ):
                        fs.delete(f"{ldir}/{entry}")
        yield
    finally:
        with contextlib.suppress(Exception):
            if fs.exists(tmp):
                fs.delete(tmp)
        if acquired:
            # release only if still ours: a breaker may have taken the
            # lease from an over-TTL run — deleting then would drop THE
            # BREAKER's claim (read-check-delete is not atomic; the
            # residual race needs a run to exceed the TTL *and* lose a
            # ms-scale window, and the documented contract is already
            # "size the TTL above the slowest run")
            with contextlib.suppress(Exception):
                if fs.read_text(path) == holder:
                    fs.delete(path)
