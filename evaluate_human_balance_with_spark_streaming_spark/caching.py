"""Session-scoped persist lifecycle management.

Several operators persist intermediate DataFrames as deliberate
optimization barriers (e.g. the MinHash shingle table — see
operators/dedup.py::with_shingles for the measured 21× CollapseProject
trap). Those caches must outlive plan construction (the driver
evaluates the returned DataFrame later), so the operator cannot
unpersist them itself — but across a 60-query correctness/bench
session they would otherwise accumulate until LRU eviction churns.

``managed_persist`` registers each cache in a session-global list;
``release_managed`` (called by the query wrapper in __spark_entry__
before each new query, and by bench.py between queries) frees every
cache belonging to ALREADY-EVALUATED earlier queries. At 100 TB the
same role is played by materialized intermediate tables with explicit
lifecycle (drop after the consuming stage).

CONTRACT: build-then-evaluate, one query at a time. release_managed
assumes every previously returned DataFrame has been evaluated; a
caller that builds several plans before collecting the first would
have the first plan's barriers unpersisted under it (correct results,
but the guarded recompute returns — e.g. the 21× CollapseProject
trap). Library users driving operators directly (notebooks) should
either evaluate each plan before building the next or own the persist
lifecycle themselves and skip release_managed entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_MANAGED: list[DataFrame] = []
_CALLBACKS: list = []


def managed_persist(df: DataFrame) -> DataFrame:
    """persist() a DataFrame and track it for deferred release."""
    out = df.persist()
    _MANAGED.append(out)
    return out


def on_release(fn) -> None:
    """Register a zero-arg cleanup callback to run at the next
    ``release_managed`` sweep — for non-persist resources with the same
    deferred lifecycle (memory-sink tables, throwaway checkpoint dirs
    in streaming/runner.py)."""
    _CALLBACKS.append(fn)


def managed_mark() -> tuple[list, list]:
    """Identity snapshot of the managed-resource registries, for a
    SCOPED release: a caller that registers resources mid-flight (e.g.
    the bench's streaming calibration probe, which runs between a
    built suite's queries) can free only what IT registered with
    ``release_managed_since(mark)`` instead of sweeping every pending
    barrier process-wide — the silent-recompute trap ADVICE r06
    flagged for any caller with built-but-unevaluated plans pending.

    The snapshot holds the entries themselves, not registry lengths
    (ADVICE r07): a length-based mark assumed strict LIFO discipline,
    so a full ``release_managed`` between mark and scoped release made
    the mark stale — the scoped caller's own entries silently escaped
    release, and a later registrant could be swept by the marker. With
    an identity snapshot a stale mark degrades safely: exactly the
    entries NOT in the snapshot are released, wherever they sit. An
    entry registered both before and after the mark is treated as
    pre-mark (left for its owner — the safe direction)."""
    return (list(_MANAGED), list(_CALLBACKS))


def release_managed_since(mark: tuple[list, list], blocking: bool = False) -> int:
    """Release only the caches/callbacks NOT present (by identity) in
    the ``managed_mark`` snapshot — i.e. those registered after it.
    Snapshot entries are left untouched, in order, for the owning
    queries' own release_managed sweep. Returns the number of caches
    released."""
    # Release FIRST, then drop the released entries from the registry
    # in one slice assignment (review finding): a pop-then-re-extend
    # shape would lose every already-popped keeper if a BaseException
    # (Ctrl-C in a blocked py4j call) escaped mid-loop — pre-mark
    # persist barriers would vanish from tracking and pin executor
    # memory for the session's life. With this ordering an interrupt
    # leaves the registry intact: already-released entries are still
    # listed (re-releasing is harmless — unpersist is safe on
    # unpersisted frames, and the cleanup callbacks swallow their own
    # double-run errors), and nothing is ever untracked unreleased.
    snap_m, snap_c = mark
    n = 0
    for df in reversed(list(_MANAGED)):  # LIFO, like release order always was
        if any(df is s for s in snap_m):
            continue
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:
            pass
    _MANAGED[:] = [df for df in _MANAGED if any(df is s for s in snap_m)]
    for fn in reversed(list(_CALLBACKS)):
        if any(fn is s for s in snap_c):
            continue
        try:
            fn()
        except Exception:
            pass
    _CALLBACKS[:] = [fn for fn in _CALLBACKS if any(fn is s for s in snap_c)]
    return n


def release_managed(blocking: bool = False) -> int:
    """Unpersist every tracked cache (safe on never-materialized or
    already-unpersisted frames) and run registered cleanup callbacks.
    Returns the number of caches released."""
    return release_managed_since(([], []), blocking)
