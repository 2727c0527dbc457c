"""Loud drain for availableNow streaming queries.

Every store-drain helper used to end with a bare
``q.awaitTermination(N)`` — which RETURNS FALSE and keeps the query
running when the drain outlives N seconds.  At fixture scale that was
invisible; at the 100x-clone probe (~90 s per batch) the curation
drain silently returned after 3 of 6 batches, the caller read
half-drained stores, and the kill/resume and compaction equality
checks "failed" while the underlying stores were exactly right once
the background drain finished (STREAM_SCALE_r09 finding).  A
truncated drain must be an ERROR, never a silent partial return.
"""

from __future__ import annotations

DRAIN_TIMEOUT_S = 3600.0


def drain(q, timeout: float | None = None):
    """Block until the availableNow query terminates; raise on timeout
    (default DRAIN_TIMEOUT_S) instead of returning with the query still
    running.  Re-raises the query's own exception via awaitTermination
    if the stream failed."""
    limit = DRAIN_TIMEOUT_S if timeout is None else timeout
    if not q.awaitTermination(limit):
        q.stop()
        raise TimeoutError(
            f"streaming drain '{q.name}' still running after {limit}s — "
            "refusing to return a half-drained store (raise the timeout "
            "for genuinely longer drains)")
    return q
