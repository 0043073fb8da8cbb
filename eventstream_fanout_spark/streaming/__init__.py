"""Streaming subpackage.  One shared guard lives here because every
sim drains availableNow streams the same way."""

from __future__ import annotations


def await_or_raise(query, timeout_s: int = 300) -> None:
    """``awaitTermination`` returns False on timeout instead of
    raising, so a slow drain would let the caller read a
    partially-written store and fail much later as an inexplicable
    hash mismatch (or worse, pass with stale data).  Fail loudly at
    the stream instead."""
    if not query.awaitTermination(timeout_s):
        query.stop()
        raise RuntimeError(
            f"streaming query {query.name or query.id} did not "
            f"terminate within {timeout_s}s"
        )
