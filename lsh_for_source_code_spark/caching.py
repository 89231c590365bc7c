"""Session-lifetime cache registry (ADVICE r1: persist leaks).

Operators persist fan-out intermediates (shingled/signed feature tables, the
tagged bucket table) because Catalyst otherwise duplicates the whole upstream
subtree per consumer. Those caches must not outlive the query that created
them in a long-lived session: `track()` registers every such persist and
`release_all()` unpersists them once the caller has materialized its result
(bench loop, pipeline store, tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ACTIVE: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Register a persisted DataFrame for later release; returns it."""
    _ACTIVE.append(df)
    return df


def release_all() -> int:
    """Unpersist every tracked DataFrame (non-blocking); returns the count."""
    n = len(_ACTIVE)
    for df in _ACTIVE:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped
    _ACTIVE.clear()
    return n
