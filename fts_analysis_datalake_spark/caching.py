"""Session-scoped lifecycle for operator-internal ``persist()`` calls.

Several operators cache an intermediate that feeds both sides of a
self-join (MinHash signatures, shingle sets, SRP band tables): the
persist cannot be released inside the operator — the returned plan is
lazy and still references the cached blocks — but leaving it to an
ambient ``spark.catalog.clearCache()`` makes composed/library use leak
cached RDDs for the session lifetime (e.g. a leakage audit calling
exact_jaccard_for_pairs inside a larger plan).

This module is the single owner of that lifecycle:

- operators call :func:`tracked_persist` instead of ``df.persist()``;
- whoever MATERIALIZES the result (bench loop, driver harness, test
  fixture, a composing query) calls :func:`release_tracked` once the
  action finishes.

``release_tracked`` unpersists exactly what this library persisted —
unlike ``clearCache`` it cannot evict caches the embedding application
manages itself, so it is safe to call from library code.

At 100 TB the same contract holds: executor storage memory is
reclaimed per query instead of accreting until eviction pressure
causes recomputation mid-plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` registered for later :func:`release_tracked`."""
    out = df.persist()
    _TRACKED.append(out)
    return out


def release_tracked() -> int:
    """Unpersist every tracked DataFrame (blocking=False); returns the
    number released. Idempotent; safe when nothing is tracked."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # noqa: BLE001 — a dead session must not mask cleanup
            pass
    return n
