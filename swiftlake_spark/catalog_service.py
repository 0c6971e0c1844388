"""Catalog-service commit protocol (CAS pointer swap).

≙ how the reference actually commits in production: it hands its Iceberg
tables to a transactional catalog (Glue / JDBC — reference
README.md:100-118 and the MyBatis-backed catalog wiring), where the
table's current-metadata POINTER lives in the catalog service and a
commit is an atomic compare-and-swap of that pointer.  The storage then
needs NO conditional put at all: metadata files get unique names, any
writer may upload freely, and the CAS decides the winner.

This module provides the seam plus an in-process implementation with
exactly those semantics.  A real Glue/JDBC/REST-catalog backend is one
subclass: ``current`` = GetTable, ``register`` = CreateTable (fails on
exists), ``cas`` = UpdateTable with an expected-value precondition
(Glue ``VersionId``, JDBC ``UPDATE … WHERE metadata_location = ?``).

Tables opt in via the table property ``commit.protocol = catalog-cas``
(default remains the storage-claim protocol, fileio.try_claim).  The
two protocols are both exercised by tests/test_fileio.py.
"""

from __future__ import annotations

import threading


class CatalogCommitService:
    """Table-pointer authority.  Keys are table LOCATIONS (stable,
    backend-independent); values are metadata file names relative to the
    table's metadata/ directory."""

    def current(self, table_key: str) -> str | None:
        raise NotImplementedError

    def register(self, table_key: str, pointer: str) -> None:
        """Create the pointer; raises FileExistsError if the table is
        already registered (the create-table race)."""
        raise NotImplementedError

    def cas(self, table_key: str, expected: str | None, new: str) -> bool:
        """Atomically swap pointer expected→new; False on mismatch (a
        concurrent committer won)."""
        raise NotImplementedError

    def drop(self, table_key: str) -> None:
        raise NotImplementedError


class MemoryCatalogCommitService(CatalogCommitService):
    def __init__(self) -> None:
        self._pointers: dict[str, str] = {}
        self._lock = threading.Lock()

    def current(self, table_key: str) -> str | None:
        with self._lock:
            return self._pointers.get(table_key)

    def register(self, table_key: str, pointer: str) -> None:
        with self._lock:
            if table_key in self._pointers:
                raise FileExistsError(table_key)
            self._pointers[table_key] = pointer

    def cas(self, table_key: str, expected: str | None, new: str) -> bool:
        with self._lock:
            cur = self._pointers.get(table_key)
            # strict precondition semantics, like a conforming backend
            # (Glue VersionId / JDBC UPDATE … WHERE metadata_location=?):
            # no row → fail; creation goes through register()
            if cur is None or cur != expected:
                return False
            self._pointers[table_key] = new
            return True

    def drop(self, table_key: str) -> None:
        with self._lock:
            self._pointers.pop(table_key, None)


# Process-default service — a deployment would install its Glue/JDBC
# implementation here at engine startup.
_DEFAULT = MemoryCatalogCommitService()


def default_catalog_service() -> CatalogCommitService:
    return _DEFAULT


def set_default_catalog_service(svc: CatalogCommitService) -> CatalogCommitService:
    global _DEFAULT
    prev, _DEFAULT = _DEFAULT, svc
    return prev
