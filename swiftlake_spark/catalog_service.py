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


class HttpCatalogCommitService(CatalogCommitService):
    """Pointer authority over an S3-compatible HTTP object store — the
    network-boundary twin of HttpFileIO (≙ the reference's Glue/JDBC
    catalog wiring, README.md:100-118, where a commit is an atomic
    pointer swap with a precondition).

    Each table's pointer lives at ``<base>/<prefix>/<quoted table key>``:

    - ``register`` = conditional create (``If-None-Match: *`` → 412 on
      the create-table race);
    - ``cas`` = read the pointer WITH its ETag, verify the content
      equals the caller's expected value, then PUT ``If-Match: <etag>``
      — the store checks the precondition atomically, so two racers
      from the same basis get exactly one 200 and one 412.  (Glue's
      VersionId / a JDBC ``UPDATE … WHERE metadata_location = ?`` are
      the same shape; S3 conditional writes support If-Match natively.)

    Stdlib urllib only; auth (SigV4, bearer) is a ``_request`` override
    in a subclass, mirroring HttpFileIO's seam.
    """

    def __init__(self, base_url: str, prefix: str = "__catalog__") -> None:
        self._base = base_url.rstrip("/")
        self._prefix = prefix.strip("/")

    # -- transport (override point for auth) ----------------------------
    def _request(self, method: str, url: str, data: bytes | None = None,
                 headers: dict | None = None):
        import urllib.error
        import urllib.request

        req = urllib.request.Request(
            url, data=data, method=method, headers=headers or {}
        )
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                return resp.status, dict(resp.headers), resp.read()
        except urllib.error.HTTPError as e:
            return e.code, dict(e.headers or {}), b""

    def _url(self, table_key: str) -> str:
        import urllib.parse

        return (self._base + "/" + self._prefix + "/"
                + urllib.parse.quote(table_key, safe=""))

    # -- CatalogCommitService -------------------------------------------
    def current(self, table_key: str) -> str | None:
        status, _h, body = self._request("GET", self._url(table_key))
        return body.decode("utf-8") if status == 200 else None

    def _current_with_etag(self, table_key: str):
        status, h, body = self._request("GET", self._url(table_key))
        if status != 200:
            return None, None
        etag = {k.lower(): v for k, v in h.items()}.get("etag")
        return body.decode("utf-8"), etag

    def register(self, table_key: str, pointer: str) -> None:
        status, _h, _b = self._request(
            "PUT", self._url(table_key), pointer.encode("utf-8"),
            {"If-None-Match": "*"},
        )
        if status == 412:
            raise FileExistsError(table_key)
        if status >= 300:
            raise IOError(f"catalog register failed: HTTP {status}")

    def cas(self, table_key: str, expected: str | None, new: str) -> bool:
        cur, etag = self._current_with_etag(table_key)
        if cur is None or etag is None or cur != expected:
            return False
        status, _h, _b = self._request(
            "PUT", self._url(table_key), new.encode("utf-8"),
            {"If-Match": etag},
        )
        return status == 200

    def drop(self, table_key: str) -> None:
        self._request("DELETE", self._url(table_key))


# Process-default service — a deployment would install its Glue/JDBC
# implementation here at engine startup.
_DEFAULT = MemoryCatalogCommitService()


def default_catalog_service() -> CatalogCommitService:
    return _DEFAULT


def set_default_catalog_service(svc: CatalogCommitService) -> CatalogCommitService:
    global _DEFAULT
    prev, _DEFAULT = _DEFAULT, svc
    return prev
