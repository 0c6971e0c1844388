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


def pointer_snapshot_id(pointer: str) -> int:
    """Deterministic positive int64 identity for a metadata pointer name
    — the "snapshot id" the REST commit's ``assert-ref-snapshot-id``
    requirement tracks.  A real Iceberg deployment asserts the snapshot
    ids recorded inside its metadata files; this engine's metadata
    versions map 1:1 to commits, so the (unique, uuid-suffixed) pointer
    name itself is the commit identity and its hash is a stable id both
    committer and catalog agree on without parsing metadata."""
    import hashlib

    return int.from_bytes(
        hashlib.sha256(pointer.encode("utf-8")).digest()[:8], "big"
    ) >> 1


class RestCatalogCommitService(CatalogCommitService):
    """Pointer authority speaking the public Iceberg REST catalog shape
    (the iceberg REST OpenAPI: ``GET  /v1/namespaces/{ns}/tables/{t}``
    load-table, ``POST /v1/namespaces/{ns}/register`` register-table,
    ``POST /v1/namespaces/{ns}/tables/{t}`` commit-with-requirements,
    ``DELETE`` drop-table).  ≙ the reference's production catalog wiring
    (README.md:100-118 — its Iceberg tables commit through a
    transactional catalog); this is the standard-protocol twin of the
    bespoke HttpCatalogCommitService above.

    Mapping onto the commit-service seam (table keys are LOCATIONS):

    - the table identifier is the location, URL-quoted, under one
      configurable namespace;
    - ``current`` = load-table → basename of ``metadata-location``;
    - ``register`` = register-table (409 AlreadyExists → the
      create-table race) followed by a ref-seeding commit whose
      requirement asserts the ``main`` ref does NOT exist yet
      (``snapshot-id: null`` — the spec's assert-for-absent-ref form);
    - ``cas`` = commit-with-requirements: ``assert-ref-snapshot-id`` on
      ``main`` for the EXPECTED pointer's id, updates
      ``set-snapshot-ref`` (main → new pointer's id) and
      ``set-properties`` carrying the new metadata location.  The
      server checks requirements atomically and answers 409
      CommitFailedException when a concurrent committer won — exactly
      Glue VersionId / JDBC ``WHERE metadata_location = ?`` semantics
      over the standard wire shape.

    If the seeding commit is lost to a crash between the two register
    calls, the next ``cas`` self-heals: on 409 it re-loads the table and,
    when ``main`` is absent but ``metadata-location`` still names the
    expected pointer, retries with the absent-ref requirement.

    Stdlib urllib only; auth is either a bearer ``token`` (sent as
    ``Authorization: Bearer …``, the REST catalog's OAuth shape) or a
    ``_request`` override in a subclass (SigV4), mirroring HttpFileIO's
    seam."""

    def __init__(self, base_url: str, namespace: str = "swiftlake",
                 token: str | None = None) -> None:
        self._base = base_url.rstrip("/")
        self._ns = namespace
        self._token = token

    # -- transport (override point for auth) ----------------------------
    def _request(self, method: str, url: str, data: bytes | None = None,
                 headers: dict | None = None):
        import urllib.error
        import urllib.request

        hdrs = dict(headers or {})
        if self._token:
            hdrs["Authorization"] = f"Bearer {self._token}"
        req = urllib.request.Request(url, data=data, method=method,
                                     headers=hdrs)
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                return resp.status, dict(resp.headers), resp.read()
        except urllib.error.HTTPError as e:
            return e.code, dict(e.headers or {}), e.read() if e.fp else b""

    # -- REST plumbing ---------------------------------------------------
    def _ident(self, table_key: str) -> str:
        import urllib.parse

        return urllib.parse.quote(table_key, safe="")

    def _table_url(self, table_key: str) -> str:
        return (f"{self._base}/v1/namespaces/{self._ns}/tables/"
                f"{self._ident(table_key)}")

    def _load(self, table_key: str) -> dict | None:
        import json

        status, _h, body = self._request("GET", self._table_url(table_key))
        if status != 200:
            return None
        return json.loads(body.decode("utf-8"))

    def _metadata_location(self, table_key: str, pointer: str) -> str:
        return table_key.rstrip("/") + "/metadata/" + pointer

    def _commit(self, table_key: str, requirements: list,
                updates: list) -> int:
        import json

        body = json.dumps({
            "identifier": {"namespace": [self._ns], "name": table_key},
            "requirements": requirements,
            "updates": updates,
        }).encode("utf-8")
        status, _h, _b = self._request(
            "POST", self._table_url(table_key), body,
            {"Content-Type": "application/json"},
        )
        return status

    @staticmethod
    def _ref_update(pointer: str) -> dict:
        return {"action": "set-snapshot-ref", "ref-name": "main",
                "type": "branch",
                "snapshot-id": pointer_snapshot_id(pointer)}

    def _pointer_updates(self, table_key: str, pointer: str) -> list:
        return [
            self._ref_update(pointer),
            {"action": "set-properties", "updates": {
                "swiftlake.metadata-location":
                    self._metadata_location(table_key, pointer),
            }},
        ]

    # -- CatalogCommitService -------------------------------------------
    def current(self, table_key: str) -> str | None:
        doc = self._load(table_key)
        if not doc:
            return None
        loc = doc.get("metadata-location")
        return loc.rsplit("/", 1)[-1] if loc else None

    def register(self, table_key: str, pointer: str) -> None:
        import json

        body = json.dumps({
            "name": table_key,
            "metadata-location": self._metadata_location(table_key, pointer),
        }).encode("utf-8")
        status, _h, _b = self._request(
            "POST", f"{self._base}/v1/namespaces/{self._ns}/register",
            body, {"Content-Type": "application/json"},
        )
        if status == 409:
            raise FileExistsError(table_key)
        if status >= 300:
            raise IOError(f"catalog register failed: HTTP {status}")
        # seed the main ref (requirement: the ref must not exist yet)
        st = self._commit(
            table_key,
            [{"type": "assert-ref-snapshot-id", "ref": "main",
              "snapshot-id": None}],
            [self._ref_update(pointer)],
        )
        if st == 409:
            # a crashed earlier attempt already seeded — idempotent iff
            # the ref matches this pointer
            doc = self._load(table_key) or {}
            refs = (doc.get("metadata") or {}).get("refs") or {}
            main = (refs.get("main") or {}).get("snapshot-id")
            if main != pointer_snapshot_id(pointer):
                raise IOError(
                    f"catalog ref seeded with a different pointer: {table_key}"
                )
        elif st >= 300:
            raise IOError(f"catalog ref seeding failed: HTTP {st}")

    def cas(self, table_key: str, expected: str | None, new: str) -> bool:
        if expected is None:
            return False  # creation goes through register()
        updates = self._pointer_updates(table_key, new)
        st = self._commit(
            table_key,
            [{"type": "assert-ref-snapshot-id", "ref": "main",
              "snapshot-id": pointer_snapshot_id(expected)}],
            updates,
        )
        if st == 200:
            return True
        if st == 409:
            # seeding-gap recovery: registered, ref never set, pointer
            # still the expected one → claim via the absent-ref form
            doc = self._load(table_key)
            if doc:
                refs = (doc.get("metadata") or {}).get("refs") or {}
                loc = doc.get("metadata-location") or ""
                if "main" not in refs and loc.rsplit("/", 1)[-1] == expected:
                    return self._commit(
                        table_key,
                        [{"type": "assert-ref-snapshot-id", "ref": "main",
                          "snapshot-id": None}],
                        updates,
                    ) == 200
            return False
        if st == 404:
            return False
        raise IOError(f"catalog commit failed: HTTP {st}")

    def drop(self, table_key: str) -> None:
        self._request("DELETE", self._table_url(table_key))


# Process-default service — a deployment would install its Glue/JDBC
# implementation here at engine startup.
_DEFAULT = MemoryCatalogCommitService()


def default_catalog_service() -> CatalogCommitService:
    return _DEFAULT


def set_default_catalog_service(svc: CatalogCommitService) -> CatalogCommitService:
    global _DEFAULT
    prev, _DEFAULT = _DEFAULT, svc
    return prev
