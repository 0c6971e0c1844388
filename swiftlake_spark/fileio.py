"""Storage seam (FileIO) for table metadata, manifests and file staging.

≙ reference ``FileIO`` + the S3 implementation
(aws/src/main/java/com/arcesium/swiftlake/aws/SwiftLakeS3FileIO.java:
109-117 — ``newInputFiles`` downloads remote objects into a local
staging directory before the engine touches them, and written files are
uploaded back).  The native format here routes every metadata/manifest
byte through this interface, so adding a real object-store backend is
one class, not a rewrite.

Backends:

- :class:`LocalFileIO` — plain filesystem.  Atomic claim =
  ``O_CREAT|O_EXCL`` (POSIX create-exclusive); atomic replace =
  ``os.replace``.
- :class:`MemoryFileIO` — in-process object-store fake with S3-like
  semantics: a flat key space, NO rename primitive, claim via
  conditional put (if-none-match) under a lock, and ``local_path``
  staging downloads for anything a JVM/Arrow reader must open (exactly
  the reference's S3 staging strategy).  Used by tests to prove the
  commit protocol and the Iceberg reader work without POSIX semantics.

Commit protocol per backend (documented here because correctness hangs
on it): the claim of ``v<N+1>.json`` must be *create-if-absent*.
Locally that is ``O_EXCL``.  On an object store it is a conditional put
(S3 ``If-None-Match: *``, GCS ``ifGenerationMatch=0``); stores without
conditional put need an external lock service — the reference leans on
Iceberg's catalog (JDBC/Glue) for the same reason.

Scheme dispatch: ``mem://<store>/<key>`` → a named in-process store;
``file://`` or bare paths → local.  Other schemes raise — honestly, not
silently.
"""

from __future__ import annotations

import os
import threading
import uuid
from typing import Any


class StorageError(IOError):
    pass


class FileIO:
    """Interface.  Paths are backend-native strings; directories are a
    convention (prefixes), not objects — mirrors object stores."""

    scheme: str = ""

    # -- reads
    def read_bytes(self, path: str) -> bytes:
        raise NotImplementedError

    def read_text(self, path: str) -> str:
        return self.read_bytes(path).decode("utf-8")

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def list(self, prefix: str) -> list[str]:
        """Immediate child names under a directory-ish prefix."""
        raise NotImplementedError

    def list_recursive(self, prefix: str) -> list[str]:
        """All file paths under ``prefix``, relative to it ('/'-joined)."""
        raise NotImplementedError

    def mtime(self, path: str) -> float:
        raise NotImplementedError

    # -- writes
    def write_bytes(self, path: str, data: bytes) -> None:
        """Create-or-replace (last writer wins)."""
        raise NotImplementedError

    def write_text(self, path: str, data: str) -> None:
        self.write_bytes(path, data.encode("utf-8"))

    def try_claim(self, path: str, data: str) -> None:
        """Atomic create-if-absent — THE commit primitive.  Raises
        FileExistsError when another writer already claimed ``path``."""
        raise NotImplementedError

    def replace_text(self, path: str, data: str) -> None:
        """Atomic create-or-replace for advisory files (version hints).
        Readers must never see a torn write; last writer wins."""
        raise NotImplementedError

    def delete(self, path: str) -> None:
        raise NotImplementedError

    # -- staging
    def local_path(self, path: str) -> str:
        """A filesystem path holding ``path``'s bytes, for readers that
        need a real file (Spark scans, Arrow footer reads).  Local
        backend: identity.  Remote backends: download-to-staging
        (≙ SwiftLakeS3FileIO.newInputFiles)."""
        raise NotImplementedError

    def upload(self, local_src: str, path: str) -> None:
        """Publish a locally-written file into the store."""
        raise NotImplementedError


class LocalFileIO(FileIO):
    scheme = "file"

    @staticmethod
    def _p(path: str) -> str:
        """Every method accepts the file:// URI form — strip it so the
        scheme-dispatch promise ('file:// or bare paths → local') holds
        for ALL operations, not just local_path."""
        if path.startswith("file://"):
            return path[len("file://"):]
        return path

    def read_bytes(self, path: str) -> bytes:
        with open(self._p(path), "rb") as f:
            return f.read()

    def exists(self, path: str) -> bool:
        return os.path.exists(self._p(path))

    def list(self, prefix: str) -> list[str]:
        try:
            return sorted(os.listdir(self._p(prefix)))  # deterministic, like mem
        except (FileNotFoundError, NotADirectoryError):
            return []

    def list_recursive(self, prefix: str) -> list[str]:
        prefix = self._p(prefix)
        out = []
        for root, _dirs, files in os.walk(prefix):
            for fn in files:
                out.append(os.path.relpath(os.path.join(root, fn), prefix))
        return sorted(out)

    def mtime(self, path: str) -> float:
        return os.path.getmtime(self._p(path))

    def write_bytes(self, path: str, data: bytes) -> None:
        path = self._p(path)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(data)

    def try_claim(self, path: str, data: str) -> None:
        """Write the full body to a tmp file, then hard-link it into
        place: link(2) fails with EEXIST if the claim is taken, and a
        successful claim is visible to readers ONLY with its complete
        contents — O_CREAT|O_EXCL alone exposes a created-but-empty
        window where a concurrent loader would JSON-parse a torn file."""
        path = self._p(path)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = os.path.join(os.path.dirname(path), f".claim.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(data)
        try:
            os.link(tmp, path)  # atomic create-if-absent, full contents
        finally:
            os.unlink(tmp)

    def replace_text(self, path: str, data: str) -> None:
        path = self._p(path)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = os.path.join(os.path.dirname(path), f".tmp.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(data)
        os.replace(tmp, path)

    def delete(self, path: str) -> None:
        os.remove(self._p(path))

    def local_path(self, path: str) -> str:
        return self._p(path)

    def upload(self, local_src: str, path: str) -> None:
        path = self._p(path)
        if os.path.abspath(local_src) != os.path.abspath(path):
            self.write_bytes(path, self.read_bytes(local_src))


class _MemStore:
    """One named in-process object store: key → (bytes, mtime)."""

    def __init__(self) -> None:
        self.objects: dict[str, tuple[bytes, float]] = {}
        self.lock = threading.Lock()


_MEM_STORES: dict[str, _MemStore] = {}
_MEM_STORES_LOCK = threading.Lock()


def _mem_store(name: str) -> _MemStore:
    with _MEM_STORES_LOCK:
        return _MEM_STORES.setdefault(name, _MemStore())


def reset_memory_store(name: str) -> None:
    """Test hook: drop a named store's contents AND the singleton's
    staged copies of them — otherwise local_path would keep serving
    bytes of deleted objects across tests."""
    with _MEM_STORES_LOCK:
        _MEM_STORES.pop(name, None)
        if _MEM_IO is not None:
            prefix = f"mem://{name}/"
            stale = [k for k in _MEM_IO._staged if k.startswith(prefix)]
            for k in stale:
                dst = _MEM_IO._staged.pop(k)
                _MEM_IO._origins.pop(dst, None)


class _StagingCache:
    """Download-to-staging shared by remote backends (≙ the reference's
    SwiftLakeS3FileIO.newInputFiles staging strategy): remote URI →
    local copy for readers that need a real file (Spark scans, Arrow
    footer reads), plus the reverse map so ``input_file_name()`` of a
    staged scan resolves back to store URIs.

    Staging-cache growth: staged copies live for the process lifetime
    (objects are immutable by convention — uuid data files — so the
    cache never goes stale, but it is never trimmed either).  A
    production deployment should bound the staging directory (the
    reference stages into a deleteOnExit temp dir per engine)."""

    def _init_staging(self, staging_dir: str | None, tag: str) -> None:
        self._staging = staging_dir or os.path.join(
            os.environ.get("TMPDIR", "/tmp"), f"swiftlake_{tag}_stage_{os.getpid()}"
        )
        self._staged: dict[str, str] = {}
        self._origins: dict[str, str] = {}

    def _stage_key(self, path: str) -> str:
        """Key-derived staging basename bounded to the 255-byte filename
        limit: long keys (hive-escaped partition dirs) hash, keeping the
        basename tail for debuggability."""
        # ':' would survive from an authority (host:port) and Hadoop's
        # Path parser rejects colons in path components — sanitize it
        flat = path.split("://", 1)[-1].replace("/", "__").replace(":", "_")
        if len(flat.encode("utf-8")) > 160:
            import hashlib

            tail = os.path.basename(path)[-80:]
            flat = hashlib.sha256(path.encode("utf-8")).hexdigest()[:32] + "_" + tail
        return flat

    def _stage(self, path: str, data: bytes) -> str:
        os.makedirs(self._staging, exist_ok=True)
        dst = os.path.join(
            self._staging, uuid.uuid4().hex[:8] + "_" + self._stage_key(path)
        )
        with open(dst, "wb") as f:
            f.write(data)
        self._staged[path] = dst
        self._origins[dst] = path
        return dst

    def _unstage(self, path: str) -> None:
        stale = self._staged.pop(path, None)
        if stale:
            self._origins.pop(stale, None)

    def staged_origin(self, local_path: str) -> str | None:
        """Reverse of ``local_path``: the store URI a staged file came
        from (needed to map ``input_file_name()`` of a staged scan back
        to table-relative paths)."""
        return self._origins.get(local_path)


class MemoryFileIO(_StagingCache, FileIO):
    """S3-semantics fake: flat keys, conditional-put claim, staging
    downloads.  ``mem://<store>/<key...>``."""

    scheme = "mem"

    def __init__(self, staging_dir: str | None = None) -> None:
        self._init_staging(staging_dir, "mem")

    @staticmethod
    def _split(path: str) -> tuple[_MemStore, str]:
        if not path.startswith("mem://"):
            raise StorageError(f"not a mem:// path: {path}")
        rest = path[len("mem://"):]
        store, _, key = rest.partition("/")
        return _mem_store(store), key

    def read_bytes(self, path: str) -> bytes:
        store, key = self._split(path)
        with store.lock:
            if key not in store.objects:
                raise FileNotFoundError(path)
            return store.objects[key][0]

    def exists(self, path: str) -> bool:
        store, key = self._split(path)
        with store.lock:
            return key in store.objects

    def list(self, prefix: str) -> list[str]:
        store, key = self._split(prefix)
        key = key.rstrip("/") + "/" if key else ""
        with store.lock:
            names = {
                k[len(key):].split("/", 1)[0]
                for k in store.objects
                if k.startswith(key)
            }
        return sorted(names)

    def list_recursive(self, prefix: str) -> list[str]:
        store, key = self._split(prefix)
        key = key.rstrip("/") + "/" if key else ""
        with store.lock:
            return sorted(k[len(key):] for k in store.objects if k.startswith(key))

    def mtime(self, path: str) -> float:
        store, key = self._split(path)
        with store.lock:
            if key not in store.objects:
                raise FileNotFoundError(path)
            return store.objects[key][1]

    def write_bytes(self, path: str, data: bytes) -> None:
        import time

        store, key = self._split(path)
        with store.lock:
            store.objects[key] = (data, time.time())
        self._unstage(path)

    def try_claim(self, path: str, data: str) -> None:
        """Conditional put (If-None-Match: *): atomicity comes from the
        store, not from POSIX — the semantics a real S3 backend provides."""
        import time

        store, key = self._split(path)
        with store.lock:
            if key in store.objects:
                raise FileExistsError(path)
            store.objects[key] = (data.encode("utf-8"), time.time())

    def replace_text(self, path: str, data: str) -> None:
        # object stores have atomic PUT per key; no rename needed
        self.write_bytes(path, data.encode("utf-8"))

    def delete(self, path: str) -> None:
        store, key = self._split(path)
        with store.lock:
            store.objects.pop(key, None)
        self._unstage(path)

    def local_path(self, path: str) -> str:
        if path in self._staged and os.path.exists(self._staged[path]):
            return self._staged[path]
        return self._stage(path, self.read_bytes(path))

    def upload(self, local_src: str, path: str) -> None:
        with open(local_src, "rb") as f:
            self.write_bytes(path, f.read())


class HttpFileIO(_StagingCache, FileIO):
    """S3-compatible FileIO over plain HTTP (VERDICT r6 ask #8;
    reference aws/.../SwiftLakeS3FileIO.java:109-117).  Speaks the
    object-store REST subset every S3-compatible service provides:

    - ``GET/HEAD/PUT/DELETE /<key>`` for objects,
    - conditional put ``If-None-Match: *`` → 412 when the key exists —
      THE commit-claim primitive (S3 has supported it natively since
      2024-08; MinIO/GCS/R2 equivalents exist),
    - prefix listing via ``GET /?prefix=<p>`` returning one
      ``<key>\\t<mtime-epoch>`` line per object (the shape of S3
      ListObjectsV2 reduced to what the engine consumes).

    Stdlib-only (``urllib.request``) so the seam carries zero new
    dependencies; auth (SigV4 etc.) belongs in a subclass override of
    ``_request`` — the engine's correctness contract is only the verbs
    above.  Tested against a local ``http.server`` fake over a real
    network boundary (tests/test_fileio.py)."""

    scheme = "http"

    def __init__(self, staging_dir: str | None = None) -> None:
        self._init_staging(staging_dir, "http")

    # one seam for every wire call: subclasses add auth headers here
    def _request(self, method: str, url: str, data: bytes | None = None,
                 headers: dict | None = None):
        import urllib.request

        req = urllib.request.Request(url, data=data, method=method,
                                     headers=headers or {})
        return urllib.request.urlopen(req, timeout=30)

    @staticmethod
    def _err_status(exc) -> int:
        return getattr(exc, "code", -1)

    def read_bytes(self, path: str) -> bytes:
        import urllib.error

        try:
            with self._request("GET", path) as r:
                return r.read()
        except urllib.error.HTTPError as e:
            if e.code == 404:
                raise FileNotFoundError(path) from None
            raise StorageError(f"GET {path}: {e}") from e

    def exists(self, path: str) -> bool:
        import urllib.error

        try:
            with self._request("HEAD", path):
                return True
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return False
            raise StorageError(f"HEAD {path}: {e}") from e

    def _base_and_key(self, prefix: str) -> tuple[str, str]:
        """http://host:port/<key-prefix> → (authority base, key prefix)."""
        scheme, _, rest = prefix.partition("://")
        host, _, key = rest.partition("/")
        return f"{scheme}://{host}", key

    def _list_raw(self, prefix: str) -> list[tuple[str, float]]:
        import urllib.parse

        base, key = self._base_and_key(prefix)
        key = key.rstrip("/") + "/" if key else ""
        url = f"{base}/?prefix={urllib.parse.quote(key)}"
        with self._request("GET", url) as r:
            body = r.read().decode("utf-8")
        out = []
        for line in body.splitlines():
            if not line:
                continue
            k, _, mt = line.partition("\t")
            out.append((k[len(key):], float(mt or 0)))
        return out

    def list(self, prefix: str) -> list[str]:
        return sorted({rel.split("/", 1)[0] for rel, _ in self._list_raw(prefix)})

    def list_recursive(self, prefix: str) -> list[str]:
        return sorted(rel for rel, _ in self._list_raw(prefix))

    def mtime(self, path: str) -> float:
        import urllib.error

        try:
            with self._request("HEAD", path) as r:
                mt = r.headers.get("X-Mtime")
                if mt is not None:
                    return float(mt)
                lm = r.headers.get("Last-Modified")
                if lm:
                    from email.utils import parsedate_to_datetime

                    return parsedate_to_datetime(lm).timestamp()
                return 0.0
        except urllib.error.HTTPError as e:
            if e.code == 404:
                raise FileNotFoundError(path) from None
            raise StorageError(f"HEAD {path}: {e}") from e

    def write_bytes(self, path: str, data: bytes) -> None:
        import urllib.error

        try:
            with self._request("PUT", path, data=data):
                pass
        except urllib.error.HTTPError as e:
            raise StorageError(f"PUT {path}: {e}") from e
        self._unstage(path)

    def try_claim(self, path: str, data: str) -> None:
        """Conditional put: ``If-None-Match: *`` makes the STORE arbiter
        of the race — 412 Precondition Failed ⇒ another writer holds the
        claim.  Exactly S3's CreateIfNotExists contract."""
        import urllib.error

        try:
            with self._request(
                "PUT", path, data=data.encode("utf-8"),
                headers={"If-None-Match": "*"},
            ):
                pass
        except urllib.error.HTTPError as e:
            if e.code == 412:
                raise FileExistsError(path) from None
            raise StorageError(f"conditional PUT {path}: {e}") from e

    def replace_text(self, path: str, data: str) -> None:
        # object stores have atomic PUT per key; no rename needed
        self.write_bytes(path, data.encode("utf-8"))

    def delete(self, path: str) -> None:
        import urllib.error

        try:
            with self._request("DELETE", path):
                pass
        except urllib.error.HTTPError as e:
            if e.code != 404:  # S3 DELETE is idempotent; match that
                raise StorageError(f"DELETE {path}: {e}") from e

    def local_path(self, path: str) -> str:
        if path in self._staged and os.path.exists(self._staged[path]):
            return self._staged[path]
        return self._stage(path, self.read_bytes(path))

    def upload(self, local_src: str, path: str) -> None:
        with open(local_src, "rb") as f:
            self.write_bytes(path, f.read())


# ------------------------------------------------------------- SigV4 auth

def _sigv4_quote(s: str, safe: str = "-_.~") -> str:
    import urllib.parse

    return urllib.parse.quote(s, safe=safe)


def sigv4_canonical_request(
    method: str,
    path: str,
    query: str,
    headers: "dict[str, str]",
    signed_headers: "list[str]",
    payload_hash: str,
) -> str:
    """AWS Signature Version 4 canonical request (public spec: AWS
    General Reference, "Signature Version 4 signing process").  ``path``
    and ``query`` are the wire forms; the S3 variant single-encodes the
    decoded path (slashes preserved)."""
    import urllib.parse

    canon_uri = _sigv4_quote(urllib.parse.unquote(path or "/"), safe="/-_.~")
    pairs = []
    if query:
        for part in query.split("&"):
            if not part:
                continue
            k, _, v = part.partition("=")
            pairs.append((
                _sigv4_quote(urllib.parse.unquote_plus(k)),
                _sigv4_quote(urllib.parse.unquote_plus(v)),
            ))
    canon_query = "&".join(f"{k}={v}" for k, v in sorted(pairs))
    lowered = {k.lower(): " ".join(str(v).split()) for k, v in headers.items()}
    canon_headers = "".join(f"{h}:{lowered.get(h, '')}\n" for h in signed_headers)
    return "\n".join([
        method.upper(),
        canon_uri,
        canon_query,
        canon_headers,
        ";".join(signed_headers),
        payload_hash,
    ])


def sigv4_signature(
    secret_key: str,
    canonical_request: str,
    amz_date: str,
    region: str,
    service: str,
) -> tuple[str, str]:
    """(scope, hex signature) for a canonical request at ``amz_date``
    (``YYYYMMDDTHHMMSSZ``)."""
    import hashlib
    import hmac

    datestamp = amz_date[:8]
    scope = f"{datestamp}/{region}/{service}/aws4_request"
    string_to_sign = "\n".join([
        "AWS4-HMAC-SHA256",
        amz_date,
        scope,
        hashlib.sha256(canonical_request.encode("utf-8")).hexdigest(),
    ])

    def _h(key: bytes, msg: str) -> bytes:
        return hmac.new(key, msg.encode("utf-8"), hashlib.sha256).digest()

    k = _h(("AWS4" + secret_key).encode("utf-8"), datestamp)
    k = _h(k, region)
    k = _h(k, service)
    k = _h(k, "aws4_request")
    return scope, hmac.new(
        k, string_to_sign.encode("utf-8"), hashlib.sha256
    ).hexdigest()


class SigV4HttpFileIO(HttpFileIO):
    """HttpFileIO with AWS Signature Version 4 request signing — the auth
    scheme real S3 (and every S3-compatible store) requires.  ≙ reference
    aws/src/main/java/com/arcesium/swiftlake/aws/SwiftLakeS3FileIO.java:
    109-117, whose S3 clients sign through the AWS SDK; here the signing
    is stdlib hmac/hashlib implementing the published SigV4 process.

    Every wire call goes through the one ``_request`` seam: payload is
    hashed (``x-amz-content-sha256``), ``host``/``x-amz-date`` (and the
    session token, when present) are signed, and the ``Authorization``
    header carries the credential scope + signature.  Engine-added
    headers (``If-None-Match``/``If-Match`` conditional writes) ride
    along unsigned, matching S3's rules for non-``x-amz-*`` headers.

    Verified against a local fake that re-derives the signature with the
    shared secret and rejects unsigned or mis-signed requests with 403
    (tests/test_fileio.py) — the closest a sandbox without S3 can get to
    the real authentication boundary."""

    def __init__(
        self,
        access_key: str,
        secret_key: str,
        region: str = "us-east-1",
        service: str = "s3",
        session_token: str | None = None,
        staging_dir: str | None = None,
        clock=None,
    ) -> None:
        super().__init__(staging_dir)
        self.access_key = access_key
        self.secret_key = secret_key
        self.region = region
        self.service = service
        self.session_token = session_token
        self._clock = clock  # () -> datetime (UTC); None = wall clock

    @classmethod
    def from_env(cls, **kw) -> "SigV4HttpFileIO":
        """Standard AWS environment variables (public convention)."""
        return cls(
            access_key=os.environ["AWS_ACCESS_KEY_ID"],
            secret_key=os.environ["AWS_SECRET_ACCESS_KEY"],
            region=os.environ.get("AWS_REGION", "us-east-1"),
            session_token=os.environ.get("AWS_SESSION_TOKEN"),
            **kw,
        )

    def _request(self, method: str, url: str, data: bytes | None = None,
                 headers: dict | None = None):
        import hashlib
        import urllib.parse

        u = urllib.parse.urlsplit(url)
        now = self._clock() if self._clock is not None else __import__(
            "datetime"
        ).datetime.now(__import__("datetime").timezone.utc)
        amz_date = now.strftime("%Y%m%dT%H%M%SZ")
        payload_hash = hashlib.sha256(data or b"").hexdigest()
        hdrs = dict(headers or {})
        hdrs["Host"] = u.netloc
        hdrs["x-amz-date"] = amz_date
        hdrs["x-amz-content-sha256"] = payload_hash
        if self.session_token:
            hdrs["x-amz-security-token"] = self.session_token
        signed = sorted(
            h for h in ("host", "x-amz-date", "x-amz-content-sha256",
                        "x-amz-security-token")
            if h == "host" or h in {k.lower() for k in hdrs}
        )
        creq = sigv4_canonical_request(
            method, u.path, u.query, hdrs, signed, payload_hash
        )
        scope, sig = sigv4_signature(
            self.secret_key, creq, amz_date, self.region, self.service
        )
        hdrs["Authorization"] = (
            f"AWS4-HMAC-SHA256 Credential={self.access_key}/{scope}, "
            f"SignedHeaders={';'.join(signed)}, Signature={sig}"
        )
        return super()._request(method, url, data, hdrs)


_LOCAL = LocalFileIO()
_MEM_IO: "MemoryFileIO | None" = None
_HTTP_IO: "HttpFileIO | None" = None
# explicit per-prefix registrations (e.g. a SigV4 client for one store's
# base URL) consulted before scheme dispatch; longest prefix wins
_REGISTERED: "list[tuple[str, FileIO]]" = []


def register_fileio(prefix: str, io: FileIO) -> None:
    """Route every path under ``prefix`` to ``io`` (authenticated
    backends carry credentials, so they are registered per store rather
    than guessed per scheme)."""
    unregister_fileio(prefix)
    _REGISTERED.append((prefix, io))
    _REGISTERED.sort(key=lambda t: -len(t[0]))


def unregister_fileio(prefix: str) -> None:
    _REGISTERED[:] = [(p, io) for p, io in _REGISTERED if p != prefix]


def fileio_for(path: str) -> FileIO:
    """Scheme dispatch.  Remote backends are process singletons so their
    staging caches (and origin reverse-maps) are shared — staged objects
    are immutable by convention (uuid-named data files; metadata goes
    through read_text, never staging)."""
    global _MEM_IO, _HTTP_IO
    for prefix, io in _REGISTERED:
        # Boundary-checked match: a registration for http://h:80 must NOT
        # capture http://h:8012/... (that would route another store's
        # requests — with the wrong credentials — through this client).
        # A match is the prefix itself or a '/'-separated descendant.
        if path == prefix or path.startswith(prefix.rstrip("/") + "/"):
            return io
    if path.startswith("mem://"):
        if _MEM_IO is None:
            with _MEM_STORES_LOCK:  # two racing first-callers must not
                if _MEM_IO is None:  # split the staging/origin maps
                    _MEM_IO = MemoryFileIO()
        return _MEM_IO
    if path.startswith(("http://", "https://")):
        if _HTTP_IO is None:
            with _MEM_STORES_LOCK:
                if _HTTP_IO is None:
                    _HTTP_IO = HttpFileIO()
        return _HTTP_IO
    if "://" in path and not path.startswith("file://"):
        raise NotImplementedError(
            f"no FileIO backend for {path!r} — implement a FileIO subclass "
            "(conditional-put claim + staging downloads) and register it here"
        )
    return _LOCAL


def join(base: str, *parts: str) -> str:
    """Path join that keeps URI schemes intact ('/' separator)."""
    if "://" in base:
        out = base.rstrip("/")
        for p in parts:
            out += "/" + p.strip("/")
        return out
    return os.path.join(base, *parts)
