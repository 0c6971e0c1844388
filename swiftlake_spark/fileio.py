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


class MemoryFileIO(FileIO):
    """S3-semantics fake: flat keys, conditional-put claim, staging
    downloads.  ``mem://<store>/<key...>``.

    Staging-cache growth: staged copies live under the staging dir for
    the process lifetime (objects are immutable by convention — uuid
    data files — so the cache never goes stale, but it is never trimmed
    either).  This is a test fake; a production FileIO should bound its
    staging directory (the reference's S3 FileIO stages into a
    deleteOnExit temp dir per engine)."""

    scheme = "mem"

    def __init__(self, staging_dir: str | None = None) -> None:
        self._staging = staging_dir or os.path.join(
            os.environ.get("TMPDIR", "/tmp"), f"swiftlake_mem_stage_{os.getpid()}"
        )
        self._staged: dict[str, str] = {}
        self._origins: dict[str, str] = {}

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
        stale = self._staged.pop(path, None)
        if stale:
            self._origins.pop(stale, None)

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
        stale = self._staged.pop(path, None)
        if stale:
            self._origins.pop(stale, None)

    def local_path(self, path: str) -> str:
        if path in self._staged and os.path.exists(self._staged[path]):
            return self._staged[path]
        data = self.read_bytes(path)
        os.makedirs(self._staging, exist_ok=True)
        _, key = self._split(path)
        # flat staging name bounded to the 255-byte filename limit: long
        # keys (hive-escaped partition dirs) hash, keeping the basename
        # tail for debuggability
        flat = key.replace("/", "__")
        if len(flat.encode("utf-8")) > 160:
            import hashlib

            tail = os.path.basename(key)[-80:]
            flat = hashlib.sha256(key.encode("utf-8")).hexdigest()[:32] + "_" + tail
        dst = os.path.join(self._staging, uuid.uuid4().hex[:8] + "_" + flat)
        with open(dst, "wb") as f:
            f.write(data)
        self._staged[path] = dst
        self._origins[dst] = path
        return dst

    def staged_origin(self, local_path: str) -> str | None:
        """Reverse of :meth:`local_path`: the store URI a staged file
        came from (needed to map ``input_file_name()`` of a staged scan
        back to table-relative paths)."""
        return self._origins.get(local_path)

    def upload(self, local_src: str, path: str) -> None:
        with open(local_src, "rb") as f:
            self.write_bytes(path, f.read())


_LOCAL = LocalFileIO()
_MEM_IO: "MemoryFileIO | None" = None


def fileio_for(path: str) -> FileIO:
    """Scheme dispatch.  The MemoryFileIO is a process singleton so its
    staging cache (and origin reverse-map) is shared — staged objects
    are immutable by convention (uuid-named data files; metadata goes
    through read_text, never staging)."""
    global _MEM_IO
    if path.startswith("mem://"):
        if _MEM_IO is None:
            with _MEM_STORES_LOCK:  # two racing first-callers must not
                if _MEM_IO is None:  # split the staging/origin maps
                    _MEM_IO = MemoryFileIO()
        return _MEM_IO
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
