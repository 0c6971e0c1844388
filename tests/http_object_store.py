"""In-process HTTP object store for FileIO tests (VERDICT r6 ask #8).

~100 lines of stdlib ``http.server``: a flat key space speaking the
object-store REST subset HttpFileIO consumes — GET/HEAD/PUT/DELETE per
key, conditional PUT via ``If-None-Match: *`` (412 when the key
exists), and ``GET /?prefix=`` listing returning ``key\tmtime`` lines.
Responses carry an ``ETag`` (md5 of the body) and PUT honors
``If-Match: <etag>`` — 412 unless the key exists with exactly that
etag, checked atomically — which is the compare-and-swap primitive
HttpCatalogCommitService builds its pointer CAS on (S3 has supported
conditional writes incl. If-Match since 2024; GCS/R2 equivalents
exist).  ThreadingHTTPServer so concurrent commit races cross a REAL
network boundary and the 412 arbitration happens under genuine
parallelism.
"""

from __future__ import annotations

import hashlib
import threading
import time
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _etag(body: bytes) -> str:
    return hashlib.md5(body).hexdigest()


class _Store:
    def __init__(self) -> None:
        self.objects: dict[str, tuple[bytes, float]] = {}
        self.lock = threading.Lock()


def _make_handler(store: _Store):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # silence per-request stderr noise
            pass

        def _key(self) -> str:
            return urllib.parse.unquote(self.path.lstrip("/"))

        def _send(self, code: int, body: bytes = b"", headers=None) -> None:
            self.send_response(code)
            for k, v in (headers or {}).items():
                self.send_header(k, v)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            if self.command != "HEAD":
                self.wfile.write(body)

        def do_GET(self) -> None:
            if self.path.startswith("/?"):
                q = urllib.parse.parse_qs(self.path[2:])
                prefix = urllib.parse.unquote(q.get("prefix", [""])[0])
                with store.lock:
                    lines = [
                        f"{k}\t{mt}"
                        for k, (_, mt) in sorted(store.objects.items())
                        if k.startswith(prefix)
                    ]
                self._send(200, "\n".join(lines).encode("utf-8"))
                return
            key = self._key()
            with store.lock:
                obj = store.objects.get(key)
            if obj is None:
                self._send(404)
            else:
                self._send(200, obj[0],
                           {"X-Mtime": repr(obj[1]), "ETag": _etag(obj[0])})

        def do_HEAD(self) -> None:
            key = self._key()
            with store.lock:
                obj = store.objects.get(key)
            if obj is None:
                self._send(404)
            else:
                self._send(200, obj[0],
                           {"X-Mtime": repr(obj[1]), "ETag": _etag(obj[0])})

        def do_PUT(self) -> None:
            key = self._key()
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            if_none = self.headers.get("If-None-Match") == "*"
            if_match = self.headers.get("If-Match")
            with store.lock:  # the put+check is ATOMIC — that's the contract
                if if_none and key in store.objects:
                    self._send(412)
                    return
                if if_match is not None:
                    cur = store.objects.get(key)
                    if cur is None or _etag(cur[0]) != if_match:
                        self._send(412)
                        return
                store.objects[key] = (body, time.time())
            self._send(200)

        def do_DELETE(self) -> None:
            key = self._key()
            with store.lock:
                existed = store.objects.pop(key, None) is not None
            self._send(204 if existed else 404)

    return Handler


def _verify_sigv4(handler, access_key: str, secret_key: str) -> str | None:
    """Re-derive the SigV4 signature with the shared secret; an error
    string means REJECT (403).  Mirrors what a real S3 endpoint checks:
    credential scope, signed-header list, and the signature itself."""
    import hmac as _hmac
    import re

    from swiftlake_spark.fileio import (
        sigv4_canonical_request,
        sigv4_signature,
    )

    auth = handler.headers.get("Authorization", "")
    m = re.fullmatch(
        r"AWS4-HMAC-SHA256 Credential=([^/]+)/(\d{8})/([^/]+)/([^/]+)"
        r"/aws4_request, SignedHeaders=([^,]+), Signature=([0-9a-f]{64})",
        auth,
    )
    if not m:
        return "missing or malformed Authorization"
    ak, datestamp, region, service, signed, sig = m.groups()
    if ak != access_key:
        return "unknown access key"
    amz_date = handler.headers.get("x-amz-date", "")
    if not amz_date.startswith(datestamp):
        return "credential scope date mismatch"
    required = {"host", "x-amz-date", "x-amz-content-sha256"}
    signed_list = signed.split(";")
    if not required <= set(signed_list):
        return "required headers not signed"
    payload_hash = handler.headers.get("x-amz-content-sha256", "")
    path, _, query = handler.path.partition("?")
    creq = sigv4_canonical_request(
        handler.command, path, query, dict(handler.headers.items()),
        signed_list, payload_hash,
    )
    _, expect = sigv4_signature(secret_key, creq, amz_date, region, service)
    if not _hmac.compare_digest(expect, sig):
        return "SignatureDoesNotMatch"
    return None


def _make_sigv4_handler(store: _Store, access_key: str, secret_key: str):
    Base = _make_handler(store)

    class Handler(Base):
        def _rejected(self) -> bool:
            err = _verify_sigv4(self, access_key, secret_key)
            if err:
                self._send(403, err.encode("utf-8"))
                return True
            return False

        def do_GET(self):
            if not self._rejected():
                super().do_GET()

        def do_HEAD(self):
            if not self._rejected():
                super().do_HEAD()

        def do_DELETE(self):
            if not self._rejected():
                super().do_DELETE()

        def do_PUT(self):
            # the payload hash is SIGNED — hash the actual body and
            # compare, so a tampered payload fails even with valid auth
            import io as _io

            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            self.rfile = _io.BytesIO(body)
            if self._rejected():
                return
            if (hashlib.sha256(body).hexdigest()
                    != self.headers.get("x-amz-content-sha256")):
                self._send(403, b"payload hash mismatch")
                return
            super().do_PUT()

    return Handler


class HttpObjectStore:
    """Context manager: serves a fresh store on an ephemeral port.
    ``credentials=(access_key, secret_key)`` turns on SigV4 verification:
    every request must carry a valid AWS-SigV4 Authorization header or
    the store answers 403."""

    def __init__(self, credentials: tuple[str, str] | None = None) -> None:
        self.store = _Store()
        handler = (
            _make_sigv4_handler(self.store, *credentials)
            if credentials
            else _make_handler(self.store)
        )
        self.server = ThreadingHTTPServer(("127.0.0.1", 0), handler)
        self.base = f"http://127.0.0.1:{self.server.server_address[1]}"
        self._thread = threading.Thread(
            target=self.server.serve_forever, daemon=True
        )

    def __enter__(self) -> "HttpObjectStore":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self.server.shutdown()
        self.server.server_close()
