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


class HttpObjectStore:
    """Context manager: serves a fresh store on an ephemeral port."""

    def __init__(self) -> None:
        self.store = _Store()
        self.server = ThreadingHTTPServer(
            ("127.0.0.1", 0), _make_handler(self.store)
        )
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
