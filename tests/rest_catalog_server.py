"""In-process Iceberg-REST-shaped catalog for commit-protocol tests.

Stdlib ``http.server`` speaking the subset of the public Iceberg REST
catalog OpenAPI that RestCatalogCommitService consumes:

- ``GET    /v1/namespaces/{ns}/tables/{ident}``  → LoadTableResult
  (``metadata-location`` + a ``metadata`` document carrying ``refs``);
- ``POST   /v1/namespaces/{ns}/register``        → RegisterTableRequest
  (``name`` + ``metadata-location``), 409 AlreadyExistsException on the
  create race;
- ``POST   /v1/namespaces/{ns}/tables/{ident}``  → CommitTableRequest
  (``requirements`` + ``updates``).  Requirements are checked and
  updates applied ATOMICALLY under one lock — two racers from the same
  basis get exactly one 200 and one 409 CommitFailedException, which is
  the compare-and-swap the commit protocol builds on;
- ``DELETE /v1/namespaces/{ns}/tables/{ident}``  → drop (204/404).

Supported requirements: ``assert-create`` and ``assert-ref-snapshot-id``
(``snapshot-id: null`` asserts the ref does not exist — the spec's
absent-ref form).  Supported updates: ``set-snapshot-ref`` and
``set-properties`` (where the ``swiftlake.metadata-location`` property
also moves the canonical metadata-location, standing in for a real
server's own metadata write).  Unknown requirement/update types → 400,
so a client drifting from the implemented shape fails loudly.

Error bodies follow the spec's ErrorModel envelope
(``{"error": {"message", "type", "code"}}``).  Optional bearer-token
auth: when constructed with a token, every request must carry
``Authorization: Bearer <token>`` or gets 401.

ThreadingHTTPServer so concurrent commit races cross a REAL network
boundary and the 409 arbitration happens under genuine parallelism.
"""

from __future__ import annotations

import json
import threading
import urllib.parse
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class _Catalog:
    def __init__(self) -> None:
        # (ns, name) -> {"location": str, "refs": {ref: snapshot_id},
        #                "properties": dict, "uuid": str}
        self.tables: dict[tuple[str, str], dict] = {}
        self.lock = threading.Lock()


def _error(code: int, typ: str, msg: str) -> tuple[int, bytes]:
    return code, json.dumps(
        {"error": {"message": msg, "type": typ, "code": code}}
    ).encode("utf-8")


def _load_result(t: dict) -> bytes:
    refs = {
        r: {"snapshot-id": s, "type": "branch"}
        for r, s in t["refs"].items()
    }
    doc = {
        "metadata-location": t["location"],
        "metadata": {
            "format-version": 2,
            "table-uuid": t["uuid"],
            "location": t["location"].rsplit("/metadata/", 1)[0],
            "current-snapshot-id": t["refs"].get("main"),
            "refs": refs,
            "properties": t["properties"],
        },
        "config": {},
    }
    return json.dumps(doc).encode("utf-8")


def _check_requirements(t: dict | None, requirements: list):
    """None when satisfied, else an (status, body) error tuple."""
    for req in requirements:
        typ = req.get("type")
        if typ == "assert-create":
            if t is not None:
                return _error(409, "CommitFailedException",
                              "requirement failed: table already exists")
        elif typ == "assert-ref-snapshot-id":
            if t is None:
                return _error(404, "NoSuchTableException", "no such table")
            ref = req.get("ref")
            want = req.get("snapshot-id")
            have = t["refs"].get(ref)
            if want is None:
                if ref in t["refs"]:
                    return _error(409, "CommitFailedException",
                                  f"requirement failed: ref {ref} exists")
            elif have != want:
                return _error(
                    409, "CommitFailedException",
                    f"requirement failed: ref {ref} is {have}, not {want}")
        else:
            return _error(400, "BadRequestException",
                          f"unsupported requirement type: {typ}")
    return None


def _apply_updates(t: dict, updates: list):
    """None on success, else an (status, body) error tuple."""
    for up in updates:
        action = up.get("action")
        if action == "set-snapshot-ref":
            t["refs"][up["ref-name"]] = up["snapshot-id"]
        elif action == "set-properties":
            props = up.get("updates") or {}
            t["properties"].update(props)
            loc = props.get("swiftlake.metadata-location")
            if loc:
                t["location"] = loc
        else:
            return _error(400, "BadRequestException",
                          f"unsupported update action: {action}")
    return None


def _make_handler(cat: _Catalog, token: str | None):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):
            pass

        def _send(self, code: int, body: bytes = b"") -> None:
            self.send_response(code)
            if body:
                self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            if body:
                self.wfile.write(body)

        def _auth_ok(self) -> bool:
            if token is None:
                return True
            if self.headers.get("Authorization") == f"Bearer {token}":
                return True
            self._send(*_error(401, "NotAuthorizedException",
                               "missing or invalid bearer token"))
            return False

        def _route(self):
            """(kind, ns, ident) or None after replying 404."""
            parts = [urllib.parse.unquote(p)
                     for p in self.path.split("?")[0].split("/") if p]
            if len(parts) == 5 and parts[0] == "v1" \
                    and parts[1] == "namespaces" and parts[3] == "tables":
                return "table", parts[2], parts[4]
            if len(parts) == 4 and parts[0] == "v1" \
                    and parts[1] == "namespaces" and parts[3] == "register":
                return "register", parts[2], None
            self._send(*_error(404, "NoSuchRouteException",
                               f"no route: {self.path}"))
            return None

        def _body(self) -> dict:
            n = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(n)
            return json.loads(raw.decode("utf-8")) if raw else {}

        def do_GET(self) -> None:
            if not self._auth_ok():
                return
            r = self._route()
            if r is None:
                return
            kind, ns, ident = r
            if kind != "table":
                self._send(*_error(405, "MethodNotAllowed", "GET"))
                return
            with cat.lock:
                t = cat.tables.get((ns, ident))
                body = _load_result(t) if t else None
            if body is None:
                self._send(*_error(404, "NoSuchTableException",
                                   f"no such table: {ident}"))
            else:
                self._send(200, body)

        def do_POST(self) -> None:
            if not self._auth_ok():
                return
            r = self._route()
            if r is None:
                return
            kind, ns, ident = r
            doc = self._body()
            if kind == "register":
                name = doc.get("name")
                loc = doc.get("metadata-location")
                if not name or not loc:
                    self._send(*_error(400, "BadRequestException",
                                       "name and metadata-location required"))
                    return
                with cat.lock:
                    if (ns, name) in cat.tables:
                        self._send(*_error(
                            409, "AlreadyExistsException",
                            f"table already exists: {name}"))
                        return
                    t = {"location": loc, "refs": {}, "properties": {},
                         "uuid": str(uuid.uuid4())}
                    cat.tables[(ns, name)] = t
                    body = _load_result(t)
                self._send(200, body)
                return
            # commit-with-requirements
            with cat.lock:  # requirement check + update apply are ATOMIC
                t = cat.tables.get((ns, ident))
                err = _check_requirements(t, doc.get("requirements") or [])
                if err is None and t is None:
                    err = _error(404, "NoSuchTableException",
                                 f"no such table: {ident}")
                if err is None:
                    err = _apply_updates(t, doc.get("updates") or [])
                body = None if err else _load_result(t)
            if err:
                self._send(*err)
            else:
                self._send(200, body)

        def do_DELETE(self) -> None:
            if not self._auth_ok():
                return
            r = self._route()
            if r is None:
                return
            kind, ns, ident = r
            if kind != "table":
                self._send(*_error(405, "MethodNotAllowed", "DELETE"))
                return
            with cat.lock:
                existed = cat.tables.pop((ns, ident), None) is not None
            self._send(204 if existed else
                       404, b"" if existed else
                       _error(404, "NoSuchTableException", ident)[1])

    return Handler


class RestCatalogServer:
    """Context manager: ``with RestCatalogServer() as s: s.base ...``"""

    def __init__(self, token: str | None = None) -> None:
        self._cat = _Catalog()
        self._token = token
        self._srv: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    @property
    def base(self) -> str:
        assert self._srv is not None
        return f"http://127.0.0.1:{self._srv.server_address[1]}"

    @property
    def tables(self) -> dict:
        return self._cat.tables

    def __enter__(self) -> "RestCatalogServer":
        self._srv = ThreadingHTTPServer(
            ("127.0.0.1", 0), _make_handler(self._cat, self._token))
        self._thread = threading.Thread(
            target=self._srv.serve_forever, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        assert self._srv is not None
        self._srv.shutdown()
        self._srv.server_close()
        if self._thread:
            self._thread.join(timeout=5)
