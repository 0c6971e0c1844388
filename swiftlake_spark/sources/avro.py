"""Minimal Apache Avro object-container codec (stdlib only).

Iceberg's manifest lists and manifests are Avro container files; reading
an existing Iceberg table therefore needs an Avro decoder, and this
environment ships none — so this module implements the public Avro 1.x
specification directly (container framing, binary encoding, null and
deflate codecs).  Scope is the subset Iceberg metadata actually uses:
records, unions, arrays, maps, strings, bytes, fixed, enums and the
primitive scalars; logical types pass through as their underlying
primitives (the Iceberg layer interprets them).

The writer exists so tests and the q113 interop query can fabricate
spec-conformant fixtures; reading is schema-driven from the writer
schema embedded in the file header, exactly as the spec prescribes.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from typing import Any, BinaryIO

MAGIC = b"Obj\x01"


# ------------------------------------------------------------- decoding

class _Reader:
    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos: self.pos + n]
        if len(b) != n:
            raise EOFError("truncated avro data")
        self.pos += n
        return b

    def at_end(self) -> bool:
        return self.pos >= len(self.buf)

    def long(self) -> int:
        # variable-length zigzag (spec: binary encoding / long)
        shift, acc = 0, 0
        while True:
            b = self.read(1)[0]
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def value(self, schema: Any) -> Any:
        if isinstance(schema, str):
            return self._primitive(schema)
        if isinstance(schema, list):  # union: branch index then value
            return self.value(schema[self.long()])
        t = schema["type"]
        if t == "record":
            return {f["name"]: self.value(f["type"]) for f in schema["fields"]}
        if t == "array":
            out = []
            while True:
                n = self.long()
                if n == 0:
                    break
                if n < 0:  # negative count ⇒ block byte size follows
                    self.long()
                    n = -n
                out.extend(self.value(schema["items"]) for _ in range(n))
            return out
        if t == "map":
            out = {}
            while True:
                n = self.long()
                if n == 0:
                    break
                if n < 0:
                    self.long()
                    n = -n
                for _ in range(n):
                    k = self._primitive("string")
                    out[k] = self.value(schema["values"])
            return out
        if t == "fixed":
            return self.read(schema["size"])
        if t == "enum":
            return schema["symbols"][self.long()]
        return self._primitive(t)

    def _primitive(self, t: str) -> Any:
        if t == "null":
            return None
        if t == "boolean":
            return self.read(1) == b"\x01"
        if t in ("int", "long"):
            return self.long()
        if t == "float":
            return struct.unpack("<f", self.read(4))[0]
        if t == "double":
            return struct.unpack("<d", self.read(8))[0]
        if t == "bytes":
            return self.read(self.long())
        if t == "string":
            return self.read(self.long()).decode("utf-8")
        raise ValueError(f"unsupported avro type {t!r}")


def read_container(path_or_file: str | BinaryIO) -> tuple[dict, list[Any]]:
    """→ (writer schema, records) from an Avro object container file."""
    if isinstance(path_or_file, str):
        with open(path_or_file, "rb") as f:
            data = f.read()
    else:
        data = path_or_file.read()
    r = _Reader(data)
    if r.read(4) != MAGIC:
        raise ValueError("not an avro container file")
    meta = r.value({"type": "map", "values": "bytes"})
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = r.read(16)
    records: list[Any] = []
    while not r.at_end():
        n = r.long()
        size = r.long()
        block = r.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)  # raw deflate per spec
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        if r.read(16) != sync:
            raise ValueError("avro sync marker mismatch")
        br = _Reader(block)
        records.extend(br.value(schema) for _ in range(n))
    return schema, records


# ------------------------------------------------------------- encoding

class _Writer:
    def __init__(self) -> None:
        self.out = io.BytesIO()

    def raw(self, b: bytes) -> None:
        self.out.write(b)

    def long(self, v: int) -> None:
        v = (v << 1) ^ (v >> 63)  # zigzag
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                self.out.write(bytes([b | 0x80]))
            else:
                self.out.write(bytes([b]))
                break

    def value(self, schema: Any, v: Any) -> None:
        if isinstance(schema, str):
            self._primitive(schema, v)
            return
        if isinstance(schema, list):  # union: pick the matching branch
            idx = _union_branch(schema, v)
            self.long(idx)
            self.value(schema[idx], v)
            return
        t = schema["type"]
        if t == "record":
            for f in schema["fields"]:
                self.value(f["type"], v[f["name"]])
        elif t == "array":
            if v:
                self.long(len(v))
                for item in v:
                    self.value(schema["items"], item)
            self.long(0)
        elif t == "map":
            if v:
                self.long(len(v))
                for k, item in v.items():
                    self._primitive("string", k)
                    self.value(schema["values"], item)
            self.long(0)
        elif t == "fixed":
            self.raw(v)
        elif t == "enum":
            self.long(schema["symbols"].index(v))
        else:
            self._primitive(t, v)

    def _primitive(self, t: str, v: Any) -> None:
        if t == "null":
            return
        if t == "boolean":
            self.raw(b"\x01" if v else b"\x00")
        elif t in ("int", "long"):
            self.long(v)
        elif t == "float":
            self.raw(struct.pack("<f", v))
        elif t == "double":
            self.raw(struct.pack("<d", v))
        elif t == "bytes":
            self.long(len(v))
            self.raw(v)
        elif t == "string":
            b = v.encode("utf-8")
            self.long(len(b))
            self.raw(b)
        else:
            raise ValueError(f"unsupported avro type {t!r}")


def _union_branch(union: list, v: Any) -> int:
    """Branch index for ``v``: null → the null branch; otherwise the
    first branch whose type matches the Python value (first-non-null
    alone would pick 'long' for a string in ['null','long','string'] and
    corrupt the encoding).  Falls back to the first non-null branch for
    complex shapes (records/arrays) — the two-branch unions this module
    writes are unambiguous there."""

    def name(s: Any) -> str:
        return s if isinstance(s, str) else s["type"]

    _MATCH = {
        "boolean": bool,
        "int": int,
        "long": int,
        "float": float,
        "double": float,
        "string": str,
        "bytes": (bytes, bytearray),
    }
    non_null = [(i, name(s)) for i, s in enumerate(union) if name(s) != "null"]
    for i, s in enumerate(union):
        if v is None and name(s) == "null":
            return i
    if v is None:
        raise ValueError(f"no union branch for {v!r} in {union}")
    # exact type match first (bool before int: bool is an int subclass)
    if isinstance(v, bool):
        for i, n in non_null:
            if n == "boolean":
                return i
    for i, n in non_null:
        t = _MATCH.get(n)
        if t is not None and not isinstance(v, bool) and isinstance(v, t):
            return i
    for i, n in non_null:
        if n not in _MATCH:  # record/array/map/fixed/enum
            return i
    if non_null:
        return non_null[0][0]
    raise ValueError(f"no union branch for {v!r} in {union}")


def write_container(path: str, schema: dict, records: list[Any]) -> None:
    """Write an Avro object container file (deflate codec)."""
    w = _Writer()
    w.raw(MAGIC)
    w.value(
        {"type": "map", "values": "bytes"},
        {
            "avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": b"deflate",
        },
    )
    sync = os.urandom(16)
    w.raw(sync)
    body = _Writer()
    for rec in records:
        body.value(schema, rec)
    block = zlib.compress(body.out.getvalue())[2:-4]  # raw deflate
    w.long(len(records))
    w.long(len(block))
    w.raw(block)
    w.raw(sync)
    with open(path, "wb") as f:
        f.write(w.out.getvalue())
