"""Minimal Apache Avro object-container-file reader/writer, dependency-free.

Implements the public Avro 1.11 specification
(https://avro.apache.org/docs/1.11.1/specification/) far enough to read and
write Apache Iceberg's manifest and manifest-list files (sources/iceberg_lite.py):
all primitive types, records, enums, fixeds, arrays, maps, unions, named-type
references, and the ``null`` + ``deflate`` block codecs. The container ships
no Avro library (fastavro/avro absent), so this is written straight from the
spec — the READER is fully generic (schema-driven from the file header), so
it parses manifests written by the real Iceberg library, not just our own.

Scope notes (what Iceberg metadata actually needs):
- Block codecs: null, deflate (raw DEFLATE, ``zlib`` wbits=-15). snappy/zstd
  raise with the codec name (honest gate — those libs aren't in the sandbox).
- Logical types ride on their physical type and are returned raw.
- The writer resolves ``["null", X]`` unions by value-is-None — sufficient
  for every optional field in the Iceberg manifest schemas.
- Deterministic output: the sync marker is derived from the schema hash, not
  ``os.urandom`` (reproducible fixture builds, same rationale as
  scripts/package_pyfiles.py).
"""

from __future__ import annotations

import hashlib
import json
import struct
import zlib
from pathlib import Path

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# schema handling
# ---------------------------------------------------------------------------

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


def _fullname(schema: dict) -> str:
    name = schema["name"]
    ns = schema.get("namespace")
    return f"{ns}.{name}" if ns and "." not in name else name


def _register_names(schema, names: dict) -> None:
    """Walk a parsed schema registering named types (record/enum/fixed) so
    later occurrences can reference them by name (spec: Names)."""
    if isinstance(schema, list):
        for s in schema:
            _register_names(s, names)
        return
    if not isinstance(schema, dict):
        return
    t = schema.get("type")
    if t in ("record", "error", "enum", "fixed"):
        names[_fullname(schema)] = schema
        names.setdefault(schema["name"], schema)
    if t in ("record", "error"):
        for f in schema["fields"]:
            _register_names(f["type"], names)
    elif t == "array":
        _register_names(schema["items"], names)
    elif t == "map":
        _register_names(schema["values"], names)


def parse_schema(schema) -> tuple[object, dict]:
    """Return (schema, names) where names maps named-type fullnames to their
    definitions. ``schema`` may be a JSON string or an already-parsed value."""
    if isinstance(schema, (str, bytes)) and (
        schema.lstrip()[:1] in ("{", "[", '"') if isinstance(schema, str) else True
    ):
        try:
            schema = json.loads(schema)
        except (json.JSONDecodeError, TypeError):
            pass  # a bare primitive name like "long"
    names: dict = {}
    _register_names(schema, names)
    return schema, names


# ---------------------------------------------------------------------------
# binary decoding (spec: Binary Encoding)
# ---------------------------------------------------------------------------


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise EOFError(f"avro: truncated read ({len(b)}/{n} bytes)")
        self.pos += n
        return b

    def at_end(self) -> bool:
        return self.pos >= len(self.buf)

    def read_long(self) -> int:
        """zigzag varint (int and long share the encoding)."""
        shift, acc = 0, 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())


def _decode(schema, names: dict, r: _Reader):
    if isinstance(schema, list):  # union: long index, then branch
        return _decode(schema[r.read_long()], names, r)
    if isinstance(schema, str):
        t = schema
        if t not in _PRIMITIVES:  # named-type reference
            return _decode(names[t], names, r)
    else:
        t = schema["type"]
    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) != b"\x00"
    if t in ("int", "long"):
        return r.read_long()
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return r.read_bytes()
    if t == "string":
        return r.read_bytes().decode("utf-8")
    if t == "fixed":
        return r.read(schema["size"])
    if t == "enum":
        return schema["symbols"][r.read_long()]
    if t in ("record", "error"):
        return {f["name"]: _decode(f["type"], names, r) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix (skippable form)
                n = -n
                r.read_long()
            for _ in range(n):
                out.append(_decode(schema["items"], names, r))
    if t == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.read_long()
            for _ in range(n):
                k = r.read_bytes().decode("utf-8")
                out[k] = _decode(schema["values"], names, r)
    raise ValueError(f"avro: unsupported schema type {t!r}")


# ---------------------------------------------------------------------------
# binary encoding
# ---------------------------------------------------------------------------


def _zigzag(n: int) -> bytes:
    acc = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = acc & 0x7F
        acc >>= 7
        if acc:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode(schema, names: dict, val, out: bytearray) -> None:
    if isinstance(schema, list):  # union: writer picks branch by None-ness
        if val is None and "null" in schema:
            out += _zigzag(schema.index("null"))
            return
        for i, branch in enumerate(schema):
            if branch != "null":
                out += _zigzag(i)
                _encode(branch, names, val, out)
                return
        raise ValueError("avro: union with no non-null branch")
    if isinstance(schema, str):
        t = schema
        if t not in _PRIMITIVES:
            _encode(names[t], names, val, out)
            return
    else:
        t = schema["type"]
    if t == "null":
        return
    if t == "boolean":
        out += b"\x01" if val else b"\x00"
    elif t in ("int", "long"):
        out += _zigzag(int(val))
    elif t == "float":
        out += struct.pack("<f", val)
    elif t == "double":
        out += struct.pack("<d", val)
    elif t == "bytes":
        out += _zigzag(len(val)) + bytes(val)
    elif t == "string":
        b = val.encode("utf-8")
        out += _zigzag(len(b)) + b
    elif t == "fixed":
        if len(val) != schema["size"]:
            raise ValueError("avro: fixed size mismatch")
        out += bytes(val)
    elif t == "enum":
        out += _zigzag(schema["symbols"].index(val))
    elif t in ("record", "error"):
        for f in schema["fields"]:
            if f["name"] in val:
                fv = val[f["name"]]
            elif "default" in f:
                fv = f["default"]
            else:
                raise ValueError(f"avro: missing field {f['name']!r}")
            _encode(f["type"], names, fv, out)
    elif t == "array":
        if val:
            out += _zigzag(len(val))
            for item in val:
                _encode(schema["items"], names, item, out)
        out += _zigzag(0)
    elif t == "map":
        if val:
            out += _zigzag(len(val))
            for k, v in val.items():
                kb = k.encode("utf-8")
                out += _zigzag(len(kb)) + kb
                _encode(schema["values"], names, v, out)
        out += _zigzag(0)
    else:
        raise ValueError(f"avro: unsupported schema type {t!r}")


# ---------------------------------------------------------------------------
# object container files (spec: Object Container Files)
# ---------------------------------------------------------------------------


def read_container(path: str | Path) -> tuple[object, dict, list]:
    """Read an Avro object-container file → (schema, file_metadata, records).

    Fully generic: the schema comes from the file header, so files written
    by any conformant Avro library (including Iceberg's Java writer) parse.
    """
    r = _Reader(Path(path).read_bytes())
    if r.read(4) != MAGIC:
        raise ValueError(f"not an Avro container file: {path}")
    meta_schema = {"type": "map", "values": "bytes"}
    raw_meta = _decode(meta_schema, {}, r)
    meta = {
        k: (v.decode("utf-8", "replace") if k.startswith("avro.") else v)
        for k, v in raw_meta.items()
    }
    schema, names = parse_schema(meta["avro.schema"])
    codec = meta.get("avro.codec", "null") or "null"
    sync = r.read(16)
    records: list = []
    while not r.at_end():
        count = r.read_long()
        size = r.read_long()
        block = r.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise NotImplementedError(
                f"avro codec {codec!r} not supported (no {codec} lib in sandbox)"
            )
        br = _Reader(block)
        for _ in range(count):
            records.append(_decode(schema, names, br))
        if r.read(16) != sync:
            raise ValueError(f"avro: sync marker mismatch in {path}")
    return schema, meta, records


def write_container(
    path: str | Path,
    schema,
    records: list,
    metadata: dict | None = None,
    codec: str = "deflate",
) -> None:
    """Write records as a single-block Avro container file.

    ``metadata`` values may be str or bytes (Iceberg stores its table schema
    JSON and partition spec under custom keys). Sync marker is deterministic
    (schema-hash) for byte-reproducible fixture builds.
    """
    schema_json = json.dumps(schema, separators=(",", ":"), sort_keys=False)
    parsed, names = parse_schema(schema_json)
    body = bytearray()
    for rec in records:
        _encode(parsed, names, rec, body)
    block = bytes(body)
    if codec == "deflate":
        c = zlib.compressobj(9, zlib.DEFLATED, -15)
        block = c.compress(block) + c.flush()
    elif codec != "null":
        raise NotImplementedError(f"avro codec {codec!r} not supported")
    meta = {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
    for k, v in (metadata or {}).items():
        meta[k] = v.encode() if isinstance(v, str) else bytes(v)
    out = bytearray(MAGIC)
    _encode({"type": "map", "values": "bytes"}, {}, meta, out)
    sync = hashlib.sha256(schema_json.encode()).digest()[:16]
    out += sync
    out += _zigzag(len(records)) + _zigzag(len(block)) + block + sync
    Path(path).write_bytes(bytes(out))
