"""Minimal Apache Avro Object Container File codec (pure Python).

Implements exactly the subset Apache Iceberg metadata needs — reading
and writing Avro container files with ``null`` or ``deflate`` codecs and
schema-driven generic record (de)serialization — from the PUBLIC Avro
1.11 specification (https://avro.apache.org/docs/1.11.1/specification/):

* container format: magic ``Obj\\x01``, file-metadata map (bytes
  values; keys ``avro.schema`` / ``avro.codec``), 16-byte sync marker,
  then data blocks of ``(count long, byte-size long, payload, sync)``;
* primitive encodings: zig-zag varint ``int``/``long``, little-endian
  IEEE-754 ``float``/``double``, length-prefixed ``bytes``/``string``,
  single-byte ``boolean``, zero-byte ``null``;
* complex encodings: ``record`` (fields in order), ``enum`` (int
  index), ``fixed`` (raw bytes), ``union`` (long branch index + value),
  ``array``/``map`` (blocks of items, negative count = block-size
  prefixed, 0 terminates);
* named-type references (a schema may refer to an earlier record /
  enum / fixed definition by full name);
* ``deflate`` codec = RFC 1951 raw deflate (``zlib`` with wbits -15).

Decoding is driven entirely by the WRITER schema embedded in the file
(Avro container files are self-describing), so no reader-schema
resolution is needed: records come back as plain dicts, unions as their
value, logical types as their raw underlying value (Iceberg timestamps
stay micros-since-epoch longs).  No code is taken from the Avro
project; byte-level fixtures in ``tests/test_iceberg.py`` pin the
format against hand-computed examples from the spec.

Used by ``plans/iceberg.py`` for Iceberg manifest-list / manifest files
(reference parity note: the reference engine has no table-format
interop; this extends the repo's Delta rung to the other open format).
"""

from __future__ import annotations

import io
import json
import struct
import zlib

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------- decode

class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise ValueError("avro: truncated input")
        out = self.buf[self.pos:self.pos + n]
        self.pos += n
        return out

    def read_long(self) -> int:
        # zig-zag varint (spec "Binary Encoding / Primitive Types")
        shift, acc = 0, 0
        while True:
            b = self.read(1)[0]
            acc |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
            if shift > 70:
                raise ValueError("avro: varint too long")
        return (acc >> 1) ^ -(acc & 1)

    def read_bytes(self) -> bytes:
        n = self.read_long()
        if n < 0:
            raise ValueError("avro: negative bytes length")
        return self.read(n)

    def at_end(self) -> bool:
        return self.pos >= len(self.buf)


def _resolve(schema, names: dict):
    """Normalize a schema node: resolve string references to named types."""
    if isinstance(schema, str):
        if schema in names:
            return names[schema]
        return schema  # primitive name
    return schema


def _register(schema: dict, names: dict) -> None:
    t = schema.get("type")
    if t in ("record", "enum", "fixed"):
        name = schema.get("name")
        ns = schema.get("namespace")
        if name:
            names[name] = schema
            if ns:
                names[f"{ns}.{name}"] = schema


def _decode(schema, r: _Reader, names: dict):
    schema = _resolve(schema, names)
    if isinstance(schema, list):  # union: long index picks the branch
        idx = r.read_long()
        if not (0 <= idx < len(schema)):
            raise ValueError(f"avro: union index {idx} out of range")
        return _decode(schema[idx], r, names)
    if isinstance(schema, str):
        t = schema
    else:
        t = schema["type"]
        if isinstance(t, (list, dict)):
            # {"type": [...]} / nested definition used as a type
            return _decode(t, r, names)
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
    if t == "record":
        _register(schema, names)
        out = {}
        for f in schema["fields"]:
            out[f["name"]] = _decode(f["type"], r, names)
        return out
    if t == "enum":
        _register(schema, names)
        idx = r.read_long()
        syms = schema["symbols"]
        if not (0 <= idx < len(syms)):
            raise ValueError(f"avro: enum index {idx} out of range")
        return syms[idx]
    if t == "fixed":
        _register(schema, names)
        return r.read(int(schema["size"]))
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:  # block-size-prefixed form: size long follows
                n = -n
                r.read_long()
            for _ in range(n):
                out.append(_decode(schema["items"], r, names))
        return out
    if t == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:
                n = -n
                r.read_long()
            for _ in range(n):
                k = r.read_bytes().decode("utf-8")
                out[k] = _decode(schema["values"], r, names)
        return out
    raise ValueError(f"avro: unsupported type {t!r}")


def _prescan_names(schema, names: dict) -> None:
    """Pre-walk a schema registering every named type, so a reference
    that textually precedes its definition inside a union still
    resolves (the spec allows references to any type defined anywhere
    in the schema document)."""
    if isinstance(schema, list):
        for s in schema:
            _prescan_names(s, names)
        return
    if not isinstance(schema, dict):
        return
    _register(schema, names)
    t = schema.get("type")
    if t == "record":
        for f in schema.get("fields", []):
            _prescan_names(f.get("type"), names)
    elif t == "array":
        _prescan_names(schema.get("items"), names)
    elif t == "map":
        _prescan_names(schema.get("values"), names)
    elif isinstance(t, (dict, list)):
        _prescan_names(t, names)


def _snappy_decompress(buf: bytes) -> bytes:
    """Pure-Python RAW-snappy decompressor (decode only — reading
    foreign snappy-coded Avro metadata needs no compressor).  Format
    per Google's published snappy format description: a varint32
    uncompressed length, then tagged elements — literals (tag 00,
    lengths ≥ 60 spill into 1-4 little-endian extra bytes) and
    back-reference copies with 1/2/4-byte offsets (tags 01/10/11);
    copies may overlap and stream byte-by-byte.  No code from the
    snappy project; byte-pinned against hand-computed vectors in
    tests/test_avro_property.py."""
    i, n = 0, len(buf)
    # varint32 uncompressed length
    out_len, shift = 0, 0
    while True:
        if i >= n:
            raise ValueError("snappy: truncated length varint")
        b = buf[i]
        i += 1
        out_len |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 32:
            raise ValueError("snappy: length varint overflow")
    out = bytearray()
    while i < n:
        tag = buf[i]
        i += 1
        kind = tag & 3
        if kind == 0:                               # literal
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59
                if i + nb > n:
                    raise ValueError("snappy: truncated literal len")
                ln = int.from_bytes(buf[i:i + nb], "little")
                i += nb
            ln += 1
            if i + ln > n:
                raise ValueError("snappy: truncated literal")
            out += buf[i:i + ln]
            i += ln
            continue
        if kind == 1:                               # copy, 1-byte off
            ln = ((tag >> 2) & 0x7) + 4
            if i >= n:
                raise ValueError("snappy: truncated copy offset")
            off = ((tag >> 5) << 8) | buf[i]
            i += 1
        elif kind == 2:                             # copy, 2-byte off
            ln = (tag >> 2) + 1
            if i + 2 > n:
                raise ValueError("snappy: truncated copy offset")
            off = int.from_bytes(buf[i:i + 2], "little")
            i += 2
        else:                                       # copy, 4-byte off
            ln = (tag >> 2) + 1
            if i + 4 > n:
                raise ValueError("snappy: truncated copy offset")
            off = int.from_bytes(buf[i:i + 4], "little")
            i += 4
        if off == 0 or off > len(out):
            raise ValueError("snappy: copy offset out of range")
        # overlapping copies are legal and stream byte-by-byte
        start = len(out) - off
        for k in range(ln):
            out.append(out[start + k])
    if len(out) != out_len:
        raise ValueError(
            f"snappy: decompressed {len(out)} bytes, header said "
            f"{out_len}")
    return bytes(out)


def read_container(data: bytes) -> tuple[dict, list]:
    """Parse an Avro Object Container File.  Returns
    ``(file_metadata, records)`` where ``file_metadata`` maps the
    container's metadata keys to ``bytes`` values (``avro.schema``
    included verbatim) and ``records`` is the decoded record list."""
    r = _Reader(data)
    if r.read(4) != MAGIC:
        raise ValueError("avro: bad magic (not an Object Container File)")
    meta: dict[str, bytes] = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.read_long()
        for _ in range(n):
            k = r.read_bytes().decode("utf-8")
            meta[k] = r.read_bytes()
    sync = r.read(16)
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate", "snappy"):
        raise ValueError(f"avro: codec {codec!r} unsupported "
                         "(null/deflate/snappy only)")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    names: dict = {}
    _prescan_names(schema, names)
    records: list = []
    while not r.at_end():
        count = r.read_long()
        size = r.read_long()
        payload = r.read(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        elif codec == "snappy":
            # Avro spec: snappy-compressed data followed by a 4-byte
            # BIG-ENDIAN CRC32 of the UNCOMPRESSED data
            if size < 4:
                raise ValueError("avro: snappy block too short")
            body, crc = payload[:-4], payload[-4:]
            payload = _snappy_decompress(body)
            if zlib.crc32(payload) & 0xFFFFFFFF != int.from_bytes(
                    crc, "big"):
                raise ValueError("avro: snappy block CRC mismatch")
        br = _Reader(payload)
        for _ in range(count):
            records.append(_decode(schema, br, names))
        if not br.at_end():
            raise ValueError("avro: trailing bytes in block")
        if r.read(16) != sync:
            raise ValueError("avro: sync marker mismatch")
    return meta, records


def read_container_file(path: str) -> tuple[dict, list]:
    with open(path, "rb") as f:
        return read_container(f.read())


# ---------------------------------------------------------------- encode

def _zigzag(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63) if n < 0 else (n << 1)
    u &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_bytes(b: bytes) -> bytes:
    return _zigzag(len(b)) + b


def _encode(schema, val, out: io.BytesIO, names: dict) -> None:
    schema = _resolve(schema, names)
    if isinstance(schema, list):  # union: pick the matching branch
        for i, branch in enumerate(schema):
            if _matches(branch, val, names):
                out.write(_zigzag(i))
                _encode(branch, val, out, names)
                return
        raise ValueError(f"avro: no union branch for {type(val).__name__}")
    t = schema if isinstance(schema, str) else schema["type"]
    if isinstance(t, (list, dict)):
        _encode(t, val, out, names)
        return
    if t == "null":
        if val is not None:
            raise ValueError("avro: non-null for null type")
        return
    if t == "boolean":
        out.write(b"\x01" if val else b"\x00")
    elif t in ("int", "long"):
        out.write(_zigzag(int(val)))
    elif t == "float":
        out.write(struct.pack("<f", float(val)))
    elif t == "double":
        out.write(struct.pack("<d", float(val)))
    elif t == "bytes":
        out.write(_enc_bytes(bytes(val)))
    elif t == "string":
        out.write(_enc_bytes(str(val).encode("utf-8")))
    elif t == "record":
        _register(schema, names)
        for f in schema["fields"]:
            if f["name"] not in val and "default" in f:
                _encode(f["type"], f["default"], out, names)
            else:
                _encode(f["type"], val[f["name"]], out, names)
    elif t == "enum":
        _register(schema, names)
        out.write(_zigzag(schema["symbols"].index(val)))
    elif t == "fixed":
        _register(schema, names)
        if len(val) != int(schema["size"]):
            raise ValueError("avro: fixed size mismatch")
        out.write(bytes(val))
    elif t == "array":
        if val:
            out.write(_zigzag(len(val)))
            for item in val:
                _encode(schema["items"], item, out, names)
        out.write(_zigzag(0))
    elif t == "map":
        if val:
            out.write(_zigzag(len(val)))
            for k, v in val.items():
                out.write(_enc_bytes(str(k).encode("utf-8")))
                _encode(schema["values"], v, out, names)
        out.write(_zigzag(0))
    else:
        raise ValueError(f"avro: unsupported type {t!r}")


def _matches(branch, val, names: dict) -> bool:
    branch = _resolve(branch, names)
    t = branch if isinstance(branch, str) else branch.get("type")
    if t == "null":
        return val is None
    if val is None:
        return False
    if t == "boolean":
        return isinstance(val, bool)
    if t in ("int", "long"):
        return isinstance(val, int) and not isinstance(val, bool)
    if t in ("float", "double"):
        return isinstance(val, float)
    if t == "string":
        return isinstance(val, str)
    if t in ("bytes", "fixed"):
        return isinstance(val, (bytes, bytearray))
    if t == "record":
        return isinstance(val, dict)
    if t == "enum":
        return isinstance(val, str)
    if t == "array":
        return isinstance(val, list)
    if t == "map":
        return isinstance(val, dict)
    return False


def write_container(schema: dict, records: list, *,
                    codec: str = "deflate",
                    meta: dict | None = None,
                    sync: bytes = b"\x00" * 16) -> bytes:
    """Serialize ``records`` into an Avro Object Container File.
    ``meta`` adds extra file-metadata entries (str or bytes values) —
    Iceberg stores its table schema / partition spec there.  ``sync``
    is deterministic by default: metadata files are content-addressed
    by path in Iceberg, and a fixed marker keeps exports byte-stable
    for tests (the marker only needs to be consistent WITHIN a file).
    """
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: codec {codec!r} unsupported")
    names: dict = {}
    _prescan_names(schema, names)
    body = io.BytesIO()
    for rec in records:
        _encode(schema, rec, body, names)
    payload = body.getvalue()
    if codec == "deflate":
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        payload = co.compress(payload) + co.flush()
    out = io.BytesIO()
    out.write(MAGIC)
    all_meta = {"avro.schema": json.dumps(schema, separators=(",", ":")),
                "avro.codec": codec}
    for k, v in (meta or {}).items():
        all_meta[k] = v
    out.write(_zigzag(len(all_meta)))
    for k, v in all_meta.items():
        out.write(_enc_bytes(k.encode("utf-8")))
        out.write(_enc_bytes(v if isinstance(v, bytes)
                             else str(v).encode("utf-8")))
    out.write(_zigzag(0))
    out.write(sync)
    if records:
        out.write(_zigzag(len(records)))
        out.write(_zigzag(len(payload)))
        out.write(payload)
        out.write(sync)
    return out.getvalue()


def write_container_file(path: str, schema: dict, records: list,
                         **kw) -> None:
    data = write_container(schema, records, **kw)
    with open(path, "wb") as f:
        f.write(data)
