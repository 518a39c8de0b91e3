"""Vendored pure-python Avro Object Container File (OCF) reader and
writer for a practical schema subset — the Kafka / data-engineering
interchange format (public spec: avro.apache.org/docs/current/
specification, "Object Container Files" + "Binary Encoding").

Layout implemented exactly per spec:

    4 bytes   magic  'Obj\\x01'
    map       file metadata (avro.schema JSON, avro.codec)
    16 bytes  sync marker
    blocks:   count(long) + byte-size(long) + data + sync marker

with the Avro binary encoding: longs/ints are ZIGZAG varints
(n -> (n << 1) ^ (n >> 63)), strings/bytes are length-prefixed,
booleans one byte, doubles little-endian IEEE, null empty. Schema
subset: a top-level ``record`` of primitive fields (null, boolean,
int, long, float→refused, double, bytes, string) — no unions,
arrays, maps, or nested records (those refuse loudly; plug in
fastavro for full schema resolution). Codecs: ``null`` and
``deflate`` (raw zlib per spec). Every structural defect is a hard
ValueError: bad magic, unknown codec, a block whose decoded record
count disagrees, a sync-marker mismatch (corrupted or misaligned
block), or trailing bytes. Reference parity note: the reference
warehouse (/root/reference, PL/pgSQL) ingests only CSV; this module
is commissioned beyond-reference training-data surface (SURVEY.md
§2.10)."""

from __future__ import annotations

import json
import struct
import zlib

MAGIC = b"Obj\x01"

_PRIMITIVES = ("null", "boolean", "int", "long", "double", "bytes", "string")


def _zigzag(n: int) -> bytes:
    """Avro long: zigzag then base-128 varint."""
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_long(b: bytes, pos: int):
    shift = u = 0
    while True:
        if pos >= len(b):
            raise ValueError("truncated Avro varint")
        byte = b[pos]
        u |= (byte & 0x7F) << shift
        pos += 1
        if not byte & 0x80:
            return (u >> 1) ^ -(u & 1), pos  # un-zigzag
        shift += 7
        if shift > 63:
            raise ValueError("Avro varint overflow")


def _validate_schema(schema: dict) -> list:
    if schema.get("type") != "record" or "fields" not in schema:
        raise NotImplementedError("only top-level record schemas supported")
    fields = []
    for f in schema["fields"]:
        t = f["type"]
        if t not in _PRIMITIVES:
            raise NotImplementedError(
                f"field {f['name']!r}: type {t!r} unsupported (primitives "
                "only; unions/arrays/nested records need fastavro)"
            )
        fields.append((f["name"], t))
    return fields


def _encode_value(t: str, v) -> bytes:
    if t == "null":
        return b""
    if t == "boolean":
        return b"\x01" if v else b"\x00"
    if t in ("int", "long"):
        return _zigzag(int(v))
    if t == "double":
        return struct.pack("<d", float(v))
    if t in ("bytes", "string"):
        raw = v.encode() if isinstance(v, str) else bytes(v)
        return _zigzag(len(raw)) + raw
    raise NotImplementedError(t)


def _decode_value(t: str, b: bytes, pos: int):
    if t == "null":
        return None, pos
    if t == "boolean":
        if pos >= len(b):
            raise ValueError("truncated Avro boolean")
        if b[pos] not in (0, 1):
            raise ValueError(f"bad Avro boolean byte {b[pos]}")
        return bool(b[pos]), pos + 1
    if t in ("int", "long"):
        return _read_long(b, pos)
    if t == "double":
        if pos + 8 > len(b):
            raise ValueError("truncated Avro double")
        (v,) = struct.unpack_from("<d", b, pos)
        return v, pos + 8
    if t in ("bytes", "string"):
        n, pos = _read_long(b, pos)
        if n < 0 or pos + n > len(b):
            raise ValueError("truncated Avro bytes/string")
        raw = b[pos : pos + n]
        return (raw.decode() if t == "string" else raw), pos + n
    raise NotImplementedError(t)


def encode_avro_ocf(
    schema: dict,
    records,
    codec: str = "deflate",
    sync: bytes = b"\x00" * 16,
    records_per_block: int = 64,
) -> bytes:
    """Write records (dicts keyed by field name) as an Avro OCF.
    ``sync`` must be 16 bytes; deterministic by default so tests and
    oracles are stable (the spec only requires uniqueness per file)."""
    fields = _validate_schema(schema)
    if len(sync) != 16:
        raise ValueError("sync marker must be 16 bytes")
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"codec {codec!r} (null/deflate only)")
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": codec.encode(),
    }
    out = bytearray(MAGIC)
    out += _zigzag(len(meta))
    for k, v in sorted(meta.items()):
        out += _encode_value("string", k) + _encode_value("bytes", v)
    out += _zigzag(0)  # end of metadata map
    out += sync
    records = list(records)
    for i in range(0, len(records), records_per_block):
        block = records[i : i + records_per_block]
        body = bytearray()
        for rec in block:
            for name, t in fields:
                body += _encode_value(t, rec[name])
        data = bytes(body)
        if codec == "deflate":
            data = zlib.compress(data)[2:-4]  # raw deflate per spec
        out += _zigzag(len(block)) + _zigzag(len(data)) + data + sync
    return bytes(out)


def parse_avro_ocf(blob: bytes):
    """Read an Avro OCF into ``(schema_dict, list_of_record_dicts)``,
    validating magic, codec, per-block record counts, sync markers,
    and exact stream consumption."""
    b = bytes(blob)
    if b[:4] != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _read_long(b, pos)
        if n == 0:
            break
        if n < 0:  # negative count: size-prefixed block form
            _size, pos = _read_long(b, pos)
            n = -n
        for _ in range(n):
            k, pos = _decode_value("string", b, pos)
            v, pos = _decode_value("bytes", b, pos)
            meta[k] = v
    if "avro.schema" not in meta:
        raise ValueError("Avro header missing avro.schema")
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"codec {codec!r} (null/deflate only)")
    fields = _validate_schema(schema)
    sync = b[pos : pos + 16]
    if len(sync) != 16:
        raise ValueError("truncated Avro header sync marker")
    pos += 16
    records = []
    while pos < len(b):
        count, pos = _read_long(b, pos)
        size, pos = _read_long(b, pos)
        if count < 0 or size < 0 or pos + size + 16 > len(b):
            raise ValueError("truncated Avro block")
        data = b[pos : pos + size]
        pos += size
        if b[pos : pos + 16] != sync:
            raise ValueError("Avro block sync marker mismatch")
        pos += 16
        if codec == "deflate":
            data = zlib.decompress(data, wbits=-15)
        dpos = 0
        for _ in range(count):
            rec = {}
            for name, t in fields:
                rec[name], dpos = _decode_value(t, data, dpos)
            records.append(rec)
        if dpos != len(data):
            raise ValueError(
                f"Avro block over-long: {len(data) - dpos} bytes after "
                f"{count} records"
            )
    return schema, records
