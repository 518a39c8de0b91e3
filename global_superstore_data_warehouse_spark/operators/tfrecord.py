"""Vendored pure-python TFRecord reader/writer — the TensorFlow
training-shard format (public spec: tensorflow/core/lib/io/
record_writer.h; the same framing tf.data and every ML data loader
speaks):

    uint64le  length
    uint32le  masked_crc32c(length bytes)
    byte[length] payload
    uint32le  masked_crc32c(payload)

CRC32C is the Castagnoli polynomial (0x1EDC6F41, reflected
0x82F63B78 — the iSCSI/ext4 CRC, NOT zlib's CRC32), implemented
table-driven below and pinned by the published check value
crc32c(b"123456789") == 0xE3069283. The mask is TFRecord's
rotate-and-add: ((crc >> 15) | (crc << 17)) + 0xA282EAD8 (mod 2^32),
applied so that CRCs of CRCs stay well-distributed.

Every framing defect is a hard error — a truncated record, a length
CRC mismatch (corrupted header), or a payload CRC mismatch
(corrupted data) raises ValueError with the record index, never a
silent partial read. This is the third ingestion front door next to
WARC (web archives) and the AVI/WAV/image codecs (media): training
shards round-trip through Spark as binary columns with the framing
validated record-exactly. Reference parity note: the reference
warehouse (/root/reference, PL/pgSQL) has no binary formats; this is
commissioned beyond-reference training-data surface (SURVEY.md
§2.10)."""

from __future__ import annotations

import struct

_CRC32C_POLY = 0x82F63B78  # Castagnoli, reflected


def _make_table():
    table = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ _CRC32C_POLY if c & 1 else c >> 1
        table.append(c)
    return table


_TABLE = _make_table()


def crc32c(data: bytes, crc: int = 0) -> int:
    """Plain table-driven CRC32C (Castagnoli). Published check value:
    crc32c(b"123456789") == 0xE3069283."""
    c = crc ^ 0xFFFFFFFF
    for b in bytes(data):
        c = (c >> 8) ^ _TABLE[(c ^ b) & 0xFF]
    return c ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def encode_tfrecords(payloads) -> bytes:
    """Frame each payload as one TFRecord: length + masked length
    CRC + payload + masked payload CRC, concatenated."""
    out = bytearray()
    for p in payloads:
        p = bytes(p)
        hdr = struct.pack("<Q", len(p))
        out += hdr
        out += struct.pack("<I", _masked_crc(hdr))
        out += p
        out += struct.pack("<I", _masked_crc(p))
    return bytes(out)


def parse_tfrecords(blob: bytes):
    """Parse a TFRecord shard into the list of payload byte strings,
    validating both masked CRCs per record and exact stream length."""
    b = bytes(blob)
    out, pos, i = [], 0, 0
    while pos < len(b):
        if pos + 12 > len(b):
            raise ValueError(f"record {i}: truncated header at byte {pos}")
        hdr = b[pos : pos + 8]
        (n,) = struct.unpack("<Q", hdr)
        (want_hcrc,) = struct.unpack_from("<I", b, pos + 8)
        if _masked_crc(hdr) != want_hcrc:
            raise ValueError(f"record {i}: length CRC mismatch")
        pos += 12
        if pos + n + 4 > len(b):
            raise ValueError(f"record {i}: truncated payload ({n} bytes)")
        payload = b[pos : pos + n]
        (want_pcrc,) = struct.unpack_from("<I", b, pos + n)
        if _masked_crc(payload) != want_pcrc:
            raise ValueError(f"record {i}: payload CRC mismatch")
        out.append(payload)
        pos += n + 4
        i += 1
    return out


# --- minimal tf.train.Example wire codec -------------------------------
# The payload INSIDE training-shard records is a tf.train.Example
# protobuf. google.protobuf is not installed in this container, but
# the proto wire format is a public spec (varints + tagged fields +
# length-delimited blocks) and tf.train.Example is three tiny nested
# messages:
#   Example  { Features features = 1; }
#   Features { map<string, Feature> feature = 1; }   // repeated entry
#   Feature  { oneof { BytesList bytes_list = 1;
#                      FloatList float_list = 2;
#                      Int64List int64_list = 3; } }
#   BytesList { repeated bytes value = 1; }
#   Int64List { repeated int64 value = 1; }          // packed
# This codec writes/reads exactly that shape (bytes + non-negative
# int64 features; packed AND unpacked int64 accepted on read), so a
# real tf.data reader can consume what we write and vice versa.


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(b: bytes, pos: int):
    """Unsigned varint for tags and lengths (< 2^64; a tag or length
    needing the 10th byte's high bits is malformed)."""
    shift = n = 0
    while True:
        if pos >= len(b):
            raise ValueError("truncated varint")
        byte = b[pos]
        n |= (byte & 0x7F) << shift
        pos += 1
        if not byte & 0x80:
            if n >= 1 << 64:
                raise ValueError("varint overflow")
            return n, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint overflow")


def _read_int64(b: bytes, pos: int):
    """int64 VALUE varint: protobuf encodes negative int64 as the
    64-bit two's complement in a 10-byte varint, so values >= 2^63
    wrap to their negative interpretation (a reader that skips this
    silently turns -1 into 18446744073709551615)."""
    u, pos = _read_varint(b, pos)
    return (u - (1 << 64) if u >= 1 << 63 else u), pos


def _ld(field: int, payload: bytes) -> bytes:
    """One length-delimited (wire type 2) field."""
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def encode_example(features: dict) -> bytes:
    """Serialize ``{name: bytes | str | list[int]}`` as a
    tf.train.Example. Strings/bytes become BytesList, int lists
    become packed Int64List; negative int64s get protobuf's
    canonical 10-byte two's-complement varint."""
    entries = bytearray()
    for name, val in features.items():
        if isinstance(val, str):
            val = val.encode()
        if isinstance(val, (bytes, bytearray)):
            feature = _ld(1, _ld(1, bytes(val)))  # bytes_list.value
        else:
            packed = bytearray()
            for v in val:
                v = int(v)
                if not -(1 << 63) <= v < 1 << 63:
                    raise ValueError(f"{v} does not fit int64")
                packed += _varint(v + (1 << 64) if v < 0 else v)
            feature = _ld(3, _ld(1, bytes(packed)))  # int64_list.value
        entries += _ld(1, _ld(1, name.encode()) + _ld(2, feature))
    return _ld(1, bytes(entries))  # Example.features


def parse_example(blob: bytes) -> dict:
    """Parse a tf.train.Example into ``{name: bytes | list[int]}``.
    Unknown fields/wire types are hard errors (this is a validator,
    not a lenient skimmer); int64 lists accept packed and unpacked
    encodings."""
    def fields(b: bytes):
        pos = 0
        while pos < len(b):
            tag, pos = _read_varint(b, pos)
            field, wt = tag >> 3, tag & 7
            if wt == 2:
                n, pos = _read_varint(b, pos)
                if pos + n > len(b):
                    raise ValueError("truncated length-delimited field")
                yield field, b[pos : pos + n]
                pos += n
            elif wt == 0:
                v, pos = _read_varint(b, pos)
                yield field, v
            else:
                raise ValueError(f"unsupported wire type {wt}")

    b = bytes(blob)
    out: dict = {}
    ex = dict(fields(b))
    if set(ex) != {1}:
        raise ValueError("not a tf.train.Example (expected features=1)")
    for field, entry in fields(ex[1]):
        if field != 1:
            raise ValueError(f"unexpected Features field {field}")
        name = value = None
        for f2, v2 in fields(entry):
            if f2 == 1:
                name = v2.decode()
            elif f2 == 2:
                value = v2
        if name is None or value is None:
            raise ValueError("map entry missing key or value")
        kind = dict(fields(value))
        if 1 in kind:  # BytesList
            vals = [v for f3, v in fields(kind[1]) if f3 == 1]
            out[name] = vals[0] if len(vals) == 1 else vals
        elif 3 in kind:  # Int64List, packed or unpacked
            ints: list[int] = []
            for f3, v in fields(kind[3]):
                if f3 != 1:
                    raise ValueError(f"unexpected Int64List field {f3}")
                if isinstance(v, int):
                    # unpacked varint: re-apply int64 interpretation
                    ints.append(v - (1 << 64) if v >= 1 << 63 else v)
                else:
                    pos = 0
                    while pos < len(v):
                        n, pos = _read_int64(v, pos)
                        ints.append(n)
            out[name] = ints
        else:
            raise ValueError(f"unsupported Feature kind {sorted(kind)}")
    return out
