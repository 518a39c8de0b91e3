"""Vendored pure-python WARC 1.0 reader/writer (ISO 28500, the
Common Crawl / web-archive interchange format) with per-record gzip
members — the exact on-disk convention of ``.warc.gz`` crawl dumps
(each record is an independently decompressible gzip member, so a
reader can split work without decompressing the whole file).

This is the ingestion front door a training-data pipeline needs for
web corpora: split members (stdlib zlib, streaming, member-by-member
— never a whole-file decompress), parse the WARC header block
(version line + named headers, Content-Length-framed payload, CRLF
CRLF trailer validated byte-exactly), and split HTTP message payloads
into status + body. Everything stricter than the spec refuses loudly:
a truncated member, a payload that disagrees with Content-Length, or
a missing trailer is a hard ValueError, never a silent partial
record. Reference parity note: the reference warehouse
(/root/reference, PL/pgSQL over superstore tables) has no ingestion
format beyond CSV; this module is part of the commissioned
beyond-reference training-data surface (SURVEY.md §2.10).
"""

from __future__ import annotations

import zlib

CRLF = b"\r\n"


def encode_warc_gz(records) -> bytes:
    """Write ``records`` — an iterable of ``(warc_type, headers,
    payload_bytes)`` where ``headers`` is a dict of extra WARC
    headers (e.g. WARC-Target-URI, Content-Type) — as concatenated
    per-record gzip members, the standard ``.warc.gz`` layout."""
    out = bytearray()
    for warc_type, headers, payload in records:
        payload = bytes(payload)
        lines = [b"WARC/1.0", b"WARC-Type: " + warc_type.encode()]
        for k, v in headers.items():
            lines.append(f"{k}: {v}".encode())
        lines.append(b"Content-Length: " + str(len(payload)).encode())
        record = CRLF.join(lines) + CRLF + CRLF + payload + CRLF + CRLF
        co = zlib.compressobj(6, zlib.DEFLATED, 31)  # 31 = gzip wrapper
        out += co.compress(record) + co.flush()
    return bytes(out)


def _split_members(blob: bytes):
    """Yield each gzip member's decompressed bytes. Concatenated
    members are split by feeding the decompressor bounded windows of
    a memoryview and advancing by what each member consumed — LINEAR
    in stream size (a naive ``rest = d.unused_data`` loop re-copies
    the whole remainder per member, O(members x bytes): ruinous on a
    real 1 GB / 50k-record crawl shard). A member that never reaches
    EOF (truncated stream) or fails the gzip CRC is a hard
    ValueError."""
    mv = memoryview(bytes(blob))
    pos, window = 0, 1 << 20
    while pos < len(mv):
        d = zlib.decompressobj(31)
        out = bytearray()
        while not d.eof:
            if pos >= len(mv):
                raise ValueError("truncated gzip member in WARC stream")
            piece = mv[pos : pos + window]
            try:
                out += d.decompress(piece)
            except zlib.error as exc:
                raise ValueError(f"corrupt gzip member: {exc}") from None
            # unused_data is bounded by the window, so the only copy
            # per iteration is at most `window` bytes
            pos += len(piece) - len(d.unused_data)
        out += d.flush()
        yield bytes(out)


def parse_warc_gz(blob: bytes):
    """Parse a ``.warc.gz`` byte string into a list of records, each
    ``{"warc_type", "headers", "payload"}`` with ``headers`` the
    name->value dict (names case-normalized to lower) and ``payload``
    the exact Content-Length bytes. Validates per record: the
    WARC/1.x version line, a mandatory integer Content-Length, the
    blank-line header terminator, and the CRLFCRLF record trailer
    with no trailing garbage."""
    out = []
    for member in _split_members(blob):
        sep = member.find(CRLF + CRLF)
        if sep < 0:
            raise ValueError("WARC record missing header terminator")
        head, rest = member[:sep], member[sep + 4 :]
        lines = head.split(CRLF)
        if not lines[0].startswith(b"WARC/1."):
            raise ValueError(f"bad WARC version line {lines[0]!r}")
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            name, _sep2, val = ln.partition(b":")
            if not _sep2:
                raise ValueError(f"malformed WARC header line {ln!r}")
            headers[name.strip().decode().lower()] = val.strip().decode()
        if "content-length" not in headers:
            raise ValueError("WARC record missing Content-Length")
        n = int(headers["content-length"])
        payload, trailer = rest[:n], rest[n:]
        if len(payload) != n or trailer != CRLF + CRLF:
            raise ValueError(
                f"WARC payload framing broken: have {len(payload)}/{n} "
                f"payload bytes, trailer {trailer!r}"
            )
        if "warc-type" not in headers:
            raise ValueError("WARC record missing WARC-Type")
        out.append(
            {
                "warc_type": headers["warc-type"],
                "headers": headers,
                "payload": payload,
            }
        )
    return out


def split_http_payload(payload: bytes):
    """Split an ``application/http`` WARC payload into
    ``(status_code_or_None, body_bytes)``: responses carry an
    HTTP/1.x status line (parsed and returned), requests a method
    line (status None); either way the body is everything after the
    CRLFCRLF header terminator. Non-HTTP payloads (no HTTP/1.x
    anywhere in the start line) return ``(None, payload)`` whole —
    the warcinfo/metadata case."""
    sep = payload.find(CRLF + CRLF)
    if sep < 0:
        return None, payload
    start_line = payload.split(CRLF, 1)[0]
    body = payload[sep + 4 :]
    if start_line.startswith(b"HTTP/1."):
        parts = start_line.split(b" ")
        if len(parts) < 2 or not parts[1].isdigit():
            raise ValueError(f"malformed HTTP status line {start_line!r}")
        return int(parts[1]), body
    if start_line.endswith(b"HTTP/1.1") or start_line.endswith(b"HTTP/1.0"):
        return None, body  # request: METHOD SP target SP version
    return None, payload
