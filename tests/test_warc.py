"""WARC reader/writer + warc_ingest_stats tests. The golden record
bytes are laid out BY HAND from ISO 28500 §4 (version line, named
headers, Content-Length framing, CRLFCRLF trailer) — only the gzip
wrapper comes from stdlib zlib, which is not under test — so the
parser is pinned independently of our own encoder."""

import zlib

import pytest

from global_superstore_data_warehouse_spark.operators.warc import (
    encode_warc_gz,
    parse_warc_gz,
    split_http_payload,
)


def _gz(b: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, 31)
    return co.compress(b) + co.flush()


GOLDEN_RECORD = (
    b"WARC/1.0\r\n"
    b"WARC-Type: response\r\n"
    b"WARC-Target-URI: http://example.com/a\r\n"
    b"Content-Type: application/http; msgtype=response\r\n"
    b"Content-Length: 43\r\n"
    b"\r\n"
    b"HTTP/1.1 200 OK\r\n"          # 17 bytes
    b"X: y\r\n"                     # 6
    b"\r\n"                         # 2
    + "hello warc body蜀".encode()  # 15 + 3 (utf-8 CJK) = 18 -> total 43
    + b"\r\n\r\n"
)


def test_warc_parse_golden_bytes():
    recs = parse_warc_gz(_gz(GOLDEN_RECORD))
    assert len(recs) == 1
    r = recs[0]
    assert r["warc_type"] == "response"
    assert r["headers"]["warc-target-uri"] == "http://example.com/a"
    assert len(r["payload"]) == 43
    status, body = split_http_payload(r["payload"])
    assert status == 200
    assert body == "hello warc body蜀".encode()


def test_warc_multi_member_roundtrip():
    recs_in = [
        ("warcinfo", {"Content-Type": "application/warc-fields"},
         b"software: x"),
        ("request", {"WARC-Target-URI": "http://e.com"},
         b"GET / HTTP/1.1\r\nHost: e.com\r\n\r\n"),
        ("response", {"WARC-Target-URI": "http://e.com"},
         b"HTTP/1.1 404 Not Found\r\n\r\ngone"),
    ]
    blob = encode_warc_gz(recs_in)
    got = parse_warc_gz(blob)
    assert [r["warc_type"] for r in got] == ["warcinfo", "request", "response"]
    assert [r["payload"] for r in got] == [p for _t, _h, p in recs_in]
    assert split_http_payload(got[0]["payload"]) == (None, b"software: x")
    assert split_http_payload(got[1]["payload"]) == (None, b"")
    assert split_http_payload(got[2]["payload"]) == (404, b"gone")
    # members are independently decompressible (the .warc.gz property
    # that makes distributed splitting possible): cutting the stream
    # at the second member boundary still yields record 1 whole
    first = _member_lengths(blob)[0]
    assert parse_warc_gz(blob[:first])[0]["payload"] == b"software: x"


def _member_lengths(blob):
    out, rest = [], bytes(blob)
    while rest:
        d = zlib.decompressobj(31)
        d.decompress(rest)
        used = len(rest) - len(d.unused_data)
        out.append(used)
        rest = d.unused_data
    import itertools

    return list(itertools.accumulate(out))


def test_warc_framing_refusals():
    with pytest.raises(ValueError, match="truncated gzip"):
        parse_warc_gz(_gz(GOLDEN_RECORD)[:-5])
    with pytest.raises(ValueError, match="version line"):
        parse_warc_gz(_gz(b"HTTP/1.0\r\nContent-Length: 0\r\n\r\n\r\n\r\n"))
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc_gz(_gz(b"WARC/1.0\r\nWARC-Type: x\r\n\r\n\r\n\r\n"))
    with pytest.raises(ValueError, match="framing"):
        # payload shorter than Content-Length claims
        parse_warc_gz(_gz(
            b"WARC/1.0\r\nWARC-Type: x\r\nContent-Length: 99\r\n\r\nhi\r\n\r\n"
        ))
    with pytest.raises(ValueError, match="framing"):
        # trailing garbage after the CRLFCRLF trailer
        parse_warc_gz(_gz(
            b"WARC/1.0\r\nWARC-Type: x\r\nContent-Length: 2\r\n\r\nhi\r\n\r\nZ"
        ))
    with pytest.raises(ValueError, match="WARC-Type"):
        parse_warc_gz(_gz(b"WARC/1.0\r\nContent-Length: 0\r\n\r\n\r\n\r\n"))
    with pytest.raises(ValueError, match="status line"):
        split_http_payload(b"HTTP/1.1 abc\r\n\r\nbody")


def test_warc_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.sampled_from(["response", "request", "metadata"]),
                st.binary(min_size=0, max_size=64),
            ),
            min_size=1,
            max_size=5,
        )
    )
    def check(pairs):
        recs = [(t, {"X-N": "v"}, p) for t, p in pairs]
        got = parse_warc_gz(encode_warc_gz(recs))
        assert [(r["warc_type"], r["payload"]) for r in got] == [
            (t, p) for t, p in pairs
        ]

    check()


def test_warc_ingest_stats_matches_oracle(spark, duck, sf_dir):
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(spark, duck, "warc_ingest_stats", sf_dir)


def test_warc_corrupt_gzip_is_value_error():
    """The documented error contract is ValueError for any framing
    defect — zlib.error must not leak through on a bad CRC or
    garbage between members."""
    blob = bytearray(encode_warc_gz([("metadata", {}, b"payload-xyz")]))
    blob[-5] ^= 0xFF  # corrupt the gzip CRC32 trailer
    with pytest.raises(ValueError, match="corrupt gzip"):
        parse_warc_gz(bytes(blob))
    ok = encode_warc_gz([("metadata", {}, b"p")])
    with pytest.raises(ValueError, match="corrupt gzip|truncated gzip"):
        parse_warc_gz(ok + b"garbage-not-gzip")


def test_warc_member_split_is_linear():
    """Many-member streams must split by advancing an offset, not by
    re-copying the remainder per member — 2k members should parse in
    well under a second (the quadratic form took minutes at crawl
    scale)."""
    import time

    recs = [("metadata", {}, b"x" * 50) for _ in range(2000)]
    blob = encode_warc_gz(recs)
    t0 = time.perf_counter()
    got = parse_warc_gz(blob)
    assert len(got) == 2000
    assert time.perf_counter() - t0 < 5.0
