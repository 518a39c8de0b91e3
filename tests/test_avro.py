"""Avro OCF codec + avro_ingest_stats tests. The zigzag table and
the golden container are transcribed from the Avro specification
(binary-encoding examples + the OCF layout), laid out by hand so the
reader is pinned independently of our writer."""

import json
import struct
import zlib

import pytest

from global_superstore_data_warehouse_spark.operators.avro import (
    _zigzag,
    encode_avro_ocf,
    parse_avro_ocf,
)

SCHEMA = {
    "type": "record",
    "name": "T",
    "fields": [
        {"name": "n", "type": "long"},
        {"name": "s", "type": "string"},
    ],
}


def test_zigzag_spec_table():
    """The exact example table from the Avro spec's binary-encoding
    section."""
    want = {0: "00", -1: "01", 1: "02", -2: "03", 2: "04",
            -64: "7f", 64: "8001"}
    for n, hx in want.items():
        assert _zigzag(n).hex() == hx, n


def _hand_laid_ocf(codec=b"null", sync=b"S" * 16, count=2, body=None,
                   block_sync=None):
    """OCF assembled by hand: magic, 2-entry metadata map, sync,
    one block. Body default: records (1, 'a') and (-1, 'bc')."""
    schema_json = json.dumps(SCHEMA, separators=(",", ":")).encode()
    if body is None:
        body = (
            bytes([0x02]) + bytes([0x02]) + b"a"      # n=1, s='a'
            + bytes([0x01]) + bytes([0x04]) + b"bc"   # n=-1, s='bc'
        )
    data = body if codec == b"null" else zlib.compress(body)[2:-4]
    out = (
        b"Obj\x01"
        + bytes([0x04])  # map: 2 entries
        + _zigzag(len(b"avro.codec")) + b"avro.codec"
        + _zigzag(len(codec)) + codec
        + _zigzag(len(b"avro.schema")) + b"avro.schema"
        + _zigzag(len(schema_json)) + schema_json
        + bytes([0x00])  # end of map
        + sync
        + _zigzag(count) + _zigzag(len(data)) + data
        + (block_sync if block_sync is not None else sync)
    )
    return out


def test_avro_parse_golden_bytes():
    for codec in (b"null", b"deflate"):
        schema, recs = parse_avro_ocf(_hand_laid_ocf(codec=codec))
        assert schema == SCHEMA
        assert recs == [{"n": 1, "s": "a"}, {"n": -1, "s": "bc"}]


def test_avro_encoder_matches_hand_layout():
    """Byte-identical to the hand layout for the null codec (the
    writer sorts metadata keys and uses one block)."""
    got = encode_avro_ocf(
        SCHEMA,
        [{"n": 1, "s": "a"}, {"n": -1, "s": "bc"}],
        codec="null",
        sync=b"S" * 16,
    )
    assert got == _hand_laid_ocf()


def test_avro_validation_refusals():
    with pytest.raises(ValueError, match="magic"):
        parse_avro_ocf(b"PAR1" + b"\x00" * 40)
    with pytest.raises(ValueError, match="sync marker mismatch"):
        parse_avro_ocf(_hand_laid_ocf(block_sync=b"X" * 16))
    with pytest.raises(ValueError, match="over-long"):
        parse_avro_ocf(_hand_laid_ocf(count=1))  # 2 records in body
    with pytest.raises(ValueError, match="truncated Avro block"):
        parse_avro_ocf(_hand_laid_ocf()[:-3])
    with pytest.raises(NotImplementedError, match="codec"):
        parse_avro_ocf(_hand_laid_ocf(codec=b"snappy"))
    with pytest.raises(NotImplementedError, match="unsupported"):
        bad = {"type": "record", "name": "B",
               "fields": [{"name": "a", "type": {"type": "array",
                                                 "items": "long"}}]}
        encode_avro_ocf(bad, [])


def test_avro_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    schema = {
        "type": "record",
        "name": "P",
        "fields": [
            {"name": "n", "type": "long"},
            {"name": "b", "type": "bytes"},
            {"name": "f", "type": "boolean"},
            {"name": "x", "type": "double"},
        ],
    }

    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=-(2**63), max_value=2**63 - 1),
                st.binary(max_size=24),
                st.booleans(),
                st.floats(allow_nan=False, allow_infinity=False),
            ),
            max_size=12,
        ),
        st.sampled_from(["null", "deflate"]),
        st.integers(min_value=1, max_value=5),
    )
    def check(rows, codec, per_block):
        recs = [{"n": n, "b": b, "f": f, "x": x} for n, b, f, x in rows]
        _s, got = parse_avro_ocf(
            encode_avro_ocf(schema, recs, codec=codec,
                            records_per_block=per_block)
        )
        assert got == recs

    check()


def test_avro_ingest_stats_matches_oracle(spark, duck, sf_dir):
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(spark, duck, "avro_ingest_stats", sf_dir)


def test_avro_truncated_values_are_value_errors():
    """A block whose framing is self-consistent but whose data is
    shorter than the schema demands must raise ValueError (the
    documented contract), not struct.error/IndexError."""
    for schema_t, body in (
        ("double", b"\x01\x02"),      # needs 8 bytes
        ("boolean", b""),             # needs 1 byte
        ("long", b"\x80"),            # unterminated varint
        ("string", bytes([0x06]) + b"ab"),  # claims 3 bytes, has 2
    ):
        schema = {"type": "record", "name": "T",
                  "fields": [{"name": "v", "type": schema_t}]}
        sj = json.dumps(schema, separators=(",", ":")).encode()
        ocf = (
            b"Obj\x01"
            + bytes([0x04])
            + _zigzag(len(b"avro.codec")) + b"avro.codec"
            + _zigzag(4) + b"null"
            + _zigzag(len(b"avro.schema")) + b"avro.schema"
            + _zigzag(len(sj)) + sj
            + bytes([0x00])
            + b"S" * 16
            + _zigzag(1) + _zigzag(len(body)) + body
            + b"S" * 16
        )
        with pytest.raises(ValueError, match="truncated Avro|over-long"):
            parse_avro_ocf(ocf)
