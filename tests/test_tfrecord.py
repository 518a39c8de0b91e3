"""TFRecord framing + tf.train.Example wire codec + ingestion-query
tests. The CRC32C check value and the golden Example bytes below are
transcribed from the public specs (RFC 3720 §B.4 check value; proto
wire format), not produced by our own encoder — the same
de-circularization discipline as the other codec goldens."""

import struct

import pytest

from global_superstore_data_warehouse_spark.operators.tfrecord import (
    _masked_crc,
    crc32c,
    encode_example,
    encode_tfrecords,
    parse_example,
    parse_tfrecords,
)


def test_crc32c_published_vectors():
    # RFC 3720 appendix B.4 / the universal CRC check value
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0x00000000
    # 32 bytes of zeros, the iSCSI test pattern
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    # 32 bytes of 0xFF
    assert crc32c(b"\xff" * 32) == 0x62A8AB43


def test_tfrecord_golden_frame():
    """One record framed BY HAND: length 3 as uint64le, its masked
    CRC computed from the spec formula, payload b'abc', payload CRC."""
    hdr = struct.pack("<Q", 3)
    frame = (
        hdr
        + struct.pack("<I", _masked_crc(hdr))
        + b"abc"
        + struct.pack("<I", _masked_crc(b"abc"))
    )
    assert parse_tfrecords(frame) == [b"abc"]
    assert encode_tfrecords([b"abc"]) == frame


def test_tfrecord_corruption_refusals():
    blob = bytearray(encode_tfrecords([b"hello", b"world"]))
    with pytest.raises(ValueError, match="record 0: length CRC"):
        bad = bytearray(blob)
        bad[8] ^= 0xFF  # flip a length-CRC byte
        parse_tfrecords(bytes(bad))
    with pytest.raises(ValueError, match="record 0: payload CRC"):
        bad = bytearray(blob)
        bad[12] ^= 0x01  # flip a payload byte
        parse_tfrecords(bytes(bad))
    with pytest.raises(ValueError, match="record 1: truncated"):
        parse_tfrecords(bytes(blob[:-2]))


def test_example_golden_bytes():
    """A one-feature Example laid out BY HAND from the proto wire
    format: Example.features(field 1, LEN) > Features.feature entry
    (field 1, LEN) > key 'id' (field 1, LEN) + value Feature
    (field 2, LEN) > Int64List (field 3, LEN) > packed value
    (field 1, LEN) holding varint 150 (the proto docs' own example
    varint, 0x96 0x01)."""
    packed = bytes([0x96, 0x01])                      # varint 150
    int64_list = bytes([0x0A, len(packed)]) + packed  # field1 LEN
    feature = bytes([0x1A, len(int64_list)]) + int64_list  # field3 LEN
    entry = (
        bytes([0x0A, 2]) + b"id"                      # key
        + bytes([0x12, len(feature)]) + feature       # value
    )
    features = bytes([0x0A, len(entry)]) + entry
    example = bytes([0x0A, len(features)]) + features
    assert parse_example(example) == {"id": [150]}
    assert encode_example({"id": [150]}) == example


def test_example_unpacked_int64_accepted():
    """Proto2-style unpacked repeated int64 (one varint field per
    element) must parse identically to the packed layout."""
    unpacked = bytes([0x08, 0x01, 0x08, 0x96, 0x01])  # field1 varints 1,150
    feature = bytes([0x1A, len(unpacked)]) + unpacked
    entry = bytes([0x0A, 1]) + b"t" + bytes([0x12, len(feature)]) + feature
    features = bytes([0x0A, len(entry)]) + entry
    example = bytes([0x0A, len(features)]) + features
    assert parse_example(example) == {"t": [1, 150]}


def test_example_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        st.dictionaries(
            st.text(
                alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=8
            ),
            st.one_of(
                st.binary(min_size=0, max_size=32),
                st.lists(
                    st.integers(min_value=0, max_value=2**63 - 1),
                    min_size=1,
                    max_size=6,
                ),
            ),
            min_size=1,
            max_size=4,
        )
    )
    def check(features):
        got = parse_example(encode_example(features))
        assert got == features

    check()


def test_example_refusals():
    with pytest.raises(ValueError, match="features=1"):
        parse_example(bytes([0x12, 0x00]))  # field 2, not an Example
    with pytest.raises(ValueError, match="wire type"):
        parse_example(bytes([0x0D, 0, 0, 0, 0]))  # I32 wire type
    with pytest.raises(ValueError, match="truncated"):
        parse_example(bytes([0x0A, 0x7F, 0x01]))  # LEN overruns


def test_tfrecord_ingest_stats_matches_oracle(spark, duck, sf_dir):
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(spark, duck, "tfrecord_ingest_stats", sf_dir)


def test_webdataset_ingest_stats_matches_oracle(spark, duck, sf_dir):
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(spark, duck, "webdataset_ingest_stats", sf_dir)


def test_arrow_ipc_ingest_stats_matches_oracle(spark, duck, sf_dir):
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(spark, duck, "arrow_ipc_ingest_stats", sf_dir)


def test_example_negative_int64_roundtrip():
    """Protobuf encodes negative int64 as the 64-bit two's complement
    in a 10-byte varint; a reader that skips the sign interpretation
    silently turns -1 into 2^64-1. Pin the canonical -1 bytes and the
    full-range round trip."""
    got = parse_example(encode_example({"n": [-1, -(2**63), 2**63 - 1, 0]}))
    assert got == {"n": [-1, -(2**63), 2**63 - 1, 0]}
    # canonical wire bytes for -1: ten bytes, 0xFF x9 + 0x01
    packed = b"\xff" * 9 + b"\x01"
    int64_list = bytes([0x0A, len(packed)]) + packed
    feature = bytes([0x1A, len(int64_list)]) + int64_list
    entry = bytes([0x0A, 1]) + b"n" + bytes([0x12, len(feature)]) + feature
    features = bytes([0x0A, len(entry)]) + entry
    example = bytes([0x0A, len(features)]) + features
    assert parse_example(example) == {"n": [-1]}
    assert encode_example({"n": [-1]}) == example
