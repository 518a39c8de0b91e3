"""Web-archive ingestion query (beyond-reference): the ``.warc.gz``
front door of a training-data pipeline, exercised end-to-end —
per-record gzip member splitting, WARC header parsing,
Content-Length framing, and HTTP payload splitting all run
distributed inside one Arrow-batched mapInPandas stage, and the
oracle recomputes every emitted value arithmetically from the
generator parameters (string lengths and md5 in SQL), so the parser
is value-checked, never just shape-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from global_superstore_data_warehouse_spark.catalog import load

WARC_STATS_SCHEMA = (
    "doc_id long, rec_index int, warc_type string, content_length long, "
    "http_status int, body_len long, body_md5 string"
)


def warc_ingest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END WARC INGESTION: build a genuine ``.warc.gz`` blob
    per document — three records in the Common Crawl layout
    (warcinfo, request, response; each its own gzip member), the
    response payload a full HTTP/1.1 message whose body is the
    document text — then split members, parse WARC headers, validate
    Content-Length framing, and strip HTTP headers with the vendored
    pure-python reader (``operators/warc.py``). Emits one row per
    record: the WARC-declared content length, the parsed HTTP status
    (null for non-response records), and the extracted body's length
    and md5. One mapInPandas stage, zero shuffle, partition-parallel
    — at 100 TB this is exactly the shape of a crawl-dump ingest:
    each executor streams its own members, nothing driver-side.

    The oracle never sees the bytes: it reassembles the same HTTP
    strings in SQL (octet_length for the framing math, DuckDB md5
    for the digests — the corpus is ASCII, so VARCHAR md5 ==
    byte md5), which catches off-by-CRLF framing errors, header/body
    split defects, and member-boundary bugs as value mismatches.
    Encode/parse circularity is broken by golden hand-laid WARC
    bytes + refusal tests in tests/test_warc.py."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    def parse_batches(batches):
        import hashlib as _hashlib

        import pandas as _pd

        from global_superstore_data_warehouse_spark.operators.warc import (
            encode_warc_gz,
            parse_warc_gz,
            split_http_payload,
        )

        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "rec_index", "warc_type", "content_length",
                "http_status", "body_len", "body_md5",
            )}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                body = str(text).encode()
                uri = f"http://corpus.example/doc/{d}"
                request = (
                    f"GET /doc/{d} HTTP/1.1\r\n"
                    "Host: corpus.example\r\n\r\n"
                ).encode()
                response = (
                    "HTTP/1.1 200 OK\r\n"
                    "Content-Type: text/plain\r\n"
                    f"Content-Length: {len(body)}\r\n\r\n"
                ).encode() + body
                blob = encode_warc_gz([
                    ("warcinfo",
                     {"Content-Type": "application/warc-fields"},
                     f"warcinfo for doc {d}".encode()),
                    ("request",
                     {"WARC-Target-URI": uri,
                      "Content-Type": "application/http; msgtype=request"},
                     request),
                    ("response",
                     {"WARC-Target-URI": uri,
                      "Content-Type": "application/http; msgtype=response"},
                     response),
                ])
                for i, rec in enumerate(parse_warc_gz(blob)):
                    status, rec_body = split_http_payload(rec["payload"])
                    out["doc_id"].append(d)
                    out["rec_index"].append(i)
                    out["warc_type"].append(rec["warc_type"])
                    out["content_length"].append(
                        int(rec["headers"]["content-length"])
                    )
                    out["http_status"].append(status)
                    out["body_len"].append(len(rec_body))
                    out["body_md5"].append(
                        _hashlib.md5(rec_body).hexdigest()
                    )
            yield _pd.DataFrame(out)

    return docs.mapInPandas(parse_batches, WARC_STATS_SCHEMA)


# The oracle rebuilds the same strings: chr(13)||chr(10) is CRLF
# (DuckDB string literals do not interpret backslash escapes).
WARC_INGEST_STATS_ORACLE = """
    WITH d AS (
        SELECT doc_id, text,
               CAST(octet_length(encode(text)) AS BIGINT) AS tl,
               chr(13) || chr(10) AS nl
        FROM documents
    )
    SELECT doc_id,
           0 AS rec_index,
           'warcinfo' AS warc_type,
           CAST(octet_length(encode('warcinfo for doc ' || doc_id)) AS BIGINT)
               AS content_length,
           CAST(NULL AS INTEGER) AS http_status,
           CAST(octet_length(encode('warcinfo for doc ' || doc_id)) AS BIGINT)
               AS body_len,
           md5('warcinfo for doc ' || doc_id) AS body_md5
    FROM d
    UNION ALL
    SELECT doc_id, 1, 'request',
           CAST(octet_length(encode('GET /doc/' || doc_id || ' HTTP/1.1' || nl
                || 'Host: corpus.example' || nl || nl)) AS BIGINT),
           CAST(NULL AS INTEGER),
           0,
           md5('')
    FROM d
    UNION ALL
    SELECT doc_id, 2, 'response',
           CAST(octet_length(encode('HTTP/1.1 200 OK' || nl
                || 'Content-Type: text/plain' || nl
                || 'Content-Length: ' || tl || nl || nl)) AS BIGINT) + tl,
           200,
           tl,
           md5(text)
    FROM d
"""
