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


# --- TFRecord training-shard ingestion ----------------------------------

TFRECORD_STATS_SCHEMA = (
    "doc_id long, rec_index int, text_len long, text_md5 string, "
    "n_tokens int, sum_tokens long"
)


def tfrecord_ingest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END TFRECORD INGESTION: build a genuine TFRecord
    training shard per document — 1..3 records, each a real
    tf.train.Example protobuf (hand-rolled wire codec in
    ``operators/tfrecord.py``: varints, length-delimited fields,
    packed Int64List) framed with the masked-CRC32C record layout —
    then parse the shard back record-exactly (both CRCs validated per
    record) and the Example protos field-exactly, emitting per-record
    text and token statistics. One mapInPandas stage, zero shuffle —
    the shape of a shard-audit pass over a 100 TB tf.data corpus.

    The oracle recomputes every value from the generator parameters
    (token formulas, text length, DuckDB md5), so a CRC defect, a
    varint boundary bug, or a proto field mix-up all surface as value
    mismatches. The CRC32C implementation is pinned separately to the
    published check value in tests/test_tfrecord.py."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    def parse_batches(batches):
        import hashlib as _hashlib

        import pandas as _pd

        from global_superstore_data_warehouse_spark.operators.tfrecord import (
            encode_example,
            encode_tfrecords,
            parse_example,
            parse_tfrecords,
        )

        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "rec_index", "text_len", "text_md5",
                "n_tokens", "sum_tokens",
            )}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                body = str(text).encode()
                k = 1 + d % 3
                shard = encode_tfrecords(
                    encode_example({
                        "doc_id": [d],
                        "seq": [i],
                        "text": body,
                        "tokens": [d % 97, i * 7, (d + i) % 13],
                    })
                    for i in range(k)
                )
                for payload in parse_tfrecords(shard):
                    ex = parse_example(payload)
                    toks = ex["tokens"]
                    out["doc_id"].append(ex["doc_id"][0])
                    out["rec_index"].append(ex["seq"][0])
                    out["text_len"].append(len(ex["text"]))
                    out["text_md5"].append(
                        _hashlib.md5(ex["text"]).hexdigest()
                    )
                    out["n_tokens"].append(len(toks))
                    out["sum_tokens"].append(sum(toks))
            yield _pd.DataFrame(out)

    return docs.mapInPandas(parse_batches, TFRECORD_STATS_SCHEMA)


TFRECORD_INGEST_STATS_ORACLE = """
    WITH d AS (
        SELECT doc_id, text, 1 + doc_id % 3 AS k FROM documents
    )
    SELECT doc_id,
           CAST(t.i AS INTEGER) AS rec_index,
           CAST(octet_length(encode(text)) AS BIGINT) AS text_len,
           md5(text) AS text_md5,
           3 AS n_tokens,
           CAST(doc_id % 97 + t.i * 7 + (doc_id + t.i) % 13 AS BIGINT)
               AS sum_tokens
    FROM d, LATERAL (SELECT unnest(range(0, k)) AS i) t
"""


# --- WebDataset (tar-of-samples) ingestion -------------------------------

WEBDATASET_STATS_SCHEMA = (
    "doc_id long, sample_key string, txt_len long, txt_md5 string, "
    "img_width int, img_height int, mean_r int"
)


def webdataset_ingest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END WEBDATASET INGESTION: the tar-of-samples layout
    multimodal training sets ship in (one POSIX tar per shard; each
    sample is the group of members sharing a basename stem —
    ``{key}.txt`` caption next to ``{key}.bmp`` image). Builds a
    genuine tar per document (stdlib tarfile over in-memory bytes —
    tar is a public, stdlib-covered format, so no vendored parser is
    needed), reads it back member-by-member, groups members into
    samples by stem, decodes the image member with the vendored BMP
    decoder, and emits one row per sample pairing caption stats with
    decoded-pixel stats. One mapInPandas stage, zero shuffle —
    exactly how a WebDataset-style loader audits shards at scale:
    each executor opens only its own tars.

    The oracle recomputes caption length/md5 and the image mean from
    the generator parameters (fill = (doc_id*13+7) % 256), so a
    member-pairing bug, a caption/image swap, or any decoder defect
    breaks the value hash."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    def parse_batches(batches):
        import hashlib as _hashlib
        import io as _io
        import tarfile as _tarfile

        import numpy as _np
        import pandas as _pd

        from global_superstore_data_warehouse_spark.operators.multimodal import (
            decode_image,
            encode_bmp,
        )

        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "sample_key", "txt_len", "txt_md5",
                "img_width", "img_height", "mean_r",
            )}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                key = f"{d:09d}"
                caption = str(text).encode()
                w, h = 3 + d % 5, 2 + d % 4
                fill = (d * 13 + 7) % 256
                px = _np.full((h, w, 3), fill, dtype=_np.uint8)
                buf = _io.BytesIO()
                with _tarfile.open(fileobj=buf, mode="w") as tf:
                    for name, data in (
                        (f"{key}.txt", caption),
                        (f"{key}.bmp", encode_bmp(w, h, px)),
                    ):
                        info = _tarfile.TarInfo(name)
                        info.size = len(data)
                        tf.addfile(info, _io.BytesIO(data))
                samples: dict = {}
                with _tarfile.open(
                    fileobj=_io.BytesIO(buf.getvalue())
                ) as tf:
                    for m in tf.getmembers():
                        stem, _dot, ext = m.name.partition(".")
                        samples.setdefault(stem, {})[ext] = (
                            tf.extractfile(m).read()
                        )
                for stem, members in samples.items():
                    img = decode_image(members["bmp"])
                    txt = members["txt"]
                    out["doc_id"].append(d)
                    out["sample_key"].append(stem)
                    out["txt_len"].append(len(txt))
                    out["txt_md5"].append(_hashlib.md5(txt).hexdigest())
                    out["img_width"].append(img.shape[1])
                    out["img_height"].append(img.shape[0])
                    out["mean_r"].append(int(img[:, :, 0].mean()))
            yield _pd.DataFrame(out)

    return docs.mapInPandas(parse_batches, WEBDATASET_STATS_SCHEMA)


WEBDATASET_INGEST_STATS_ORACLE = """
    SELECT doc_id,
           -- printf, not lpad: lpad TRUNCATES an id past 9 digits,
           -- while the plan's f"{d:09d}" only ever pads
           printf('%09d', doc_id) AS sample_key,
           CAST(octet_length(encode(text)) AS BIGINT) AS txt_len,
           md5(text) AS txt_md5,
           CAST(3 + doc_id % 5 AS INTEGER) AS img_width,
           CAST(2 + doc_id % 4 AS INTEGER) AS img_height,
           CAST((doc_id * 13 + 7) % 256 AS INTEGER) AS mean_r
    FROM documents
"""


# --- Avro object-container ingestion -------------------------------------

AVRO_STATS_SCHEMA = (
    "doc_id long, rec_index int, event_id long, name_len int, "
    "payload_md5 string, metric_x2 long"
)


def avro_ingest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END AVRO INGESTION: build a genuine Avro Object
    Container File per document — 2..4 records of a primitive record
    schema (long / string / bytes / double / boolean), zigzag-varint
    binary encoding, sync-marker blocks, codec alternating deflate /
    null by doc parity so both decompression paths run distributed —
    then parse it back with the vendored pure-python reader
    (``operators/avro.py``), validating magic, codec, per-block
    record counts, sync markers, and exact block consumption. One
    mapInPandas stage, zero shuffle — the Kafka-archive / data-lake
    interchange ingest shape.

    event_id is deliberately sign-mixed so the zigzag decode is
    value-checked (a shift-vs-arithmetic-shift bug flips negatives),
    and metric is a half-integer reported as metric*2 so the double
    path stays hash-exact. The oracle recomputes everything from the
    generator formulas; the zigzag table and OCF golden bytes are
    pinned separately in tests/test_avro.py."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    schema = {
        "type": "record",
        "name": "Event",
        "fields": [
            {"name": "event_id", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "payload", "type": "bytes"},
            {"name": "metric", "type": "double"},
            {"name": "keep", "type": "boolean"},
        ],
    }

    def parse_batches(batches):
        import hashlib as _hashlib

        import pandas as _pd

        from global_superstore_data_warehouse_spark.operators.avro import (
            encode_avro_ocf,
            parse_avro_ocf,
        )

        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "rec_index", "event_id", "name_len",
                "payload_md5", "metric_x2",
            )}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                body = str(text).encode()
                k = 2 + d % 3
                recs = [
                    {
                        "event_id": (d % 11) - 5 + i * 3,  # sign-mixed
                        "name": f"evt-{d}-{i}",
                        "payload": body,
                        "metric": i + 0.5,
                        "keep": i % 2 == 0,
                    }
                    for i in range(k)
                ]
                codec = "deflate" if d % 2 == 0 else "null"
                blob = encode_avro_ocf(
                    schema, recs, codec=codec, records_per_block=2
                )
                _schema2, got = parse_avro_ocf(blob)
                for i, rec in enumerate(got):
                    out["doc_id"].append(d)
                    out["rec_index"].append(i)
                    out["event_id"].append(rec["event_id"])
                    out["name_len"].append(len(rec["name"]))
                    out["payload_md5"].append(
                        _hashlib.md5(rec["payload"]).hexdigest()
                    )
                    out["metric_x2"].append(int(rec["metric"] * 2))
            yield _pd.DataFrame(out)

    return docs.mapInPandas(parse_batches, AVRO_STATS_SCHEMA)


AVRO_INGEST_STATS_ORACLE = """
    WITH d AS (
        SELECT doc_id, text, 2 + doc_id % 3 AS k FROM documents
    )
    SELECT doc_id,
           CAST(t.i AS INTEGER) AS rec_index,
           CAST((doc_id % 11) - 5 + t.i * 3 AS BIGINT) AS event_id,
           CAST(length('evt-' || doc_id || '-' || t.i) AS INTEGER)
               AS name_len,
           md5(text) AS payload_md5,
           CAST(t.i * 2 + 1 AS BIGINT) AS metric_x2
    FROM d, LATERAL (SELECT unnest(range(0, k)) AS i) t
"""


# --- Arrow IPC stream ingestion ------------------------------------------

ARROW_IPC_STATS_SCHEMA = (
    "doc_id long, n_batches int, n_rows long, sum_val long, "
    "min_val long, max_val long, schema_sig string"
)


def arrow_ipc_ingest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END ARROW IPC INGESTION: build a genuine Arrow IPC
    STREAM per document (pyarrow is part of this engine's substrate —
    it already carries every mapInPandas batch — so unlike the
    vendored codecs there is nothing to hand-roll: the point here is
    the zero-copy interchange path, not a parser), holding 1..3
    record batches of (idx int64, val int64, tag utf8), then read the
    stream back batch-by-batch with ``pyarrow.ipc.open_stream`` and
    reduce to per-doc statistics without ever materializing a pandas
    copy of the payload (Arrow compute over the raw buffers). One
    mapInPandas stage, zero shuffle — the shape of auditing a lake of
    ``.arrows`` interchange files where each executor memory-maps its
    own shards.

    val = (doc_id * 17 + i * i) % 1001 over i in [0, 8*n_batches) is
    recomputed arithmetically by the oracle (sum / min / max per
    doc), and schema_sig pins the exact field names+types so a
    writer/reader type drift breaks the hash."""
    docs = load(spark, sf_dir, "documents").select("doc_id")

    def parse_batches(batches):
        import pandas as _pd
        import pyarrow as _pa
        import pyarrow.compute as _pc
        import pyarrow.ipc as _ipc

        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "n_batches", "n_rows", "sum_val",
                "min_val", "max_val", "schema_sig",
            )}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                nb = 1 + d % 3
                schema = _pa.schema([
                    ("idx", _pa.int64()),
                    ("val", _pa.int64()),
                    ("tag", _pa.utf8()),
                ])
                sink = _pa.BufferOutputStream()
                with _ipc.new_stream(sink, schema) as writer:
                    for b in range(nb):
                        idx = list(range(b * 8, (b + 1) * 8))
                        writer.write_batch(_pa.record_batch([
                            _pa.array(idx, _pa.int64()),
                            _pa.array(
                                [(d * 17 + i * i) % 1001 for i in idx],
                                _pa.int64(),
                            ),
                            _pa.array([f"t{i % 4}" for i in idx]),
                        ], schema=schema))
                blob = sink.getvalue().to_pybytes()

                got_batches = []
                with _ipc.open_stream(_pa.py_buffer(blob)) as reader:
                    rschema = reader.schema
                    for batch in reader:
                        got_batches.append(batch)
                vals = _pa.chunked_array(
                    [b.column("val") for b in got_batches]
                )
                agg = _pc.min_max(vals)
                out["doc_id"].append(d)
                out["n_batches"].append(len(got_batches))
                out["n_rows"].append(sum(b.num_rows for b in got_batches))
                out["sum_val"].append(_pc.sum(vals).as_py())
                out["min_val"].append(agg["min"].as_py())
                out["max_val"].append(agg["max"].as_py())
                out["schema_sig"].append(
                    ",".join(f"{f.name}:{f.type}" for f in rschema)
                )
            yield _pd.DataFrame(out)

    return docs.mapInPandas(parse_batches, ARROW_IPC_STATS_SCHEMA)


ARROW_IPC_INGEST_STATS_ORACLE = """
    WITH d AS (
        SELECT doc_id, 1 + doc_id % 3 AS nb FROM documents
    ),
    v AS (
        SELECT doc_id, nb,
               list_transform(range(0, nb * 8),
                              i -> (doc_id * 17 + i * i) % 1001) AS vals
        FROM d
    )
    SELECT doc_id,
           CAST(nb AS INTEGER) AS n_batches,
           CAST(nb * 8 AS BIGINT) AS n_rows,
           CAST(list_aggregate(vals, 'sum') AS BIGINT) AS sum_val,
           CAST(list_min(vals) AS BIGINT) AS min_val,
           CAST(list_max(vals) AS BIGINT) AS max_val,
           'idx:int64,val:int64,tag:string' AS schema_sig
    FROM v
"""
