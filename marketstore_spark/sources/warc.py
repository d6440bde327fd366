"""WARC ingestion — the web-corpus source format (Common Crawl).

A 100 TB text corpus usually starts life as ``.warc.gz`` archives.
Gzip members aren't record-splittable, so the standard Spark strategy
is per-FILE parallelism: each ~1 GB archive is one task (
``binaryFile`` source), parsed record-by-record in an Arrow-batched
``mapInPandas`` generator that never materializes more than one
record's payload at a time per row.  Thousands of archives → thousands
of independent tasks, which is exactly how Common Crawl jobs shard.

The parser implements WARC/1.0-1.1 (ISO 28500): named-field header
block, ``Content-Length``-framed payload, CRLF CRLF record separator.
For ``response`` records the HTTP envelope is split off so downstream
text operators see the body; everything else (request, metadata,
warcinfo) passes through with its raw payload.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WARC_SCHEMA = StructType(
    [
        StructField("source_file", StringType()),
        StructField("record_id", StringType()),
        StructField("warc_type", StringType()),
        StructField("target_uri", StringType()),
        StructField("warc_date", StringType()),
        StructField("content_type", StringType()),
        StructField("http_status", IntegerType()),
        StructField("http_content_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("body", BinaryType()),
    ]
)


def parse_warc(stream: io.BufferedIOBase) -> Iterator[dict]:
    """Yield one dict per WARC record from a byte stream."""
    while True:
        # skip blank separator lines between records
        line = stream.readline()
        if not line:
            return
        if line.strip() == b"":
            continue
        if not line.startswith(b"WARC/"):
            raise ValueError(f"expected WARC version line, got {line[:40]!r}")
        headers: dict[str, str] = {}
        while True:
            h = stream.readline()
            if h in (b"\r\n", b"\n", b""):
                break
            k, _, v = h.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers.get("content-length", 0))
        payload = stream.read(length)
        yield {
            "record_id": headers.get("warc-record-id", ""),
            "warc_type": headers.get("warc-type", ""),
            "target_uri": headers.get("warc-target-uri", ""),
            "warc_date": headers.get("warc-date", ""),
            "content_type": headers.get("content-type", ""),
            "payload": payload,
        }


def split_http_payload(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """HTTP response envelope → (status, content-type, body).  Returns
    (None, None, payload) when the payload isn't an HTTP message."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    head, sep, body = payload.partition(b"\r\n\r\n")
    if not sep:
        head, sep, body = payload.partition(b"\n\n")
        if not sep:
            return None, None, payload
    lines = head.split(b"\r\n") if b"\r\n" in head else head.split(b"\n")
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        return None, None, payload
    ctype = None
    for ln in lines[1:]:
        k, _, v = ln.decode("utf-8", "replace").partition(":")
        if k.strip().lower() == "content-type":
            ctype = v.strip()
            break
    return status, ctype, body


def _iter_records_tolerant(raw: bytes) -> Iterator[dict]:
    """Stop at the first malformed record, keeping everything yielded
    before it.  A missing/garbled Content-Length desyncs the rest of
    the stream, so per-record resync isn't possible — but one corrupt
    archive must cost its own tail, not the whole Spark job (corrupt
    payload is data, not a bug — same convention as the multimodal
    decoders' decoded_ok=0)."""
    it = parse_warc(io.BytesIO(raw))
    while True:
        try:
            yield next(it)
        except StopIteration:
            return
        except (ValueError, OverflowError):
            return


def _records_of_file(path: str, content: bytes) -> Iterator[tuple]:
    try:
        raw = gzip.decompress(content) if content[:2] == b"\x1f\x8b" else content
    except (OSError, EOFError):  # truncated/corrupt gzip member
        return
    for rec in _iter_records_tolerant(raw):
        status, http_ctype, body = (
            split_http_payload(rec["payload"])
            if rec["warc_type"] == "response"
            else (None, None, rec["payload"])
        )
        yield (
            path,
            rec["record_id"],
            rec["warc_type"],
            rec["target_uri"],
            rec["warc_date"],
            rec["content_type"],
            status,
            http_ctype,
            len(body),
            body,
        )


def read_warc(
    spark: SparkSession, path_glob: str, warc_types: tuple[str, ...] | None = ("response",)
) -> DataFrame:
    """Parse WARC archives under ``path_glob`` into a record table.

    One task per archive (binaryFile source — see module docstring);
    the generator yields small record batches so executor memory holds
    one archive plus one batch, not the exploded table.  ``warc_types``
    prunes record types during the parse (None = keep all).
    """
    import pandas as pd

    files = spark.read.format("binaryFile").load(path_glob)
    cols = [f.name for f in WARC_SCHEMA.fields]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                rows = [
                    r
                    for r in _records_of_file(path, bytes(content))
                    if warc_types is None or r[2] in warc_types
                ]
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    return files.select("path", "content").mapInPandas(run, schema=WARC_SCHEMA)


def warc_to_documents(records: DataFrame, encoding: str = "utf-8") -> DataFrame:
    """Record table → the documents shape (doc_id, url, text) the text/
    dedup operators consume.  Body bytes decode JVM-side; doc_id is a
    deterministic 64-bit hash of the record id."""
    from pyspark.sql import functions as F

    return records.filter(F.col("http_status") == 200).select(
        F.xxhash64(F.col("record_id")).alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.decode(F.col("body"), encoding).alias("text"),
    )
