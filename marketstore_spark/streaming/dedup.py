"""Streaming exact dedup — the ingest-path guard against duplicate
ticks/documents (SURVEY §2 #30's streaming analogue; reference feeders
re-deliver on reconnect, and the reference dedupes by (Epoch, index)
on write — executor/writer.go).

Spark design: ``dropDuplicatesWithinWatermark`` keys the state store
on the id columns and expires state past the watermark — bounded
memory at any throughput, exactly-once output per key within the
dedup horizon.  At 100 TB/day the state is O(keys within horizon),
partitioned by key hash across executors; a wider horizon trades
state size for dedup reach.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from marketstore_spark.functions.timeutil import with_instant_ts


def dedup_stream(
    stream: DataFrame,
    key_cols: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    horizon: str = "10 minutes",
) -> DataFrame:
    """Drop re-deliveries of the same key arriving within ``horizon``
    of the watermark.  Rows later than the horizon are a replay — they
    pass through (state already expired), which is the standard
    at-least-once/bounded-state trade-off."""
    stream = with_instant_ts(stream, ts_col)  # watermark needs instant ts
    return stream.withWatermark(ts_col, horizon).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def dedup_media_stream(
    stream: DataFrame,
    ts_col: str = "ts",
    horizon: str = "10 minutes",
) -> DataFrame:
    """Perceptual dedup on the MEDIA ingest path: dHash each arriving
    image payload (Arrow mapInPandas runs identically on streaming
    DataFrames — same batch shape as the batch operator) and drop
    signature re-deliveries within the watermark horizon, so a
    re-crawled byte-identical or pixel-identical image collapses at
    ingest before it ever lands.  State is keyed on the 64-bit hash —
    8 bytes/key, bounded by the horizon like dedup_stream.  Batch-side
    near-dup (Hamming > 0) stays with dedup.hash_near_dup_pairs; the
    streaming stage is exact-signature by design (state lookups are
    equality-only).  VIDEO payloads (RIFF/AVI or ISO-BMFF containers,
    incl. IDR+P avc1/avc3 tracks) collapse by the md5 of their
    sampled-frame dHash SEQUENCE — container-invariant for lossless
    essence, so the same footage re-crawled as AVI and as an avc1 MP4
    keys identically.  Undecodable payloads fall back to an exact
    CONTENT hash (md5 of the bytes) rather than NULL — Spark's
    dropDuplicates treats NULL keys as equal, which would collapse
    every distinct corrupt frame into one; byte-identity is the right
    dedup notion for payloads we cannot decode."""
    import hashlib

    import pandas as pd

    from marketstore_spark.operators.multimodal import (
        decode_image_any,
        image_dhash_array,
    )
    from marketstore_spark.operators.video import decode_video_frames

    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in stream.schema.fields
    )

    def content_key(payload: bytes) -> int:
        v = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
        return v - (1 << 64) if v >= 1 << 63 else v

    def video_key(raw: bytes) -> int:
        h = hashlib.md5()
        for _idx, frame in decode_video_frames(raw, every_n=4):
            h.update(image_dhash_array(frame).to_bytes(8, "big", signed=True))
        v = int.from_bytes(h.digest()[:8], "big")
        return v - (1 << 64) if v >= 1 << 63 else v

    def run(batches):
        for pdf in batches:
            hashes = []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                is_video = raw[:4] == b"RIFF" or (
                    len(raw) > 8 and raw[4:8] in (b"ftyp", b"moov", b"mdat",
                                                  b"free", b"styp")
                )
                try:
                    if is_video:
                        hashes.append(video_key(raw))
                    else:
                        hashes.append(image_dhash_array(decode_image_any(raw)))
                except (ValueError, NotImplementedError):
                    hashes.append(content_key(raw))
            out = pdf.copy()
            out["dhash"] = pd.array(hashes, dtype="Int64")
            yield out

    hashed = stream.mapInPandas(run, f"{fields}, dhash long")
    return dedup_stream(hashed, key_cols=("dhash",), ts_col=ts_col, horizon=horizon)
