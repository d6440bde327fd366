"""Mergeable frequency sketches: Count-Min heavy hitters.

Pipeline surface beyond the reference (SURVEY §2 LLM-ops family): a
100 TB corpus wants term/heavy-hitter statistics without a full-width
GROUP BY when the key space is unbounded (URLs, n-grams, user agents).
The Count-Min sketch (Cormode & Muthukrishnan 2005 — public algorithm)
is the canonical answer because it is a LINEAR sketch: per-partition
sketches sum cell-wise, which is exactly a Spark hash aggregate over
(depth, slot) — the map-side combiner builds the partial sketches and
the shuffle carries at most depth·width rows per partition, no matter
how many distinct terms exist.

Determinism (the repo-wide oracle policy): slot hashing is md5-derived
(first 15 hex chars of ``md5(depth|term)`` mod width) — identical in
any engine, so the ORACLE REPLICATES THE SKETCH EXACTLY and the
estimates hash-match; no rows-only compromise needed even though the
operator is approximate (the approximation is deterministic).  The CMS
guarantee — estimate ≥ true count, with excess bounded by collisions —
is pinned as a property in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from marketstore_spark.functions.layout import spread_for_narrow_work

_WS = r"\s+"


def _slot(depth_col, term_col, width: int):
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", depth_col.cast("string"), term_col)), 1, 15),
        16,
        10,
    ).cast("long")
    return h % width


def cms_sketch(
    terms: DataFrame,
    width: int = 1024,
    depth: int = 4,
    term_col: str = "term",
) -> DataFrame:
    """Count-Min sketch of the term stream: (d, slot, cnt) rows —
    at most ``depth × width`` after the single hash aggregate.
    Linear/mergeable: sketches of two streams sum cell-wise."""
    d = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    cells = terms.select(F.col(term_col), d).select(
        "d", _slot(F.col("d"), F.col(term_col), width).alias("slot")
    )
    return cells.groupBy("d", "slot").agg(F.count(F.lit(1)).alias("cnt"))


def cms_heavy_hitters(
    df: DataFrame,
    width: int = 64,
    depth: int = 4,
    top_k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Top-k most frequent terms with Count-Min estimated counts.

    The candidate pass is inherently vocabulary-wide (a heavy-hitter
    query needs candidate terms), so the sketch is built WEIGHTED from
    the same per-term count aggregate — cell(d, slot) = Σ tcnt over
    terms hashing there, identical to hashing every raw token but with
    the depth× md5 fan-out over the vocabulary instead of the token
    stream (~50× fewer hashes at sf0.1), and the wordcount exchange is
    reused for sketch and probes (no persist needed).  For a truly
    unbounded vocabulary use :func:`cms_sketch` directly on the token
    stream — its shuffle state stays O(depth·width) with no
    per-term aggregate — and probe with a sampled/floored candidate
    stream.  Output deterministic: ties break on term; estimates are
    exact-deterministic (md5 slots), so the SQL oracle reproduces them
    bit-for-bit — estimate ≥ true count always (CMS overestimate
    property, pinned in pytest).
    """
    docs = spread_for_narrow_work(
        # Parallelize tokenize+partial-count when the input split count
        # can't (size-gated, functions/layout): a single-file corpus
        # would otherwise run the whole map side in one task, but a
        # tiny or cluster-wide corpus skips the shuffle.  Repartitioning
        # documents (not tokens) moves each byte at most once.
        df.filter(F.trim(F.col(text_col)) != "")
        .select(F.lower(F.trim(F.col(text_col))).alias("__t"))
    )
    tc = (
        docs.select(F.explode(F.split(F.col("__t"), _WS)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("tcnt"))
    )
    d = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    fan = tc.select("term", "tcnt", d).select(
        "term", "tcnt", "d", _slot(F.col("d"), F.col("term"), width).alias("slot")
    )
    sketch = fan.groupBy("d", "slot").agg(F.sum("tcnt").alias("cnt"))
    est = (
        fan.join(F.broadcast(sketch), ["d", "slot"])
        .groupBy("term")
        .agg(F.min("cnt").alias("est_count"))
    )
    return est.orderBy(F.col("est_count").desc(), F.col("term").asc()).limit(top_k)
