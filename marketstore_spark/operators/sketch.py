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

    One token scan feeds BOTH the sketch (bounded depth·width state)
    and the candidate vocabulary; each candidate's estimate is the min
    over its ``depth`` cells, read from the broadcast sketch.  At
    unbounded vocabulary, replace the distinct-candidates pass with a
    sampled/floored candidate stream — the sketch side is already
    O(depth·width) regardless.  Output deterministic: ties break on
    term; estimates are exact-deterministic (md5 slots), so the SQL
    oracle reproduces them bit-for-bit — estimate ≥ true count always
    (CMS overestimate property, pinned in pytest).
    """
    toks = (
        df.filter(F.trim(F.col(text_col)) != "")
        .select(F.explode(F.split(F.lower(F.trim(F.col(text_col))), _WS)).alias("term"))
        # Parallelize the depth×token md5 fan-out regardless of input
        # split count (the word_shingles pattern): without this, a
        # single-file corpus runs all depth·tokens hashes in one task
        # (measured 1.1s → 0.3s for the sketch at sf0.1).
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
    )
    sketch = cms_sketch(toks, width=width, depth=depth)
    cand = toks.distinct()
    probes = cand.select(
        "term", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    ).select("term", "d", _slot(F.col("d"), F.col("term"), width).alias("slot"))
    est = (
        probes.join(F.broadcast(sketch), ["d", "slot"])
        .groupBy("term")
        .agg(F.min("cnt").alias("est_count"))
    )
    return est.orderBy(F.col("est_count").desc(), F.col("term").asc()).limit(top_k)
