"""Deterministic corpus sampling (pipeline surface beyond the
reference; SURVEY §2 LLM-ops family).

A 100 TB pipeline samples with a pure hash-threshold FILTER, never an
RNG: the decision for a row depends only on (salt, key), so re-runs,
retried tasks, and different engines agree row-for-row; no shuffle, no
sampling state, and the filter composes with partition pruning.  This
is the standard reproducible-subset idiom (mod-hash bucketing as in
Common Crawl / CCNet processing pipelines — public practice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_sample(
    df: DataFrame,
    rate_num: int = 51,
    rate_den: int = 256,
    key_cols: tuple[str, ...] = ("doc_id",),
    salt: str = "sample",
) -> DataFrame:
    """Keep rows whose md5(salt|key...) leading byte < rate_num/rate_den.

    ``rate_den`` must be 256 (one hex byte of selectivity — coarse by
    design: the point is engine-portable determinism, and a lexicographic
    compare on two lowercase hex chars is identical in every engine that
    has md5).  Returns the input rows unchanged, filtered.
    """
    if rate_den != 256:
        raise ValueError("hash_sample: rate_den must be 256 (one md5 byte)")
    if not 0 <= rate_num <= 256:
        raise ValueError("hash_sample: rate_num out of [0, 256]")
    if rate_num == 256:  # '100' would break the 2-hex-char compare
        return df
    key = F.concat_ws("|", F.lit(salt), *[F.col(c).cast("string") for c in key_cols])
    return df.filter(F.substring(F.md5(key), 1, 2) < F.lit(format(rate_num, "02x")))


def pack_documents(
    df: DataFrame,
    capacity: int = 2048,
    shard_col: str = "lang",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Greedy next-fit sequence packing: assign each document to a
    fixed-``capacity`` token bin, in deterministic ``id_col`` order
    within each shard — the standard LLM pre-training packing step
    (concatenate documents into fixed-length training sequences; a doc
    that would overflow the open bin starts a new one; an oversized
    doc occupies a bin alone).  No reference analogue; pipeline
    surface beyond SURVEY §2 #37-45.

    Packing is a sequential recurrence (each decision depends on the
    running fill), so — like the EMA family — it runs as ONE
    applyInPandas pass per shard (single shuffle on the shard key) and
    the oracle replays the identical recurrence in a recursive CTE.
    All state is integer, so parity is exact.  At 100 TB the shard IS
    the packing domain (packs never span shards, matching how training
    shards are built); a shard's documents must fit one Arrow batch —
    shard by (lang, source, hash-bucket) when a single shard outgrows
    that.

    Output: shard, doc_id, n_tokens, pack_id (0-based per shard),
    pack_offset (token offset of the doc inside its pack).
    """
    import pandas as pd

    tokens = (
        F.col(tokens_col)
        if tokens_col
        else F.when(
            F.trim(F.col(text_col)) != "",
            F.size(F.split(F.trim(F.col(text_col)), r"\s+")),
        ).otherwise(F.lit(0))
    )
    slim = df.select(
        F.col(shard_col).alias("shard"),
        F.col(id_col).alias("doc_id"),
        tokens.cast("long").alias("n_tokens"),
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", ignore_index=True)
        pack = fill = 0
        packs, offs = [], []
        first = True
        for n in pdf["n_tokens"]:
            n = int(n)
            if not first and fill + n > capacity:
                pack += 1
                fill = 0
            first = False
            packs.append(pack)
            offs.append(fill)
            fill += n
        pdf["pack_id"] = pd.Series(packs, dtype="int64")
        pdf["pack_offset"] = pd.Series(offs, dtype="int64")
        return pdf

    # shard keeps its INPUT type (the docstring recommends composite /
    # integer shard keys at scale — a hardcoded string field would
    # break them at Arrow conversion)
    shard_type = df.schema[shard_col].dataType.simpleString()
    return slim.groupBy("shard").applyInPandas(
        fn,
        f"shard {shard_type}, doc_id long, n_tokens long, "
        "pack_id long, pack_offset long",
    )
