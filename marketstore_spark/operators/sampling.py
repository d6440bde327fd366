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
    running fill), so — like the EMA family — it folds in ONE
    partition-streaming ``mapInPandas`` pass over shard-hashed,
    within-partition-sorted rows, carrying (pack, fill) across Arrow
    batch boundaries: a shard of ANY size packs correctly (the earlier
    one-group-one-batch applyInPandas required a shard's documents to
    fit a single Arrow batch).  The oracle replays the identical
    recurrence in a recursive CTE; all state is integer, so parity is
    exact.  At 100 TB the shard IS the packing domain (packs never
    span shards, matching how training shards are built).

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

    def gen(batches):
        cur_shard = object()  # sentinel unequal to any real shard
        pack = fill = 0
        first = True
        for pdf in batches:
            shards = pdf["shard"].to_numpy()
            toks = pdf["n_tokens"].to_numpy()
            packs, offs = [], []
            for i in range(len(pdf)):
                if shards[i] != cur_shard:
                    cur_shard = shards[i]
                    pack = fill = 0
                    first = True
                n = int(toks[i])
                if not first and fill + n > capacity:
                    pack += 1
                    fill = 0
                first = False
                packs.append(pack)
                offs.append(fill)
                fill += n
            pdf = pdf.copy()
            pdf["pack_id"] = pd.Series(packs, dtype="int64")
            pdf["pack_offset"] = pd.Series(offs, dtype="int64")
            yield pdf

    # shard keeps its INPUT type (the docstring recommends composite /
    # integer shard keys at scale — a hardcoded string field would
    # break them at Arrow conversion)
    shard_type = df.schema[shard_col].dataType.simpleString()
    return (
        slim.repartition(F.col("shard"))
        .sortWithinPartitions("shard", "doc_id")
        .mapInPandas(
            gen,
            f"shard {shard_type}, doc_id long, n_tokens long, "
            "pack_id long, pack_offset long",
        )
    )


def stratified_hash_sample(
    df: DataFrame,
    rates: dict[str, int],
    default_num: int = 0,
    stratum_col: str = "lang",
    key_cols: tuple[str, ...] = ("doc_id",),
    salt: str = "stratified",
) -> DataFrame:
    """Per-stratum hash-threshold sampling: each stratum keeps rows at
    its own ``rates[stratum]/256`` rate (``default_num/256`` for
    unlisted strata) — the language/source-rebalancing step of a
    training-data mix (up/down-weighting by bucket, as in public
    CommonCrawl pipeline practice), with hash_sample's engine-portable
    determinism.

    The rate table is dimension-sized, so it compiles into the filter
    as a CASE expression — a pure projection+filter with NO join and
    no shuffle; partition pruning and pushdown compose as usual.
    """
    for k, v in rates.items():
        if not 0 <= v <= 256:
            raise ValueError(f"stratified_hash_sample: rate {k}={v} out of [0, 256]")
    if not 0 <= default_num <= 256:
        raise ValueError("stratified_hash_sample: default_num out of [0, 256]")
    def _hex(v: int) -> str:
        # full rate needs a sentinel ABOVE every md5 prefix; '100'
        # would lexicographically sort below 'ff' ('1' < 'f')
        return "zz" if v == 256 else format(v, "02x")

    key = F.concat_ws("|", F.lit(salt), *[F.col(c).cast("string") for c in key_cols])
    byte = F.substring(F.md5(key), 1, 2)
    thresh = F.lit(_hex(default_num))
    for k, v in sorted(rates.items()):
        thresh = F.when(F.col(stratum_col) == k, F.lit(_hex(v))).otherwise(thresh)
    return df.filter(byte < thresh)


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Split each document into fixed-size token chunks with optional
    overlap (``stride`` < ``chunk_tokens``) — the context-window
    chunking step of a training/RAG pipeline (the per-document dual of
    pack_documents, which concatenates; this splits).

    Whitespace tokens, chunk = ``chunk_tokens`` consecutive tokens
    starting every ``stride`` tokens; the tail chunk may be short.
    Pure per-row array work (split → sequence → explode → slice →
    array_join): no shuffle, no UDF, linear in corpus tokens, and the
    explode multiplies rows only by ceil(n/stride) — the same growth
    the downstream training job needs anyway.  Empty documents yield
    no chunks.

    Output: doc_id, [carry_cols...], chunk_id (0-based), n_tokens
    (in chunk), chunk_text — ``carry_cols`` pass through unchanged
    (e.g. the shard key a downstream packing step groups on; carrying
    it through the projection costs nothing and saves a re-join
    against the corpus).
    """
    stride = chunk_tokens if stride is None else stride
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_documents: chunk_tokens and stride must be positive")
    if stride > chunk_tokens:
        raise ValueError("chunk_documents: stride must be <= chunk_tokens (gaps)")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    carry = [F.col(c) for c in carry_cols]
    base = df.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col).alias("doc_id"),
        *carry,
        toks.alias("__toks"),
        F.size(toks).alias("__n"),
    )
    exploded = base.select(
        "doc_id",
        *carry_cols,
        "__toks",
        "__n",
        F.explode(
            F.sequence(F.lit(0), F.col("__n") - 1, F.lit(stride))
        ).alias("__start"),
    )
    take = F.least(F.lit(chunk_tokens), F.col("__n") - F.col("__start"))
    return exploded.select(
        "doc_id",
        *carry_cols,
        (F.col("__start") / stride).cast("long").alias("chunk_id"),
        take.cast("long").alias("n_tokens"),
        F.array_join(
            F.slice(F.col("__toks"), F.col("__start") + 1, take), " "
        ).alias("chunk_text"),
    )


def training_shuffle(
    df: DataFrame,
    num_shards: int = 8,
    seed: str = "shuffle",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global shuffle for training order: every document
    gets a (shard, position) — shard by md5 hash, position by md5
    order within the shard — the step that randomizes example order
    before packing/serving so no batch correlates with source layout.

    Engine-portable determinism (the hash_sample idiom): the key is
    md5(seed | doc_id), so any engine reproduces the exact permutation
    — reshuffling for a new epoch is just a new ``seed``.

    Scale: ``num_shards`` is the PARALLELISM UNIT — a dense per-shard
    position requires the whole shard in one task's sort, exactly like
    one training file requires one writer.  Size shards like training
    files: ~corpus_bytes / 512 MB shards (thousands at 100 TB), never
    the default 8 — eight shards means eight tasks sorting 1/8 of the
    corpus each.  With shards so sized, each sort is file-sized,
    independent, and needs no global coordination; the shard hash is
    uniform by construction (md5 bits), so no shard skews.

    Output: id_col, shard (int), position (long, dense per shard).
    """
    key = F.md5(F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string")))
    shard = F.pmod(
        F.conv(F.substring(key, 1, 15), 16, 10).cast("long"), F.lit(num_shards)
    ).cast("int")
    staged = df.select(F.col(id_col), key.alias("__key"), shard.alias("shard"))
    from pyspark.sql import Window

    pos = F.row_number().over(
        Window.partitionBy("shard").orderBy("__key", id_col)
    )
    return staged.select(
        id_col, "shard", pos.cast("long").alias("position")
    )


LENGTH_BUCKETS: tuple[int, ...] = (16, 32, 64, 128, 256, 512, 1024, 2048)


def length_bucket_stats(
    df: DataFrame,
    buckets: tuple[int, ...] = LENGTH_BUCKETS,
    text_col: str = "text",
) -> DataFrame:
    """Sequence-length bucketing report: assign each document to the
    smallest power-of-two bucket holding its whitespace token count
    and report, per bucket, the document count, real tokens, padded
    tokens, and the padding-waste ratio — the dry-run a training
    pipeline does before choosing batch-shape buckets (pad-to-bucket
    batching wastes (bucket − len) per doc; this quantifies it).

    Documents LONGER than the top bucket pad to the next multiple of
    it (they get chunked into top-bucket pieces downstream —
    chunk_documents — so their padded cost is ceil(len/top)·top).

    Exactness: bucket assignment is an integer CASE ladder over the
    literal bucket list (no log2 floats), sums are LONG; the waste
    ratio is one mirrored double division.  Plan: projection + one
    #buckets-row hash aggregate — wordcount shape, no joins.
    """
    t = F.col(text_col)
    n_tok = F.when(
        F.trim(t) != "", F.size(F.split(F.trim(t), r"\s+"))
    ).otherwise(F.lit(0))
    staged = df.select(n_tok.alias("n_tok"))
    top = buckets[-1]
    bucket = F.lit(None).cast("long")
    for b in reversed(buckets):
        bucket = F.when(F.col("n_tok") <= b, F.lit(b)).otherwise(bucket)
    # above the top bucket: pad to the next multiple of it.  top is a
    # power of two, so the double division is EXACT and ceil/floor are
    # engine-portable.
    over = F.ceil(F.col("n_tok") / F.lit(top)) * top
    bucket = F.when(F.col("n_tok") > top, F.lit(top)).otherwise(bucket)
    padded = F.when(F.col("n_tok") > top, over).otherwise(bucket)
    g = (
        staged.select(
            bucket.cast("long").alias("bucket"),
            F.col("n_tok"),
            padded.cast("long").alias("padded"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("sum_tokens"),
            F.sum("padded").alias("sum_padded"),
        )
    )
    waste = F.lit(1.0) - (
        F.col("sum_tokens").cast("double") / F.col("sum_padded")
    )
    return g.select(
        "bucket", "n_docs", "sum_tokens", "sum_padded", waste.alias("waste_ratio")
    )


def length_percentiles(
    df: DataFrame, text_col: str = "text", strata: tuple = ("lang", "source")
) -> DataFrame:
    """Per-stratum token-length distribution summary (p10/p50/p90) —
    the length profile a pipeline reads per (lang, source) before
    choosing chunking/packing parameters.  EXACT linear-interpolation
    percentiles, rounded to 6dp: the interpolation RANK ``p·(n−1)``
    itself carries a double residue (0.1·30 = 3.0000000000000004) and
    the engines fold it through differently-ordered expressions — a
    raw compare differs by ulps exactly at integer-valued quantiles,
    so this operator pins the 6dp contract (the `percentiles` key's
    raw compare survives only because its input doubles never land on
    the residue pattern).

    Scale note: exact per-group percentiles materialize each group's
    lengths (one shuffle on the strata key).  Strata are
    dimension-scale (languages × sources) but group SIZES are
    corpus-scale — at 100 TB swap in approx_percentile (GK sketch,
    map-side mergeable), the percentiles_approx path; this operator
    is the exact-verification twin, same contract as
    percentiles/percentiles_approx.
    """
    t = F.col(text_col)
    n_tok = F.when(
        F.trim(t) == "", F.lit(0)
    ).otherwise(F.size(F.split(F.trim(t), r"\s+")))
    staged = df.select(*strata, n_tok.alias("__n_tok"))
    pct = F.expr("percentile(__n_tok, array(0.1, 0.5, 0.9))")
    return (
        staged.groupBy(*strata)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            pct.alias("__p"),
        )
        .select(
            *strata,
            "n_docs",
            F.round(F.col("__p")[0], 6).alias("p10_tokens"),
            F.round(F.col("__p")[1], 6).alias("p50_tokens"),
            F.round(F.col("__p")[2], 6).alias("p90_tokens"),
        )
    )


def fixed_n_sample(
    df: DataFrame,
    n: int = 100,
    key_cols: tuple[str, ...] = ("doc_id",),
    salt: str = "fixedn",
) -> DataFrame:
    """Deterministic EXACTLY-``n`` sample: the ``n`` rows with the
    smallest md5(salt|key) digests — the fixed-budget eval subset a
    training pipeline carves out reproducibly.  ``hash_sample`` keeps
    a RATE (its kept count is binomial); eval budgets need an exact
    row count, and taking the n smallest hashes is the standard
    order-statistic trick that gets one without a random stream.

    The full digest is the primary sort key, carried in the output as
    ``sample_key`` so a consumer can re-verify membership without
    recomputing.  The key columns themselves are the SECONDARY sort
    keys: digests are unique only when ``key_cols`` values are
    distinct, and with duplicate keys the cut among tied digests would
    otherwise be nondeterministic across runs/engines.

    Shape (100 TB): ``orderBy(h).limit(n)`` plans as
    TakeOrderedAndProject — each partition keeps its local top-n and
    only n·partitions candidate rows reach the driver-side merge;
    never a global sort (plan-tested).
    """
    if n <= 0:
        raise ValueError("n must be positive")
    key = F.concat_ws("|", F.lit(salt), *[F.col(c).cast("string") for c in key_cols])
    return (
        df.withColumn("sample_key", F.md5(key))
        .orderBy("sample_key", *key_cols)
        .limit(int(n))
    )
