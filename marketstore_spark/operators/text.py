"""Text-analysis operators for the training-data pipeline (SURVEY §2
#37-40): language ID, quality scoring, token counting, fingerprinting.

All expressions are JVM-side built-ins (regexp_count / split / md5) —
no Python UDFs — so they run inside whole-stage codegen and scale
linearly with a plain projection (no shuffle at all except where a
groupBy is the point).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from marketstore_spark.functions.layout import spread_for_narrow_work

# Per-language stopword markers for the n-gram/stopword langid
# heuristic.  Counting is on word boundaries, case-insensitive.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "en": ["the", "and", "is", "of", "to", "in"],
    "es": ["el", "la", "los", "que", "es", "de"],
    "fr": ["le", "la", "les", "et", "est", "que"],
    "zh": ["的", "是", "了", "在", "和", "我"],
}

_WS = r"\s+"
# BPE-ish pre-tokenizer: letter runs, single digits, or single
# non-alphanumeric marks (GPT-2-style coarse approximation).
_BPE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"


def _nonempty(text: Column) -> Column:
    return F.trim(text) != ""


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace and BPE-ish token counts per document."""
    t = F.col(text_col)
    ws_tokens = F.when(_nonempty(t), F.size(F.split(F.trim(t), _WS))).otherwise(F.lit(0))
    bpe_tokens = F.regexp_count(t, F.lit(_BPE))
    return df.select(
        "doc_id",
        ws_tokens.alias("n_tokens_ws"),
        bpe_tokens.alias("n_tokens_bpe"),
    )


def corpus_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-(lang, source) corpus rollup — the summary a pipeline reads
    before deciding what to train on: document count, characters,
    whitespace tokens, and the smallest doc id as a stable exemplar.
    Single scan, one combiner-friendly hash aggregate."""
    t = F.col(text_col)
    ws_tokens = F.when(_nonempty(t), F.size(F.split(F.trim(t), _WS))).otherwise(F.lit(0))
    return df.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(ws_tokens).alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


def term_stats(
    df: DataFrame, top_k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document top-k terms with corpus document frequency — the
    TF-IDF building block, kept integer-exact (tf, df, n_docs) so the
    oracle hash-matches; the caller applies its own idf smoothing
    (log choice is engine-specific, so it stays OUT of the contract).

    Plan: one explode→groupBy(doc, term) for tf; doc frequency comes
    from the same grouped table (count distinct docs per term — no
    second scan of the corpus); ranking is an integer window per doc
    with a term tie-break.  At 100 TB the term table shuffles on term
    once (df) and on doc once (rank) — both combiner-friendly; the
    n_docs scalar broadcasts."""
    from pyspark.sql import Window

    t = F.col(text_col)
    toks = df.filter(_nonempty(t)).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.trim(t)), _WS)).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.filter(_nonempty(t)).select("doc_id").distinct().count()
    w = Window.partitionBy("doc_id").orderBy(F.col("tf").desc(), F.col("term").asc())
    return (
        tf.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .join(dft, "term")
        .select("doc_id", "term", "tf", "df", F.lit(n_docs).alias("n_docs"), "rank")
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / digit ratios — the standard
    cheap quality filters for pretraining corpora."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_words = F.when(_nonempty(t), F.size(F.split(F.trim(t), _WS))).otherwise(F.lit(0))
    n_punct = F.regexp_count(t, F.lit(r"[^\w\s]"))
    n_digit = F.regexp_count(t, F.lit(r"[0-9]"))
    stop_alt = "|".join(LANG_MARKERS["en"])
    n_stop = F.regexp_count(F.lower(t), F.lit(rf"\b(?:{stop_alt})\b"))
    nz = F.when(n_chars == 0, F.lit(None)).otherwise(n_chars.cast("double"))
    nzw = F.when(n_words == 0, F.lit(None)).otherwise(n_words.cast("double"))
    return df.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        (n_chars.cast("double") / nzw).alias("avg_word_len"),
        (n_punct.cast("double") / nz).alias("punct_ratio"),
        (n_digit.cast("double") / nz).alias("digit_ratio"),
        (n_stop.cast("double") / nzw).alias("stopword_ratio"),
    )


def langid(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID: count per-language marker words,
    predict the argmax (ties broken by language code order).

    Returns doc_id, predicted_lang, best_score.
    """
    t = F.lower(F.col(text_col))
    # argmax with deterministic tie-break (score desc, lang asc): negate
    # the score and sort the struct array ascending.
    neg = [
        F.struct(
            (-F.regexp_count(t, F.lit(rf"\b(?:{'|'.join(LANG_MARKERS[lang])})\b"))).alias(
                "neg_score"
            ),
            F.lit(lang).alias("lang"),
        )
        for lang in sorted(LANG_MARKERS)
    ]
    best = F.sort_array(F.array(*neg), asc=True)[0]
    return df.select(
        "doc_id",
        best["lang"].alias("predicted_lang"),
        (-best["neg_score"]).alias("best_score"),
    )


def document_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Every per-document text signal in ONE projection — quality
    ratios, language ID, fingerprint.  A corpus-cleaning pipeline
    should compute all its features in a single scan, not join the
    per-operator outputs (three shuffles of the same doc_id key); the
    individual operators above stay for à-la-carte use."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_words = F.when(_nonempty(t), F.size(F.split(F.trim(t), _WS))).otherwise(F.lit(0))
    nz = F.when(n_chars == 0, F.lit(None)).otherwise(n_chars.cast("double"))
    nzw = F.when(n_words == 0, F.lit(None)).otherwise(n_words.cast("double"))
    low = F.lower(t)
    stop_alt = "|".join(LANG_MARKERS["en"])
    neg = [
        F.struct(
            (-F.regexp_count(low, F.lit(rf"\b(?:{'|'.join(LANG_MARKERS[lang])})\b"))).alias(
                "neg_score"
            ),
            F.lit(lang).alias("lang"),
        )
        for lang in sorted(LANG_MARKERS)
    ]
    best = F.sort_array(F.array(*neg), asc=True)[0]
    norm = F.regexp_replace(F.lower(F.trim(t)), _WS, " ")
    return df.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        (F.regexp_count(t, F.lit(r"[^\w\s]")).cast("double") / nz).alias("punct_ratio"),
        (F.regexp_count(t, F.lit(r"[0-9]")).cast("double") / nz).alias("digit_ratio"),
        (F.regexp_count(low, F.lit(rf"\b(?:{stop_alt})\b")).cast("double") / nzw).alias(
            "stopword_ratio"
        ),
        best["lang"].alias("predicted_lang"),
        F.md5(norm).alias("fp_md5"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint: md5 of whitespace-normalized lowercase text
    (exact-dup key) + doc length — the cheap first pass before MinHash."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), _WS, " ")
    return df.select(
        "doc_id",
        F.md5(norm).alias("fp_md5"),
        F.length(norm).alias("fp_len"),
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher/MassiveText-style repetition signals per document: the
    duplicate-word fraction, the most-frequent-word fraction, and the
    duplicate-2-gram fraction (the published quality-filter family of
    Rae et al. 2021 §A1.1 — public paper; the reference engine has no
    analogue, this is pipeline surface beyond SURVEY §2 #37-40).

    Every signal — including the word mode — is a per-row higher-order
    function, so the operator is ONE narrow projection: no explode, no
    shuffle, no join; it scales as a plain scan (the 100 TB shape) and
    each row's work is bounded by its own document length.  The mode
    count is a run-length pass over ``array_sort(words)`` via
    ``aggregate`` (O(n log n) sort + O(n) fold, vs the O(u·n)
    count-each-distinct-word formulation that melts on long documents —
    and vs an explode/groupBy, where Catalyst's projection collapse
    re-evaluates sibling per-doc HOFs once per exploded row).  Output
    fractions are rounded to 6dp.
    """
    words = F.split(F.lower(F.trim(F.col(text_col))), _WS)
    # Bigrams via arrays_zip of two shifted slices instead of a
    # per-index lambda (one slice allocation + interpreted dispatch per
    # gram — the word_shingles zip form, operators/dedup._sliding_grams).
    # slice() needs a non-negative length, so the one-word guard stays.
    k2 = F.size(words) - 1
    grams = F.when(
        F.size(words) >= 2,
        F.transform(
            F.arrays_zip(
                F.slice(words, 1, k2).alias("w0"),
                F.slice(words, 2, k2).alias("w1"),
            ),
            lambda s: F.concat_ws(" ", s["w0"], s["w1"]),
        ),
    ).otherwise(F.array().cast("array<string>"))

    def _longest_run(acc, x):
        run = F.when(x == acc["prev"], acc["cur"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("cur"), F.greatest(acc["best"], run).alias("best")
        )

    top = F.aggregate(
        F.array_sort(F.col("__w")),
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("cur"), F.lit(0).alias("best")),
        _longest_run,
        lambda acc: acc["best"],
    )
    # The HOF lambdas are interpreted per element — spread the heavy
    # projection when the input's split count can't (size-gated, see
    # functions/layout); the shuffled payload is just the raw text rows.
    df = spread_for_narrow_work(df, id_col, heavy=True)
    base = df.filter(_nonempty(F.col(text_col))).select(
        F.col(id_col).alias("doc_id"), words.alias("__w"), grams.alias("__g")
    )
    per_doc = base.select(
        "doc_id",
        F.size("__w").alias("n_words"),
        F.size(F.array_distinct("__w")).alias("__uw"),
        F.size("__g").alias("__ng"),
        F.size(F.array_distinct("__g")).alias("__ug"),
        top.alias("__top"),
    )
    nw = F.col("n_words").cast("double")
    return per_doc.select(
        "doc_id",
        "n_words",
        F.round(1.0 - F.col("__uw") / nw, 6).alias("dup_word_frac"),
        F.round(F.col("__top") / nw, 6).alias("top_word_frac"),
        F.round(
            F.when(
                F.col("__ng") > 0, 1.0 - F.col("__ug") / F.col("__ng").cast("double")
            ),
            6,
        ).alias("dup_2gram_frac"),
    )


# Dolma/C4-style PII masking (public pipeline surface; the synthetic
# documents corpus contains no PII by construction, so this operator is
# exercised by constructed fixtures in pytest rather than a driver
# oracle key).  Patterns are Java-regex (Spark-side only) and
# deliberately conservative: detection-over-coverage is the published
# convention (Dolma masks email/phone/IP with |||TOKEN||| markers).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"(?<!\d)(?:\+?\d{1,2}[\s.-]?)?(?:\(\d{3}\)\s?|\d{3}[\s.-])\d{3}[\s.-]\d{4}(?!\d)",
    # lookarounds reject a 4th-octet continuation (1.2.3.4.5) but allow
    # a bare sentence period after the address
    "ipv4": r"(?<!\d)(?<!\d\.)(?:\d{1,3}\.){3}\d{1,3}(?!\.?\d)",
}


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    classes: list[str] | None = None,
    marker: str = "|||{cls}|||",
) -> DataFrame:
    """Mask PII spans in-place and count them per class.

    One narrow projection: per class, one ``regexp_count`` for the
    count and one chained ``regexp_replace`` for the masking — all
    JVM-side regex inside whole-stage codegen, no shuffle, so the
    operator scales as a plain scan (same shape as the quality/langid
    signals it typically runs beside).  Email is masked before phone
    so digit runs inside a masked email can't double-match.

    Output: every input column except ``text_col``, the scrubbed
    ``text``, and one ``n_<class>`` count per class.
    """
    classes = list(PII_PATTERNS) if classes is None else classes
    # Each class counts on the PROGRESSIVELY-masked value, then masks:
    # counting every class on the original text would report matches a
    # prior class already consumed (a phone-shaped local part inside an
    # email) — n_<class> must equal the markers actually inserted.
    scrubbed = F.col(text_col)
    counts = []
    for c in classes:
        counts.append(F.regexp_count(scrubbed, F.lit(PII_PATTERNS[c])).alias(f"n_{c}"))
        scrubbed = F.regexp_replace(
            scrubbed, PII_PATTERNS[c], marker.format(cls=c.upper())
        )
    keep = [c for c in df.columns if c != text_col]
    return df.select(*keep, scrubbed.alias(text_col), *counts)


def doc_freq_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unigram-frequency document quality score: the mean corpus
    frequency of a document's tokens — the engine-portable core of
    KenLM-style perplexity filtering (CCNet's quality signal).  A
    document of common words scores high; one of rare/garbage tokens
    scores low.  Kept integer-exact: per-doc Σ count(term) and token
    count are LONG sums, the score is ONE double division — no logs,
    no order-dependent float accumulation (the repo parity policy; a
    caller wanting log-space perplexity applies its own log to the
    integer counts).

    Plan: one explode→groupBy(term) builds the corpus unigram table
    (wordcount shape, combiner-friendly); the token stream re-joins it
    on term (shuffle join — the vocabulary is corpus-scale in general;
    broadcast the top-V slice + OOV fallback when the vocab fits), and
    one groupBy(doc) folds the doc score.  Linear end to end.
    """
    t = F.col(text_col)
    toks = df.filter(_nonempty(t)).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.trim(t)), _WS)).alias("term"),
    )
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("term_count"))
    return (
        toks.join(vocab, "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("term_count").alias("sum_freq"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "sum_freq",
            (F.col("sum_freq").cast("double") / F.col("n_tokens")).alias(
                "mean_term_freq"
            ),
        )
    )


def bm25_score(
    df: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 relevance of every document against a fixed query
    term list — the standard retrieval score a corpus pipeline uses to
    mine topic-relevant training data (and the engine analogue of the
    reference's "serve the raw series, client post-processes" posture
    moved server-side).

    Scale shape: the corpus is NEVER shuffled.  One aggregate pass
    reduces the whole corpus to a single row of integers — n_docs,
    Σ doc_len, and per-term document frequencies — which is
    broadcast back; the score is then a pure projection per document
    (tf per term via a JVM-side ``filter`` over the token array, no
    explode).  Two scans, zero fact shuffles, no vocabulary join —
    the query term list is a literal, unlike :func:`doc_freq_score`'s
    corpus-wide vocabulary.

    Determinism: tf/df/dl are exact integers; idf uses ln (the BM25
    definition — the one deliberate libm use in this module), and the
    per-term score contributions are added in EXPLICIT sorted-term
    order, never a float aggregate, so the expression tree is
    identical in any engine.  Callers compare at 6 decimals (the
    repo's round-trip emulation in the registered oracle).
    """
    terms = sorted(set(terms))
    t = F.col(text_col)
    # Materialize the token array ONCE: every per-term tf filter and
    # the length/contains expressions reference it, and HOF lambdas
    # are interpreted — inlining the split into each consumer (which
    # CollapseProject would do if this were a single select) re-splits
    # the text ~2+|terms| times per row.  Measured 21% faster at sf0.1.
    base = df.filter(_nonempty(t)).select(
        F.col(id_col), F.split(F.lower(F.trim(t)), _WS).alias("__toks")
    )
    toks = F.col("__toks")

    def _df_flag(term: str) -> Column:
        return F.array_contains(toks, term).cast("long")

    stats = (
        base.select(
            F.size(toks).alias("__dl"),
            *[_df_flag(term).alias(f"__c{i}") for i, term in enumerate(terms)],
        )
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__dl").alias("sum_dl"),
            *[F.sum(f"__c{i}").alias(f"df{i}") for i in range(len(terms))],
        )
    )

    scored = base.join(F.broadcast(stats))
    dl = F.size(toks)
    n = F.col("n_docs")
    # avgdl enters as dl·N/Σdl so the only divisions are the two in
    # the final per-term expression — fixed order, both engines alike.
    score = F.lit(0.0)
    for i, term in enumerate(terms):
        tf = F.size(F.filter(toks, lambda x: x == F.lit(term))).cast("double")
        idf = F.log(
            F.lit(1.0)
            + (n.cast("double") - F.col(f"df{i}") + F.lit(0.5))
            / (F.col(f"df{i}") + F.lit(0.5))
        )
        denom = tf + F.lit(k1) * (
            F.lit(1.0 - b)
            + F.lit(b) * (dl.cast("double") * n.cast("double"))
            / F.col("sum_dl").cast("double")
        )
        score = score + idf * (tf * F.lit(k1 + 1.0)) / denom
    return scored.select(
        F.col(id_col).alias("doc_id"),
        dl.cast("long").alias("n_tokens"),
        score.alias("bm25"),
    )


def bigram_lift(
    df: DataFrame,
    min_count: int = 5,
    top_k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Collocation mining: the ``top_k`` adjacent word pairs by LIFT —
    p(ab) / (p(a)·p(b)), the exponentiated-PMI association measure
    (log-free on purpose: engines' ln() differ by ulps; lift orders
    identically).  The phrase-detection pass a corpus pipeline runs
    before tokenizer training or n-gram feature mining (word2vec's
    phrase pass uses the same statistic, publicly documented).

    Counts are exact integers; the lift is evaluated once per pair as
    the mirrored literal expression
    ``(c_ab / N_bi) / ((c_a / N_uni) * (c_b / N_uni))`` in float64.

    Plan (r10 re-plan — the old two-granularity form planned SIX
    corpus scans at runtime: separate unigram/bigram aggregates fed
    five join branches and ReusedExchange never crossed them): ONE
    corpus scan emits a combined explode — unigrams as (w, '') and
    adjacent pairs as (w1, w2) — into ONE ``groupBy(a, b)`` aggregate
    with CONDITIONAL counts (c_uni, c_bi).  Every downstream consumer
    filters on those aggregate OUTPUTS (``c_uni > 0`` marks unigram
    rows, ``c_bi >= min_count`` the kept pairs), which Catalyst cannot
    push below the exchange — unlike a grouping-KEY filter, which
    pushdown would clone into per-branch scans — so the kept-pair
    table, the kept-word set, the pruned vocabulary, and the corpus
    totals all share the single exchange via AQE's ReusedExchange
    (runtime-audited: 1 documents scan in the final plan).  The ''
    marker cannot collide: split on \\s+ of trimmed text never yields
    an empty token, so no real bigram has b = ''.

    The unigram table is VOCABULARY-scale (10⁸–10⁹ distinct words at
    corpus scale) — broadcasting it unfiltered is an executor OOM at
    100 TB, so it is first semi-join-PRUNED to the word set of the
    kept bigram table (collocation-scale by construction: ≤ 2·|kept
    pairs|).  Pruning drops rows, never rewrites counts — c_a/c_b stay
    the full-corpus unigram totals, so lift values are unchanged.
    N_bi counts ALL adjacent pairs (the sample space), not just kept
    ones; both totals come from ONE unfiltered single-row aggregate
    over the shared exchange.  Final top-k is one k-row global sort
    over the kept-pair table.  sequence(1, size-1) DESCENDS for
    one-word docs — bigram entries are emitted only when the doc has
    ≥ 2 tokens.
    """
    t = F.col(text_col)
    toks = df.select(
        F.split(F.lower(F.trim(t)), _WS).alias("__toks")
    ).filter(_nonempty(t))
    tagged = (
        toks.select(
            F.explode(
                F.concat(
                    F.transform(
                        "__toks",
                        lambda w: F.struct(w.alias("a"), F.lit("").alias("b")),
                    ),
                    F.when(
                        F.size("__toks") >= 2,
                        F.transform(
                            F.sequence(F.lit(1), F.size("__toks") - 1),
                            lambda i: F.struct(
                                F.element_at("__toks", i).alias("a"),
                                F.element_at("__toks", i + 1).alias("b"),
                            ),
                        ),
                    ).otherwise(F.array()),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        # explicit in the SHARED subtree so the not-null predicates the
        # downstream joins push down are already present and every
        # consumer's child stays byte-identical (reuse prerequisite);
        # semantically neutral — explode never yields NULL fields here
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
    )
    counts = tagged.groupBy("a", "b").agg(
        F.count(F.when(F.col("b") == "", 1)).alias("c_uni"),
        F.count(F.when(F.col("b") != "", 1)).alias("c_bi"),
    )
    # Every consumer's filter references BOTH counts (the `>= 0` arm is
    # a tautology for a count, but the optimizer doesn't know value
    # ranges so it survives): per-branch column pruning would otherwise
    # drop the unused aggregate function, making each branch's partial
    # aggregate — and therefore its exchange — unique, and ReusedExchange
    # only dedups identical subtrees (runtime-audited: with the anchor,
    # the final plan scans documents ONCE).
    uni = counts.filter((F.col("c_uni") > 0) & (F.col("c_bi") >= 0)).select(
        F.col("a").alias("w"), F.col("c_uni").alias("c_w")
    )
    # NOTE (r14, examined-left): a kept-level materialization barrier
    # (repartition(pmod(xxhash64(w1,w2)))) was built and measured — it
    # removes one of the four final-aggregate replays (the kept-word
    # branch and the join big side then share one collocation-scale
    # shuffle) but costs a consistent +6-8% locally (min-of-4 x 3
    # interleaved rounds: 0.729/0.775/0.794 -> 0.803/0.815/0.847) —
    # the added AQE stage floor exceeds the saved vocab-partial
    # re-merge at any SF measurable here, and the saved term is
    # secondary at scale (the corpus-side explode+partial agg already
    # runs ONCE).  Reverted per the measure-first rule; a uni/totals
    # barrier is impossible because their filters differ and Filter
    # pushes below RepartitionByExpression (forking the subtree).
    kept = counts.filter(
        (F.col("c_bi") >= min_count) & (F.col("c_uni") >= 0)
    ).select(
        F.col("a").alias("w1"), F.col("b").alias("w2"),
        F.col("c_bi").alias("c_ab"),
    )
    totals = counts.agg(
        F.sum("c_uni").alias("n_uni"), F.sum("c_bi").alias("n_bi")
    )
    # Prune the vocabulary to the kept-pair word set BEFORE the
    # broadcast (see docstring — the unfiltered table is a
    # scale-killer).  One explode over the kept pairs yields the word
    # set in a single consumption of the pair table.
    kept_w = kept.select(
        F.explode(F.array(F.col("w1"), F.col("w2"))).alias("w")
    ).distinct()
    uni_kept = uni.join(F.broadcast(kept_w), "w", "left_semi")
    j = (
        kept.join(F.broadcast(uni_kept.withColumnRenamed("w", "w1")
                              .withColumnRenamed("c_w", "c_a")), "w1")
        .join(F.broadcast(uni_kept.withColumnRenamed("w", "w2")
                          .withColumnRenamed("c_w", "c_b")), "w2")
        .crossJoin(F.broadcast(totals))
    )
    lift = (
        (F.col("c_ab").cast("double") / F.col("n_bi"))
        / (
            (F.col("c_a").cast("double") / F.col("n_uni"))
            * (F.col("c_b").cast("double") / F.col("n_uni"))
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("lift").desc(), F.col("w1").asc(), F.col("w2").asc())
    return (
        j.select("w1", "w2", "c_ab", "c_a", "c_b", lift.alias("lift"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
    )


def lexical_diversity(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document lexical-diversity quality signals: token count,
    type count (distinct tokens), type-token ratio, and the hapax
    fraction (share of tokens occurring exactly once — the classic
    vocabulary-richness measure; low TTR/hapax flags boilerplate and
    generated text, the complement of the repetition_stats family).

    Every signal is a per-row higher-order function — ONE narrow
    projection, no explode/shuffle/join (the repetition_stats shape;
    Catalyst's projection collapse makes explode pipelines quadratic
    for sibling per-doc HOFs).  The hapax count is a run-length fold
    over ``array_sort(words)``: a run of length 1 is a hapax —
    O(n log n) per row, bounded by the document's own length.
    Fractions are integer ÷ integer, ONE double division each,
    rounded to 6dp (oracle emulates Spark's shortest-repr rounding).
    """
    words = F.split(F.lower(F.trim(F.col(text_col))), _WS)

    # fold state: (prev token, current run length, hapaxes CLOSED so
    # far); a new token closes the previous run — closing a run of
    # exactly 1 increments the count — and the finisher closes the
    # final run the same way.
    def _hapax_step(acc, x):
        is_new = x != acc["prev"]
        closed1 = F.when(is_new & (acc["cur"] == 1), 1).otherwise(0)
        return F.struct(
            x.alias("prev"),
            F.when(is_new, F.lit(1)).otherwise(acc["cur"] + 1).alias("cur"),
            (acc["hap"] + closed1).alias("hap"),
        )

    hapax = F.aggregate(
        F.array_sort(F.col("__w")),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("cur"), F.lit(0).alias("hap")
        ),
        _hapax_step,
        lambda acc: acc["hap"] + F.when(acc["cur"] == 1, 1).otherwise(0),
    )
    df = spread_for_narrow_work(df, id_col, heavy=True)
    base = df.filter(_nonempty(F.col(text_col))).select(
        F.col(id_col).alias("doc_id"), words.alias("__w")
    )
    per = base.select(
        "doc_id",
        F.size("__w").alias("n_tokens"),
        F.size(F.array_distinct("__w")).alias("n_types"),
        hapax.alias("n_hapax"),
    )
    nt = F.col("n_tokens").cast("double")
    return per.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_types").cast("long").alias("n_types"),
        F.col("n_hapax").cast("long").alias("n_hapax"),
        F.round(F.col("n_types") / nt, 6).alias("ttr"),
        F.round(F.col("n_hapax") / nt, 6).alias("hapax_frac"),
    )


def filter_funnel(
    df: DataFrame,
    min_words: int = 5,
    max_punct: float = 0.2,
    max_digit: float = 0.3,
    max_word_len: float = 20.0,
    text_col: str = "text",
) -> DataFrame:
    """Quality-filter FUNNEL report: how many documents survive each
    successive gate (the attrition table every published corpus
    pipeline reports — C4, RefinedWeb, Dolma all lead with one).
    Gates, applied cumulatively in order: non-empty → ≥ ``min_words``
    words → punctuation ratio < ``max_punct`` → digit ratio <
    ``max_digit`` → average word length < ``max_word_len``.

    One scan (the shared ``quality_features`` projection) reduced to a
    SINGLE row of exact LONG counts — a SinglePartition aggregate with
    map-side partials; the ratios are each one double division, so the
    gate comparisons are engine-identical.  A NULL ratio (empty doc)
    fails its gate, matching SQL CASE semantics.
    """
    feats = quality_features(df, text_col=text_col)
    g0 = F.col("n_chars").isNotNull()  # every row
    g1 = F.col("n_words") >= int(min_words)
    g2 = g1 & (F.col("punct_ratio") < float(max_punct))
    g3 = g2 & (F.col("digit_ratio") < float(max_digit))
    g4 = g3 & (F.col("avg_word_len") < float(max_word_len))

    def cnt(cond):
        # count(when(...)) — not sum(when/otherwise): COUNT is 0 on an
        # empty corpus where SUM degrades to NULL (the report must
        # always be one well-formed row)
        return F.count(F.when(cond, F.lit(1)))

    return feats.agg(
        cnt(g0).alias("n_total"),
        cnt(F.col("n_words") > 0).alias("n_nonempty"),
        cnt(g1).alias("n_min_len"),
        cnt(g2).alias("n_punct"),
        cnt(g3).alias("n_digit"),
        cnt(g4).alias("n_word_len"),
    )


def source_token_jaccard(
    df: DataFrame, text_col: str = "text", source_col: str = "source"
) -> DataFrame:
    """EXACT Jaccard similarity of the distinct-token vocabularies of
    every pair of corpus sources — the cross-source overlap matrix a
    training-mix designer reads next to ``corpus_stats`` (high overlap
    → the sources are near-redundant; the dedup families answer the
    same question per-document, this answers it per-SOURCE).

    ``J(a,b) = |Va ∩ Vb| / (|Va| + |Vb| − |Va ∩ Vb|)`` over lowercase
    whitespace vocabularies; only overlapping pairs are emitted (a
    zero-intersection pair contributes no row — the inner-join
    convention of the dedup pair reports).  All three counts are exact
    LONGs; J is ONE double division.

    Shape (100 TB): explode → distinct(source, token) is a combiner-
    friendly hash distinct (vocabulary-scale, not corpus-scale, after
    the map side); the intersection self-join shuffles the vocabulary
    table on token, and each token fans out to at most
    C(#sources, 2) pairs — bounded by the DIMS-scale source count
    squared, never by corpus size.  Per-source sizes are a tiny
    aggregate broadcast onto the pair counts.
    """
    t = F.col(text_col)
    vocab = (
        df.filter(_nonempty(t))
        .select(
            F.col(source_col).alias("source"),
            F.explode(F.split(F.lower(F.trim(t)), _WS)).alias("tok"),
        )
        .distinct()
    )
    sizes = vocab.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a, b = vocab.alias("a"), vocab.alias("b")
    inter = (
        a.join(b, F.col("a.tok") == F.col("b.tok"))
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = F.broadcast(sizes.select(F.col("source").alias("src_a"), F.col("n").alias("n_a")))
    sb = F.broadcast(sizes.select(F.col("source").alias("src_b"), F.col("n").alias("n_b")))
    joined = inter.join(sa, "src_a").join(sb, "src_b")
    union = F.col("n_a") + F.col("n_b") - F.col("n_common")
    return joined.select(
        "src_a",
        "src_b",
        "n_a",
        "n_b",
        "n_common",
        (F.col("n_common").cast("double") / union.cast("double")).alias("jaccard"),
    )


def source_token_stats(
    df: DataFrame, text_col: str = "text", source_col: str = "source"
) -> DataFrame:
    """Per-source vocabulary profile: token count, vocabulary size,
    hapax count, the dominant token, and the Simpson concentration
    index ``Σc² / N²`` (a.k.a. Herfindahl over the unigram
    distribution) with its inverse, the EFFECTIVE vocabulary size
    ``N²/Σc²`` — the diversity screen read before weighting a source
    in a training mix.  Simpson is chosen over Shannon entropy
    DELIBERATELY: ``Σ c·ln c`` is a cross-row float sum whose value
    depends on accumulation order (the numeric-policy trap), while
    ``Σc²`` is exact integer arithmetic on both engines.

    Exactness: token/vocab/hapax counts are LONGs; ``Σc²`` accumulates
    in DECIMAL(38,0) (a 100 TB source's Σc² clears 2⁶³ — the
    kyle_lambda policy); the two indices are single double expressions
    over exact values, rounded 6dp.  The top token breaks count ties
    on the lexicographically LARGEST token (max_by on the (count,
    token) struct — deterministic on both engines).

    Shape (100 TB): wordcount — explode → (source, token) hash count
    with map-side partials, then a #sources-row aggregate.  Nothing
    quadratic, no windows, no joins.
    """
    t = F.col(text_col)
    counts = (
        df.filter(_nonempty(t))
        .select(
            F.col(source_col).alias("source"),
            F.explode(F.split(F.lower(F.trim(t)), _WS)).alias("tok"),
        )
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cdec = F.col("c").cast("decimal(38,0)")
    per = counts.groupBy("source").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab"),
        F.count(F.when(F.col("c") == 1, F.lit(1))).alias("n_hapax"),
        F.sum(cdec * cdec).alias("__c2"),
        F.max_by("tok", F.struct("c", "tok")).alias("top_tok"),
        F.max("c").alias("top_count"),
    )
    ntd = F.col("n_tokens").cast("double")
    c2d = F.col("__c2").cast("double")
    return per.select(
        "source",
        "n_tokens",
        "vocab",
        "n_hapax",
        "top_tok",
        "top_count",
        F.round(c2d / (ntd * ntd), 6).alias("simpson"),
        F.round(ntd * ntd / c2d, 6).alias("effective_vocab"),
    )


def vocab_growth(
    df: DataFrame,
    bin_docs: int = 100,
    text_col: str = "text",
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source Heaps-law vocabulary-growth curve: reading a
    source's documents in doc-id order, the cumulative token count and
    cumulative DISTINCT-token count after each bin of ``bin_docs``
    document ids — the sub-linear vocab-vs-tokens curve (Heaps' law,
    public) that tells a corpus builder whether more data from a
    source still buys new vocabulary or is saturating.

    Exactness: a type's first occurrence is attributed to the MINIMUM
    doc id containing it (exact integer aggregate — no ordering of
    floats anywhere); both curves are integer window sums.  Blank
    documents stay on the curve with zero tokens.

    The doc axis is BINNED (``id DIV bin_docs``) deliberately: the
    cumulative sums need a per-source sort, and per-doc granularity
    would sort corpus-scale rows inside #sources partitions (a skew
    cliff at 100 TB).  Binning caps the window input at
    max_id/bin_docs rows per source — ``bin_docs`` is the scale lever,
    and a curve with more points than a plot can show is noise anyway.

    Shape: one explode → (source, token) min-id aggregate (wordcount,
    map-side combinable), one doc-level bin aggregate off a narrow
    projection, a (source, bin)-keyed join of the two bin tables, then
    the shared per-source window — everything after the explode is
    bin-scale.
    """
    from pyspark.sql import Window

    if bin_docs <= 0:
        raise ValueError("bin_docs must be positive")
    t = F.col(text_col)
    tok_n = F.when(_nonempty(t), F.size(F.split(F.lower(F.trim(t)), _WS))).otherwise(
        F.lit(0)
    )
    bins = (
        df.select(
            F.col(source_col).alias("source"),
            F.expr(f"{id_col} DIV {int(bin_docs)}").alias("bin"),
            tok_n.alias("__nt"),
        )
        .groupBy("source", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__nt").alias("n_tokens"),
        )
    )
    firsts = (
        df.filter(_nonempty(t))
        .select(
            F.col(source_col).alias("source"),
            F.col(id_col).alias("__id"),
            F.explode(F.split(F.lower(F.trim(t)), _WS)).alias("tok"),
        )
        .groupBy("source", "tok")
        .agg(F.min("__id").alias("first_doc"))
        .groupBy("source", F.expr(f"first_doc DIV {int(bin_docs)}").alias("bin"))
        .agg(F.count(F.lit(1)).alias("__new"))
    )
    j = bins.join(firsts, ["source", "bin"], "left").select(
        "source",
        "bin",
        "n_docs",
        "n_tokens",
        F.coalesce(F.col("__new"), F.lit(0)).alias("new_types"),
    )
    w = Window.partitionBy("source").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return j.select(
        "source",
        "bin",
        "n_docs",
        "n_tokens",
        "new_types",
        F.sum("n_tokens").over(w).alias("cum_tokens"),
        F.sum("new_types").over(w).alias("cum_types"),
    )


def unigram_nll(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document negative log-likelihood under the CORPUS'S OWN
    unigram language model — the external-model-free version of the
    CCNet/DSIR LM-quality signal: documents whose tokens are corpus-
    typical score low, gibberish and off-distribution text score high.

    The per-doc mean of float log-probs is a cross-row float sum
    (order-dependent — banned), so each distinct token's log-prob is
    FIXED-POINT quantized once — ``floor(ln(c/N)·10⁶ + 0.5)`` as a
    LONG, floor being engine-identical on the same double where
    round-half-up is not — and each document sums exact integers; the
    NLL is one mirrored double chain ``−(Σq/n)/10⁶``.  (ln is the
    bm25-precedent deliberate libm use: both engines see the identical
    ``c/N`` double, and the quantization step absorbs the sub-ulp
    difference except on exact boundaries — parity-tested at three
    scales.)

    Shape (100 TB): one explode feeding BOTH the token-count aggregate
    (wordcount, map-side combined) and the per-doc join; the scalar N
    is a one-row broadcast (bm25 pattern) derived from the COUNTS
    table (Σc — a vocab-scale rollup; summing the raw token stream
    again was a third full-corpus pass, caught by the round-9
    repeated-scan audit); the token join shuffles the exploded corpus
    once on token (the doc_freq_score shape — there is no per-token
    lookup without it), then a per-doc aggregate.
    """
    t = F.col(text_col)
    toks = df.filter(_nonempty(t)).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.trim(t)), _WS)).alias("tok"),
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(F.sum("c").alias("n"))
    q = F.floor(
        F.log(F.col("c").cast("double") / F.col("n").cast("double"))
        * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("long")
    qtab = counts.crossJoin(F.broadcast(total)).select("tok", q.alias("q"))
    # Explicit SHUFFLE_HASH on the q-table side: Catalyst's post-
    # Generate size estimate undershoots the exploded token stream and
    # the planner otherwise builds the BROADCAST from the corpus-scale
    # stream (BuildLeft — a driver-OOM shape at scale, and 2× slower
    # locally).  The hinted shape is the docstring's intended one: the
    # stream pays ONE token-keyed exchange, the q-table side is already
    # partitioned on tok by its own aggregate (no extra exchange), and
    # the per-partition build is vocab/num_partitions rows (§3.2: hash
    # build on the provably smaller side, no sort of the stream).
    per = toks.join(qtab.hint("shuffle_hash"), "tok").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("q").alias("__sq"),
    )
    nll = (
        -(F.col("__sq").cast("double") / F.col("n_tokens").cast("double"))
    ) / F.lit(1000000.0)
    return per.select("doc_id", "n_tokens", nll.alias("nll"))


def c4_clean(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The C4 line/page cleaning recipe (Raffel et al. 2020,
    arXiv:1910.10683 §2.2) as a TRANSFORM: returns the cleaned text
    plus the page-level keep decision, so the actual corpus rewrite is
    one filter + select downstream.

    Line rules (a line survives iff ALL hold): ends in terminal
    punctuation (``. ! ? "``), carries ≥ 3 whitespace words, doesn't
    mention ``javascript`` (boilerplate warning lines).  Page rules:
    drop on ``lorem ipsum``, any ``{`` (code), or < 5 sentences after
    line cleaning.  (C4's three-sentence-span dedup is the separate
    ``dedup_span`` operator; the bad-words list is site-specific and
    injected by the caller as a pre-filter.)

    Scale shape: entirely row-local — split/filter/join HOFs, one
    scan, zero shuffles, like :func:`gopher_rules`.  The cleaned text
    is rebuilt with ``array_join`` so both engines produce the
    identical byte string (hash-parity on the transform output, not
    just the counts).
    """
    t0 = F.col(text_col)
    lines = F.split(t0, "\n")
    # regex predicates so tabs behave like spaces (trim/rtrim are
    # space-only in both engines) and leading whitespace can't create
    # a phantom empty token in the word count
    kept = F.filter(
        lines,
        lambda x: x.rlike(r'[.!?"]\s*$')
        & (F.regexp_count(x, F.lit(r"\S+")) >= 3)
        & ~F.lower(x).contains("javascript"),
    )
    clean = F.array_join(kept, "\n")
    n_sent = F.regexp_count(clean, F.lit(r"[.!?]")).cast("long")
    has_lorem = F.lower(t0).contains("lorem ipsum")
    has_brace = t0.contains("{")
    keep = (~has_lorem) & (~has_brace) & (n_sent >= 5)
    return df.select(
        F.col(id_col).alias("doc_id"),
        clean.alias("clean_text"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_lines_kept"),
        n_sent.alias("n_sentences"),
        has_lorem.cast("int").alias("has_lorem_ipsum"),
        has_brace.cast("int").alias("has_brace"),
        keep.cast("int").alias("keep_doc"),
    )


#: Gopher rule 7's minimal English stop set (Rae 2021 Table A1).
_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The Gopher document-quality rule battery (Rae et al. 2021,
    arXiv:2112.11446 Table A1) — the LINE-level and word-shape filters
    that `quality_features` (char-ratio) doesn't cover: word count in
    [50, 100k], mean word length in [3, 10], symbol-to-word ratio
    (# and ellipses) ≤ 0.1, ≤90% of lines bullet-started, ≤30% of
    lines ellipsis-ended, ≥80% of words containing a letter, ≥2 hits
    from a small stop set — plus the duplicate-line fraction signal.

    Scale shape: ENTIRELY row-local — split/filter/aggregate HOFs over
    per-doc arrays, no explode, no shuffle; the whole battery is one
    scan and one projection (the cheapest possible 100 TB plan).
    Parity discipline: every fraction is a single division of two
    exact integers, and every pass/fail flag compares INTEGERS
    (3·W ≤ Σlen ≤ 10·W, 10·symbols ≤ W, …) so no threshold can flip
    on a float boundary cross-engine.
    """
    t0 = F.lower(F.col(text_col))
    # split then drop empty tokens: trim() strips only spaces in both
    # engines, so trim-then-split would count phantom "" words on
    # newline-only docs; likewise a line is blank iff it has no
    # non-whitespace char (space-only trim would count a tab-only
    # line as content)
    words = F.filter(F.split(t0, _WS), lambda x: x != "")
    lines = F.filter(F.split(t0, "\n"), lambda x: x.rlike(r"\S"))
    w = F.size(words).cast("long")
    sum_len = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    hashes = F.regexp_count(t0, F.lit("#")).cast("long")
    ells = (
        F.regexp_count(t0, F.lit(r"\.\.\.")) + F.regexp_count(t0, F.lit("…"))
    ).cast("long")
    alpha_w = F.size(F.filter(words, lambda x: x.rlike("[a-z]"))).cast("long")
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(words), F.array(*[F.lit(s) for s in _GOPHER_STOPS])
        )
    ).cast("long")
    nl = F.size(lines).cast("long")
    # first non-whitespace char / ellipsis-before-trailing-whitespace:
    # regex forms so tabs behave like spaces (ltrim/rtrim are
    # space-only in both engines)
    bullets = F.size(
        F.filter(
            lines,
            lambda x: F.regexp_extract(x, r"\S", 0).isin("-", "*", "•"),
        )
    ).cast("long")
    ell_lines = F.size(
        F.filter(lines, lambda x: x.rlike(r"(\.\.\.|…)\s*$"))
    ).cast("long")
    dlines = F.size(F.array_distinct(lines)).cast("long")

    base = df.select(
        F.col(id_col).alias("doc_id"),
        w.alias("n_words"),
        sum_len.alias("__sl"),
        hashes.alias("__h"),
        ells.alias("__e"),
        alpha_w.alias("__aw"),
        stop_hits.alias("stopword_hits"),
        nl.alias("n_lines"),
        bullets.alias("__b"),
        ell_lines.alias("__el"),
        dlines.alias("__dl"),
    )
    W = F.col("n_words")
    L = F.col("n_lines")
    nzw = F.when(W > 0, W.cast("double"))
    nzl = F.when(L > 0, L.cast("double"))
    syms = F.col("__h") + F.col("__e")
    flags = {
        "pass_word_count": (W >= 50) & (W <= 100000),
        "pass_mean_word_len": (W > 0)
        & (3 * W <= F.col("__sl"))
        & (F.col("__sl") <= 10 * W),
        "pass_symbol_ratio": (W > 0) & (10 * syms <= W),
        "pass_bullet_lines": (L == 0) | (10 * F.col("__b") <= 9 * L),
        "pass_ellipsis_lines": (L == 0) | (10 * F.col("__el") <= 3 * L),
        "pass_alpha_words": (W > 0) & (5 * F.col("__aw") >= 4 * W),
        "pass_stopwords": F.col("stopword_hits") >= 2,
    }
    all_pass = None
    for c in flags.values():
        all_pass = c if all_pass is None else (all_pass & c)
    return base.select(
        "doc_id",
        "n_words",
        "n_lines",
        (F.col("__sl").cast("double") / nzw).alias("mean_word_len"),
        (syms.cast("double") / nzw).alias("symbol_word_ratio"),
        (F.col("__b").cast("double") / nzl).alias("bullet_line_frac"),
        (F.col("__el").cast("double") / nzl).alias("ellipsis_line_frac"),
        ((L - F.col("__dl")).cast("double") / nzl).alias("dup_line_frac"),
        (F.col("__aw").cast("double") / nzw).alias("alpha_word_frac"),
        "stopword_hits",
        *[v.cast("int").alias(k) for k, v in flags.items()],
        all_pass.cast("int").alias("gopher_pass"),
    )


def dsir_weights(
    df: DataFrame,
    target,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document importance weights for DOMAIN-TARGETED data
    selection (the DSIR recipe, Xie et al. 2023, arXiv:2302.03169):
    score each document by how much more likely its tokens are under
    the target domain's unigram LM than under the raw corpus's —
    ``log w(d) = Σ_tok [ln p_tgt(tok) − ln p_raw(tok)]`` with add-one
    smoothing over the shared vocabulary on both sides.  Positive
    ``log_w`` = target-like; sample/select by weight downstream
    (corpus_sample_stratified / corpus_sample_fixed_n compose).

    ``target`` is a boolean Column marking the in-domain documents
    (e.g. ``F.col("source") == "wiki"``); both LMs come from ONE
    conditional aggregate over one exploded token stream — the target
    model is a filtered projection of the same counts, not a second
    corpus pass.

    Parity discipline (the unigram_nll idiom): each distinct token's
    log-ratio is fixed-point quantized once —
    ``floor(ln((c+1)/(N+V))·10⁶ + 0.5)`` per side as LONG — documents
    sum exact integers, and the weight is one mirrored double chain.

    Shape (100 TB): explode feeds the token-count aggregate (map-side
    combined, vocab-scale result) and the per-doc join; scalars
    (N_raw, N_tgt, V) are a one-row broadcast derived from the counts
    table; the token join shuffles the exploded corpus once on token
    (the doc_freq_score shape), then a per-doc aggregate.  The hashed
    variant at extreme vocab (bucket tokens with F.hash % B before
    counting, the paper's actual estimator) drops in before the
    groupBy without changing the plan shape.
    """
    t = F.col(text_col)
    toks = (
        df.filter(_nonempty(t))
        .select(
            F.col(id_col).alias("doc_id"),
            target.cast("boolean").alias("__tgt"),
            F.explode(F.split(F.lower(F.trim(t)), _WS)).alias("tok"),
        )
        .filter(F.col("tok") != "")  # newline-only docs split to [""]
    )
    counts = toks.groupBy("tok").agg(
        F.count(F.lit(1)).alias("c_r"),
        F.count(F.when(F.col("__tgt"), F.lit(1))).alias("c_t"),
    )
    scalars = counts.agg(
        F.sum("c_r").alias("n_r"),
        F.sum("c_t").alias("n_t"),
        F.count(F.lit(1)).alias("v"),
    )

    def _q(c, n):
        return F.floor(
            F.log(c.cast("double") / n.cast("double")) * F.lit(1000000.0)
            + F.lit(0.5)
        ).cast("long")

    qtab = counts.crossJoin(F.broadcast(scalars)).select(
        "tok",
        (
            _q(F.col("c_t") + 1, F.col("n_t") + F.col("v"))
            - _q(F.col("c_r") + 1, F.col("n_r") + F.col("v"))
        ).alias("qd"),
    )
    # SHUFFLE_HASH for the same reason as unigram_nll: the planner's
    # post-Generate size estimate otherwise broadcasts the CORPUS-scale
    # token stream (BuildLeft).  The vocab-scale q-table cannot be the
    # broadcast side at 100 TB either (open vocabulary) — the hashed
    # variant is the bounded-table scale path and broadcasts its
    # ≤ num_buckets q-table instead.
    per = toks.join(qtab.hint("shuffle_hash"), "tok").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("qd").alias("__s"),
    )
    lw = F.col("__s").cast("double") / F.lit(1000000.0)
    return per.select(
        "doc_id",
        "n_tokens",
        lw.alias("log_w"),
        (lw / F.col("n_tokens").cast("double")).alias("avg_log_w"),
    )


def dsir_weights_hashed(
    df: DataFrame,
    target,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 4096,
) -> DataFrame:
    """The HASHED-feature DSIR estimator — the form Xie et al. 2023
    (arXiv:2302.03169, §3 "hashed n-gram features") actually run at
    pretraining scale: tokens are bucketed by ``hash(tok) % B`` before
    the LM counts, so both unigram models live in a FIXED ``B``-cell
    table regardless of vocabulary size, and add-one smoothing runs
    over the ``B`` buckets (denominator ``N + B``) instead of the
    observed vocabulary.  :func:`dsir_weights` (the plain-vocab
    variant) documents this as its 100 TB drop-in; this is that
    drop-in, registered first-class.

    Why it matters at 100 TB: the plain estimator's count table is
    vocabulary-sized (open-ended — web corpora exceed 10⁹ distinct
    tokens), so the token-keyed shuffle and the broadcast q-table both
    grow with the data.  Here both are capped at ``B`` rows: the
    groupBy state is a fixed array, the q-table broadcast is ~``B``×16
    bytes, and the per-doc join keys draw from ``B`` values — hash
    collisions trade a bounded bias (the paper's analysis) for a
    bounded plan.

    The bucket hash is the repo's cross-engine idiom (dedup.py:654):
    the top 15 hex digits of md5 as a non-negative LONG, mod ``B`` —
    bit-identical in Spark (``conv(substring(md5(tok),1,15),16,10)``)
    and DuckDB (``CAST('0x' || substr(md5(tok),1,15) AS BIGINT)``), so
    the oracle pins hash parity, not just shape.  Quantization and the
    exact-integer doc sums mirror :func:`dsir_weights`.

    Plan shape (pinned in test_scan_census): ONE tokenize+md5 pass
    behind a ``repartition("bk")`` materialization barrier (r14) whose
    shuffle files feed both consumers — the counts ``groupBy("bk")``
    reuses the barrier's partitioning and the per-doc probe side
    replays it as a ReusedExchange; the corpus totals come from an
    unpartitioned WINDOW over the bounded counts table (scale-safe only
    because B is a constant — see the inline comment), NOT the plain
    variant's crossJoin of a one-row broadcast; then one token-bucket
    BroadcastHashJoin with the ≤ B-row q-table as the explicit
    ``F.broadcast`` build side, and one per-doc aggregate.
    """
    t = F.col(text_col)
    toks = (
        df.filter(_nonempty(t))
        .select(
            F.col(id_col).alias("doc_id"),
            target.cast("boolean").alias("__tgt"),
            F.explode(F.split(F.lower(F.trim(t)), _WS)).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .select(
            "doc_id",
            "__tgt",
            (
                F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10)
                .cast("long")
                % F.lit(num_buckets)
            ).alias("bk"),
        )
        # bk is never null, but the per-doc join below INFERS
        # isnotnull(bk) into only its own branch; carrying the filter
        # here keeps both consumer subtrees byte-identical (reuse
        # prerequisite for the barrier exchange below).
        .filter(F.col("bk").isNotNull())
        # MATERIALIZATION BARRIER (r14, VERDICT r13 #2): tokenize +
        # md5-bucket runs ONCE and both consumers (the B-row counts
        # aggregate and the per-doc probe side) replay the barrier's
        # shuffle files — without it each branch re-ran the corpus
        # scan, split, explode and per-token md5 (2 scans / 2 hash
        # passes; r10 census).  Keyed on bk so the counts groupBy
        # reuses the partitioning (no second exchange).  Scale
        # accounting at 100 TB: the probe side of the broadcast join
        # previously shipped nothing (narrow scan→join), so the
        # barrier ADDS one token-stream shuffle write+read — but
        # REMOVES a full corpus scan plus a per-token md5+conv pass,
        # which dominates (the token rows here are three narrow
        # columns; the md5 is ~100 ns/token and the scan is the 100 TB
        # text itself).
        .repartition("bk")
    )
    # PRUNING ANCHORS (r14): both consumers of the barrier must demand
    # the SAME (doc_id, __tgt, bk) column set below it, or per-branch
    # column pruning rewrites each copy's tokenize projection and the
    # barrier exchange forks (ReusedExchange only dedups canonically
    # equal subtrees).  The references must survive the optimizer
    # (probed live: count(<non-null expr>) folds to count(1),
    # 0·length(·) folds away, and a guard FILTER sinks below the
    # projection with its aliases inlined) — hence the fold-resistant
    # but provably value-neutral forms here:
    #   * c_t counts when(__tgt, greatest(1, pmod(coalesce(doc_id,0),1)))
    #     — pmod(x,1)=0 for every x, so the branch value is exactly 1;
    #   * n_tokens (below) counts when(length(concat_ws('', __tgt)) >= 0, 1)
    #     — concat_ws never returns null and length is never negative,
    #     so the predicate is TRUE for every row including null __tgt.
    counts = toks.groupBy("bk").agg(
        F.count(F.lit(1)).alias("c_r"),
        F.count(
            F.when(
                F.col("__tgt"),
                F.greatest(F.lit(1), F.pmod(F.coalesce(F.col("doc_id"), F.lit(0)), F.lit(1))),
            )
        ).alias("c_t"),
    )

    def _q(c, n):
        return F.floor(
            F.log(c.cast("double") / n.cast("double")) * F.lit(1000000.0)
            + F.lit(0.5)
        ).cast("long")

    # Corpus totals via an unpartitioned window over the ≤ B-row counts
    # table (NOT the plain variant's crossJoin of a separate one-row
    # aggregate): the counts subtree appears once, so the totals need
    # no second aggregate pipeline, no SinglePartition exchange, and no
    # BroadcastNestedLoopJoin — the window sees all B rows in one task,
    # which is scale-safe ONLY because B is a fixed constant (the plain
    # vocab-scale variant keeps the crossJoin; its counts table is
    # unbounded and must never pass through one task).
    wall = Window.partitionBy()
    v = F.lit(num_buckets).cast("long")
    qtab = counts.select(
        "bk",
        F.sum("c_r").over(wall).alias("n_r"),
        F.sum("c_t").over(wall).alias("n_t"),
        "c_t",
        "c_r",
    ).select(
        "bk",
        (
            _q(F.col("c_t") + 1, F.col("n_t") + v)
            - _q(F.col("c_r") + 1, F.col("n_r") + v)
        ).alias("qd"),
    )
    # Explicit build side: after Generate+Project, Catalyst's size
    # estimate for the exploded token stream shrinks below the
    # broadcast threshold and the planner builds the broadcast from
    # the CORPUS-scale stream (BuildLeft) — a driver-OOM shape at
    # scale.  The q-table is ≤ num_buckets rows by construction, so
    # it is always the correct build side (§3.1: pick the join
    # strategy deliberately).
    # n_tokens ≡ count(1) — the __tgt half of the anchor pair (see the
    # counts comment above).
    per = toks.join(F.broadcast(qtab), "bk").groupBy("doc_id").agg(
        F.count(
            F.when(
                F.length(F.concat_ws("", F.col("__tgt").cast("string"))) >= 0,
                F.lit(1),
            )
        ).alias("n_tokens"),
        F.sum("qd").alias("__s"),
    )
    lw = F.col("__s").cast("double") / F.lit(1000000.0)
    return per.select(
        "doc_id",
        "n_tokens",
        lw.alias("log_w"),
        (lw / F.col("n_tokens").cast("double")).alias("avg_log_w"),
    )


def language_mix(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-(source, predicted language) composition report with the
    metadata-agreement rate: how much of each source the langid
    heuristic assigns to each language, what share of the source that
    is, and how often the prediction agrees with the table's own
    ``lang`` label — the QA table read before trusting EITHER signal
    in a training mix (every corpus paper reports its language
    composition; the agreement column localizes where heuristic and
    metadata disagree).

    Same marker-argmax as :func:`langid` (alphabetical tie-break),
    inlined so source/label ride the one projection — composing
    ``langid(df)`` would force a doc-keyed self-join.  Counts are
    exact LONGs; the share is one double division against a
    per-source window total over GROUP-scale rows (sources × five
    languages — dims², never corpus-scale); agreement is one double
    division.  One corpus scan, one hash aggregate.
    """
    from pyspark.sql import Window

    low = F.lower(F.col(text_col))
    neg = [
        F.struct(
            (
                -F.regexp_count(
                    low, F.lit(rf"\b(?:{'|'.join(LANG_MARKERS[lang])})\b")
                )
            ).alias("neg_score"),
            F.lit(lang).alias("lang"),
        )
        for lang in sorted(LANG_MARKERS)
    ]
    best = F.sort_array(F.array(*neg), asc=True)[0]
    staged = df.select(
        F.col(source_col).alias("source"),
        F.col(lang_col).alias("__label"),
        best["lang"].alias("predicted_lang"),
    )
    per = staged.groupBy("source", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(
            F.when(F.col("__label") == F.col("predicted_lang"), F.lit(1))
        ).alias("n_label_match"),
    )
    w = Window.partitionBy("source")
    return per.select(
        "source",
        "predicted_lang",
        "n_docs",
        "n_label_match",
        (
            F.col("n_docs").cast("double")
            / F.sum("n_docs").over(w).cast("double")
        ).alias("share"),
        (
            F.col("n_label_match").cast("double") / F.col("n_docs").cast("double")
        ).alias("label_agreement"),
    )


def zipf_fit(
    df: DataFrame,
    top_k: int = 1000,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Zipf-law fit per source: the least-squares slope of
    log-frequency vs log-rank over the top ``top_k`` terms — natural
    text sits near −1; templated/boilerplate feeds and synthetic spam
    flatten or steepen, so the slope is a cheap distribution-level
    quality signal next to the per-doc filters (Gopher's repetition
    rules look inside documents; this looks at the source's whole
    frequency curve).

    Numeric policy (the unigram_nll/bm25 precedent): both engines see
    the IDENTICAL integer rank/count doubles, ln is the sanctioned
    libm use, and each log is FIXED-POINT quantized once
    (``floor(ln·10⁶ + 0.5)`` as LONG) so all regression moments are
    exact integers (cross-terms DECIMAL(38,0) per the house moment
    policy); the slope is one double division of two exact decimals.
    Rank ties break on the term itself — deterministic.

    Shape (100 TB): one wordcount aggregate, a per-source top-k rank
    window over the (vocab-scale) counts, and a per-source moment
    aggregate over ≤ top_k rows.  The corpus shuffles once, as tokens.
    """
    from pyspark.sql import Window

    t = F.col(text_col)
    counts = (
        df.filter(_nonempty(t))
        .select(
            F.col(source_col).alias("source"),
            F.explode(F.split(F.lower(F.trim(t)), _WS)).alias("term"),
        )
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("source").orderBy(F.col("c").desc(), F.col("term"))
    ranked = counts.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= top_k
    )
    def _q(col):
        return F.floor(
            F.log(col.cast("double")) * F.lit(1000000.0) + F.lit(0.5)
        ).cast("long")
    q = ranked.select("source", _q(F.col("rk")).alias("x"), _q(F.col("c")).alias("y"))
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = q.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d38(F.col("x"))).alias("sx"),
        F.sum(d38(F.col("y"))).alias("sy"),
        F.sum(d38(F.col("x")) * F.col("y")).alias("sxy"),
        F.sum(d38(F.col("x")) * F.col("x")).alias("sxx"),
    )
    num = d38(F.col("n")) * F.col("sxy") - F.col("sx") * F.col("sy")
    den = d38(F.col("n")) * F.col("sxx") - F.col("sx") * F.col("sx")
    return m.select(
        "source",
        F.col("n").alias("n_terms"),
        (num.cast("double") / den.cast("double")).alias("zipf_slope"),
    )
