"""Empty-input behavior (reference: executor/all_test.go and
frontend/query_test.go exercise empty ranges / missing keys — the
engine must return empty results with the right schema, never throw)."""

import pytest
from pyspark.sql import functions as F

from marketstore_spark.catalog import load_table
from marketstore_spark.operators.candler import tick_candles
from marketstore_spark.operators.dedup import exact_dedup_groups, minhash_lsh_pairs
from marketstore_spark.operators.gapfill import gapfill_ffill
from marketstore_spark.operators.slice import limit_records, time_range
from marketstore_spark.operators.uda import gap_threshold, scalar_agg


@pytest.fixture(scope="module")
def empty_events(spark):
    return spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_empty_range_returns_zero_rows(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = time_range(ev, start="2030-01-01", end="2030-12-31")
    assert out.count() == 0
    assert out.schema == ev.schema


def test_candler_empty_input(empty_events):
    out = tick_candles(empty_events, "5Min")
    assert out.count() == 0
    assert {"open", "high", "low", "close", "epoch"} <= set(out.columns)


def test_limit_and_aggs_empty_input(empty_events):
    assert limit_records(empty_events, 5).count() == 0
    assert scalar_agg(empty_events, "min").count() == 0
    assert gap_threshold(empty_events, 60).count() == 0


def test_gapfill_empty_input(empty_events):
    assert gapfill_ffill(empty_events, "15Min").count() == 0


def test_dedup_empty_and_whitespace_docs(spark, empty_docs):
    assert exact_dedup_groups(empty_docs).count() == 0
    assert minhash_lsh_pairs(empty_docs).count() == 0
    ws = spark.createDataFrame([(1, "   "), (2, "a b")], "doc_id long, text string")
    # whitespace-only docs are excluded from shingling, short docs from
    # 3-gram shingles: no pairs, no crash
    assert minhash_lsh_pairs(ws).count() == 0


def test_adjust_empty_ca_table(spark, sf_dir):
    """No corporate actions → adjusted == value (rounded), never a
    throw; exercises the exact path's empty-ratio fallback."""
    from marketstore_spark.operators.adjust import adjust

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value").limit(50)
    empty_ca = spark.createDataFrame([], "user_id long, ts timestamp, ratio double")
    out = adjust(ev, empty_ca)
    assert out.count() == 50
    assert out.filter(F.col("adjusted") != F.round(F.col("value"), 4)).count() == 0


def test_interval_join_empty_sides(spark, empty_events):
    from marketstore_spark.operators.rangejoin import interval_join

    ivs = spark.createDataFrame([], "iid long, start_ts timestamp, end_ts timestamp")
    out = interval_join(
        empty_events.select("ts"), ivs, start_col="start_ts", end_col="end_ts"
    )
    assert out.count() == 0


def test_parse_announcements_empty_file(spark, tmp_path):
    from marketstore_spark.operators.ca import parse_announcements

    f = tmp_path / "empty.reorg"
    f.write_text("H0|header-only\n# nothing else\n")
    out = parse_announcements(spark, str(f))
    assert out.count() == 0
    assert out.columns == ["symbol", "ex_ts", "ratio", "type"]


def test_corpus_stats_empty(spark):
    from marketstore_spark.operators.text import corpus_stats

    docs = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    assert corpus_stats(docs).count() == 0


def test_corpus_hygiene_empty_input(spark, empty_docs):
    from marketstore_spark.operators.dedup import benchmark_overlap
    from marketstore_spark.operators.sampling import hash_sample
    from marketstore_spark.operators.text import repetition_stats

    assert repetition_stats(empty_docs).count() == 0
    assert hash_sample(empty_docs).count() == 0
    docs = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    # empty benchmark → nothing flagged; empty corpus → nothing flagged
    assert benchmark_overlap(docs, empty_docs, n=3).count() == 0
    assert benchmark_overlap(empty_docs, docs, n=3).count() == 0


def test_round5_operators_empty_input(spark, empty_events, empty_docs):
    from marketstore_spark.operators.dedup import span_dedup_groups
    from marketstore_spark.operators.ewm import macd
    from marketstore_spark.operators.gapfill import gapfill_interp
    from marketstore_spark.operators.quant import obv, stochastic_k
    from marketstore_spark.operators.sampling import pack_documents
    from marketstore_spark.operators.text import scrub_pii

    ev = empty_events.withColumn("volume", F.lit(1).cast("long"))
    assert obv(ev).count() == 0
    assert stochastic_k(ev).count() == 0
    assert macd(empty_events.select("user_id", "ts", "event_id", "value")).count() == 0
    assert gapfill_interp(empty_events, "1H").count() == 0
    assert span_dedup_groups(empty_docs).count() == 0
    assert scrub_pii(empty_docs).count() == 0
    docs = empty_docs.withColumn("lang", F.lit("en"))
    assert pack_documents(docs).count() == 0
    # whitespace-only and sub-span docs: no spans, no crash
    short = spark.createDataFrame([(1, "   "), (2, "a b")], "doc_id long, text string")
    assert span_dedup_groups(short, span_words=5).count() == 0


def test_round6_indicators_empty_input(empty_events):
    from marketstore_spark.operators.quant import atr, donchian, xs_momentum

    ee = empty_events.withColumn("event_id", F.col("event_id"))
    assert atr(ee).count() == 0
    assert donchian(ee).count() == 0
    assert xs_momentum(ee).count() == 0


def test_round6_corpus_ops_empty_input(spark, empty_docs):
    from marketstore_spark.operators.sampling import (
        chunk_documents,
        stratified_hash_sample,
    )
    from marketstore_spark.operators.text import doc_freq_score

    assert chunk_documents(empty_docs).count() == 0
    assert doc_freq_score(empty_docs).count() == 0
    ed = empty_docs.withColumn("lang", F.lit("en"))
    assert stratified_hash_sample(ed, rates={"en": 64}).count() == 0
    # whitespace-only docs produce no chunks and no score rows
    ws = spark.createDataFrame([(1, "   ")], "doc_id long, text string")
    assert chunk_documents(ws).count() == 0
    assert doc_freq_score(ws).count() == 0


def test_semantic_dedup_empty_input(spark):
    from marketstore_spark.operators.dedup import (
        semantic_dedup_keep,
        semantic_dedup_pairs,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert semantic_dedup_pairs(empty).count() == 0
    assert semantic_dedup_keep(empty).count() == 0


def test_ema_macd_empty_input(empty_events):
    from marketstore_spark.operators.ewm import ema, macd

    assert ema(empty_events).count() == 0
    assert macd(empty_events).count() == 0


def test_round6_operators_empty_input(spark, empty_events, empty_docs):
    from marketstore_spark.operators.candler import rollup_cascade
    from marketstore_spark.operators.quant import nbbo, tick_rule
    from marketstore_spark.operators.simsearch import knn_label_eval
    from marketstore_spark.operators.text import bm25_score

    ev = empty_events.withColumn("volume", F.lit(None).cast("long"))
    out = tick_rule(ev)
    assert out.count() == 0
    assert {"side", "signed_vol", "cum_flow"} <= set(out.columns)

    out = nbbo(empty_events)
    assert out.count() == 0
    assert {"best_bid_c", "best_ask_c", "bid_venue", "ask_venue"} <= set(out.columns)

    out = rollup_cascade(empty_events)
    assert out.count() == 0
    assert {"level", "epoch", "open", "close", "n"} <= set(out.columns)

    out = bm25_score(empty_docs, ["scan", "join"])
    assert out.count() == 0
    assert set(out.columns) == {"doc_id", "n_tokens", "bm25"}

    empty_emb = spark.createDataFrame(
        [], "vec_id long, embedding array<double>, label int"
    )
    out = knn_label_eval(empty_emb)
    assert out.count() == 0
    assert set(out.columns) == {"vec_id", "label", "pred", "correct"}


def test_round8_quant_family_empty_input(spark):
    from marketstore_spark.operators.bars import vpin
    from marketstore_spark.operators.quant import (
        autocorr_returns,
        intraday_seasonality,
        kyle_lambda,
        markout_returns,
        roll_spread,
        variance_ratio,
    )

    empty = spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, value double, volume long",
    )
    for op in (roll_spread, autocorr_returns, variance_ratio):
        out = op(empty)
        assert out.count() == 0 and "symbol" in out.columns
    assert kyle_lambda(empty).count() == 0
    assert vpin(empty).count() == 0
    assert markout_returns(empty).count() == 0
    assert intraday_seasonality(empty).count() == 0


def test_round8_text_family_empty_input(empty_docs, spark):
    from marketstore_spark.operators.dedup import dup_size_histogram
    from marketstore_spark.operators.text import filter_funnel, lexical_diversity

    assert lexical_diversity(empty_docs).count() == 0
    assert dup_size_histogram(empty_docs).count() == 0
    # the funnel is a global aggregate: one all-zero row, never empty
    r = filter_funnel(empty_docs).collect()
    assert len(r) == 1 and r[0]["n_total"] == 0 and r[0]["n_word_len"] == 0


def test_round8_second_wave_empty_input(spark):
    from marketstore_spark.operators.quant import (
        corwin_schultz,
        kaufman_er,
        range_vol,
    )
    from marketstore_spark.operators.text import (
        source_token_jaccard,
        source_token_stats,
    )

    empty = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, value double"
    )
    for op in (range_vol, corwin_schultz, kaufman_er):
        out = op(empty)
        assert out.count() == 0 and "symbol" in out.columns
    sourced = spark.createDataFrame([], "doc_id long, text string, source string")
    assert source_token_jaccard(sourced).count() == 0
    assert source_token_stats(sourced).count() == 0


def test_vocab_growth_empty_input(spark):
    from marketstore_spark.operators.text import vocab_growth

    sourced = spark.createDataFrame([], "doc_id long, text string, source string")
    assert vocab_growth(sourced).count() == 0


def test_kmeans_update_empty_input(spark):
    from marketstore_spark.operators.simsearch import kmeans_update

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert kmeans_update(empty).count() == 0


def test_realized_moments_empty_input(spark):
    from marketstore_spark.operators.quant import realized_moments

    empty = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, value double"
    )
    assert realized_moments(empty).count() == 0


def test_benchmark_coverage_empty_sides(spark, empty_docs):
    from marketstore_spark.operators.dedup import benchmark_coverage

    docs = spark.createDataFrame([(1, "a b c d e f g h i")], ["doc_id", "text"])
    # empty corpus: every bench doc reports zero coverage
    out = benchmark_coverage(empty_docs, docs, n=3).collect()
    assert len(out) == 1 and out[0]["n_matched"] == 0 and out[0]["coverage"] == 0.0
    # empty benchmark: empty report
    assert benchmark_coverage(docs, empty_docs, n=3).count() == 0


def test_trimmed_mean_empty_input(spark):
    from marketstore_spark.operators.quant import trimmed_mean

    empty = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, value double"
    )
    assert trimmed_mean(empty).count() == 0


def test_mfi_empty_input(spark):
    from marketstore_spark.operators.quant import mfi

    empty = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, value double, volume long"
    )
    assert mfi(empty).count() == 0


def test_fixed_n_sample_empty_input(spark):
    from marketstore_spark.operators.sampling import fixed_n_sample

    empty = spark.createDataFrame([], "doc_id long, lang string, source string")
    assert fixed_n_sample(empty, n=5).count() == 0


def test_cci_empty_input(spark):
    from marketstore_spark.operators.quant import cci

    empty = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, value double"
    )
    assert cci(empty).count() == 0


def test_aroon_empty_input(spark):
    from marketstore_spark.operators.quant import aroon

    empty = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, value double"
    )
    assert aroon(empty).count() == 0


def test_adx_empty_input(spark):
    from marketstore_spark.operators.quant import adx

    empty = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, value double"
    )
    assert adx(empty).count() == 0


def test_volume_profile_empty_input(spark):
    from marketstore_spark.operators.quant import volume_profile

    empty = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, value double, volume long"
    )
    assert volume_profile(empty).count() == 0


def test_unigram_nll_empty_input(empty_docs):
    from marketstore_spark.operators.text import unigram_nll

    assert unigram_nll(empty_docs).count() == 0


def test_liquidity_panel_empty_input(spark):
    from marketstore_spark.operators.quant import liquidity_panel

    empty = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, value double"
    )
    assert liquidity_panel(empty).count() == 0


def test_gap_percentiles_empty_input(spark):
    from marketstore_spark.operators.quant import gap_percentiles

    empty = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, value double"
    )
    assert gap_percentiles(empty).count() == 0


def test_price_impact_curve_empty_input(spark):
    from marketstore_spark.operators.quant import price_impact_curve

    empty = spark.createDataFrame(
        [], "user_id long, ts timestamp, event_id long, value double, volume long"
    )
    assert price_impact_curve(empty).count() == 0


def test_language_mix_empty_input(spark):
    from marketstore_spark.operators.text import language_mix

    empty = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string"
    )
    assert language_mix(empty).count() == 0


def test_move_percentiles_empty_input(spark):
    from marketstore_spark.operators.quant import move_percentiles

    empty = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, value double"
    )
    assert move_percentiles(empty).count() == 0


def test_market_concentration_empty_input(spark):
    from marketstore_spark.operators.quant import market_concentration

    empty = spark.createDataFrame(
        [], "user_id long, ts timestamp, event_id long, value double, volume long"
    )
    assert market_concentration(empty).count() == 0


def test_dedup_rate_by_source_empty_input(spark):
    from marketstore_spark.operators.dedup import dedup_rate_by_source

    empty = spark.createDataFrame([], "doc_id long, text string, source string")
    assert dedup_rate_by_source(empty).count() == 0


def test_acf_spectrum_empty_input(spark):
    from marketstore_spark.operators.quant import acf_spectrum

    empty = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, value double"
    )
    assert acf_spectrum(empty).count() == 0


def test_event_analytics_empty_input(empty_events):
    from marketstore_spark.operators.funnel import (
        active_users_window,
        event_anomaly,
        event_funnel,
        event_transitions,
        retention_cohorts,
    )

    # funnel: a global aggregate always yields one row → 3 step rows
    # with zero users, never an exception
    steps = {r["step_name"]: r["users"] for r in event_funnel(
        empty_events, ["view", "click", "purchase"]
    ).collect()}
    assert steps == {"view": 0, "click": 0, "purchase": 0}
    assert retention_cohorts(empty_events).count() == 0
    assert event_transitions(empty_events).count() == 0
    assert active_users_window(empty_events).count() == 0
    assert event_anomaly(empty_events).count() == 0


def test_substring_and_novelty_empty_and_degenerate_docs(spark):
    from marketstore_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_novelty_by_source,
        substring_dup_rate_by_source,
        substring_dup_spans,
    )

    empty = spark.createDataFrame([], "doc_id long, text string, source string")
    assert substring_dup_spans(empty).count() == 0
    assert substring_dup_rate_by_source(empty).count() == 0
    assert ngram_containment_pairs(empty).count() == 0
    assert ngram_novelty_by_source(empty).count() == 0

    # degenerate docs: empty text and docs shorter than the gram width
    # must flow through (zero words counted for '' — not one)
    short = spark.createDataFrame(
        [(1, "", "A"), (2, "one two", "A"), (3, "a b c d e f g h i", "B")],
        ["doc_id", "text", "source"],
    )
    assert substring_dup_spans(short, k=8).count() == 0
    rates = {r["source"]: r for r in substring_dup_rate_by_source(short, k=8).collect()}
    assert (rates["A"]["total_words"], rates["A"]["dup_span_words"]) == (2, 0)
    assert rates["B"]["total_words"] == 9


def test_round11_text_operators_empty_input(spark, empty_docs):
    from pyspark.sql import functions as F

    from marketstore_spark.operators.text import (
        c4_clean,
        dsir_weights,
        gopher_rules,
    )

    assert gopher_rules(empty_docs).count() == 0
    assert c4_clean(empty_docs).count() == 0
    assert dsir_weights(empty_docs, F.lit(False)).count() == 0
    # whitespace-only docs survive the battery with zero counts
    ws = spark.createDataFrame([(1, "   \n  ")], ["doc_id", "text"])
    r = gopher_rules(ws).collect()[0]
    assert r["n_words"] == 0 and r["gopher_pass"] == 0
    assert c4_clean(ws).collect()[0]["keep_doc"] == 0


def test_session_cooccurrence_empty_input(empty_events):
    from marketstore_spark.operators.funnel import session_cooccurrence

    out = session_cooccurrence(empty_events)
    assert out.count() == 0
    assert {"type_a", "type_b", "n_ab", "n_a", "n_b", "lift"} <= set(out.columns)
