"""Runtime scan-census regression guard (VERDICT r10 item 5).

The plan pins in test_plans.py check the PRINTED (pre-AQE) plan shape,
which can lie in both directions: AQE may dedup branches the printed
plan shows twice (ReusedExchange), and per-branch column pruning may
fork a scan the printed plan shows once.  tools/audit_scans.py walks
the FINAL adaptive plan after execution — the runtime truth — and
round 10's census found three real multi-scans that every static pin
had missed (text_bigram_lift 6→1, source_novelty 2→1, event_rfm 2→1).

This test runs that census over the keys whose single-scan (or
documented two-scan) shape was deliberately engineered, and fails the
moment a future edit re-forks a scan.  Counts are CEILINGS pinned at
the engineered value — fewer scans is progress, more is a regression.
"""

import re
from collections import Counter

import pytest

from marketstore_spark.queries import SPARK_QUERIES

#: key → {table: max allowed runtime scans of that table}.
#: corpus_unigram_nll's second documents scan is the documented
#: broadcast-stats shape (scan twice with no shuffle beats a
#: token-keyed exchange at 100 TB — tools/audit_scans.py docstring);
#: everything else is a pinned one-scan re-plan.
_PINNED_SCANS = {
    "text_bigram_lift": {"documents": 1},
    "source_novelty": {"documents": 1},
    "event_rfm": {"events": 1},
    "active_users_window": {"events": 1},
    "dedup_substring": {"documents": 1},
    "corpus_unigram_nll": {"documents": 2},
    "corpus_dsir_weights": {"documents": 2},
    # r14: one shared tokenize barrier feeds both the counts and the
    # per-doc branches (repartition("bk") + fold-resistant pruning
    # anchors — see text.dsir_weights_hashed)
    "corpus_dsir_weights_hashed": {"documents": 1},
    # r14: combined set+minima aggregate behind a pmod(doc_id) barrier
    # (see dedup.minhash_lsh_pairs) — banding and both verify sides
    # replay ONE gram pass
    "dedup_minhash_lsh": {"documents": 1},
    # r14: row-side array_distinct replaced the global (doc, token)
    # distinct exchange in simhash
    "dedup_simhash_pairs": {"documents": 1},
    "corpus_gopher_rules": {"documents": 1},
    "corpus_c4_clean": {"documents": 1},
    "corpus_pii_scrub": {"documents": 1},
    "markout_returns": {"events": 1},
    "volume_profile": {"events": 1},
    "rolling_corr_market": {"events": 1},
}


def _final_plan_scan_counts(df) -> Counter:
    df.collect()
    final = (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    return Counter(re.findall(r"(\w+)\.parquet", final))


@pytest.mark.parametrize("key", sorted(_PINNED_SCANS))
def test_runtime_scan_census_ceiling(spark, sf_dir, key):
    cnt = _final_plan_scan_counts(SPARK_QUERIES[key](spark, sf_dir))
    ceiling = _PINNED_SCANS[key]
    over = {
        t: c for t, c in cnt.items() if c > ceiling.get(t, 1)
    }
    assert not over, (
        f"{key}: runtime plan scans {dict(cnt)} exceed the pinned "
        f"ceiling {ceiling} — a re-plan forked a scan (see "
        f"tools/audit_scans.py)"
    )


def test_minhash_no_sort_aggregate(spark, sf_dir):
    """r14 (VERDICT r13 #1): the min(md5-hex)×32 signature aggregate
    must not plan a SortAggregate — the combined set+minima aggregate
    rides ObjectHashAggregate behind the doc barrier.  A future edit
    that re-splits the aggregate (e.g. an anchor expression the
    optimizer learns to fold) brings the per-task O(n log n) gram sort
    back; this pin catches it at the final adaptive plan."""
    df = SPARK_QUERIES["dedup_minhash_lsh"](spark, sf_dir)
    df.collect()
    final = (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert "SortAggregate" not in final
