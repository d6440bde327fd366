"""sf1-scale adversarial value-parity sweep for the overflow- and
skew-sensitive operator family (VERDICT r08 next-round item 5).

The driver's correctness gate runs at sf0.01, local sweeps at sf0.1 —
neither reaches the magnitudes where int64 moment arithmetic wraps.
This tool GENERATES a ~2.2M-row events table (100 symbols × 30 years
of daily history, prices to $99,999.99) plus a 50k-doc corpus, sized
so that:

- per-symbol moment SUMS (Σx², Σxy) stay inside int64 with ~12×
  margin — the documented LONG-sum bound the operators rely on, and
- the CROSS-TERMS (n·Σxx − Σx², n·Σxy − Σx·Σy) exceed 2⁶³ by ~10³ —
  exactly the region the DECIMAL(38,0)/HUGEINT promotions exist for;
  pre-promotion code silently wraps here,

then runs each target key's registered Spark query against its DuckDB
oracle over the SAME parquet and compares row counts, columns, and
every value exactly (the tests/test_oracle_parity.py comparator).
Prints a parity table and the measured cross-term magnitudes so the
"we actually exceeded int64" claim is checked, not assumed.

Usage:  python tools/stress_sf1.py [--out /tmp/sf1stress] [--keep]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# keys exercised at stress scale: the DECIMAL(38,0)/HUGEINT moment
# family, the blocked pairwise path, the exact-rational percentile
# interpolators, and the corpus-side token/vocab aggregates
TARGET_KEYS = [
    "roll_spread",
    "autocorr_returns",
    "variance_ratio",
    "liquidity_panel",
    "kyle_lambda",
    "realized_moments",
    "rolling_corr_market",
    "market_concentration",
    "mfi",
    "gap_percentiles",
    "move_percentiles",
    "pairwise_corr",
    "source_token_stats",
    "source_token_jaccard",
    "corpus_vocab_growth",
    # round-9 additions: the overlapping-gram substring dedup family
    # (the injected boilerplate produces a gram with ~5k sites — the
    # shape the count-only duplicated-set aggregate exists for) and
    # the event-sequence analytics over the 2.2M-row event stream
    "dedup_substring",
    "dedup_substring_rate",
    "dedup_containment",
    "event_funnel",
    "retention_cohorts",
    "event_transitions",
    "active_users_window",
    "event_anomaly",
    "source_novelty",
    "event_cooccurrence",
    "text_zipf_fit",
    "corpus_dedup_funnel",
    "event_rfm",
]

N_SYMBOLS = 100
N_DAYS = 10_957  # 30 years of daily candles
TICKS_PER_DAY = 2
N_DOCS = 50_000
VOCAB = 30_000
SEED = 20260815


def gen_events(out_dir: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(SEED)
    n = N_SYMBOLS * N_DAYS * TICKS_PER_DAY
    day = np.tile(np.repeat(np.arange(N_DAYS), TICKS_PER_DAY), N_SYMBOLS)
    sym = np.repeat(np.arange(1, N_SYMBOLS + 1), N_DAYS * TICKS_PER_DAY)
    # intra-day offsets strictly increasing per (sym, day) so candle
    # open/close order is unambiguous; microsecond jitter stresses the
    # exact-rational gap percentiles at ~10^10-µs magnitudes
    frac = np.sort(
        rng.integers(0, 86_400_000_000, size=n).reshape(-1, TICKS_PER_DAY), axis=1
    ).reshape(-1)
    epoch_us = (
        np.int64(946_684_800_000_000)  # 2000-01-01 UTC
        + day.astype(np.int64) * 86_400_000_000
        + frac
    )
    # prices: full 2-dp grid to $99,999.99 → integer cents ≤ 10^7.
    # Daily moves are then ±2·10^7 cents; over ~10^4 candles the
    # moment sums hit ~7·10^17 (inside int64) and the cross-terms
    # ~8·10^21 (far past 2^63) — the calibration in the docstring.
    cents = rng.integers(1, 10_000_000, size=n)
    value = cents / 100.0
    vol = rng.integers(1, 1_000_000, size=n)
    etype = rng.choice(
        np.array(["view", "click", "purchase", "signup", "error"]), size=n
    )
    props = np.char.add(
        np.char.add('{"k": ', vol.astype("U7")), "}"
    )
    table = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(epoch_us, pa.timestamp("us")),
            "user_id": pa.array(sym, pa.int64()),
            "event_type": pa.array(etype, pa.string()),
            "value": pa.array(value, pa.float64()),
            "props": pa.array(props, pa.string()),
        }
    )
    pq.write_table(table, os.path.join(out_dir, "events.parquet"))


def gen_documents(out_dir: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(SEED + 1)
    words = np.array([f"w{i:05d}" for i in range(VOCAB)])
    sources = np.array(["web", "books", "code", "wiki", "news", "forum"])
    langs = np.array(["en", "de", "fr", "es", "ja"])
    texts = []
    # zipf-ish draw so doc-frequency / vocab-growth binning sees a
    # realistic head/tail split, not a uniform vocabulary
    zipf_p = 1.0 / np.arange(1, VOCAB + 1)
    zipf_p /= zipf_p.sum()
    lens = rng.integers(20, 300, size=N_DOCS)
    # 40-word boilerplate injected into ~10% of docs at a random word
    # offset: gives dedup_substring a gram with ~5k corpus-wide sites
    # (stressing the count-only duplicated-set aggregate — the design
    # exists so a hot gram never builds a posting list) while the rest
    # of each doc stays unique zipf noise.
    boiler = " ".join(f"b{i:03d}" for i in range(40))
    inject = rng.random(N_DOCS) < 0.10
    for di, ln in enumerate(lens):
        toks = list(rng.choice(words, size=ln, p=zipf_p))
        if inject[di]:
            at = int(rng.integers(0, ln))
            toks[at:at] = boiler.split()
        texts.append(" ".join(toks))
    table = pa.table(
        {
            "doc_id": pa.array(np.arange(N_DOCS), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(rng.choice(langs, size=N_DOCS), pa.string()),
            "source": pa.array(rng.choice(sources, size=N_DOCS), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(out_dir, "documents.parquet"))


def magnitudes(con) -> dict:
    """Measured per-symbol cross-term magnitudes — proves the sweep
    actually crossed 2⁶³ (HUGEINT math, so the probe itself is exact)."""
    row = con.execute(
        """
WITH t AS (
  SELECT user_id AS symbol, ts, event_id,
         CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS px_c,
         time_bucket(INTERVAL '1 day', ts) AS bucket
  FROM events
), c AS (
  SELECT symbol, bucket, last(px_c ORDER BY ts, event_id) AS close_c
  FROM t GROUP BY symbol, bucket
), m AS (
  SELECT symbol, close_c - LAG(close_c) OVER
    (PARTITION BY symbol ORDER BY bucket) AS x FROM c
), g AS (
  SELECT symbol, CAST(COUNT(x) AS HUGEINT) AS n,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(SUM(x) AS HUGEINT) AS sx
  FROM m GROUP BY symbol
)
SELECT MAX(sxx) AS max_sum_xx, MAX(n * sxx) AS max_cross,
       MAX(sx * sx) AS max_sx_sq FROM g
"""
    ).fetchone()
    return {
        "max_sum_xx": float(row[0]),
        "max_cross_term": float(row[1]),
        "max_sx_squared": float(row[2]),
        "int64_max": float(2**63 - 1),
        "sums_within_int64": float(row[0]) < 2**63 - 1,
        "cross_terms_past_int64": float(row[1]) > 2**63 - 1,
    }


def compare(name, spark_pdf, duck_pdf) -> str:
    import pandas as pd

    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return f"COLS {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    if len(spark_pdf) != len(duck_pdf):
        return f"ROWS {len(spark_pdf)} vs {len(duck_pdf)}"

    def norm(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if pd.api.types.is_datetime64_any_dtype(df[c]):
                df[c] = df[c].astype("datetime64[us]")
            elif pd.api.types.is_float_dtype(df[c]):
                df[c] = df[c].astype("float64")
            elif pd.api.types.is_integer_dtype(df[c]):
                df[c] = df[c].astype("int64")
        return df.sort_values(by=list(df.columns), ignore_index=True)

    a, b = norm(spark_pdf), norm(duck_pdf)
    for c in a.columns:
        import pandas as pd

        if pd.api.types.is_float_dtype(a[c]):
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            for x, y in zip(av, bv):
                if pd.isna(x) and pd.isna(y):
                    continue
                if pd.isna(x) or pd.isna(y) or not math.isclose(
                    x, y, rel_tol=0, abs_tol=0
                ):
                    return f"VALUE {c}: {x!r} vs {y!r}"
        elif not a[c].equals(b[c]):
            diff = a[c][a[c] != b[c]]
            return f"VALUE {c} at idx {diff.index[0]}"
    return "ok"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sf1stress")
    ap.add_argument("--keep", action="store_true", help="keep generated parquet")
    ap.add_argument("--keys", nargs="*", default=None)
    args = ap.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    base = "/root/testdata/sf0.1"
    for t in (
        "region nation customer supplier part orders lineitem embeddings"
    ).split():
        dst = os.path.join(args.out, f"{t}.parquet")
        if not os.path.exists(dst):
            shutil.copyfile(os.path.join(base, f"{t}.parquet"), dst)
    print("generating stress events/documents ...", flush=True)
    gen_events(args.out)
    gen_documents(args.out)

    import duckdb

    from marketstore_spark import get_session
    from marketstore_spark.catalog import TABLES
    from marketstore_spark.queries import ORACLE_SQL, SPARK_QUERIES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.out}/{t}.parquet')"
        )
    mags = magnitudes(con)
    print("cross-term magnitudes:", json.dumps(mags), flush=True)
    if not (mags["sums_within_int64"] and mags["cross_terms_past_int64"]):
        print("CALIBRATION FAILED — stress data not in the target regime")
        return 2

    spark = get_session("sf1-stress")
    keys = args.keys or TARGET_KEYS
    results = {}
    for name in keys:
        try:
            spdf = SPARK_QUERIES[name](spark, args.out).toPandas()
            ddf = con.execute(ORACLE_SQL[name]).df()
            results[name] = compare(name, spdf, ddf)
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            results[name] = f"ERROR {type(ex).__name__}: {ex}"
        print(f"  {name:28s} {results[name]}", flush=True)
    bad = {k: v for k, v in results.items() if v != "ok"}
    print(json.dumps({"parity": results, "magnitudes": mags}))
    if not args.keep:
        for f in ("events.parquet", "documents.parquet"):
            os.unlink(os.path.join(args.out, f))
    print("STRESS PARITY:", "FAIL" if bad else "PASS", flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
