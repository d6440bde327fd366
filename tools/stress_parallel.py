"""Multi-file scaling probe (VERDICT r13 #6): make the core-count leg
produce evidence.

Every sf0.1 testdata table is ONE parquet file with ONE row group, so
all pre-exchange work is structurally single-task and the driver's
8-vs-32-core ratios can never show parallelism (a genuine
serialization regression would be invisible).  This tool rewrites the
chosen SF into an N-file copy per table (row-group-splittable layout)
in a scratch dir, then re-runs the requested keys through the bench
methodology (min-of-N, noop sink, input-sized shuffle partitions) at
two core counts and prints the per-key ratio — the scaling evidence
the driver's `scaling` block cannot currently produce.

Usage:
    python tools/stress_parallel.py [--sf DIR] [--files 16] [--n 3]
        [--cpus-high 32] [--cpus-low 8] [--keep] key ...

Notes:
- The rewrite itself uses Spark (repartition(N) per table) and is NOT
  timed.
- Ratios near cpus_high/cpus_low mean the key scales with cores once
  the input splits; ratios near 1 mean the key is exchange/floor-bound
  at this SF — compare against the single-file run before reading a
  flat ratio as a serialness bug.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

#: Default probe set: the heaviest timed keys of the r14 bench.
DEFAULT_KEYS = [
    "corpus_dedup_funnel",
    "pairwise_corr",
    "corpus_dsir_weights_hashed",
    "event_cooccurrence",
    "dedup_containment",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "rolling_corr_market",
    "dedup_simhash_pairs",
    "gapfill",
]


def rewrite_multifile(sf_dir: str, out_dir: str, n_files: int) -> None:
    """Rewrite each table as an n_files-part parquet DIRECTORY.

    pyarrow, not Spark: arrow round-trips events.parquet's ns
    timestamps bit-exactly (a Spark rewrite under nanosAsLong would
    retype ts to BIGINT and break catalog.load_table).  Row order is
    preserved (contiguous slices), so order-insensitive queries return
    identical results and hash parity against the single-file copy
    holds."""
    import pyarrow.parquet as pq

    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        tbl = pq.read_table(src)
        dst = os.path.join(out_dir, f"{t}.parquet")
        os.makedirs(dst, exist_ok=True)
        n = max(1, min(n_files, tbl.num_rows))
        step = (tbl.num_rows + n - 1) // n
        for i in range(n):
            part = tbl.slice(i * step, step)
            if part.num_rows == 0:
                break
            pq.write_table(part, os.path.join(dst, f"part-{i:05d}.parquet"))


def time_keys(sf_dir: str, cpus: int, keys: list[str], n: int) -> dict[str, float]:
    """bench.py methodology: fresh session at local[cpus], min-of-n
    noop-forced runs per key, input-sized shuffle partitions."""
    from marketstore_spark import get_session
    from marketstore_spark.queries import SPARK_QUERIES

    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(sf_dir)
        for f in files
    )
    sp = max(8, min(cpus, total // (8 << 20)))
    spark = get_session(
        f"stress-parallel-{cpus}", master=f"local[{cpus}]", shuffle_partitions=sp
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {}
    SPARK_QUERIES[keys[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    for key in keys:
        fn = SPARK_QUERIES[key]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        best = None
        for _ in range(n):
            df = fn(spark, sf_dir)
            spark.sparkContext.setJobDescription(f"stress{cpus}:{key}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
        out[key] = best
        print(f"  local[{cpus}] {key:32s} {best:.3f}", flush=True)
    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--files", type=int, default=16)
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--cpus-high", type=int, default=32)
    ap.add_argument("--cpus-low", type=int, default=8)
    ap.add_argument("--out", default=None, help="scratch dir (default: mkdtemp)")
    ap.add_argument("--keep", action="store_true", help="keep the scratch copy")
    ap.add_argument("keys", nargs="*", default=None)
    args = ap.parse_args()
    keys = args.keys or DEFAULT_KEYS

    out_dir = args.out or tempfile.mkdtemp(prefix="sfmulti_")
    try:
        print(f"rewriting {args.sf} -> {out_dir} as {args.files} files/table", flush=True)
        rewrite_multifile(args.sf, out_dir, args.files)
        hi = time_keys(out_dir, args.cpus_high, keys, args.n)
        lo = time_keys(out_dir, args.cpus_low, keys, args.n)
        print(f"\n{'key':32s} {'c'+str(args.cpus_high):>8s} {'c'+str(args.cpus_low):>8s}  ratio")
        for k in keys:
            r = lo[k] / hi[k] if hi[k] else float("nan")
            print(f"{k:32s} {hi[k]:8.3f} {lo[k]:8.3f}  {r:5.2f}")
    finally:
        if not args.keep and args.out is None:
            shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
