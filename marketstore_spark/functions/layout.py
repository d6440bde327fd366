"""Input-layout helpers: when to impose a repartition before heavy
narrow work.

Several operators run expensive per-row projections (interpreted HOF
lambdas, token explosions) before their first shuffle.  If the corpus
arrives in fewer input splits than the cluster has cores, everything up
to that shuffle serializes in those few tasks — so the original pattern
was an unconditional ``repartition(defaultParallelism)``.  That is
wrong at BOTH ends of the size axis:

- tiny inputs (local test scales): the shuffle costs more than the
  serial work it parallelizes (~0.2s per query at sf0.1 — measured
  directly; the whole documents table is 1.5 MB there);
- huge inputs (the 100 TB target): the scan already yields far more
  splits than cores (files split at ``spark.sql.files.maxPartitionBytes``),
  so a repartition just reshuffles the entire corpus for nothing.

``spread_for_narrow_work`` repartitions ONLY in the middle regime,
where the input plausibly has fewer splits than cores AND carries
enough bytes for per-task work to dominate the one-time row shuffle.
Size comes from Catalyst's logical-plan statistics (file-size based
for parquet scans) — no job is triggered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# For light (codegen-able) work the break-even is bytes-driven: below
# ~2 MB/core the one-time row shuffle beats any parallelism gain
# (measured ~0.2s/query at sf0.1 where the whole corpus is 1.5 MB).
# For heavy work (interpreted HOF lambdas — per-row cost dominates
# bytes) serializing even a 1.5 MB corpus on its 1-3 natural splits
# costs seconds, so the only lower bound is "trivially small".
# 128 MB matches spark.sql.files.maxPartitionBytes's default — if a
# deployment lowers it, natural splits only increase.
_MIN_BYTES_PER_TASK = 2 << 20
_MIN_BYTES_HEAVY = 64 << 10
_SPLIT_BYTES = 128 << 20


def spread_for_narrow_work(df: DataFrame, *by: str, heavy: bool = False) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism`` (hash on ``by``
    when given, round-robin otherwise) iff the estimated input size
    sits in the window where that buys parallelism: big enough that
    the downstream narrow work outweighs one row shuffle, small enough
    that the scan's own splits don't already cover the cluster.

    ``heavy=True`` declares the downstream projection interpreted-HOF
    heavy (per-row lambda cost dominates byte count): the lower bound
    drops to a trivial-size floor — measured at sf0.1, serializing the
    3-gram shingle builder on the corpus's natural splits costs ~4s
    against a ~0.2s shuffle."""
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # noqa: BLE001 — stats are advisory; fall back to spreading
        size = None
    lo = _MIN_BYTES_HEAVY if heavy else par * _MIN_BYTES_PER_TASK
    if size is not None and (size < lo or size >= par * _SPLIT_BYTES):
        return df
    cols = [F.col(c) for c in by]
    return df.repartition(par, *cols) if cols else df.repartition(par)
