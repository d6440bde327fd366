"""Similarity search over embedding columns (SURVEY §2 #35-36).

- Brute-force cosine top-k: the exact baseline.  The (small) query set
  is broadcast against the corpus — a map-side join, one shuffle for
  the per-query top-k window.  At 100 TB the corpus side stays
  partitioned; only k rows per query cross the wire after the local
  rank prune.
- LSH (random-hyperplane) bucketed top-k: the approximate scale path.
  Hyperplane signs are md5-derived (deterministic, engine-portable);
  candidates are restricted to the query's bucket (and optionally
  neighboring buckets by flipping one bit).

Vector math is JVM-side (zip_with/aggregate) — see functions/vector.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from marketstore_spark.functions.vector import cosine_sim


def _as_double(vec_col: str) -> Column:
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: for each query vector the k nearest corpus
    vectors (self-matches excluded).  Output: query_id, neighbor_id,
    cosine (rounded 6dp), rank."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv")
    )
    pairs = c.crossJoin(F.broadcast(q)).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine_sim(F.col("qv"), F.col("cv")).alias("cos_raw"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_raw", 6).alias("cosine"),
            "rank",
        )
    )


def hyperplane_signature(
    df: DataFrame,
    num_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "lsh",
) -> DataFrame:
    """Random-hyperplane LSH signature as a bit string.

    Plane p's component for dimension i is a deterministic pseudo-random
    value in [-1, 1): (md5-derived 60-bit int / 2^59) - 1.  Sign of the
    dot product gives bit p.  All JVM-side expressions.
    """
    v = _as_double(vec_col)
    bits = []
    for p in range(num_planes):
        # component_i = hash(seed,p,i) mapped to [-1,1)
        comp = lambda i, p=p: (
            F.conv(
                F.substring(F.md5(F.concat_ws("|", F.lit(seed), F.lit(p), i.cast("string"))), 1, 15),
                16,
                10,
            ).cast("double")
            / F.lit(float(2**59))
            - F.lit(1.0)
        )
        dot = F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1),
                lambda x, i: x * comp(i),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col),
        F.concat(*bits).alias("bucket"),
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 8,
    num_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k with OR-amplification: ``num_tables``
    independent hash tables of ``num_planes`` hyperplanes each; a corpus
    vector is a candidate if it shares a bucket with the query in ANY
    table.  Recall rises with more tables / fewer planes at the cost of
    candidate volume — the standard LSH tuning surface.  The pytest
    suite measures recall against brute force."""
    csigs = []
    qsigs = []
    for t in range(num_tables):
        seed = f"lsh{t}"
        csigs.append(
            hyperplane_signature(corpus, num_planes, id_col, vec_col, seed=seed)
            .select("vec_id", vec_col, F.concat(F.lit(f"{t}:"), F.col("bucket")).alias("bucket"))
        )
        qsigs.append(
            hyperplane_signature(queries, num_planes, id_col, vec_col, seed=seed)
            .select(
                F.col("vec_id").alias("query_id"),
                F.col(vec_col).alias("qvec"),
                F.concat(F.lit(f"{t}:"), F.col("bucket")).alias("bucket"),
            )
        )
    csig = csigs[0]
    for extra in csigs[1:]:
        csig = csig.unionByName(extra)
    qsig = qsigs[0]
    for extra in qsigs[1:]:
        qsig = qsig.unionByName(extra)
    cand = (
        csig.join(F.broadcast(qsig), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "qvec", "vec_id", vec_col)
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine_sim(_as_double(vec_col), F.transform(F.col("qvec"), lambda x: x.cast("double"))).alias("cos_raw"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_raw", 6).alias("cosine"), "rank")
    )
