"""Language-partitioned corpus store — the training-data layout.

A 100 TB web corpus is served by language (and often by quality tier):
downstream jobs train per-language tokenizers, sample per-language
mixes, or drop low-quality tiers wholesale.  Directory-partitioning on
those keys makes each such read a partition-pruned scan — the corpus
analogue of the symbol/date tick store (sources/parquet.py).

Partition keys are DERIVED in the same single scan that reads the text
(operators/text.py document_features — language id and quality ratios
in one projection), so ingestion is one pass: score → tag →
partitioned write.  Cardinality stays bounded (languages × tiers ≈
dozens of directories), the safe zone for Hive-style partitioning —
never partition by a high-cardinality key like doc id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marketstore_spark.operators.text import document_features


def write_corpus_store(
    docs: DataFrame,
    root: str,
    text_col: str = "text",
    quality_bands: tuple[float, float] = (0.02, 0.08),
    mode: str = "overwrite",
) -> None:
    """Write documents partitioned by (lang, tier).

    ``tier`` buckets the English-stopword ratio (the standard cheap
    quality proxy): 'hi' ≥ bands[1] > 'mid' ≥ bands[0] > 'lo'.  One
    scan computes both derived keys via ``document_features``; the
    write shuffles only for the partitioned layout."""
    lo, hi = quality_bands
    feats = document_features(docs, text_col).select(
        "doc_id", "predicted_lang", "stopword_ratio"
    )
    tagged = (
        docs.join(feats, "doc_id")
        .withColumn("lang", F.col("predicted_lang"))
        .withColumn(
            "tier",
            F.when(F.col("stopword_ratio") >= hi, "hi")
            .when(F.col("stopword_ratio") >= lo, "mid")
            .otherwise("lo"),
        )
        .drop("predicted_lang", "stopword_ratio")
    )
    tagged.write.mode(mode).partitionBy("lang", "tier").parquet(root)


def read_corpus_store(spark: SparkSession, root: str) -> DataFrame:
    """Read back; filters on ``lang``/``tier`` prune directories before
    any file opens."""
    return spark.read.parquet(root)
