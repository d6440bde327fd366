"""CSV import — the `marketstore connect` \\load path and csv feeders.

Reference: cmd/connect loads CSV into buckets; contrib feeders poll
external APIs and append rows.  Spark-native: schema-checked CSV read →
normalize timestamps → Catalog.write append.  At scale the same reader
ingests from object storage with parallel splits for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_csv(
    spark: SparkSession,
    path: str,
    schema=None,
    ts_col: str = "ts",
    ts_format: str | None = None,
    header: bool = True,
) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    df = reader.csv(path)
    if ts_format is not None:
        df = df.withColumn(ts_col, F.to_timestamp(F.col(ts_col), ts_format))
    return df


def import_csv_to_bucket(
    spark: SparkSession,
    csv_path: str,
    catalog,
    key: str,
    schema=None,
    ts_col: str = "ts",
    ts_format: str | None = None,
) -> int:
    """Load a CSV file into a TBK bucket; returns rows written."""
    df = read_csv(spark, csv_path, schema=schema, ts_col=ts_col, ts_format=ts_format)
    n = df.count()
    catalog.write(key, df)
    return n
