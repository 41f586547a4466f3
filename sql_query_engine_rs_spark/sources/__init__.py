"""Sources & sinks.

Reference sources: CSV (src/storage/csv.rs) and in-memory
(src/storage/memory.rs); it has NO sinks — results only reach the CLI
pretty-printer (src/cli.rs:104-106). Spark-first we expose the full
read/write matrix; parquet is the scale default (statistics + pushdown).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read(spark: SparkSession, fmt: str, path: str, schema=None, **options) -> DataFrame:
    """Uniform reader: fmt ∈ {parquet, csv, json, orc, text}."""
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", True)
        if schema is None:
            options.setdefault("inferSchema", True)
    return reader.options(**options).load(path)


def write(df: DataFrame, fmt: str, path: str, mode: str = "overwrite",
          partition_by: list[str] | None = None, **options) -> None:
    """Uniform writer. ``partition_by`` produces hive-style directory
    partitioning — at 100 TB this is what enables partition pruning for
    downstream readers."""
    if fmt == "csv":
        options.setdefault("header", True)  # match the reader's default
    writer = df.write.format(fmt).mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
