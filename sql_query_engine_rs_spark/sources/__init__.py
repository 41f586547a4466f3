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


def compact(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_mb: int = 512,
    sort_cols: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet dataset into ~target_mb
    files, optionally range-clustered on ``sort_cols``.

    Small files are the silent killer at 100 TB (a 100k-file table costs
    minutes of listing + one task per file); compaction restores ~1 task per
    128 MB split. ``sort_cols`` adds repartitionByRange + sortWithinPartitions
    so parquet min/max stats become selective — readers then prune row
    groups on those columns (poor-man's Z-order for one sort dimension).
    Returns the number of output files.
    """
    from sql_query_engine_rs_spark.plans import plan_size_bytes

    df = spark.read.parquet(in_path)
    size = plan_size_bytes(df)
    if size is not None:
        n = max(1, round(size / (target_mb * 1024 * 1024)))
    else:
        # stats API unavailable: keep the current task count (no resize)
        n = max(1, df.rdd.getNumPartitions())
    if sort_cols:
        df = df.repartitionByRange(n, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        df = df.coalesce(n) if df.rdd.getNumPartitions() > n else df.repartition(n)
    df.write.mode("overwrite").parquet(out_path)
    # inputFiles() is the catalog's own listing — works on object stores
    # where a local-fs glob would see nothing
    return len(spark.read.parquet(out_path).inputFiles())
