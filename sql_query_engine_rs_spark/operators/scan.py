"""Scan operators (sources).

Reference: TableScanExecutor pulls Arrow batches from CsvStorage /
InMemoryStorage (src/executor/table_scan.rs:9-33, src/storage/csv.rs:170-218,
src/storage/memory.rs:138-162) — single stream, no parallelism, no pushdown
(the CsvConfig.projection hook exists but is never set, src/storage/csv.rs:94).

Spark-first: a scan is a lazy reader; the file source splits into
``maxPartitionBytes`` tasks and receives pushed filters + pruned columns from
Catalyst. That is the property that matters at 100 TB — scans here are where
most optimization happens, for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def table_scan(spark: SparkSession, name: str, columns: list[str] | None = None) -> DataFrame:
    """Scan a registered table, optionally projecting a column subset.

    The column subset reaches the parquet reader as ReadSchema (column
    pruning) — the optimization the reference stubs but never implements.
    """
    df = spark.table(name)
    return df.select(*columns) if columns else df


def csv_scan(spark: SparkSession, path: str, schema=None, header: bool = True) -> DataFrame:
    """CSV source (reference: src/storage/csv.rs:92-167; header + ',' assumed)."""
    reader = spark.read.option("header", header).option("delimiter", ",")
    reader = reader.schema(schema) if schema is not None else reader.option("inferSchema", True)
    return reader.csv(path)


def parquet_scan(spark: SparkSession, path: str) -> DataFrame:
    """Parquet source — the scale-path format (statistics, pushdown, pruning)."""
    return spark.read.parquet(path)
