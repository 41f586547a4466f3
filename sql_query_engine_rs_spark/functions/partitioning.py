"""Partitioning utilities shared by the pipeline operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Spread a narrow input across the cluster before CPU-heavy map work.

    Small/single-file sources (one parquet row group) arrive as 1 partition;
    hashing/shingling/cosine would then run on one core. A round-robin
    repartition of the raw rows is cheap relative to the per-row compute it
    unlocks. At real scale inputs already have thousands of splits and this
    is a no-op.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
