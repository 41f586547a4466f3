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

    The probe uses Catalyst's size statistics (a driver-side metadata call)
    rather than ``df.rdd`` — converting to an RDD forces a full Python-RDD
    translation that costs seconds on a cold session. Inputs smaller than
    one scan split per core are the ones that arrive under-partitioned.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        max_split = int(df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
        if size < max_split * target:
            return df.repartition(target)
        return df
    except Exception:
        if df.rdd.getNumPartitions() < target:
            return df.repartition(target)
        return df
