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

    The probe uses Catalyst's size statistics (a driver-side metadata call,
    via plans.plan_size_bytes) rather than ``df.rdd`` — converting to an RDD
    forces a full Python-RDD translation that costs seconds on a cold
    session. Inputs smaller than one scan split per core are the ones that
    arrive under-partitioned.
    """
    from sql_query_engine_rs_spark.plans import plan_size_bytes

    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    size = plan_size_bytes(df)
    if size is not None:
        max_split = int(df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
        return df.repartition(target) if size < max_split * target else df
    # stats unavailable (private API changed): partition-count heuristic
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
