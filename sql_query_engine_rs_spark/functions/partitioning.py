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


def volume_scaled_partitions(
    df: DataFrame,
    bytes_per_partition: int = 256 * 1024,
    cap: int = 8192,
) -> int:
    """Exchange width proportional to an INPUT's scan bytes.

    ``spark.sql.shuffle.partitions`` is a fixed session conf, so any keyed
    exchange downstream of a ROW-MULTIPLYING stage (pair generation, token
    explode) keeps the same partition count while its data grows with the
    corpus — per-partition width then grows linearly with N and the stage
    tips into sort spill (measured: pipe_basket_lift read 5.73x for 3x
    data at 32 fixed partitions, 3.43x at 128; pipe_dedup_method_agreement
    read 4.1x at x100 for the same reason). Sizing the exchange from the
    input scan restores partitions ∝ volume: callers pass the SOURCE table
    frame (whose Catalyst scan stats exist before any job runs) and
    repartition the wide frame by its join/agg key with the returned count.

    ``bytes_per_partition`` is deliberately much smaller than a scan split
    (256 KB of compressed source per partition) because one source byte
    fans out to many pair-frame bytes. The floor is the session's default
    parallelism (never fewer partitions than cores); the cap bounds task-
    scheduling overhead — at 100 TB the cap is what a real cluster would
    raise, with AQE coalescing the small tail either way.
    """
    from sql_query_engine_rs_spark.plans import plan_size_bytes

    floor = df.sparkSession.sparkContext.defaultParallelism
    size = plan_size_bytes(df)
    if size is None:
        return floor
    return max(floor, min(cap, size // bytes_per_partition))
