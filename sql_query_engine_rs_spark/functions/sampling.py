"""Deterministic sampling operators for reproducible train/eval carving.

No counterpart in the reference (no sampling anywhere). Complements the
md5-prefix hash sample in queries.py (`pipe_hash_sample`): that one is O(1)
per row but gives only approximate per-stratum sizes; `stratified_sample`
here gives EXACT per-stratum sizes at the cost of a per-stratum sort.

Scale notes: the window sorts each stratum by md5 — per-stratum shuffle+sort.
Fine when strata are many and balanced (the partition key spreads);
a single giant stratum would bottleneck its one partition — for that shape,
fall back to hash-threshold sampling (approximate sizes, no sort) or
salt + two-phase top-k. Deterministic: same data → same sample, any cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fraction: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly ceil(fraction * |stratum|) rows per stratum, chosen as the
    rows with the smallest md5(id) — a deterministic, engine-portable
    pseudorandom order (ties broken by id; md5 collisions are immaterial)."""
    w_rank = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    w_all = Window.partitionBy(stratum_col)
    return (
        df.withColumn("_rn", F.row_number().over(w_rank))
        .withColumn("_take", F.ceil(F.count(F.lit(1)).over(w_all) * fraction))
        .filter(F.col("_rn") <= F.col("_take"))
        .drop("_rn", "_take")
    )
