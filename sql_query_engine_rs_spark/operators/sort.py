"""Sort / limit / top-k — extension surface (reference has no ORDER BY or
LIMIT: BoundSelect has no such fields, src/binder/statement/mod.rs:13-19).

Scale notes: a global ``orderBy`` is a range-partitioned shuffle (Spark
samples key ranges first) — fine, but for "top N" always use ``top_k``:
``orderBy(...).limit(n)`` is planned as TakeOrderedAndProject, which keeps a
per-partition heap of n rows and never sorts the full 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def order_by(df: DataFrame, *cols: Column | str) -> DataFrame:
    return df.orderBy(*cols)


def limit(df: DataFrame, n: int) -> DataFrame:
    return df.limit(n)


def top_k(df: DataFrame, k: int, *order_cols: Column | str) -> DataFrame:
    """ORDER BY ... LIMIT k → TakeOrderedAndProject (no global sort)."""
    return df.orderBy(*order_cols).limit(k)
