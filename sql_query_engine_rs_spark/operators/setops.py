"""Set operators + DISTINCT — extension surface (reference: query bodies other
than plain SELECT hit ``todo!()``, src/binder/statement/mod.rs:23-26;
DISTINCT unsupported, SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """UNION ALL by column NAME (robust to select-order drift)."""
    return a.unionByName(b)


def union_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b).distinct()


def intersect(a: DataFrame, b: DataFrame, keep_duplicates: bool = False) -> DataFrame:
    return a.intersectAll(b) if keep_duplicates else a.intersect(b)


def except_all(a: DataFrame, b: DataFrame, keep_duplicates: bool = True) -> DataFrame:
    return a.exceptAll(b) if keep_duplicates else a.subtract(b)


def distinct(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """DISTINCT / dropDuplicates. With ``subset``, keeps one arbitrary row per
    key — a map-side-combinable shuffle, the cheap exact-dedup primitive."""
    return df.dropDuplicates(subset) if subset else df.distinct()
