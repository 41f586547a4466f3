"""Filter (selection) operator.

Reference: FilterExecutor evaluates the predicate to a BooleanArray and
applies Arrow ``filter_record_batch`` per batch (src/executor/filter.rs:12-27).
v0 supports comparison predicates ``> < >= <= =``; AND/OR/!= bind but panic
at runtime (src/executor/array_compute.rs:62-64) — here they simply work.

Spark-first: ``df.filter`` stays inside whole-stage codegen and, crucially,
Catalyst pushes it into the file scan (PushedFilters) so row groups whose
min/max statistics exclude the predicate are never read — the difference
between scanning 100 TB and scanning the few TB that match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def filter_(df: DataFrame, predicate: Column | str) -> DataFrame:
    return df.filter(predicate)
