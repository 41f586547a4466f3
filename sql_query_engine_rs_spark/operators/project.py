"""Project (projection) operator.

Reference: ProjectExecutor evaluates each select-list expression into a new
column and derives field names like ``id+1`` / ``Sum(salary)``
(src/executor/project.rs:11-30; naming rules src/executor/evaluator.rs:28-56).

Spark derives different default names (``(id + 1)``, ``sum(salary)``), so
callers alias explicitly when name parity matters (SURVEY.md §2.3). Projection
here also drives column pruning all the way to the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def project(df: DataFrame, *exprs: Column | str) -> DataFrame:
    """``SELECT expr, ...``; ``project(df, "*")`` is the wildcard expansion
    (reference: src/binder/statement/mod.rs:45-48)."""
    return df.select(*exprs)
