"""Aggregation operators: SimpleAgg (global) and HashAgg (grouped).

Reference:
- SimpleAggExecutor — one accumulator per agg func, drains the child, emits a
  single 1-row batch (src/executor/aggregate/simple_agg.rs:10-66).
- HashAggExecutor — row-wise ahash of the group keys, per-group accumulators,
  first-appearance output order (src/executor/aggregate/hash_agg.rs:14-143).
- Accumulators: count (src/executor/aggregate/count.rs), sum (sum.rs),
  min/max (min_max.rs). v0 binds ONLY count/sum/min/max
  (src/binder/expression/agg_func.rs:74); we add avg/count(*)/distinct etc.
  as the extension surface (SURVEY.md §2.2).

Deliberate divergences from reference bugs (SURVEY.md §2.4): COUNT accumulates
across batches (reference resets per batch, count.rs:19); group identity is
key equality, not a raw 64-bit hash (reference merges colliding groups,
hash_agg.rs:82-96); Int sums widen to Long (reference keeps Int32 and can
overflow, agg_func.rs:59-63).

Scale notes: Spark's HashAggregateExec does partial (map-side) aggregation
before the shuffle, so a group-by over 100 TB shuffles only one partial row
per (task, group) — the reference has no such concept (single stream). Output
order is nondeterministic after the shuffle; callers sort if they need
determinism (reference order is first-appearance, hash_agg.rs:95,124).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# v0 agg surface (reference: src/binder/expression/agg_func.rs:54-73) plus the
# extension funcs that the reference explicitly lacks (SURVEY.md §2.2).
AGG_FUNCS = {
    "count": F.count,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "avg": F.avg,
    "count_distinct": F.countDistinct,
    "stddev": F.stddev,
    "approx_count_distinct": F.approx_count_distinct,
}


def _to_agg_cols(aggs: Sequence[Column | tuple[str, str, str]]) -> list[Column]:
    """Accept either ready Columns or (func, col, alias) triples."""
    out: list[Column] = []
    for a in aggs:
        if isinstance(a, tuple):
            func, col, alias = a
            out.append(AGG_FUNCS[func](col).alias(alias))
        else:
            out.append(a)
    return out


def simple_agg(df: DataFrame, aggs: Sequence[Column | tuple[str, str, str]]) -> DataFrame:
    """Global aggregation — no GROUP BY, always exactly one output row.

    Reference: PhysicalSimpleAgg chosen when group_by is empty
    (src/optimizer/physical_rewriter.rs:33-46).
    """
    return df.agg(*_to_agg_cols(aggs))


def hash_agg(
    df: DataFrame,
    group_by: Sequence[Column | str],
    aggs: Sequence[Column | tuple[str, str, str]],
) -> DataFrame:
    """Grouped aggregation, multi-column keys supported
    (reference: src/binder/statement/mod.rs:58-62, hash_utils.rs:163-222)."""
    return df.groupBy(*group_by).agg(*_to_agg_cols(aggs))
