"""Operator layer: one builder per operator in SURVEY.md §2.

Each function is a thin, composable DataFrame transformation. Catalyst owns
physical strategy selection (the reference hand-rolls SimpleAgg vs HashAgg at
src/optimizer/physical_rewriter.rs:33-46; Spark's planner makes the same and
better choices, including partial/map-side aggregation the reference lacks).
"""

from sql_query_engine_rs_spark.operators.scan import table_scan, csv_scan, parquet_scan
from sql_query_engine_rs_spark.operators.filter import filter_
from sql_query_engine_rs_spark.operators.project import project
from sql_query_engine_rs_spark.operators.aggregate import simple_agg, hash_agg, AGG_FUNCS
from sql_query_engine_rs_spark.operators.join import join, broadcast_join
from sql_query_engine_rs_spark.operators.sort import order_by, limit, top_k
from sql_query_engine_rs_spark.operators.setops import union_all, union_distinct, intersect, except_all, distinct
from sql_query_engine_rs_spark.operators.window import windowed

__all__ = [
    "table_scan", "csv_scan", "parquet_scan",
    "filter_", "project",
    "simple_agg", "hash_agg", "AGG_FUNCS",
    "join", "broadcast_join",
    "order_by", "limit", "top_k",
    "union_all", "union_distinct", "intersect", "except_all", "distinct",
    "windowed",
]
