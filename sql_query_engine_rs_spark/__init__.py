"""PySpark-native analytics engine with the query surface of
Fedomn/sql-query-engine-rs (v0) plus idiomatic-Spark extensions.

The reference engine's parse -> bind -> plan -> optimize -> execute stack
(reference: src/db.rs:50-92) collapses into ``spark.sql()`` / the DataFrame
API here: Catalyst performs binding, input-ref resolution, physicalization,
predicate pushdown, and column pruning that the reference implements by hand
(reference: src/optimizer/input_ref_rewriter.rs, physical_rewriter.rs).

What this package adds on top of raw Spark:

- ``session``     — scale-aware SparkSession factory (AQE, broadcast, Arrow).
- ``catalog``     — the reference's ``RootCatalog`` equivalent
                    (reference: src/catalog/mod.rs:10-42): named-table
                    registry over CSV/parquet/in-memory sources, ``\\dt``.
- ``database``    — ``Database.run(sql)`` + meta-commands
                    (reference: src/db.rs, src/cli.rs:111-135).
- ``operators``   — DataFrame builders for each operator in SURVEY.md §2
                    (scan/filter/project/aggregate) plus the extension set
                    (join/sort/setops/window).
- ``functions``   — expression helpers and the large-scale data-pipeline
                    operators: dedup, similarity search, text analysis,
                    multimodal column plumbing.
- ``streaming``   — Structured Streaming equivalents (windowed aggregation,
                    watermarks, stateful ops).
"""

__version__ = "0.1.0"

from sql_query_engine_rs_spark.session import get_spark  # noqa: F401
from sql_query_engine_rs_spark.catalog import Catalog  # noqa: F401
from sql_query_engine_rs_spark.database import Database  # noqa: F401
