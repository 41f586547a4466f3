"""Similarity search over embedding columns (array<float>).

No counterpart in the reference (no array types at all —
src/types/mod.rs:57,75 panics on non-scalar Arrow types). Extension surface
for the training-data pipeline.

Scale design
------------
- ``cosine`` is a pure JVM higher-order-function expression (zip_with +
  aggregate): no Python, no UDF, vectorizes inside codegen.
- ``brute_force_topk`` broadcasts the (small) query set against the corpus —
  one map-side pass over the corpus + a per-query top-k (window with
  partition-local limit). Exact; linear in |corpus| × |queries|.
- ``random_hyperplane_buckets`` + ``lsh_topk`` is the approximate scale path:
  sign-LSH buckets shrink the candidate set so the join is bucket-local.
  Projections are derived deterministically from (plane, dim) via a hash so
  the operator needs no stored model/state — any executor recomputes the same
  planes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sql_query_engine_rs_spark.functions.expressions import portable_round
from sql_query_engine_rs_spark.functions.partitioning import ensure_parallelism as _ensure_parallelism


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a JVM expression. Inputs are cast to array<double> BEFORE
    multiplying — float32 products would lose ~1e-7 of precision and break
    cross-engine (DuckDB-oracle) agreement; double math agrees to ~1e-16."""
    ad, bd = a.cast("array<double>"), b.cast("array<double>")
    return F.aggregate(F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    ad = a.cast("array<double>")
    return F.sqrt(F.aggregate(ad, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    ``queries`` must be small (it is broadcast); the corpus streams through
    map-side. Output: (query_id, <id_col>, cos_sim, rank), self-matches
    excluded, rank by (cos_sim desc, id) for determinism.
    """
    q = queries.select(F.col(id_col).alias(query_id_col), F.col(vec_col).alias("_qv"))
    c = _ensure_parallelism(corpus).select(F.col(id_col), F.col(vec_col).alias("_cv"))
    scored = c.join(F.broadcast(q), on=F.col(query_id_col) != F.col(id_col)).select(
        query_id_col,
        id_col,
        portable_round(cosine(F.col("_qv"), F.col("_cv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ------------------------------------------------------------ LSH scale path

def _plane_coeff(plane: int, dim_idx: Column) -> Column:
    """Deterministic ±1 coefficient for (plane, dimension) — parity of a
    cheap integer hash. Stateless: recomputable on any executor."""
    h = F.hash(F.lit(plane), dim_idx)
    return F.when(h.bitwiseAND(F.lit(1)) == 1, F.lit(1.0)).otherwise(F.lit(-1.0))


def random_hyperplane_signature(vec: Column, num_planes: int = 8) -> Column:
    """Sign-LSH signature: bit b = sign(vec · plane_b) with ±1-coefficient
    hyperplanes. Returns an int bucket id in [0, 2^num_planes)."""
    def plane_sign(p: int) -> Column:
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.transform(F.sequence(F.lit(0), F.size(vec) - 1), lambda i: _plane_coeff(p, i)),
                lambda x, c: x * c,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))

    sig = F.lit(0)
    for p in range(num_planes):
        sig = sig + plane_sign(p)
    return sig


def random_hyperplane_buckets(
    df: DataFrame, vec_col: str = "embedding", num_planes: int = 8, bucket_col: str = "bucket"
) -> DataFrame:
    """Attach the sign-LSH bucket id (map-only)."""
    return df.withColumn(bucket_col, random_hyperplane_signature(F.col(vec_col), num_planes))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket,
    then exact cosine rank within candidates. With ``num_planes`` p, the
    candidate set shrinks ~2^p-fold; recall is tunable via p (and multiple
    tables if needed). Output schema matches ``brute_force_topk``."""
    cb = random_hyperplane_buckets(corpus, vec_col, num_planes)
    qb = random_hyperplane_buckets(queries, vec_col, num_planes).select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("_qv"), F.col("bucket")
    )
    scored = (
        cb.join(F.broadcast(qb), on="bucket")
        .filter(F.col(query_id_col) != F.col(id_col))
        .select(query_id_col, id_col, portable_round(cosine(F.col("_qv"), F.col(vec_col)), 6).alias("cos_sim"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
