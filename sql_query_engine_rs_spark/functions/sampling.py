"""Deterministic sampling operators for reproducible train/eval carving.

No counterpart in the reference (no sampling anywhere). Complements the
md5-prefix hash sample in queries.py (`pipe_hash_sample`): that one is O(1)
per row but gives only approximate per-stratum sizes; `stratified_sample`
here gives EXACT per-stratum sizes at the cost of a per-stratum sort.

Scale notes: the plain window sorts each stratum by md5 — per-stratum
shuffle+sort, fine when strata are many and balanced. Both exact operators
carry a ``salted=True`` two-phase variant for the single-giant-stratum shape:
phase 1 ranks within (stratum, salt) so no task ever sorts more than the
stratum's 1/n_salts share, and the superset argument (below, per operator)
makes phase 2's exact re-rank run over a bounded survivor set. Deterministic:
same data → same sample, any cluster, either path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fraction: float,
    id_col: str = "doc_id",
    salted: bool = False,
    n_salts: int = 16,
) -> DataFrame:
    """Exactly ceil(fraction * |stratum|) rows per stratum, chosen as the
    rows with the smallest md5(id) — a deterministic, engine-portable
    pseudorandom order (ties broken by id; md5 collisions are immaterial).

    ``salted=False``: one count window + one rank window per stratum — a
    giant stratum serializes onto the single task that sorts it.

    ``salted=True`` (the 100 TB path): per-stratum takes come from a skinny
    broadcast count frame (one row per stratum), then two bounded phases.
    Phase 1 ranks within (stratum, salt) where salt = pmod(hash(id),
    n_salts) and keeps rank <= take_s: any row among the stratum's true
    first take_s has at most take_s - 1 predecessors overall, hence at most
    take_s - 1 in its own salt, so phase 1 keeps a SUPERSET of the answer
    (exactness preserved) while no task sorts more than the stratum's salt
    share; survivors are <= take_s * n_salts per stratum. Phase 2 re-ranks
    the bounded survivor set exactly. Same result as the single-window
    form by construction; pinned by tests/test_pipeline_ops.py.

    The broadcast count frame holds one (stratum, take) row per stratum —
    fine to millions of strata; the giant-stratum shape this path exists
    for has few strata by definition.
    """
    order = (F.md5(F.col(id_col).cast("string")), F.col(id_col))
    if not salted:
        w_rank = Window.partitionBy(stratum_col).orderBy(*order)
        w_all = Window.partitionBy(stratum_col)
        return (
            df.withColumn("_rn", F.row_number().over(w_rank))
            .withColumn("_take", F.ceil(F.count(F.lit(1)).over(w_all) * fraction))
            .filter(F.col("_rn") <= F.col("_take"))
            .drop("_rn", "_take")
        )
    takes = df.groupBy(stratum_col).agg(
        F.ceil(F.count(F.lit(1)) * F.lit(fraction)).alias("_take")
    )
    salt = F.pmod(F.hash(F.col(id_col)), F.lit(n_salts))
    phase1_w = Window.partitionBy(F.col(stratum_col), salt).orderBy(*order)
    survivors = (
        df.join(F.broadcast(takes), stratum_col)
        .withColumn("_rn1", F.row_number().over(phase1_w))
        .filter(F.col("_rn1") <= F.col("_take"))
        .drop("_rn1")
    )
    final_w = Window.partitionBy(stratum_col).orderBy(*order)
    return (
        survivors.withColumn("_rn", F.row_number().over(final_w))
        .filter(F.col("_rn") <= F.col("_take"))
        .drop("_rn", "_take")
        .select(*df.columns)
    )


def domain_cap(
    df: DataFrame,
    domain_col: str,
    cap: int,
    order_col: str = "doc_id",
    salted: bool = False,
    n_salts: int = 16,
) -> DataFrame:
    """Keep at most ``cap`` rows per domain, the first by ``order_col`` —
    the CommonCrawl-style guard against any one host dominating a corpus.
    Output: input columns + ``rn`` (1-based rank within the domain).

    ``salted=False``: one row_number window — one shuffle, but a mega-domain
    serializes onto a single task (every row of the domain must pass through
    one partition's sort).

    ``salted=True`` (the 100 TB path): two phases, both bounded.
    Phase 1 ranks within (domain, salt) where salt = pmod(hash(order_col),
    n_salts) and keeps rank <= cap: any row within the domain's true first
    ``cap`` has at most cap-1 predecessors overall, hence at most cap-1 in
    its own salt, so phase 1 keeps a SUPERSET of the answer (exactness
    preserved) while bounding every task at the salt's share; survivors are
    <= cap * n_salts per domain. Phase 2 re-ranks the bounded survivor set
    per domain — the hot key now carries at most cap * n_salts rows, not
    the whole domain. Same result as the single-phase window, by
    construction; pinned by tests/test_pipeline_ops.py.
    """
    final_w = Window.partitionBy(domain_col).orderBy(order_col)
    if not salted:
        return df.withColumn("rn", F.row_number().over(final_w)).filter(F.col("rn") <= cap)
    salt = F.pmod(F.hash(F.col(order_col)), F.lit(n_salts))
    phase1_w = Window.partitionBy(F.col(domain_col), salt).orderBy(order_col)
    survivors = df.withColumn("_rn1", F.row_number().over(phase1_w)).filter(
        F.col("_rn1") <= cap
    )
    return (
        survivors.drop("_rn1")
        .withColumn("rn", F.row_number().over(final_w))
        .filter(F.col("rn") <= cap)
    )
