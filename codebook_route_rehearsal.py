"""Rehearse the k > CODEBOOK_COLLECT_MAX distributed assignment route on
REAL scale — the "SemDeDup at k≈10⁶" path, measured rather than argued.

Builds a ~100k-centroid codebook (hash-sampled distinct vectors from
the x300 rehearsal corpus; k=99,692 → coarse m=315) — 1.5× past the
65,536 driver-collect bound, so ``ivf_assign_two_level`` takes
``_assign_two_level_distributed`` (coarse seeds via the kernel; fine
cells via a shuffle join on the coarse id) — and assigns the full x100
corpus (200k vectors) through it. Reports wall time, assignment
coverage (empty-group drops are the documented inner-join semantic),
and a bit-parity check: a HASH-SPREAD sample of outputs (smallest
md5(vec_id) — covers every copy's transform, not just copy 0's
identity vectors) is replayed driver-side in numpy with the kernels'
own strict-fold helpers (same md5 seed pick, same argmax-first
tie/NaN rule), which must agree EXACTLY.

For context it also times the retained JVM twin
(``_ivf_assign_two_level_jvm``) on the same inputs — the interpreted
crossJoin/broadcast form the distributed route supersedes past the
bound. Results recorded under "distributed_codebook_route" in
BENCH_sf1.json.

Run: python codebook_route_rehearsal.py   (corpora must exist — run
scale_rehearsal.py first; env: SPARK_GRAFT_CPUS)
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from sql_query_engine_rs_spark.session import get_spark  # noqa: E402

_REPO = os.path.dirname(os.path.abspath(__file__))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
K = 100_000
SAMPLE = 500


def main() -> None:
    from sql_query_engine_rs_spark.functions import arrow_kernels as AK
    from sql_query_engine_rs_spark.functions.similarity import (
        _ivf_assign_two_level_jvm,
        ivf_assign_two_level,
    )

    spark = get_spark(
        "codebook-route", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    spark.sparkContext.setLogLevel("ERROR")
    cb = (
        spark.read.parquet(os.path.join(_REPO, "sf1_rehearsal_x300/embeddings.parquet"))
        # deterministic ~K-subset WITHOUT a GlobalLimit: a limit() collapses
        # the frame to one partition and the first rehearsal run serialized
        # the JVM twin's 31.6M-fold grouping crossJoin onto a single task.
        # Real codebooks come out of well-partitioned groupBys, so
        # hash-sample 1-in-6 of the 600k ids instead (the x300 ids are
        # copy-offset by 10^12, so a range filter only hits one copy).
        .filter(F.pmod(F.xxhash64("vec_id"), F.lit(6)) == 0)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").cast("array<double>").alias("_centroid"),
        )
        .repartition(int(CPUS), "centroid_id")
        .persist()
    )
    k = cb.count()
    assert k > AK.CODEBOOK_COLLECT_MAX, (k, AK.CODEBOOK_COLLECT_MAX)
    corpus = (
        spark.read.parquet(os.path.join(_REPO, "sf1_rehearsal_x100/embeddings.parquet"))
        .select("vec_id", "embedding")
        .persist()
    )
    n = corpus.count()

    t0 = time.time()
    out = ivf_assign_two_level(corpus, cb)
    out.write.format("noop").mode("overwrite").save()
    route_s = round(time.time() - t0, 2)
    # persist AFTER the timed leg (keeps the timing a pure route run);
    # count + the parity sample then share ONE cached re-run instead of
    # re-executing the ~63M-pair join once each
    out = out.persist()
    assigned = out.count()
    print(f"route: {route_s}s assigned {assigned}/{n}", file=sys.stderr)

    jvm_s = None
    if os.environ.get("SPARK_GRAFT_CBR_TWIN", "1") == "1":
        t0 = time.time()
        _ivf_assign_two_level_jvm(corpus, cb).write.format("noop").mode(
            "overwrite"
        ).save()
        jvm_s = round(time.time() - t0, 2)
        print(f"jvm twin: {jvm_s}s", file=sys.stderr)

    # ---- bit-parity replay on a sample, driver-side numpy -----------
    cb_pd = cb.toPandas()
    cids = cb_pd["centroid_id"].to_numpy(dtype=np.int64)
    mat = np.stack(cb_pd["_centroid"].to_numpy()).astype(np.float64)
    order = np.argsort(cids, kind="stable")
    cids, mat = cids[order], mat[order]
    m = max(2, int(k**0.5))
    by_h = sorted(
        range(k), key=lambda i: hashlib.md5(str(int(cids[i])).encode()).hexdigest()
    )[:m]
    seed_idx = sorted(by_h, key=lambda i: cids[i])
    gids, G = cids[seed_idx], mat[seed_idx]
    grp = gids[AK._argbest(AK._strict_scores(mat, G, "cosine"), "cosine")]
    sample = (
        out.orderBy(F.md5(F.col("vec_id").cast("string"))).limit(SAMPLE).collect()
    )
    sv = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in sample])
    routed = gids[AK._argbest(AK._strict_scores(sv, G, "cosine"), "cosine")]
    bad = 0
    for i, r in enumerate(sample):
        g_cids, g_mat = cids[grp == routed[i]], mat[grp == routed[i]]
        if len(g_cids) == 0:
            # replay routed to an empty seed group: under correct routing
            # the route would have DROPPED this row (inner join), so a
            # sampled output row landing here is itself a divergence —
            # record it instead of crashing argmax on an empty axis
            bad += 1
            continue
        want = g_cids[
            AK._argbest(AK._strict_scores(sv[i : i + 1], g_mat, "cosine"), "cosine")
        ][0]
        bad += int(want != r.centroid_id)
    print(
        json.dumps(
            {
                "metric": "distributed_codebook_route",
                "k": int(k),
                "coarse_m": m,
                "n_vectors": int(n),
                "assigned": int(assigned),
                "dropped_empty_groups": int(n - assigned),
                "route_s": route_s,
                "jvm_twin_s": jvm_s,
                "sample_checked": len(sample),
                "sample_mismatches": bad,
            }
        )
    )


if __name__ == "__main__":
    main()
