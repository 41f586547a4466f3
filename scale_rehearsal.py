"""sf1 scale rehearsal: measured (not argued) near-linear scaling evidence.

All per-round bench evidence is sf0.1 (~600k lineitem / 5k documents); the
100x-scale claims otherwise rest on plan-shape tests. This script
materializes a ~10x corpus locally — no driver help needed — and benches the
heavy operator family at BOTH scales with bench.py's exact min-of-warm
method, printing one JSON line with per-query times and the sf1/sf0.1 ratio.
Near-linear scaling shows as ratio ~= 10-12x (data is 10x, plus modest
shuffle superlinearity); a hidden quadratic shows as >= 50x.

Corpus construction (10 salted copies of sf0.1, remapped ids):
- documents: doc_id offset per copy; every TOKEN gets a per-copy suffix
  ("x0".."x9") so shingle/term sets are DISJOINT across copies — the dup
  rate stays that of the base corpus instead of every doc gaining 9 exact
  twins, which would measure a 45x-heavier dedup workload, not 10x data.
- events: event_id/user_id offset per copy — 10x users at constant per-user
  density, so watermark state and join fan-in scale linearly.
- embeddings: vec_id offset per copy (vectors repeat; ANN cell populations
  scale 10x).
- lineitem: l_orderkey offset per copy (scan/agg family).
Other tables copy through unchanged so every registered query still runs.

Run: python scale_rehearsal.py   (env: SPARK_GRAFT_SF1_DIR, _COPIES, _CPUS)
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sql_query_engine_rs_spark.queries import QUERIES  # noqa: E402
from sql_query_engine_rs_spark.session import get_spark  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("SPARK_GRAFT_SF1_DIR", os.path.join(os.path.dirname(os.path.abspath(__file__)), "sf1_rehearsal"))
COPIES = int(os.environ.get("SPARK_GRAFT_SF1_COPIES", "10"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
TRIALS = 3
OFFSET = 10**12  # id remap stride per copy; far above any base id

# The heavy family: candidate generation (MinHash/SimHash), iterative
# clustering, broadcast-probe decontamination, ANN, stateful streaming,
# retrieval scoring — plus one scan/agg anchor (TPC-H Q1).
HEAVY = [
    "pipe_minhash_lsh",
    "pipe_simhash",
    "pipe_dup_clusters",
    "pipe_decontaminate",
    "pipe_ann_ivf",
    "stream_interval_join",
    "stream_custom_state_expiry",
    "pipe_bm25",
    "pipe_inverted_index",
    "ext_tpch_q1",
]


def _write_single_file(df, dst: str) -> None:
    """Write as ONE plain parquet FILE (streaming queries symlink
    {sf_dir}/events.parquet expecting a file, and single files keep the
    layout identical to the driver's testdata)."""
    tmp = dst + "_tmp"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    shutil.move(part, dst)
    shutil.rmtree(tmp)


def build_data(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(OUT, exist_ok=True)
    plans = {
        "documents": lambda df, c: df.select(
            (F.col("doc_id") + F.lit(c * OFFSET)).alias("doc_id"),
            F.regexp_replace("text", r"(\S+)", "$1x%d" % c).alias("text"),
            "lang",
            "source",
            "n_chars",
        ),
        "events": lambda df, c: df.select(
            (F.col("event_id") + F.lit(c * OFFSET)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.lit(c * OFFSET)).alias("user_id"),
            "event_type",
            "value",
            "props",
        ),
        "embeddings": lambda df, c: df.select(
            (F.col("vec_id") + F.lit(c * OFFSET)).alias("vec_id"), "embedding", "label"
        ),
        "lineitem": lambda df, c: df.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(c * OFFSET)
        ),
    }
    for tbl, remap in plans.items():
        dst = os.path.join(OUT, f"{tbl}.parquet")
        if os.path.exists(dst):
            continue
        base = spark.read.parquet(os.path.join(BASE, f"{tbl}.parquet"))
        scaled = None
        for c in range(COPIES):
            part = remap(base, c)
            scaled = part if scaled is None else scaled.unionByName(part)
        _write_single_file(scaled, dst)
        print(f"built {tbl}: {COPIES}x", file=sys.stderr)
    for f in glob.glob(os.path.join(BASE, "*.parquet")):
        dst = os.path.join(OUT, os.path.basename(f))
        if not os.path.exists(dst):
            shutil.copy(f, dst)


def bench(spark, sf_dir: str, names: list[str]) -> dict[str, float]:
    from sql_query_engine_rs_spark.functions.caching import release_caches

    out = {}
    for name in names:
        times = []
        for _ in range(TRIALS):
            t0 = time.time()
            QUERIES[name].build(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
            release_caches()
        out[name] = round(min(times[1:]), 3)
        print(f"{sf_dir.rsplit('/', 1)[-1]} {name}: {out[name]}s (trials {[round(t, 2) for t in times]})", file=sys.stderr)
    return out


def main() -> None:
    spark = get_spark("scale-rehearsal", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")
    build_data(spark)
    # same warmups as bench.py so both scales measure the data path
    QUERIES["v0_simple_agg"].build(spark, BASE).collect()
    small = bench(spark, BASE, HEAVY)
    big = bench(spark, OUT, HEAVY)
    ratios = {n: (round(big[n] / small[n], 2) if small[n] > 0 else None) for n in HEAVY}
    print(
        json.dumps(
            {
                "metric": "sf1_rehearsal",
                "copies": COPIES,
                "base_sf_dir": BASE,
                "queries": {
                    n: {"sf0.1_sec": small[n], "sf1_sec": big[n], "ratio": ratios[n]}
                    for n in HEAVY
                },
                "note": f"min-of-warm over {TRIALS} full build+execute trials per scale; "
                "near-linear = ratio ~10-12x for 10 copies, quadratic creep >= 50x",
            }
        )
    )


if __name__ == "__main__":
    main()
