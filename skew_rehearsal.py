"""Planted-skew rehearsal: measured evidence that keyed operators survive
pathological KEY DISTRIBUTIONS, not just uniform scale-up.

Every scale_rehearsal corpus multiplies the base data uniformly, so its
linear ratios certify volume behavior but say nothing about the other
100 TB failure mode: one hot key. Real crawls have them — a bot user
emitting 20% of all events, one mega-source contributing 40% of
documents, boilerplate pages repeated verbatim across 5% of the corpus,
a staple part appearing on 10% of order lines, exact-duplicate
embedding rows from re-crawled pages. This script builds a SKEWED
variant of the uniform x10 corpus (same row counts, same schema — only
the key distributions change) and benches the keyed-heavy entries on
both, reporting skew/uniform time ratios. ~1.0 means the plan absorbs
the skew (map-side partial agg, capped buckets, AQE skew split);
materially above 1 is the measured, documented cost of that skew shape.

What each plant exercises (and the absorbing mechanism under test):
- events: 20% of events remapped to ONE user_id. Stateful streaming
  groups by user — per-key state is semantically single-task, so the
  hot user's rows process serially within each micro-batch. There is no
  plan trick around this (state per key IS the contract); the measured
  ratio is the honest floor, and the production mitigations are
  upstream: key-salting when state is associative, or bot-key
  quarantine before the stream. Also exercises the batch transition
  matrix (groupBy user — partial agg absorbs).
- documents: 40% of docs remapped to ONE source. pipe_source_overlap
  fans out per (hash, source) — hash-key partial aggs absorb a hot
  source; per-source distinct counts are two-phase.
- documents: 5% of docs' text replaced with ONE boilerplate string.
  Floods MinHash band buckets: _cap_band_size (max_band_size=256)
  must DROP the flooded buckets (documented recall trade) so the
  within-band pair join never sees the O(clones^2) candidate set.
- lineitem: 10% of lines remapped to ONE part. pipe_basket_lift's
  pair extraction self-joins on l_orderkey (basket-bounded), then
  groups by (part_a, part_b) — the hot part spreads across many
  distinct pair keys and count aggs absorb the per-key heat map-side.
- lineitem: 10% of lines remapped to ONE l_orderkey (independent salt
  — round 11, the builder's r10 staging note (d)). The mega-order is
  the c² bomb pipe_basket_lift's _BASKET_PAIR_CAP=1024 exists for:
  uncapped, its pair self-join generates C(distinct_parts, 2) rows
  (measured 74.1 s at x10 vs 9.1 s capped, BENCH_sf1.json
  "hot_order_cap_x10"); capped, the linear per-order count drops it
  BEFORE the quadratic stage, so the skew ratio here measures the cap
  absorbing the flood in the REGISTERED plan. The same plant makes the
  mega-order a ~10%-of-edges hub on the order side of
  pipe_hub_impact's and pipe_graph_pagerank's bipartite graph.
  (pipe_rfm_segments is NOT exercised: it aggregates the orders table,
  which this lineitem-only plant never touches.)
- embeddings: 5% of vectors replaced with ONE clone vector. Sign-LSH
  puts every clone in the SAME bucket no matter how many planes
  auto-derivation adds — the within-bucket verify pays O(clones^2)
  pair cosines by construction. That is the real cost of shipping
  exact-duplicate vectors into a near-dup pass; the measured ratio
  documents it, and the production discipline is an exact
  pre-dedup (hash-distinct on the vector bytes — one cheap shuffle)
  before any LSH stage. pipe_ann_ivf sees the clones as one hot IVF
  cell (bounded: probes scan one heavy cell).

Run: python skew_rehearsal.py   (env: SPARK_GRAFT_SKEW_COPIES, _CPUS)
Emits one JSON line; results are recorded under "skew_rehearsal" in
BENCH_sf1.json.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import scale_rehearsal as SR  # noqa: E402  (reuses corpus build + bench method)
from sql_query_engine_rs_spark.session import get_spark  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

COPIES = int(os.environ.get("SPARK_GRAFT_SKEW_COPIES", "10"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
_REPO = os.path.dirname(os.path.abspath(__file__))

# above every remapped id at ANY copy count (copy offsets are c * OFFSET,
# c < COPIES — a fixed sentinel would collide with copy c's id range once
# COPIES grows past it)
HOT_USER = (COPIES + 1) * SR.OFFSET
HOT_PART = 1
HOT_ORDER = (COPIES + 1) * SR.OFFSET  # order-key domain; same sentinel rule
BOILERPLATE = (
    "This page is part of our standard catalog template. All rights "
    "reserved. Contact support for licensing questions. The quick brown "
    "fox jumps over the lazy dog while the catalog renders the same "
    "footer on every page of the export batch."
)

# entries whose plans the plants target; all are scale_rehearsal.HEAVY
# members so uniform-corpus numbers share the same method
SKEW_OPS = [
    "stream_event_transitions",      # hot user, batch-side transition agg
    "stream_custom_state_expiry",    # hot user, per-key streaming state
    "stream_session_windows",        # hot user, session-window state (r9 verdict item 5)
    "pipe_source_overlap",           # hot source
    "pipe_minhash_lsh",              # boilerplate flood vs band caps
    "pipe_dup_clusters",             # boilerplate flood through clustering
    "pipe_basket_lift",              # hot part through pair extraction; hot ORDER vs _BASKET_PAIR_CAP
    "pipe_hub_impact",               # hot order = ~10%-of-edges hub on the bipartite graph
    "pipe_embedding_near_dup_auto",  # clone flood: the O(clones^2) bucket
    "pipe_ann_ivf",                  # clone flood: one hot IVF cell
]

# Round 9: the graph family under the SAME plants — each plant is a hot
# NODE of that entry's graph, the hub shape graph algorithms are most
# sensitive to:
# - pagerank's bipartite order-part graph: the hot part (10% of lines)
#   becomes a node with ~10% of all in-edges. Per iteration the hub is
#   one groupBy(dst) key — partial aggregation must absorb it; the
#   rank/deg join keys on src where the hub's mass is one row.
# - LPA's MinHash near-dup graph: the boilerplate flood (5% of docs,
#   identical text) is a would-be clique of clones; _cap_band_size must
#   drop the flooded bands so the edge list never goes O(clones^2), and
#   the mode-argmax groupBy absorbs whatever capped edges remain.
# - kcore/assortativity's symmetrized kNN graph: the clone flood (5% of
#   vectors identical) shares every LSH bucket. Since round 10,
#   similarity.knn_graph detects the flooded bucket (population probe >
#   KNN_CLONE_COLLAPSE_TRIGGER) and collapses exact clones to one
#   representative before the bucket self-join (bit-identical output,
#   pinned), so the within-bucket scan is O(distinct^2), never
#   O(clones^2) — this plant now measures the collapse absorbing the
#   flood (was 1.04x/1.28x under the pre-collapse all-member scan),
#   while the uniform corpus stays on the direct plan (healthy buckets
#   never pay the collapse's extra exchanges). Downstream the clones are still
#   mutual 1.0-neighbors — a dense k-core and a degree-correlated
#   block — whose peel/correlation joins key on ids, not the hot region.
GRAPH_SKEW_OPS = [
    "pipe_graph_pagerank",
    "pipe_lpa_communities",
    "pipe_kcore_decompose",
    "pipe_graph_assortativity",
]


def skew_dir() -> str:
    return os.path.join(_REPO, f"skew_rehearsal_x{COPIES}")


def build_skew(spark) -> None:
    """Derive the skewed corpus from the uniform x{COPIES} corpus: same
    row counts and schema, remapped key distributions only."""
    src = SR.out_dir(COPIES)
    out = skew_dir()
    os.makedirs(out, exist_ok=True)

    clone_vec = None  # filled lazily from the first embedding row

    def events(df):
        return df.withColumn(
            "user_id",
            F.when(F.pmod(F.hash("event_id"), F.lit(5)) == 0, F.lit(HOT_USER))
            .otherwise(F.col("user_id")),
        )

    def documents(df):
        # independent salts: h%20==0 implies h%5==0 for the SAME hash, so
        # unsalted moduli would nest the flood inside the hot source and
        # entangle the two plants' measured ratios
        flooded = F.pmod(F.hash("doc_id", F.lit("flood")), F.lit(20)) == 0  # 5%
        hot_src = F.pmod(F.hash("doc_id", F.lit("src")), F.lit(5)) < 2      # 40%
        return df.select(
            "doc_id",
            F.when(flooded, F.lit(BOILERPLATE)).otherwise(F.col("text")).alias("text"),
            "lang",
            F.when(hot_src, F.lit("hot_source")).otherwise(F.col("source")).alias("source"),
            F.when(flooded, F.lit(len(BOILERPLATE))).otherwise(F.col("n_chars")).alias("n_chars"),
        )

    def lineitem(df):
        # independent salts (see documents): the hot-part and hot-order
        # plants overlap on ~1% of lines instead of nesting, so each
        # entry's ratio is dominated by its own mechanism
        return df.withColumn(
            "l_partkey",
            F.when(
                F.pmod(F.hash("l_orderkey", "l_linenumber"), F.lit(10)) == 0,
                F.lit(HOT_PART),
            ).otherwise(F.col("l_partkey")),
        ).withColumn(
            "l_orderkey",
            F.when(
                F.pmod(F.hash("l_orderkey", "l_linenumber", F.lit("ord")), F.lit(10)) == 0,
                F.lit(HOT_ORDER),
            ).otherwise(F.col("l_orderkey")),
        )

    def embeddings(df):
        # the literal array is array<double>; without the cast, when()
        # coerces the WHOLE column to array<double> and every skew-corpus
        # vector is written at 2x the uniform corpus's width — the ratios
        # would measure dtype bytes, not skew
        lit_vec = F.array(*[F.lit(float(x)) for x in clone_vec]).cast("array<float>")
        return df.withColumn(
            "embedding",
            F.when(F.pmod(F.hash("vec_id"), F.lit(20)) == 0, lit_vec)
            .otherwise(F.col("embedding")),
        )

    remaps = {
        "events": events,
        "documents": documents,
        "lineitem": lineitem,
        "embeddings": embeddings,
    }
    for tbl, remap in remaps.items():
        dst = os.path.join(out, f"{tbl}.parquet")
        if os.path.exists(dst):
            continue
        base = spark.read.parquet(os.path.join(src, f"{tbl}.parquet"))
        if tbl == "embeddings" and clone_vec is None:
            clone_vec = base.select("embedding").first()[0]  # 1-row collect
        SR._write_single_file(remap(base), dst)
        print(f"skew-built {tbl}", file=sys.stderr)
    for f in glob.glob(os.path.join(src, "*.parquet")):
        dst = os.path.join(out, os.path.basename(f))
        if not os.path.exists(dst):
            shutil.copy(f, dst)


def main() -> None:
    spark = get_spark(
        "skew-rehearsal", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    spark.sparkContext.setLogLevel("ERROR")
    SR.build_data(spark, COPIES)
    build_skew(spark)
    from sql_query_engine_rs_spark.queries import QUERIES

    QUERIES["v0_simple_agg"].build(spark, SR.BASE).collect()  # warmup
    ops = SKEW_OPS + GRAPH_SKEW_OPS
    sel = os.environ.get("SPARK_GRAFT_SKEW_OPS")
    if sel:
        ops = [s.strip() for s in sel.split(",") if s.strip()]
        unknown = [s for s in ops if s not in SKEW_OPS + GRAPH_SKEW_OPS]
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_SKEW_OPS not rehearsed here: {unknown}")
    uniform = SR.bench(spark, SR.out_dir(COPIES), ops, copies=COPIES)
    skewed = SR.bench(spark, skew_dir(), ops, copies=COPIES)
    per_query = {
        n: {
            "uniform": uniform[n],
            "skew": skewed[n],
            "ratio_skew/uniform": round(skewed[n] / uniform[n], 2) if uniform[n] > 0 else None,
        }
        for n in ops
    }
    print(
        json.dumps(
            {
                "metric": "skew_rehearsal",
                "copies": COPIES,
                "plants": {
                    "events": "20% of events -> one user_id",
                    "documents": "40% of docs -> one source; 5% of texts -> one boilerplate string",
                    "lineitem": "10% of lines -> one l_partkey; 10% (independent salt) -> one l_orderkey",
                    "embeddings": "5% of vectors -> one clone vector",
                },
                "queries": per_query,
                "note": "same row counts as the uniform corpus; min-of-warm "
                f"over {SR.TRIALS} trials per corpus; ratio ~1 = plan absorbs the "
                "skew (partial agg / band caps / bounded baskets); above 1 = the "
                "measured cost of that skew shape (see module docstring for the "
                "per-plant mechanism and the production mitigation)",
            }
        )
    )


if __name__ == "__main__":
    main()
