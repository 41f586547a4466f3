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
- embeddings: vec_id offset per copy, vector cyclically ROTATED by the copy
  index (rotation preserves norms and the within-copy cosine structure
  while decorrelating cross-copy pairs) — the dup rate stays that of the
  base corpus instead of every vector gaining copies-1 exact cos=1 twins,
  which would measure a quadratically heavier SemDeDup/near-dup workload,
  not 10x data. ANN cell populations still scale 10x.
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
_REPO = os.path.dirname(os.path.abspath(__file__))
# comma list of copy multipliers; each builds its own corpus dir. "10"
# reproduces the classic sf1 rehearsal; "10,30" adds an amortized-overhead
# linearity check (30x/10x should read ~3x for linear operators, since both
# scales carry the same per-stage fixed costs).
COPIES_LIST = [
    int(c) for c in os.environ.get("SPARK_GRAFT_SF1_COPIES", "10").split(",")
]
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
# >= 2 (min-of-warm); 2 halves the wall-clock of the slow x100 stateful
# drains at the cost of one fewer warm sample
TRIALS = max(2, int(os.environ.get("SPARK_GRAFT_SF1_TRIALS", "3")))
OFFSET = 10**12  # id remap stride per copy; far above any base id


def out_dir(copies: int) -> str:
    # the 10-copy dir keeps its original name (committed BENCH_sf1 history)
    return os.path.join(
        _REPO, "sf1_rehearsal" if copies == 10 else f"sf1_rehearsal_x{copies}"
    )

# The heavy family: candidate generation (MinHash/SimHash), iterative
# clustering, broadcast-probe decontamination, ANN, stateful streaming,
# retrieval scoring — plus one scan/agg anchor (TPC-H Q1).
HEAVY = [
    "pipe_knn_graph",
    # round 11: the hot-order skew plant measures pipe_hub_impact, and
    # SKEW_OPS is pinned subset-of-HEAVY so uniform numbers share this
    # method — hub_impact's distinct-pair scan is O(lineitem) and belongs
    # in the uniform sweep anyway
    "pipe_hub_impact",
    "pipe_kcore_decompose",
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
    "pipe_semdedup_kscaled",
    # round-5 fourth wave: PQ's codebook is fixed-size (quantization quality
    # tracks the data DISTRIBUTION, not N), so encode/ADC must read linear;
    # the outer join adds watermark-flush state to the interval-join shape;
    # BPE pair counting is vocab-bounded after the corpus pass
    "pipe_ann_pq",
    "stream_outer_join",
    "pipe_bpe_pair_counts",
    # round-5 fifth wave: span-level exact-substring dedup (positional-gram
    # explosion must stay linear — coverage amplification is x8 on DUP
    # occurrences only, and the suffixed-copy corpus keeps the dup rate
    # constant); the mergeable-sketch family (count-min / bloom) must read
    # flat-ish (sketch size is fixed; only the token pass scales); DSIR is
    # one explode + 256-row joins; the MinHash audit is the candidate half
    # of pipe_minhash_lsh plus signature compares
    "pipe_exact_substring_dedup",
    "pipe_countmin_heavyhitters",
    "pipe_bloom_membership",
    "pipe_dsir_weights",
    "pipe_minhash_jaccard_est",
    # the 6-stage curation funnel composite — measured here (relative
    # scaling), not in bench.py (it would read as an outlier next to
    # per-operator numbers)
    "pipe_curation_funnel",
    # round-6: the third stateful-streaming shape (overlapping sliding
    # windows multiply state rows by window_count/slide) — state-store
    # scaling is the axis the earlier x100 deep point didn't cover
    "stream_sliding_windows",
    # round-6: semdedup with EVERY knob at its auto default (k and the
    # hierarchical switch derived from count()) — the scale-safety claim
    # for the shipped defaults, measured rather than argued
    "pipe_semdedup_auto",
    # round-6 late: iterative link analysis — per iteration one edge-keyed
    # shuffle join + one aggregate over the persisted edge frame; expected
    # linear in edges at a fixed iteration count
    "pipe_graph_pagerank",
    # round-6 late: corpus-pair text ops — source_overlap's per-hash
    # fan-out is bounded by #sources, distinct_ngrams is three two-phase
    # distinct aggregates, the streaming transition matrix is O(users)
    # state; all expected linear in documents/events
    "pipe_source_overlap",
    "pipe_distinct_ngrams",
    "stream_event_transitions",
    # round-6 final wave: three global layout sorts over the fact table
    # (sort is n log n — the one deliberately superlinear entry, expected
    # ratio ~copy_multiple x log growth); the order-key co-partitioned
    # basket self-join (fan-out bounded by C(basket,2), expected linear);
    # the N*d^2 second-moment pass behind the covariance spectrum
    # (d fixed -> linear in N, everything downstream is d^2-sized)
    "pipe_zorder_layout",
    "pipe_basket_lift",
    "pipe_cov_spectrum",
    # round-6 late batch: the DataFrame Lloyd loop (k fixed -> linear in N,
    # k*dim-row update shuffles), the sparse-postings cosine join (probe set
    # fixed -> postings fan-out linear in corpus), and the Poisson bootstrap
    # (a B-fold map-side explode, linear by construction). pipe_record_linkage
    # is deliberately NOT here: its registered (nation, segment) blocking is
    # corpus-size-independent, so block sizes — and the in-block pair scan —
    # grow linearly with N and the op is the DOCUMENTED quadratic under a
    # fixed blocking scheme (the docstring's finer-keys-plus-caps discipline
    # is the production answer; rehearsing the fixed scheme would measure
    # the known caveat, not a regression).
    "pipe_kmeans_lloyd",
    "pipe_sparse_cosine_dups",
    "pipe_bootstrap_ci",
    # round-6 session-2 wave: Naive Bayes (one tokenize pass + (term, class)
    # and (doc, class) partial shuffles — linear in tokens at fixed class
    # count); 2-round label propagation over the MinHash graph (edge-keyed
    # joins, constant dup rate by corpus construction -> linear in edges);
    # BPE merge training (vocab-bounded after the corpus tokenize — the
    # suffixed-copy corpus multiplies vocab by the copy count, so linear in
    # VOCAB is the expected read); nearest-centroid scoring (explode N*d +
    # broadcast centroid join -> linear in N); the watermark late-drop
    # stream (windowed-agg state + 2.1 s fixed file-staging sleeps — ratios
    # read low until the drain dominates). pipe_link_prediction is NOT
    # rehearsed: like the other kNN-graph entries its registered form pins
    # num_planes=3 for a static oracle, and scale-safety rests on
    # similarity.knn_graph's auto-plane bucket bounding (~64/bucket).
    "pipe_naive_bayes",
    "pipe_lpa_communities",
    "pipe_bpe_merge_train",
    "pipe_centroid_classifier",
    "stream_late_data_drop",
    # round-6 session 4: skip-gram pair extraction is the session's one
    # explode-heavy text op (posexplode + subsample + window self-join);
    # the suffixed-copy corpus multiplies docs, vocab and pairs by the
    # copy count, so linear is the expected read.
    "pipe_skipgram_pairs",
    # round-6 session 4: the method-triangulation audit runs BOTH pair
    # generators (MinHash-LSH banding + SimHash Hamming blocking) plus a
    # full-outer set compare on (lo, hi) pair keys — expected linear, since
    # each side is individually rehearsed linear and the compare is keyed
    # by pair ids (skinny). The session's other additions (bradley_terry /
    # fleiss_kappa / sinkhorn_ot / token_budget_mix) are single-scan +
    # bounded-scalar shapes and are not worth rehearsal wall-clock.
    # (Round 7: the compare exchange is now volume_scaled_partitions-sized;
    # the round-6 x100/x30 = 4.1 was pair-key width at 32 fixed partitions.)
    "pipe_dedup_method_agreement",
    # round 7: record_linkage is rehearsable now that its blocking scales
    # with N — the capped (nation x segment) arm drops flooded blocks at
    # rehearsal scale and the digits-key numeric-token arm (bucket size ~2
    # at any N, thanks to the per-copy name remap above) carries recall;
    # expected linear. Before this fix the fixed blocking key made the op
    # the documented quadratic and it was deliberately excluded.
    "pipe_record_linkage",
    # round 7: the two remaining new registered entries, measured rather
    # than argued — the range-bucketed layout audit is two lineitem scans
    # (1-row stats broadcast + bucket-assign/min-max, no global sort, the
    # n log n exact-chunking entry's production twin, expected linear),
    # and the auto-plane near-dup twin re-derives planes from count() so
    # bucket populations stay ~64 as the corpus grows (expected linear;
    # the rotated-copy corpus keeps the dup rate constant).
    "pipe_zorder_range_layout",
    "pipe_embedding_near_dup_auto",
    # round 10: the session-window stream joins the skew corpus (hot-user
    # plant — per-key session state is semantically serial for the hot
    # key); rehearsed uniform here so the skew ratio has its denominator.
    "stream_session_windows",
    # round 11: the crawl-curation wave. The incremental probes are
    # index-scan-bound by design (the shard/bench side is broadcast), so
    # they must read linear in the corpus; url_dedup is a map-only
    # canonicalize + bounded-key groupBy; decontam_diff is the
    # decontaminate shape plus an old/new flag aggregate.
    "pipe_incremental_dedup",
    "pipe_incremental_minhash",
    "pipe_url_dedup",
    "pipe_decontam_diff",
]

# SPARK_GRAFT_SF1_OPS=a,b,c restricts the benched set — used for the x100
# deep point, where building/benching the full 19-op family would spend the
# round's wall-clock on corpus writes instead of evidence.
_OPS_FILTER = os.environ.get("SPARK_GRAFT_SF1_OPS")
if _OPS_FILTER:
    _sel = [s.strip() for s in _OPS_FILTER.split(",") if s.strip()]
    unknown = [s for s in _sel if s not in HEAVY]
    if unknown:
        raise SystemExit(f"SPARK_GRAFT_SF1_OPS not in HEAVY: {unknown}")
    HEAVY = _sel


def _semdedup_kscaled(spark, sf_dir: str, copies: int):
    """SemDeDup with num_centroids scaled by the corpus multiple — the
    documented production discipline (cells stay bounded as N grows; the
    per-cell pair scan is quadratic within a cell, so holding k fixed under
    a growing corpus would measure that quadratic, not the operator's
    scale behavior). The first rehearsal of this entry read 7.8x for 3x
    data — root cause was NOT the N·k assignment math but the codebook's
    Lloyd pass inheriting the parquet scan's 1-2 partitions (fixed:
    ivf_centroids now re-parallelizes; 202 s -> 20 s at x30). The N·k
    term IS still quadratic when k ∝ N: beyond ~10^7 vectors switch
    ``hierarchical_assign=True`` (N·2·sqrt(k), see ivf_assign_two_level) —
    at rehearsal sizes its extra joins cost more than the cosines it
    saves (measured 10.7 s vs 5.8 s at x10), so the rehearsal benches the
    registered brute path. threshold matches the registered pipe_semdedup."""
    from sql_query_engine_rs_spark.functions.dedup import semdedup

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return semdedup(emb, threshold=0.4, num_centroids=8 * copies)


def _semdedup_auto(spark, sf_dir: str, copies: int):
    """semdedup with no knobs: num_centroids = auto_num_centroids(count())
    and the hierarchical-assignment switch both derive from the corpus —
    the shipped scale-safe defaults. At x10 (50k vecs) auto-k is 782
    (brute assignment); at x30 (150k) it is 2344, past
    SEMDEDUP_HIERARCHICAL_K, so assignment auto-routes through the
    two-level hierarchy — the x30/x10 ratio therefore measures the
    DEFAULTS' behavior across the crossover, which is the claim."""
    from sql_query_engine_rs_spark.functions.dedup import semdedup

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return semdedup(emb, threshold=0.4)


# entries benched through a (spark, sf_dir, copies) builder instead of the
# registry — operators whose scale parameters must track the corpus multiple
SCALED_BUILDERS = {
    "pipe_semdedup_kscaled": _semdedup_kscaled,
    "pipe_semdedup_auto": _semdedup_auto,
}


def _write_single_file(df, dst: str) -> None:
    """Write as ONE plain parquet FILE (streaming queries symlink
    {sf_dir}/events.parquet expecting a file, and single files keep the
    layout identical to the driver's testdata)."""
    tmp = dst + "_tmp"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    shutil.move(part, dst)
    shutil.rmtree(tmp)


def _embedding_remap(c: int):
    """Per-copy embedding transform: cyclic ROTATION by c % 64 composed,
    for copies past the rotation period, with a deterministic ±1 SIGN
    pattern keyed on q = c // 64. Rotation alone wraps at 64 copies —
    copies c and c+64 of the same vector were EXACT clones, planting
    ~(copies/64 choose 2) artifact near-dup pairs per base vector
    (discovered by the x300 deep point: knn_graph's x300/x100 ratio read
    15.33, exactly the artifact pair growth 560/36, while the
    clone-collapsed near-dup read 1.31 — the skew-rehearsal fix absorbing
    the artifact). Both transforms preserve norms and within-copy cosine
    structure exactly (signs cancel in every within-copy inner product);
    cross-copy pairs with equal rotation now differ in ~32 of 64 signs —
    decorrelated like the distinct-rotation pairs. q = 0 keeps the
    identity pattern, so every corpus of ≤ 64 copies (the committed
    x10/x30 rows) is bit-identical to the historical construction."""
    from pyspark.sql import functions as F

    rot = c % 64
    rotated = (
        F.col("embedding")
        if rot == 0
        else F.concat(
            F.slice("embedding", rot + 1, 64 - rot),
            F.slice("embedding", 1, rot),
        )
    )
    q = c // 64
    if q == 0:
        return rotated.alias("embedding")
    signed = F.transform(
        rotated,
        lambda x, i: x
        * F.when(F.pmod(F.hash(F.lit(q), i), F.lit(2)) == 0, F.lit(1.0))
        .otherwise(F.lit(-1.0))
        .cast("float"),
    )
    return signed.cast("array<float>").alias("embedding")


def build_data(spark, copies: int) -> None:
    from pyspark.sql import functions as F

    out = out_dir(copies)
    os.makedirs(out, exist_ok=True)
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
            (F.col("vec_id") + F.lit(c * OFFSET)).alias("vec_id"),
            _embedding_remap(c),
            "label",
        ),
        "lineitem": lambda df, c: df.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(c * OFFSET)
        ),
        # customer scaling (round 7, for pipe_record_linkage): the NAME must
        # track the remapped key — record_linkage's numeric-token blocking
        # keys on the digits of c_name, so copies keeping identical names
        # would collide `copies` originals per digits bucket (quadratic
        # in-bucket growth that measures the corpus construction, not the
        # operator). Copy 0 keeps the original 9-digit names; copies c>0
        # rewrite to Customer#<15-digit new key> — same prefix shape, so
        # the corruption classes (delete char 5 / '#'->'=' / append 'x')
        # behave identically.
        "customer": lambda df, c: df.select(
            (F.col("c_custkey") + F.lit(c * OFFSET)).alias("c_custkey"),
            (
                F.col("c_name")
                if c == 0
                else F.concat(
                    F.lit("Customer#"),
                    F.lpad((F.col("c_custkey") + F.lit(c * OFFSET)).cast("string"), 15, "0"),
                ).alias("c_name")
            ),
            *[f for f in df.columns if f not in ("c_custkey", "c_name")],
        ),
    }
    for tbl, remap in plans.items():
        dst = os.path.join(out, f"{tbl}.parquet")
        if os.path.exists(dst):
            continue
        base = spark.read.parquet(os.path.join(BASE, f"{tbl}.parquet"))
        scaled = None
        for c in range(copies):
            part = remap(base, c)
            scaled = part if scaled is None else scaled.unionByName(part)
        _write_single_file(scaled, dst)
        print(f"built {tbl}: {copies}x", file=sys.stderr)
    for f in glob.glob(os.path.join(BASE, "*.parquet")):
        dst = os.path.join(out, os.path.basename(f))
        if not os.path.exists(dst):
            shutil.copy(f, dst)


def bench(spark, sf_dir: str, names: list[str], copies: int = 1) -> dict[str, float]:
    from sql_query_engine_rs_spark.functions.caching import release_caches

    out = {}
    for name in names:
        times = []
        for _ in range(TRIALS):
            t0 = time.time()
            if name in SCALED_BUILDERS:
                df = SCALED_BUILDERS[name](spark, sf_dir, copies)
            else:
                df = QUERIES[name].build(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
            release_caches()
        out[name] = round(min(times[1:]), 3)
        print(f"{sf_dir.rsplit('/', 1)[-1]} {name}: {out[name]}s (trials {[round(t, 2) for t in times]})", file=sys.stderr)
    return out


def main() -> None:
    spark = get_spark("scale-rehearsal", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")
    for copies in COPIES_LIST:
        build_data(spark, copies)
    # same warmups as bench.py so all scales measure the data path
    QUERIES["v0_simple_agg"].build(spark, BASE).collect()
    results = {"sf0.1": bench(spark, BASE, HEAVY, copies=1)}
    for copies in COPIES_LIST:
        results[f"x{copies}"] = bench(spark, out_dir(copies), HEAVY, copies=copies)
    scales = list(results)
    per_query = {}
    for n in HEAVY:
        row = {s: results[s][n] for s in scales}
        # adjacent-scale ratios; the x30/x10-style ratio is the amortized
        # linearity signal (both scales carry the same fixed overhead)
        for a, b in zip(scales, scales[1:]):
            row[f"ratio_{b}/{a}"] = round(results[b][n] / results[a][n], 2) if results[a][n] > 0 else None
        per_query[n] = row
    print(
        json.dumps(
            {
                "metric": "sf1_rehearsal",
                "copies": COPIES_LIST,
                "base_sf_dir": BASE,
                "queries": per_query,
                "note": f"min-of-warm over {TRIALS} full build+execute trials per scale; "
                "vs-sf0.1 ratios are overhead-dominated (sub-copies = fixed costs amortizing); "
                "the between-rehearsal-scales ratio is the clean linearity signal "
                "(~= the copy multiple for linear ops; quadratic creep reads as its square)",
            }
        )
    )


if __name__ == "__main__":
    main()
