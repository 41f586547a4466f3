"""Property-based tests (hypothesis) for the cross-engine invariants the
whole correctness gate rests on. The reference has no property testing
(SURVEY.md §5); these go beyond parity to pin the determinism rules."""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

finite_doubles = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
)


@settings(max_examples=30, deadline=None)
@given(st.lists(finite_doubles, min_size=1, max_size=40))
def test_portable_round_matches_duckdb(spark, values):
    """floor(x*100+0.5)/100 must agree bit-for-bit between Spark and DuckDB
    for any finite double — the invariant every rounded oracle column uses."""
    from sql_query_engine_rs_spark.functions.expressions import portable_round

    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "i long, v double")
    got = {
        r.i: r.r for r in df.select("i", portable_round(F.col("v"), 2).alias("r")).collect()
    }
    con = duckdb.connect()
    rows = ", ".join(f"({i}, {v!r}::DOUBLE)" for i, v in enumerate(values))
    want = dict(
        con.execute(
            f"SELECT i, FLOOR(v * 100 + 0.5) / 100 FROM (VALUES {rows}) t(i, v)"
        ).fetchall()
    )
    for i in got:
        g, w = got[i], want[i]
        assert (g == w) or (math.isnan(g) and math.isnan(w)), (values[i], g, w)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.text(alphabet="ab ", min_size=0, max_size=30), min_size=2, max_size=6)
)
@pytest.mark.slow  # heavyweight sweep; round-end full validation runs it (SPARK_GRAFT_FULL_TESTS=1)
def test_jaccard_bounds_and_symmetry(spark, texts):
    """0 <= jaccard <= 1; j(a,a)=1 for non-empty shingle sets; symmetric."""
    from sql_query_engine_rs_spark.functions.dedup import jaccard, token_ngrams

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    g = df.select("id", token_ngrams(F.col("text"), 1).alias("g"))
    a, b = g.alias("a"), g.alias("b")
    rows = (
        a.crossJoin(b)
        .select(
            F.col("a.id").alias("ia"),
            F.col("b.id").alias("ib"),
            jaccard(F.col("a.g"), F.col("b.g")).alias("j"),
            F.size(F.col("a.g")).alias("na"),
        )
        .collect()
    )
    j = {(r.ia, r.ib): r.j for r in rows}
    sizes = {r.ia: r.na for r in rows}
    for (ia, ib), v in j.items():
        assert 0.0 <= v <= 1.0
        assert j[(ib, ia)] == v  # symmetric
        if ia == ib and sizes[ia] > 0:
            assert v == 1.0


def test_fingerprint_whitespace_case_invariance(spark):
    """The fingerprint must be invariant under case and whitespace runs —
    its whole purpose."""
    from sql_query_engine_rs_spark.functions.text import fingerprint

    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "  HELLO\tWORLD  "), (4, "helloworld")],
        "id long, text string",
    )
    fps = {r.id: r.fp for r in df.select("id", fingerprint(F.col("text")).alias("fp")).collect()}
    assert fps[1] == fps[2] == fps[3]
    assert fps[4] != fps[1]


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.text(alphabet="abc", min_size=1, max_size=4), min_size=0, max_size=12),
    st.integers(min_value=1, max_value=4),
)
@pytest.mark.slow  # heavyweight sweep; round-end full validation runs it (SPARK_GRAFT_FULL_TESTS=1)
def test_shingles_from_tokens_matches_reference(spark, toks, n):
    """The zip_with shingle construction must equal the naive definition:
    distinct space-joined n-grams of the token sequence, [] when len < n."""
    from sql_query_engine_rs_spark.functions.dedup import shingles_from_tokens

    df = spark.createDataFrame([(1, toks)], "id long, toks array<string>")
    got = df.select(shingles_from_tokens(F.col("toks"), n).alias("g")).first().g
    want = list(dict.fromkeys(
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    ))
    assert sorted(got) == sorted(want), (toks, n, got, want)


@settings(max_examples=20, deadline=None)
@given(st.binary(min_size=0, max_size=4000), st.integers(min_value=1, max_value=2000))
def test_frame_sample_stub_invariants(spark, payload, every_ms):
    """Stub frame demux invariants for any payload: frame count is
    max(1, min(len//every_ms, 32)); indices are dense from 0; timestamps are
    idx*every_ms; every frame carries at least one byte."""
    from sql_query_engine_rs_spark.functions.multimodal import frame_sample

    df = spark.createDataFrame([(1, bytearray(payload))], "item_id long, payload binary")
    rows = sorted(frame_sample(df, every_ms=every_ms).collect(), key=lambda r: r.frame_idx)
    want_n = max(1, min(len(payload) // every_ms, 32))
    assert len(rows) == want_n
    assert [r.frame_idx for r in rows] == list(range(want_n))
    assert all(r.frame_ts_ms == r.frame_idx * every_ms for r in rows)
    assert all(len(r.frame_payload) >= 1 for r in rows)


def test_token_histogram_partitions_corpus(spark, sf_dir):
    """Histogram buckets must partition the corpus exactly: doc counts sum
    to the table count, per-bucket min/max stay inside the bucket's log2
    range, and totals sum to the corpus token count."""
    from sql_query_engine_rs_spark.queries import QUERIES, docs_parallel, t as _t

    rows = QUERIES["pipe_token_histogram"].build(spark, sf_dir).collect()
    n_docs = _t(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        lo, hi = 2 ** (r.bucket - 1), 2**r.bucket - 1
        assert max(r.min_tok, 1) >= lo and max(r.max_tok, 1) <= hi


def test_unigram_logprob_nonnegative_and_bounded(spark, sf_dir):
    """-ln p is nonnegative and bounded by ln(total corpus tokens); every
    probe doc with tokens appears exactly once."""
    import math

    from sql_query_engine_rs_spark.queries import QUERIES

    rows = QUERIES["pipe_unigram_logprob"].build(spark, sf_dir).collect()
    assert len(rows) == len({r.doc_id for r in rows})
    total = sum(r.n_tok for r in rows)
    for r in rows:
        assert 0.0 <= r.avg_neg_logprob
        # loosest bound: a token seen once in the whole corpus
        assert r.avg_neg_logprob <= math.log(max(total, 2)) + 20


def test_bradley_terry_invariants(spark, sf_dir):
    """BT strengths are a probability-style vector: positive, ~sum to 1
    (each component 10-dp pinned, so the sum sits within 4e-10 + the 6-dp
    output floor), and ordered consistently with win share when the
    design is near-balanced."""
    from sql_query_engine_rs_spark.queries import QUERIES

    rows = QUERIES["pipe_bradley_terry"].build(spark, sf_dir).collect()
    assert len(rows) == 4
    total = sum(r.strength for r in rows)
    assert abs(total - 1.0) < 1e-4
    assert all(r.strength > 0 for r in rows)
    assert all(0 <= r.wins <= r.comparisons for r in rows)
    # the arm with the highest win RATE must carry the highest strength
    best_rate = max(rows, key=lambda r: (r.wins / r.comparisons, r.source))
    best_strength = max(rows, key=lambda r: (r.strength, r.source))
    assert best_rate.source == best_strength.source


def test_fleiss_kappa_bounds(spark, sf_dir):
    """Fleiss' kappa lies in [-1, 1]; P̄ and P_e are proportions."""
    from sql_query_engine_rs_spark.queries import QUERIES

    row = QUERIES["pipe_fleiss_kappa"].build(spark, sf_dir).collect()[0]
    assert 0.0 <= row.p_bar <= 1.0 and 0.0 <= row.p_e < 1.0
    assert -1.0 <= row.kappa <= 1.0


def test_sinkhorn_plan_mass_and_cost(spark, sf_dir):
    """The Sinkhorn plan's total mass must approach 1 (marginal fitting)
    and the transport cost is bounded by the maximum bin distance."""
    from sql_query_engine_rs_spark.queries import QUERIES

    row = QUERIES["pipe_sinkhorn_ot"].build(spark, sf_dir).collect()[0]
    assert abs(row.plan_mass - 1.0) < 0.05
    assert 0.0 <= row.ot_cost <= 7.0 * row.plan_mass + 1e-9


def test_token_budget_mix_weights_sum(spark, sf_dir):
    """Mixture weights sum to ~1 and sqrt-temperature orders epochs
    inversely to source size (smaller source -> more epochs)."""
    from sql_query_engine_rs_spark.queries import QUERIES

    rows = QUERIES["pipe_token_budget_mix"].build(spark, sf_dir).collect()
    assert abs(sum(r.mix_weight for r in rows) - 1.0) < 1e-4
    by_size = sorted(rows, key=lambda r: r.n_tokens)
    epochs = [r.epochs for r in by_size]
    assert epochs == sorted(epochs, reverse=True)


def test_quantile_normalize_equalizes_means(spark, sf_dir):
    """After quantile normalization all equal-sized sources share one
    score multiset: mean_after must be a single value across sources."""
    from sql_query_engine_rs_spark.queries import QUERIES

    rows = QUERIES["pipe_quantile_normalize"].build(spark, sf_dir).collect()
    if len({r.n for r in rows}) == 1:  # equal-sized sources (the fixture)
        assert len({r.mean_after for r in rows}) == 1


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=60
    ),
    st.integers(min_value=2, max_value=12),
    st.booleans(),
    st.integers(min_value=2, max_value=7),
)
@pytest.mark.slow  # heavyweight sweep; round-end full validation runs it (SPARK_GRAFT_FULL_TESTS=1)
def test_bucketed_ntile_matches_global_ntile(spark, keys, k, desc, nb):
    """The two-level exact ntile (queries._bucketed_ntile) must equal
    F.ntile(k) over the same total order for ANY key multiset (heavy
    ties, negative domains, single-value domains), any tile count, both
    directions, and ANY bucket count — including nb far below the
    default 256, where many keys collapse into few buckets and every
    cross-bucket offset seam is exercised."""
    from pyspark.sql import Window

    from sql_query_engine_rs_spark.queries import _bucketed_ntile

    rows = [(i, v) for i, v in enumerate(keys)]
    df = spark.createDataFrame(rows, "id long, v long")
    order = [F.col("v").desc() if desc else F.col("v").asc(), F.col("id")]
    want = {
        r.id: r.t
        for r in df.select(
            "id", F.ntile(k).over(Window.orderBy(*order)).alias("t")
        ).collect()
    }
    got = {
        r.id: r.t
        for r in _bucketed_ntile(df, k, [("v", desc), "id"], nb=nb)
        .select("id", F.col("_tile").cast("int").alias("t"))
        .collect()
    }
    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-30, max_value=30),
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=2, max_value=6),
)
@pytest.mark.slow  # heavyweight sweep; round-end full validation runs it (SPARK_GRAFT_FULL_TESTS=1)
def test_bucketed_running_sums_match_global_window(spark, rows, nb):
    """The two-level running sums + seam lead (queries.
    _bucketed_running_sums) must equal the single global-order window
    they replaced for ANY distinct-value frame and ANY bucket count —
    the bit-identity the seven converted order-statistic oracles rest
    on. Counts are integer-valued doubles, so equality is exact, and
    the lead must cross empty-bucket seams to the next non-empty
    bucket's min."""
    from pyspark.sql import Window

    from sql_query_engine_rs_spark.queries import _bucketed_running_sums

    df = spark.createDataFrame(
        [(v, float(c1), float(c2)) for v, c1, c2 in rows],
        "v long, c1 double, c2 double",
    )
    run = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r.v: (r.s1, r.s2, r.nx)
        for r in df.select(
            "v",
            F.sum("c1").over(run).alias("s1"),
            F.sum("c2").over(run).alias("s2"),
            F.lead("v").over(Window.orderBy("v")).alias("nx"),
        ).collect()
    }
    got = {
        r.v: (r._cum_c1, r._cum_c2, r._lead_v)
        for r in _bucketed_running_sums(df, "v", ["c1", "c2"], nb=nb, with_lead=True)
        .select("v", "_cum_c1", "_cum_c2", "_lead_v")
        .collect()
    }
    assert got == want


@settings(max_examples=12, deadline=None)
@given(
    st.sets(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=60),
    st.integers(min_value=1, max_value=70),
)
def test_ivf_seed_rank_matches_python_md5_order(spark, ids, k):
    """similarity._ivf_seed_rank must reproduce the md5-order rank an
    INDEPENDENT implementation computes (Python hashlib over str(int)) —
    for any unique id set and any k, including k past the corpus size.
    This is the distributed seed rank's ground-truth contract: Spark's
    md5(cast(id as string)) == hashlib.md5(str(int(id)))."""
    import hashlib

    from sql_query_engine_rs_spark.functions.similarity import _ivf_seed_rank

    ids = sorted(ids)
    df = spark.createDataFrame([(i,) for i in ids], "vec_id long")
    got = {
        (r.centroid_id, r.vec_id)
        for r in _ivf_seed_rank(df, k, id_col="vec_id").collect()
    }
    ordered = sorted(ids, key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    want = {(rank, i) for rank, i in enumerate(ordered[:k])}
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**31 - 1),
    st.lists(st.integers(min_value=2, max_value=7), min_size=1, max_size=2),
    st.integers(min_value=2, max_value=5),
)
@pytest.mark.slow  # heavyweight sweep; round-end full validation runs it (SPARK_GRAFT_FULL_TESTS=1)
def test_knn_clone_collapse_matches_direct_property(spark, seed, clone_sizes, k):
    """Randomized twin of the fixed clone-collapse pin: for any random
    corpus + planted clone groups (sizes straddling k+1) + k, the collapse
    path (trigger forced to 0) is bit-identical to the direct all-member
    self-join."""
    import numpy as np

    import sql_query_engine_rs_spark.functions.similarity as S

    rng = np.random.RandomState(seed % (2**31))
    base = rng.uniform(-1, 1, size=(14, 64))
    rows = [(i, base[i].tolist()) for i in range(14)]
    nxt = 100
    for c in clone_sizes:
        src = base[int(rng.randint(0, 14))].tolist()
        for _ in range(c):
            rows.append((nxt, list(src)))
            nxt += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def canon(recs):
        import math
        return {
            (r.src_id, r.nbr_id,
             "nan" if (r.cos_sim is not None and math.isnan(r.cos_sim)) else r.cos_sim,
             r.rank)
            for r in recs
        }

    want = canon(S._knn_graph_direct(df, k=k, num_planes=2).collect())
    old = S.KNN_CLONE_COLLAPSE_TRIGGER
    S.KNN_CLONE_COLLAPSE_TRIGGER = 0
    try:
        got = canon(S.knn_graph(df, k=k, num_planes=2).collect())
    finally:
        S.KNN_CLONE_COLLAPSE_TRIGGER = old
    assert got == want, sorted(got ^ want)[:8]


def test_bucketed_ntile_extreme_long_domain_no_overflow(spark):
    """Long keys spanning ~2^63 used to overflow _range_bucket's native
    (v-mn)*nb arithmetic (r9 ADVICE) — throwing under ANSI sessions,
    silently mis-bucketing otherwise. The double-cast form must bucket
    monotonically and still match F.ntile exactly on an extreme-domain
    multiset (ties at both extremes included)."""
    from pyspark.sql import Window

    from sql_query_engine_rs_spark.queries import _bucketed_ntile

    keys = [
        -(2**62), -(2**62), -(2**61), -12345, -1, 0, 0, 1, 7, 10**12,
        2**61, 2**62 - 3, 2**62 - 1, 2**62 - 1,
    ]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(keys)], "id long, v long")
    for k in (2, 4, 5):
        got = {
            r.id: r._tile
            for r in _bucketed_ntile(df, k, [("v", False), "id"]).collect()
        }
        want = {
            r.id: r.t
            for r in df.withColumn(
                "t", F.ntile(k).over(Window.orderBy(F.col("v").asc(), F.col("id")))
            ).collect()
        }
        assert got == want, (k, got, want)
