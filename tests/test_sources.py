"""Sources & sinks: read/write round-trips (the reference has NO sinks —
results only reach its CLI printer, src/cli.rs:104-106), partitioned writes
that enable partition pruning, and the in-memory table path."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sql_query_engine_rs_spark.catalog import Catalog
from sql_query_engine_rs_spark.sources import read, write


@pytest.fixture()
def sample(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)], "id long, k string, v double"
    )


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_write_read_roundtrip(spark, sample, tmp_path, fmt):
    path = str(tmp_path / f"out_{fmt}")
    write(sample, fmt, path)
    back = read(spark, fmt, path, schema="id long, k string, v double")
    assert sorted(tuple(r) for r in back.collect()) == sorted(tuple(r) for r in sample.collect())


def test_partitioned_write_prunes(spark, sample, tmp_path):
    """Hive-style partitioning: a filter on the partition column must prune
    directories (PartitionFilters), not scan-and-discard."""
    path = str(tmp_path / "part")
    write(sample, "parquet", path, partition_by=["k"])
    assert sorted(os.listdir(path + "/k=a")) != []  # directory layout exists
    back = read(spark, "parquet", path).filter(F.col("k") == "a")
    plan = back._sc._jvm.PythonSQLUtils.explainString(back._jdf.queryExecution(), "formatted")
    assert "PartitionFilters: [" in plan and "k" in plan.split("PartitionFilters")[1][:80]
    assert back.count() == 2


def test_memory_table_scan(spark):
    """In-memory scan (reference: src/storage/memory.rs:138-162)."""
    cat = Catalog(spark)
    cat.create_memory_table("mem_t", [(1, "x"), (2, "y")], "id long, name string")
    got = spark.sql("select name from mem_t where id = 2").collect()
    assert [r.name for r in got] == ["y"]
    # empty table -> empty result, schema preserved (memory.rs:174-190)
    cat.create_memory_table("mem_empty", [], "id long, name string")
    assert spark.sql("select * from mem_empty").collect() == []


def test_stateful_running_totals_stream(spark, tmp_path):
    """applyInPandasWithState: per-key running totals on a real stream."""
    from sql_query_engine_rs_spark.streaming import running_totals_stateful

    src_dir = str(tmp_path / "events_src")
    df = spark.createDataFrame(
        [(1, 10, 1.0), (2, 10, 2.0), (3, 20, 5.0)], "event_id long, user_id long, value double"
    )
    df.write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(df.schema).parquet(src_dir)
    out = running_totals_stateful(stream, key_col="user_id")
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("state_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.user_id: (r.n_events, r.total) for r in spark.table("state_sink").collect()}
    assert rows == {10: (2, 3.0), 20: (1, 5.0)}
    # batch twin: same schema, same totals
    batch = running_totals_stateful(df, key_col="user_id")
    brows = {r.user_id: (r.n_events, r.total) for r in batch.collect()}
    assert brows == rows


def test_compact_small_files(spark, tmp_path):
    from sql_query_engine_rs_spark.sources import compact

    src = str(tmp_path / "shattered")
    out = str(tmp_path / "compacted")
    df = spark.range(10000).selectExpr("id", "id % 7 AS k", "md5(CAST(id AS STRING)) AS payload")
    df.repartition(64).write.parquet(src)   # 64 tiny files
    n_files = compact(spark, src, out, target_mb=512)
    assert n_files < 8
    assert spark.read.parquet(out).count() == 10000


def test_compact_range_clustering_prunes(spark, tmp_path):
    """Range-clustered output: each file covers a narrow id range, so the
    min/max stats make a point filter touch ~1 row group."""
    from sql_query_engine_rs_spark.sources import compact

    src = str(tmp_path / "src2")
    out = str(tmp_path / "out2")
    spark.range(20000).selectExpr("id", "md5(CAST(id AS STRING)) AS payload") \
        .repartition(32).write.parquet(src)
    compact(spark, src, out, target_mb=1, sort_cols=["id"])
    got = spark.read.parquet(out)
    assert got.filter("id = 12345").count() == 1
    assert got.count() == 20000


def test_csv_malformed_row_handling(spark, tmp_path):
    """Ingest hardening for dirty CSV — the 100 TB contract is that one bad
    row degrades, not fails: PERMISSIVE mode captures the raw line in the
    corrupt-record column (good rows keep parsing), DROPMALFORMED removes
    it, and the default never throws."""
    p = tmp_path / "dirty.csv"
    p.write_text(
        "id,qty,price\n"
        "1,5,9.99\n"
        "2,not_a_number,1.50\n"   # type error in qty
        "3,7,2.25\n"
    )
    schema = "id long, qty long, price double, _corrupt string"
    permissive = (
        spark.read.schema(schema)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(str(p))
    )
    rows = {r.id: r for r in permissive.collect()}
    assert rows[1].qty == 5 and rows[3].qty == 7
    bad = [r for r in rows.values() if r._corrupt is not None]
    assert len(bad) == 1 and "not_a_number" in bad[0]._corrupt
    assert bad[0].qty is None  # failed field NULLed, row retained

    dropped = (
        spark.read.schema("id long, qty long, price double")
        .option("header", "true")
        .option("mode", "DROPMALFORMED")
        .csv(str(p))
    )
    assert sorted(r.id for r in dropped.collect()) == [1, 3]


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema evolution on read: a column added mid-corpus must surface for
    new files and read NULL for old ones under mergeSchema — the additive-
    evolution contract a long-lived 100 TB table relies on (without
    mergeSchema, whichever file Spark samples first dictates the schema
    and late columns silently vanish)."""
    base = str(tmp_path / "tbl")
    spark.createDataFrame([(1, "a")], "id long, a string").write.parquet(base + "/p=1")
    spark.createDataFrame([(2, "b", 9.5)], "id long, a string, score double").write.parquet(
        base + "/p=2"
    )
    merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert "score" in merged.columns
    rows = {r.id: r for r in merged.collect()}
    assert rows[1].score is None and rows[2].score == 9.5
