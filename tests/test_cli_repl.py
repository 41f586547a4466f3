"""Scripted REPL session (reference: src/cli.rs interactive loop): feed a
stdin script, assert the rendered output — SQL, meta-commands, error
recovery, EOF exit."""

from __future__ import annotations

import io

import pytest

from sql_query_engine_rs_spark.cli import repl
from sql_query_engine_rs_spark.database import Database
from sql_query_engine_rs_spark.fixtures import load_employee


@pytest.fixture(scope="module")
def db(spark):
    d = Database(spark)
    load_employee(d)
    return d


def run_script(db, script: str) -> str:
    out = io.StringIO()
    repl(db, stdin=io.StringIO(script), stdout=out)
    return out.getvalue()


def test_repl_scripted_session(db):
    script = (
        "select sum(salary), count(id) from employee;\n"
        "select first_name from employee where id > 2\n"
        "\\dt\n"
        "\\load parquet li_repl /root/testdata/sf0.001/lineitem.parquet\n"
        "select count(*) as n from li_repl\n"
    )
    out = run_script(db, script)
    assert "33500 4" in out              # aggregation golden (slt corpus)
    assert "John" in out and "Von" in out  # filter golden
    assert "employee" in out             # \dt lists the fixture
    assert "li_repl" in out              # \load registers + shows tables
    assert "6000" in out                 # count over loaded parquet
    assert out.strip().endswith("Exited")


def test_repl_load_orc(db, spark, tmp_path):
    """\\load orc: write an ORC copy of a testdata table, load it through
    the REPL, and query it — the Hive-ecosystem columnar source."""
    path = str(tmp_path / "region_orc")
    spark.read.parquet("/root/testdata/sf0.001/region.parquet").write.orc(path)
    out = run_script(db, f"\\load orc region_orc {path}\nselect count(*) as n from region_orc\n")
    assert "region_orc" in out
    assert "5" in out


def test_repl_load_memory(db):
    """\\load memory: inline JSON fixtures without touching disk — the
    fastest way to probe a query shape in the REPL."""
    out = run_script(
        db,
        "\\load memory mt 'a int, b string' '[[1, \"x\"], [2, \"y\"], [3, \"x\"]]'\n"
        "select b, count(*) as n from mt group by b order by b\n",
    )
    assert "mt" in out
    assert "x 2" in out and "y 1" in out


def test_repl_load_memory_errors(db):
    from sql_query_engine_rs_spark.errors import MetaCommandError

    import pytest

    with pytest.raises(MetaCommandError):
        db.run("\\load memory only_name")
    with pytest.raises(MetaCommandError):
        db.run("\\load memory t 'a int' 'not json'")
    with pytest.raises(MetaCommandError):
        db.run("\\load memory t 'a int' '{\"not\": \"rows\"}'")


def test_repl_error_recovery(db):
    """Errors print and the loop continues (cli.rs run_sql behavior)."""
    out = run_script(db, "select * from no_such_table\n\\bogus\nselect 1 as one\n")
    assert "Run Error:" in out
    assert "Run Internal Err:" in out or "Run Error:" in out
    assert "one\n1" in out.replace("sql> ", "")


def test_repl_null_and_empty_rendering(db):
    out = run_script(db, "select state, salary from employee where id = 4\n")
    assert "(empty) NULL" in out


def test_repl_exit_command(db):
    out = run_script(db, "exit\nselect 1\n")
    assert out.count("sql>") == 1 and "Exited" in out


def test_bench_meta_command(db, monkeypatch, sf_dir):
    """\\bench runs a registered query with the min-of-warm method and
    renders one row; bad inputs get usage errors, not tracebacks."""
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", sf_dir)
    out = run_script(db, "\\bench v0_simple_agg 2\n")
    assert "query sf_dir trials cold_sec steady_sec" in out
    assert "v0_simple_agg" in out and "Run Error" not in out
    assert "unknown query" in run_script(db, "\\bench nope_not_registered\n")
    assert "usage" in run_script(db, "\\bench\n")
    assert "trials must be" in run_script(db, "\\bench v0_simple_agg 1\n")


def test_tracked_caches_scope(spark):
    """The context manager releases only caches registered inside it."""
    from sql_query_engine_rs_spark.functions.caching import (
        _LIVE_CACHES,
        persist_tracked,
        release_caches,
        tracked_caches,
    )

    release_caches()
    outer = persist_tracked(spark.range(10))
    outer.count()
    with tracked_caches():
        inner = persist_tracked(spark.range(20))
        inner.count()
        assert inner.storageLevel.useMemory
    assert not inner.storageLevel.useMemory, "inner cache survived its scope"
    assert outer.storageLevel.useMemory, "outer cache wrongly released"
    assert len(_LIVE_CACHES) == 1
    release_caches()


def test_plan_meta_command(db):
    rows = db.run_collect("\\plan select department_id, sum(salary) from employee group by department_id")
    assert len(rows) == 1
    r = rows[0]
    assert r.exchanges >= 1 and r.scans >= 1


def test_plan_meta_command_usage_error(db):
    import pytest

    from sql_query_engine_rs_spark.errors import MetaCommandError

    with pytest.raises(MetaCommandError):
        db.run("\\plan")


def test_reuse_meta_command(db, monkeypatch, sf_dir):
    """\\reuse reports cross-query common subplans (SparkCruise-style) for
    registered queries; bad inputs get usage errors, not tracebacks."""
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", sf_dir)
    out = run_script(db, "\\reuse pipe_token_count pipe_token_histogram\n")
    assert "fingerprint weight n_queries queries node" in out
    assert "pipe_token_count" in out and "Run Error" not in out
    assert "usage" in run_script(db, "\\reuse pipe_token_count\n")
    assert "unknown queries" in run_script(db, "\\reuse nope1 nope2\n")
    # stream_* entries are rejected: \reuse presents as a pure report, but
    # building a streaming entry executes its drain (side effects)
    assert "does not accept streaming" in run_script(
        db, "\\reuse pipe_token_count stream_sliding_windows\n"
    )


def test_describe_meta_command(db):
    """\\d <table> renders per-column name/type/nullability; unknown tables
    and bad arity get catalog/usage errors, not tracebacks."""
    out = run_script(db, "\\d employee\n")
    assert "column type nullable" in out and "Run Error" not in out
    assert "salary" in out
    assert "table not found" in run_script(db, "\\d nope\n")
    assert "usage" in run_script(db, "\\d\n")
