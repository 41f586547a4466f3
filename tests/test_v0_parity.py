"""v0 query-surface parity: the reference's sqllogictest corpus
(tests/slt/select.slt, filter.slt, aggregation.slt) replayed over the
employee fixture (FIXTURES.md), with the reference's rendering rules
(NULL -> "NULL", empty string -> "(empty)", space-separated columns —
src/util/mod.rs:27-54) and order-insensitive comparison for grouped
queries (reference order is first-appearance, hash_agg.rs:95,124).

The employee CSV is loaded with the explicit schema from FIXTURES.md §5 and
empty string cells preserved (Spark's CSV reader maps unquoted empties to
NULL by default; the reference's Arrow reader yields "" for strings)."""

from __future__ import annotations

import pytest

from sql_query_engine_rs_spark.database import Database
from sql_query_engine_rs_spark.fixtures import EMPLOYEE_CSV, EMPLOYEE_SCHEMA


def render(rows) -> list[str]:
    """Reference slt rendering (src/util/mod.rs:27-54)."""
    out = []
    for row in rows:
        cells = []
        for v in row:
            if v is None:
                cells.append("NULL")
            elif v == "":
                cells.append("(empty)")
            else:
                cells.append(str(v))
        out.append(" ".join(cells))
    return out


@pytest.fixture(scope="module")
def db(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("csv") / "employee.csv"
    path.write_text(EMPLOYEE_CSV)
    d = Database(spark)
    # empty_strings=True: state='' stays a string (reference Arrow behavior);
    # numeric empties still parse as NULL (FIXTURES.md §5).
    d.catalog.create_csv_table("employee", str(path), schema=EMPLOYEE_SCHEMA, empty_strings=True)
    return d


# --- tests/slt/select.slt
def test_slt_select(db):
    got = render(db.run_collect("select first_name from employee where id > 2"))
    assert got == ["John", "Von"]


# --- tests/slt/filter.slt
def test_slt_filter(db):
    got = render(db.run_collect("select first_name, state, id, salary from employee where id > 1"))
    assert got == ["Gregg CO 2 10000", "John CO 3 11500", "Von (empty) 4 NULL"]


# --- tests/slt/aggregation.slt
def test_slt_global_sum(db):
    assert render(db.run_collect("select sum(salary) from employee")) == ["33500"]


def test_slt_agg_exprs_with_filter(db):
    got = render(
        db.run_collect(
            "select sum(salary), sum(id+1), count(id), count(salary) from employee where id > 1"
        )
    )
    assert got == ["21500 12 3 2"]


def test_slt_min_max_string(db):
    got = render(db.run_collect("select max(salary), min(id), max(last_name) from employee"))
    assert got == ["12000 1 Travis"]


def test_slt_group_by_salary_null_group(db):
    """A group whose agg input is all-NULL: count(id)=1, sum/max/min=NULL
    (reference golden tests/slt/aggregation.slt:16-22)."""
    got = render(
        db.run_collect(
            "select salary, count(id), sum(salary), max(salary), min(salary) "
            "from employee group by salary"
        )
    )
    assert sorted(got) == sorted(
        [
            "12000 1 12000 12000 12000",
            "10000 1 10000 10000 10000",
            "11500 1 11500 11500 11500",
            "NULL 1 NULL NULL NULL",
        ]
    )


def test_slt_group_by_state_empty_string_group(db):
    """state='' groups separately from NULL and renders (empty)
    (reference golden tests/slt/aggregation.slt:24-30)."""
    got = render(
        db.run_collect(
            "select state, count(state), sum(salary), max(salary), min(salary) "
            "from employee group by state"
        )
    )
    assert sorted(got) == sorted(
        [
            "CA 1 12000 12000 12000",
            "CO 2 21500 11500 10000",
            "(empty) 1 NULL NULL NULL",
        ]
    )


def test_slt_group_by_multi_key(db):
    got = render(
        db.run_collect(
            "select state, id, count(state), sum(salary), max(salary), min(salary) "
            "from employee group by state, id"
        )
    )
    assert sorted(got) == sorted(
        [
            "CA 1 1 12000 12000 12000",
            "CO 2 1 10000 10000 10000",
            "CO 3 1 11500 11500 11500",
            "(empty) 4 1 NULL NULL NULL",
        ]
    )


# --- reference README example (README.md:17)
def test_readme_query(db):
    assert render(db.run_collect("select first_name from employee where last_name = 'Hopkins'")) == ["Bill"]


# --- select * expansion (src/binder/statement/mod.rs:45-48)
def test_select_star(db):
    rows = db.run_collect("select * from employee")
    assert len(rows) == 4 and len(rows[0]) == 7


# --- arithmetic + implicit widening (src/binder/expression/binary_op.rs:27-63)
def test_projection_arithmetic(db):
    got = render(db.run_collect("select id + 1, salary / 2 from employee where id = 1"))
    assert got == ["2 6000.0"]


# --- \dt meta command shape (src/storage/csv.rs:65-85)
def test_show_tables(db):
    rows = db.run("\\dt").collect()
    assert ("employee", "id, first_name, last_name, state, job_title, salary, department_id") in [
        tuple(r) for r in rows
    ]


def test_load_parquet_meta(db, spark):
    df = db.run("\\load parquet li_meta /root/testdata/sf0.001/lineitem.parquet")
    names = [r.table_name for r in df.collect()]
    assert "li_meta" in names
    assert db.run_collect("select count(*) as n from li_meta")[0].n == 6000


def test_load_json_meta(db, spark, tmp_path):
    p = str(tmp_path / "docs.jsonl")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20).write.mode(
        "overwrite"
    ).json(p)
    df = db.run("\\load json jdocs " + p)
    assert "jdocs" in [r.table_name for r in df.collect()]
    assert db.run_collect("select count(*) as n from jdocs")[0].n == 20


def test_explain_meta(db):
    rows = db.run("\\explain select sum(salary) as s from employee where id > 1").collect()
    plan = rows[0].plan
    assert "HashAggregate" in plan or "SortAggregate" in plan
    # quoted literal must survive the raw-tail parse (shlex would reject it)
    rows2 = db.run("\\explain select * from employee where first_name = 'alice'").collect()
    assert "employee" in rows2[0].plan.lower() or "Scan" in rows2[0].plan


def test_explain_meta_errors(db):
    import pytest as _pytest
    from sql_query_engine_rs_spark.errors import MetaCommandError

    with _pytest.raises(MetaCommandError):
        db.run("\\explain")
    with _pytest.raises(MetaCommandError):
        db.run("\\")
