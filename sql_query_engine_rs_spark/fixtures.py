"""The reference's employee fixture (tests/csv/employee.csv in the reference
tree, documented in FIXTURES.md §5), embedded so the REPL and tests can
preload it without reading the read-only reference checkout.

Schema note: the reference's Arrow CSV reader yields "" (empty string) for
empty string cells while Spark's CSV reader maps them to NULL; loading with
``empty_strings=True`` preserves the reference behavior (state='' groups and
renders as "(empty)").
"""

from __future__ import annotations

EMPLOYEE_CSV = """id,first_name,last_name,state,job_title,salary,department_id
1,Bill,Hopkins,CA,Manager,12000,1
2,Gregg,Langford,CO,Driver,10000,2
3,John,Travis,CO,"Manager, Software",11500,4
4,Von,Mill,,Defensive End,,
"""

EMPLOYEE_SCHEMA = (
    "id long, first_name string, last_name string, state string, "
    "job_title string, salary long, department_id long"
)


def load_employee(db, dir_path: str | None = None) -> str:
    """Write the embedded CSV to ``dir_path`` (or a temp dir) and register it
    as table ``employee``, mirroring the reference's main() preload
    (src/main.rs:4-14). Returns the CSV path."""
    import os
    import tempfile

    d = dir_path or tempfile.mkdtemp(prefix="employee_fixture_")
    path = os.path.join(d, "employee.csv")
    with open(path, "w") as f:
        f.write(EMPLOYEE_CSV)
    db.catalog.create_csv_table("employee", path, schema=EMPLOYEE_SCHEMA, empty_strings=True)
    return path
