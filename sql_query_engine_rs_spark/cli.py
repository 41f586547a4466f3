"""Interactive REPL — the reference's primary entry point, on Spark.

Mirrors src/cli.rs:95-135 + src/main.rs:4-14: pre-load the employee fixture,
then accept SQL statements and the ``\\dt`` / ``\\load`` meta-commands until
EOF. Errors print and the loop continues (cli.rs run_sql prints "Run Error"
rather than aborting). Rendering follows the engine's slt conventions:
NULL -> "NULL", empty string -> "(empty)" (src/util/mod.rs:27-54).

Run with ``python -m sql_query_engine_rs_spark``.
"""

from __future__ import annotations

import sys
from typing import IO

from sql_query_engine_rs_spark.errors import MetaCommandError

PROMPT = "sql> "


def render_value(v) -> str:
    if v is None:
        return "NULL"
    if v == "":
        return "(empty)"
    return str(v)


def print_result(df, out: IO[str], max_rows: int = 100) -> None:
    """Space-separated rendering with a header, capped at ``max_rows``
    (a REPL pretty-printer must never collect an unbounded result)."""
    rows = df.limit(max_rows + 1).collect()
    out.write(" ".join(df.columns) + "\n")
    for r in rows[:max_rows]:
        out.write(" ".join(render_value(v) for v in r) + "\n")
    if len(rows) > max_rows:
        out.write(f"... (output capped at {max_rows} rows)\n")


def repl(db, stdin: IO[str] | None = None, stdout: IO[str] | None = None) -> None:
    """Read-eval-print loop over ``Database``; testable via injected streams."""
    stdin = stdin if stdin is not None else sys.stdin
    stdout = stdout if stdout is not None else sys.stdout
    while True:
        stdout.write(PROMPT)
        stdout.flush()
        line = stdin.readline()
        if not line:  # EOF
            stdout.write("Exited\n")
            return
        sql = line.strip().rstrip(";")
        if not sql:
            continue
        if sql in ("exit", "quit", "\\q"):
            stdout.write("Exited\n")
            return
        try:
            print_result(db.run(sql), stdout)
        except MetaCommandError as e:
            stdout.write(f"Run Internal Err: {e}\n")
        except Exception as e:  # AnalysisException, parse errors, ...
            first = str(e).strip().splitlines()[0] if str(e).strip() else repr(e)
            stdout.write(f"Run Error: {first}\n")


def main() -> None:
    from sql_query_engine_rs_spark.database import Database
    from sql_query_engine_rs_spark.fixtures import load_employee

    db = Database()
    db.spark.sparkContext.setLogLevel("ERROR")
    load_employee(db)
    sys.stdout.write(
        "sql-query-engine-rs-spark REPL — employee table pre-loaded.\n"
        "Meta: \\dt, \\d <table>, \\load csv|parquet|json|orc <name> <path>, "
        "\\load memory <name> <schema> <json-rows>, \\explain <sql>, \\plan <sql>, "
        "\\bench <query> [trials], \\reuse <query> <query> [...]. "
        "Ctrl-D or 'exit' quits.\n"
    )
    repl(db)


if __name__ == "__main__":
    main()
