"""``python -m sql_query_engine_rs_spark`` — interactive REPL entry point
(the reference's src/main.rs)."""

from sql_query_engine_rs_spark.cli import main

main()
