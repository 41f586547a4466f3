"""Replay the driver's correctness gate over a window of the registry.

Usage:
  python scripts/window_sim.py              # first-50 window (the driver's)
  python scripts/window_sim.py 50 100       # a slice of the registry order
  python scripts/window_sim.py names.txt    # one entry name per line

Vanilla SparkSession, sf0.01 (the driver's correctness scale), row-sorted
stringified comparison against the DuckDB oracle. Pass condition:
``DONE bad: []``.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as m

    qs, osql = m.queries(), m.oracle_sql()
    order = list(qs)
    if len(sys.argv) == 2 and os.path.exists(sys.argv[1]):
        with open(sys.argv[1]) as f:
            names = [ln.strip() for ln in f if ln.strip()]
    elif len(sys.argv) == 3:
        names = order[int(sys.argv[1]) : int(sys.argv[2])]
    else:
        names = order[:50]

    sf_dir = "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]").appName("window-sim").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    bad = []
    for i, name in enumerate(names):
        try:
            srows = sorted(
                tuple(str(x) for x in r)
                for r in qs[name](spark, sf_dir).collect()
            )
            drows = sorted(
                tuple(str(x) for x in r)
                for r in con.execute(osql[name]).fetchall()
            )
            ok = srows == drows
        except Exception as e:  # noqa: BLE001
            ok = False
            print(f"  {name}: {e!r}")
        print(f"[{i + 1}/{len(names)}] {name}: {'ok' if ok else 'BAD'}")
        if not ok:
            bad.append(name)
    spark.stop()
    print("DONE bad:", bad)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
