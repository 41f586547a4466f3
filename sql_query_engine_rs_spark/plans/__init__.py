"""Plan introspection helpers.

The reference prints an indented plan tree for every query
(dyn PlanNode::explain — src/optimizer/plan_node/mod.rs:44-53, used at
src/db.rs:72-83). Spark's equivalent is ``df.explain``; these helpers expose
the plan as a string and assert scale-critical properties (pushdown, pruning,
broadcast) in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """Plan tree as a string (instead of stdout).

    Fast path reaches through the JVM gateway (private API, stable across
    Spark 3.x/4.x but not guaranteed); on any failure it degrades to
    capturing ``df.explain()`` stdout — same text, slightly slower. All
    ``_jdf``/``_jvm`` access in this package funnels through here and
    ``plan_size_bytes`` so a Spark upgrade degrades gracefully instead of
    crashing plan tests."""
    try:
        return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)  # type: ignore[attr-defined]
    except Exception:
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode=mode)
        return buf.getvalue()


def plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's estimated size of the optimized plan's output, or None if
    the private queryExecution API is unavailable (callers fall back to a
    partition-count heuristic). Driver-side metadata only — never triggers
    a job."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())  # type: ignore[attr-defined]
    except Exception:
        return None


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of the formatted plan ('' if none)."""
    plan = explain_str(df)
    return "\n".join(line.strip() for line in plan.splitlines() if "PushedFilters" in line)


def assert_pushdown(df: DataFrame, fragment: str) -> None:
    """Raise if ``fragment`` (e.g. a column name) is not in PushedFilters."""
    pf = pushed_filters(df)
    if fragment not in pf:
        raise AssertionError(f"expected pushed filter containing {fragment!r}, got: {pf!r}")


def uses_broadcast(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple")
