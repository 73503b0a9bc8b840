"""Plan-inspection helpers: assert the physical plan we *want*, not just
one that passes (pushdown reached the scan, join went broadcast, codegen
spans cover the hot path). Used by tests and by bench tuning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def _plan(df: DataFrame) -> str:
    try:
        return formatted_plan(df)
    except Exception:
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()


def has_pushed_filter(df: DataFrame, fragment: str | None = None) -> bool:
    plan = _plan(df)
    if "PushedFilters: []" in plan and fragment is None:
        return False
    if fragment:
        return any(
            "PushedFilters" in ln and fragment in ln for ln in plan.splitlines()
        )
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def is_broadcast_join(df: DataFrame) -> bool:
    plan = _plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in _plan(df)


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the scan (column pruning check)."""
    plan = _plan(df)
    cols: list[str] = []
    for ln in plan.splitlines():
        if "ReadSchema" in ln:
            inner = ln.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols.extend(p.split(":")[0].strip() for p in inner.split(",") if ":" in p)
    return cols
