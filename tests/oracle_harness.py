"""Local replica of the driver's DuckDB-oracle comparison.

Runs a catalog query via Spark and its oracle SQL via DuckDB on the
same parquet tables, then compares row count, column names, and an
order-insensitive value representation. Run the full sweep with
``python -m tests.oracle_harness [sf_dir]``.
"""

from __future__ import annotations

import math
import sys
from typing import Any

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v: Any) -> Any:
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — bit-exactness is the contract
    if hasattr(v, "isoformat"):
        return v.isoformat()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return repr(float(v))
    except Exception:
        pass
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def _canon(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def assert_driver_safe_schema(name: str, sdf) -> None:
    """Catalog-wide output-typing guard (round-4 lesson: q176 shipped a
    raw DECIMAL(38,0) column — the only one in the driver head — and it
    was the round's only hash failure despite matching locally in both
    tuned and vanilla sessions). The driver's cross-engine hasher
    normalizes decimal/float32 differently than we do, so the README
    Float-discipline rule is now ENFORCED, not advisory: no catalog
    query may emit a raw DecimalType or FloatType output column. Keep
    decimal math internal and cast to long/double/string at the end."""
    from pyspark.sql.types import DecimalType, FloatType

    offenders = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (DecimalType, FloatType))
    ]
    if offenders:
        raise AssertionError(
            f"{name} emits raw decimal/float32 output columns {offenders}; "
            "the driver hasher mangles these — cast to long/double/string "
            "at the end of the query (README Float discipline)"
        )


def compare_one(spark, con, name: str, qfn, sql: str | None, sf_dir: str) -> dict:
    sdf = qfn(spark, sf_dir)
    assert_driver_safe_schema(name, sdf)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    res: dict[str, Any] = {"name": name, "spark_rows": len(s_rows)}
    if sql is None:
        res["status"] = "rows_only"
        res["ok"] = len(s_rows) >= 0
        return res
    cur = con.execute(sql)
    d_cols = [d[0] for d in cur.description]
    d_rows = cur.fetchall()
    res["duck_rows"] = len(d_rows)
    if sorted(s_cols) != sorted(d_cols):
        res["status"] = "schema_mismatch"
        res["detail"] = f"spark={sorted(s_cols)} duck={sorted(d_cols)}"
        res["ok"] = False
        return res
    if len(s_rows) != len(d_rows):
        res["status"] = "rowcount_mismatch"
        res["ok"] = False
        return res
    cs = _canon(s_rows, s_cols)
    cd = _canon(d_rows, d_cols)
    if cs != cd:
        res["status"] = "value_mismatch"
        diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
        res["detail"] = repr(diffs)[:2000]
        res["ok"] = False
        return res
    res["status"] = "match"
    res["ok"] = True
    return res


def assert_fixture_caps(con: duckdb.DuckDBPyConnection) -> None:
    """The q78 oracle enumerates chunk positions with a FIXED
    ``range(0, 512)`` (512 chunks x 8 words = 4096 words max per doc);
    the Spark side is unbounded. If the fixture docs ever outgrow the
    cap the two would silently diverge — fail loudly here instead."""
    (max_words,) = con.execute(
        "SELECT coalesce(max(len(string_split(text, ' '))), 0) FROM documents"
    ).fetchone()
    if max_words > 512 * 8:
        raise AssertionError(
            f"documents fixture has a {max_words}-word doc; the q78 oracle's "
            "512-chunk cap (4096 words) no longer covers the data — raise the "
            "cap in SQL_PARAGRAPH_DEDUP or shrink the fixture"
        )


def run_all(sf_dir: str, only: list[str] | None = None) -> list[dict]:
    import __spark_entry__ as entrymod
    from sstable_migrator_spark.session import get_spark

    spark = get_spark(app_name="oracle_harness", shuffle_partitions=8)
    con = duck_connection(sf_dir)
    assert_fixture_caps(con)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            results.append(compare_one(spark, con, name, fn, oracles.get(name), sf_dir))
        except Exception as e:  # noqa: BLE001
            results.append(
                {"name": name, "status": "error", "ok": False, "detail": repr(e)[:2000]}
            )
    return results


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    results = run_all(sf, only)
    bad = [r for r in results if not r.get("ok")]
    for r in results:
        line = f"{r['status']:>18}  {r['name']}"
        if not r.get("ok") and r.get("detail"):
            line += f"\n    {r['detail'][:500]}"
        print(line)
    print(f"\n{len(results) - len(bad)}/{len(results)} match")
    sys.exit(1 if bad else 0)
