"""File-level zone-map data skipping: min/max manifests + pruned scans.

The missing layer between ``zorder_write`` (which makes every file
cover a narrow range of each layout column) and the reader: at 100 TB
a table is hundreds of thousands of parquet files, and parquet footer
min/max stats only help AFTER every footer has been opened. The
table formats (Delta/Iceberg) therefore hoist per-file column stats
into the table manifest so planning prunes files without touching
storage. This module is that mechanism, dependency-free:

- ``zonemap_write``: range-layout the data (repartitionByRange +
  sortWithinPartitions on the leading stats column — or feed it
  z-ordered input), write parquet, then collect per-FILE min/max/
  null-count for the stats columns in ONE distributed pass
  (``input_file_name`` groupBy — O(files) driver rows, never data
  rows) and publish ``_zonemap.json``.
- ``zonemap_prune``: evaluate a conjunction of simple predicates
  against the manifest intervals; a file is skipped only when its
  [min, max] provably cannot satisfy the predicate (all-null files
  are skipped for null-rejecting comparisons). Correct-by-
  construction: never skips a file that could hold a match.
- ``zonemap_read``: read exactly the surviving files (empty-result
  predicate -> empty DataFrame with the manifest schema, no scan).

Scale shape: stats collection is one extra map pass over freshly
written data (what Delta's dataSkippingNumIndexedCols does); the
manifest is O(files x stats_cols) JSON — at extreme file counts it
shards the same way Iceberg splits manifests, which changes storage,
not the pruning logic. Pruning itself is driver-side O(files) integer
comparisons, zero cluster work for the planning step.
"""

from __future__ import annotations

import datetime
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["collect_file_stats", "zonemap_write", "zonemap_prune", "zonemap_read"]

_MANIFEST = "_zonemap.json"

_OPS = ("<", "<=", "=", ">", ">=", "between")


def _to_plain(v):
    """JSON-safe stat value; dates/timestamps become ISO strings whose
    lexicographic order equals their temporal order."""
    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    return v


def zonemap_write(
    df: DataFrame,
    path: str,
    stats_cols: list[str],
    n_files: int = 8,
    order_by: str | None = None,
    mode: str = "overwrite",
) -> dict:
    """Write ``df`` range-laid-out on ``order_by`` (default: the first
    stats column) and publish the per-file zone map. Returns the
    manifest dict."""
    if not stats_cols:
        raise ValueError("stats_cols must name at least one column")
    for c in stats_cols:
        if c not in df.columns:
            raise ValueError(f"stats column {c!r} not in DataFrame")
    lead = order_by or stats_cols[0]
    (
        df.repartitionByRange(n_files, F.col(lead))
        .sortWithinPartitions(lead)
        .write.mode(mode)
        .parquet(path)
    )
    spark = df.sparkSession
    written = spark.read.parquet(path)
    files = collect_file_stats(written, stats_cols, root=path)
    manifest = {
        "stats_cols": stats_cols,
        "schema": json.loads(written.schema.json()),
        "files": files,
    }
    with open(os.path.join(path, _MANIFEST), "w") as fh:
        json.dump(manifest, fh)
    return manifest


def _relativize(uri: str, root: str) -> str:
    """Store file paths RELATIVE to the table root so manifests survive
    a directory move/copy (the reason versioned manifests keep relative
    dirs); absolute input_file_name URIs would break — or silently read
    a stale location — after relocation."""
    from urllib.parse import unquote, urlparse

    p = unquote(urlparse(uri).path) if "://" in uri else uri
    root_abs = os.path.abspath(root)
    if p.startswith(root_abs + os.sep):
        return os.path.relpath(p, root_abs)
    return p  # outside the root: keep as-is (never silently wrong)


def validate_predicates(predicates: list[tuple]) -> None:
    for _, op, _v in predicates:
        if op not in _OPS:
            raise ValueError(f"op {op!r}: supported ops are {_OPS}")


def apply_predicates(df: DataFrame, predicates: list[tuple]) -> DataFrame:
    """Apply the ``(col, op, value)`` conjunction EXACTLY — the manifest
    prunes, this decides. Shared by zonemap_read and
    versioned.read_version so the predicate grammar cannot drift."""
    for col, op, value in predicates:
        if op == "between":
            df = df.filter(F.col(col).between(value[0], value[1]))
        else:
            df = df.filter(
                {"=": F.col(col) == value, "<": F.col(col) < value,
                 "<=": F.col(col) <= value, ">": F.col(col) > value,
                 ">=": F.col(col) >= value}[op]
            )
    return df


def collect_file_stats(
    written: DataFrame, stats_cols: list[str], root: str | None = None
) -> list[dict]:
    """Per-FILE min/max/null-count for ``stats_cols`` in one
    distributed ``input_file_name`` pass — O(files) driver rows, never
    data rows. Shared by ``zonemap_write`` and the versioned-table
    manifests (``sinks.versioned.versioned_write(stats_cols=...)``).
    With ``root``, stored paths are made relative to it (relocatable
    manifests)."""
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in stats_cols:
        aggs += [
            F.min(c).alias(f"_min_{c}"),
            F.max(c).alias(f"_max_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"_nulls_{c}"),
        ]
    per_file = (
        written.withColumn("_f", F.input_file_name()).groupBy("_f").agg(*aggs).collect()
    )
    files = []
    for r in sorted(per_file, key=lambda r: r["_f"]):
        stats = {}
        for c in stats_cols:
            stats[c] = {
                "min": _to_plain(r[f"_min_{c}"]),
                "max": _to_plain(r[f"_max_{c}"]),
                "nulls": int(r[f"_nulls_{c}"]),
            }
        path = _relativize(r["_f"], root) if root else r["_f"]
        files.append({"path": path, "rows": int(r["_rows"]), "stats": stats})
    return files


def _file_may_match(stats: dict, col: str, op: str, value) -> bool:
    """Interval test: True unless [min, max] is provably disjoint from
    the predicate. Unknown columns/stats keep the file (never skip on
    missing information)."""
    s = stats.get(col)
    if s is None:
        return True
    lo, hi = s["min"], s["max"]
    if lo is None or hi is None:
        # every value in this file is NULL; comparisons are
        # null-rejecting, so it cannot match
        return False
    if op == "between":
        vlo, vhi = (_to_plain(v) for v in value)
        return not (hi < vlo or lo > vhi)
    v = _to_plain(value)
    if op == "=":
        return lo <= v <= hi
    if op == "<":
        return lo < v
    if op == "<=":
        return lo <= v
    if op == ">":
        return hi > v
    if op == ">=":
        return hi >= v
    raise ValueError(f"op {op!r}: supported ops are {_OPS}")


def zonemap_prune(
    path: str, predicates: list[tuple]
) -> tuple[list[str], dict]:
    """Files surviving a CONJUNCTION of ``(col, op, value)`` predicates
    (``op`` in <, <=, =, >, >=, between — ``between`` takes a (lo, hi)
    tuple), plus a pruning report."""
    with open(os.path.join(path, _MANIFEST)) as fh:
        manifest = json.load(fh)
    validate_predicates(predicates)
    for col, _op, _ in predicates:
        if col not in manifest["stats_cols"]:
            raise ValueError(
                f"column {col!r} has no zone-map stats "
                f"(indexed: {manifest['stats_cols']})"
            )
    keep = []
    rows_kept = 0
    for f in manifest["files"]:
        if all(_file_may_match(f["stats"], c, op, v) for c, op, v in predicates):
            # stored relative (relocatable manifests); returned absolute
            p = f["path"]
            keep.append(p if os.path.isabs(p) or "://" in p else os.path.join(path, p))
            rows_kept += f["rows"]
    report = {
        "files_total": len(manifest["files"]),
        "files_read": len(keep),
        "files_skipped": len(manifest["files"]) - len(keep),
        "rows_total": sum(f["rows"] for f in manifest["files"]),
        "rows_read_bound": rows_kept,
    }
    return keep, report


def zonemap_read(
    spark: SparkSession, path: str, predicates: list[tuple]
) -> DataFrame:
    """Scan only the files the zone map cannot rule out, then apply the
    predicates exactly (the manifest prunes, the filter decides). An
    all-pruned result returns an empty DataFrame with the table schema
    and touches no storage."""
    keep, _ = zonemap_prune(path, predicates)
    with open(os.path.join(path, _MANIFEST)) as fh:
        schema = T.StructType.fromJson(json.load(fh)["schema"])
    if not keep:
        return spark.createDataFrame([], schema)
    return apply_predicates(spark.read.schema(schema).parquet(*keep), predicates)
