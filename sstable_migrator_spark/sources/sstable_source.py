"""Distributed SSTable source — the reverse migration.

The reference moves data INTO Cassandra (App.java:231-250 +
sstableloader); a user holding the produced artifacts eventually wants
them back out (sstable -> parquet migration, cluster-free audits).
This source scans a directory of BIG-format sstables (the layout
``sinks.ring.write_sstables`` produces, or a landed stream target)
DISTRIBUTED: one Spark task per sstable, each running the independent
binary reader (sinks/sstable_format.read_sstable — index cross-check,
digest, CRC, bloom) and emitting Arrow batches.

Schema: column NAMES for the partition key and clustering are supplied
by the caller — real sstables do not store them either (they live in
the cluster's schema tables; sstableloader equally needs the schema).
Column TYPES come from the Statistics.db HEADER of the first sstable,
so a caller cannot mislabel an int as a text. CQL->Spark mapping:
text/varchar/ascii/inet -> string, int -> int, bigint -> bigint,
double -> double, boolean -> boolean, blob -> binary,
timestamp -> timestamp (CQL stores millis; sub-ms precision was
truncated at write time, as in Cassandra), date -> date.

Column order: key columns first (caller order), then regular columns
in sstable serialization order — sorted by name, exactly as Cassandra
stores them; select() to taste.

Scale: the scan parallelizes over sstables (one per token range from
write_sstables); each task is a linear single pass over its Data.db.
``verify=True`` (default) keeps the integrity checks on — the same
cost class as the write's digesting. An absent cell surfaces as NULL.
"""

from __future__ import annotations

import datetime
import glob
import os

from pyspark.sql import DataFrame, SparkSession

_CQL_TO_SPARK = {
    "text": "string",
    "varchar": "string",
    "ascii": "string",
    "inet": "string",
    "int": "int",
    "bigint": "bigint",
    "double": "double",
    "boolean": "boolean",
    "blob": "binary",
    "timestamp": "timestamp",
    "date": "date",
}


def _key_types(key_type: str):
    """Marshal types of the partition-key components (shared parser in
    sinks.sstable_format)."""
    from sstable_migrator_spark.sinks.sstable_format import _key_component_types

    return _key_component_types(key_type)


def _sstable_dirs(path: str, pattern: str) -> list[str]:
    out = []
    for d in sorted(glob.glob(os.path.join(path, pattern))):
        if os.path.isdir(d) and any(
            f.endswith("-TOC.txt") for f in os.listdir(d)
        ):
            out.append(d)
    if not out:
        raise ValueError(f"no sstable directories under {path}/{pattern}")
    return out


def _convert(cql: str, v):
    """Reader deser -> Spark-facing Python value (timestamp millis ->
    datetime, date epoch-days -> date); everything else is already the
    right Python type."""
    if v is None:
        return None
    if cql == "timestamp":
        # integer epoch math: float-seconds division drops the last
        # microsecond for ~half of all far-future millis values
        return datetime.datetime(
            1970, 1, 1, tzinfo=datetime.timezone.utc
        ) + datetime.timedelta(milliseconds=v)
    if cql == "date":
        return datetime.date(1970, 1, 1) + datetime.timedelta(days=v)
    return v


def read_sstables(
    spark: SparkSession,
    path: str,
    partition_key: list[str],
    clustering: list[str] | None = None,
    pattern: str = "cass_range=*",
    verify: bool = True,
) -> DataFrame:
    """Scan every sstable under ``path`` into a DataFrame — one task
    per sstable, types from Statistics.db, names from the caller's
    schema (see module docstring)."""
    from sstable_migrator_spark.sinks.sstable_format import (
        _marshal_to_type,
        _parse_statistics,
    )

    clustering = list(clustering or [])
    dirs = _sstable_dirs(path, pattern)
    # one unit per SSTABLE, not per directory: a row-capped range
    # (write_sstables max_rows_per_sstable) holds several generations
    # in one range dir; each is its own scan task. NOTE: all sstables
    # are unioned verbatim — a directory holding uncompacted OVERWRITE
    # generations must be compacted first (compact_stream_batches /
    # streaming.sstable_ingest), exactly as the q179 path does.
    tables = [
        (d, f[: -len("-TOC.txt")])
        for d in dirs
        for f in sorted(os.listdir(d))
        if f.endswith("-TOC.txt")
    ]

    # driver-side: one Statistics.db (KBs) fixes the types for all
    first, prefix = tables[0]
    with open(os.path.join(first, f"{prefix}-Statistics.db"), "rb") as fh:
        stats = _parse_statistics(fh.read())
    key_cqls = [t.cql for t in _key_types(stats["key_type"])]
    clus_cqls = [_marshal_to_type(m).cql for m in stats["clustering_types"]]
    reg = [(n, _marshal_to_type(m).cql) for n, m in stats["regular_columns"]]
    if len(partition_key) != len(key_cqls):
        raise ValueError(
            f"partition_key names {partition_key} vs {len(key_cqls)} "
            "serialized key components"
        )
    if len(clustering) != len(clus_cqls):
        raise ValueError(
            f"clustering names {clustering} vs {len(clus_cqls)} "
            "serialized clustering components"
        )
    names = partition_key + clustering + [n for n, _ in reg]
    cqls = key_cqls + clus_cqls + [c for _, c in reg]
    schema = ", ".join(
        f"`{n}` {_CQL_TO_SPARK[c]}" for n, c in zip(names, cqls)
    )

    # one sstable per task; parallelize with one row per slice pins the
    # placement without the range sampler's extra pass or an exchange
    # (hash repartition on the path would leave ~1/e tasks empty and
    # others reading 2-3 sstables)
    from ..sinks import local_rows_df

    dirs_df = local_rows_df(
        spark,
        [(i, d, p) for i, (d, p) in enumerate(tables)],
        "i int, dir string, prefix string",
        slices=len(tables),
    )

    def _scan(batches):
        import pandas as pd

        from sstable_migrator_spark.sinks.sstable_format import (
            _split_key,
            read_sstable,
        )

        for pdf in batches:
            for d, pref in zip(pdf["dir"], pdf["prefix"]):
                got = read_sstable(d, prefix=pref, verify=verify)
                if verify and not (
                    got["index_ok"]
                    and got["digest_ok"]
                    and got["crc_ok"]
                    and got["bloom_all_present"]
                ):
                    raise ValueError(f"sstable integrity check failed: {d}")
                key_ts = _key_types(got["stats"]["key_type"])
                rows = []
                for p in got["partitions"]:
                    comps = _split_key(p["key"], got["stats"]["key_type"])
                    keyvals = [
                        _convert(t.cql, t.deser(b))
                        for t, b in zip(key_ts, comps)
                    ]
                    for r in p["rows"]:
                        clusvals = [
                            _convert(c, v)
                            for c, v in zip(clus_cqls, r["clustering"])
                        ]
                        regvals = [
                            _convert(c, r["cells"].get(n))
                            for n, c in zip(
                                [n for n, _ in reg], [c for _, c in reg]
                            )
                        ]
                        rows.append(keyvals + clusvals + regvals)
                        if len(rows) >= 65536:
                            # bounded Arrow batches: one giant frame per
                            # sstable would cost several times the file
                            # size in task memory
                            yield pd.DataFrame(
                                rows, columns=names, dtype=object
                            )
                            rows = []
                if rows:
                    yield pd.DataFrame(rows, columns=names, dtype=object)

    return dirs_df.mapInPandas(_scan, schema)
