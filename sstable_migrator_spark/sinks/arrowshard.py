"""Arrow IPC stream shards — the trainer-interchange sink.

North-star extension sibling of ``tarshard``: many training stacks
(dataloaders, tokenizer services, feature stores) consume Arrow IPC
streams directly — zero-copy columnar batches, no parquet decode on
the hot path. This module writes and reads that layout Spark-side:

- ``write_arrow_shards``: one Arrow-batched pass; each task streams
  its partition into rolling ``shard-<part>-<roll>.arrow`` files (IPC
  STREAM format, one record batch per shard, capped rows per shard),
  so shard count scales with parallelism and no driver state grows
  with data. Shard bytes are DETERMINISTIC for identical input
  partitioning: the Arrow schema is derived from the Spark schema
  (never inferred from pandas), batches are rebuilt to exactly the
  cap, and the IPC writer adds no timestamps — so shards can be
  digested and re-synced like the sstable components. Every shard's
  sha256 lands in ``_arrow_manifests.json``.
- ``read_arrow_shards``: one task per shard (same repartitionByRange
  pinning as the tar/sstable sources); the Spark schema comes from the
  first shard's embedded Arrow schema, so no caller-side DDL to drift.
  ``verify=True`` (default) re-hashes each shard against its manifest
  digest before decoding — a truncated or corrupted copy fails loudly
  with the shard name, not downstream with a decode artifact.

SHARED-FILESYSTEM CONTRACT: same as tarshard — ``path`` is opened with
plain ``open()`` on the executors and globbed on the driver; on a real
cluster it must be a filesystem all nodes see (resolve with
:func:`sstable_migrator_spark.sinks.scratch_path`).
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_arrow_shards", "verify_arrow_shards", "write_arrow_shards"]

_MANIFEST = "_arrow_manifests.json"


def write_arrow_shards(
    df: DataFrame,
    path: str,
    max_rows_per_shard: int = 10000,
) -> list[dict]:
    """Write ``df`` as Arrow IPC stream shards under ``path``. Returns
    the shard manifests (also persisted as ``_arrow_manifests.json``):
    one row per shard with name, rows, bytes, sha256."""
    import pandas as pd
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema

    if max_rows_per_shard < 1:
        raise ValueError(f"max_rows_per_shard must be >= 1, got {max_rows_per_shard}")
    os.makedirs(path, exist_ok=True)
    # overwrite semantics (parquet-sink parity): a re-run that produces
    # FEWER shards must not leave stale ones behind — they would fail
    # the read-time manifest check loudly, but the re-run itself should
    # be idempotent, not a cleanup exercise
    import glob as _glob

    for stale in _glob.glob(os.path.join(path, "shard-*.arrow")):
        os.remove(stale)
    mf = os.path.join(path, _MANIFEST)
    if os.path.exists(mf):
        os.remove(mf)
    arrow_schema = to_arrow_schema(df.schema)
    cols = df.columns

    def _write(batches):
        from pyspark import TaskContext

        part = TaskContext.get().partitionId()
        roll = 0
        pending: list[pa.Table] = []
        n_pending = 0
        out = []

        def _flush():
            # one shard = one record batch: byte-deterministic for a
            # given row content, independent of how Spark sliced the
            # incoming Arrow batches
            nonlocal roll, pending, n_pending
            if not n_pending:
                return
            tbl = pa.concat_tables(pending).combine_chunks()
            name = f"shard-{part:05d}-{roll:03d}.arrow"
            full = os.path.join(path, name)
            with open(full, "wb") as fh, pa.ipc.new_stream(fh, arrow_schema) as w:
                w.write_table(tbl, max_chunksize=max_rows_per_shard)
            with open(full, "rb") as fh:
                data = fh.read()
            out.append(
                {
                    "shard": name,
                    "rows": n_pending,
                    "bytes": len(data),
                    "sha256": hashlib.sha256(data).hexdigest(),
                }
            )
            roll += 1
            pending, n_pending = [], 0

        for pdf in batches:
            tbl = pa.Table.from_pandas(
                pdf[cols], schema=arrow_schema, preserve_index=False
            )
            while tbl.num_rows:
                take = min(max_rows_per_shard - n_pending, tbl.num_rows)
                pending.append(tbl.slice(0, take))
                n_pending += take
                tbl = tbl.slice(take)
                if n_pending >= max_rows_per_shard:
                    _flush()
        _flush()
        if out:
            yield pd.DataFrame(out)

    manifests = df.mapInPandas(
        _write, "shard string, rows long, bytes long, sha256 string"
    ).collect()
    rows = sorted((r.asDict() for r in manifests), key=lambda m: m["shard"])
    with open(os.path.join(path, _MANIFEST), "w") as fh:
        json.dump(rows, fh)
    return rows


def read_arrow_shards(
    spark: SparkSession,
    path: str,
    verify: bool = True,
) -> DataFrame:
    """Scan every ``shard-*.arrow`` under ``path`` back into a
    DataFrame — one task per shard, schema recovered from the first
    shard's embedded Arrow schema. ``verify=True`` re-hashes each shard
    against ``_arrow_manifests.json`` before decoding and raises on any
    mismatch or on a shard the manifest doesn't know."""
    import glob as _glob

    import pyarrow as pa

    from pyspark.sql.pandas.types import from_arrow_schema

    shards = sorted(_glob.glob(os.path.join(path, "shard-*.arrow")))
    if not shards:
        raise ValueError(f"no arrow shards under {path}")
    digests: dict[str, str] = {}
    if verify:
        mf = os.path.join(path, _MANIFEST)
        if not os.path.exists(mf):
            raise ValueError(
                f"verify=True but {mf} is missing — pass verify=False to "
                "read unmanifested shards"
            )
        with open(mf) as fh:
            digests = {m["shard"]: m["sha256"] for m in json.load(fh)}
        # completeness BEFORE any decode: a missing shard would
        # otherwise read fewer rows silently — the one failure digest
        # checks per read shard cannot catch
        missing = sorted(set(digests) - {os.path.basename(s) for s in shards})
        if missing:
            raise ValueError(
                f"{path}: manifest lists {len(missing)} shard(s) not on "
                f"disk (partial copy?): {missing[:5]}"
            )
    with open(shards[0], "rb") as fh:
        arrow_schema = pa.ipc.open_stream(fh).schema
    spark_schema = from_arrow_schema(arrow_schema)

    from . import local_rows_df

    dirs_df = local_rows_df(
        spark,
        [(i, s) for i, s in enumerate(shards)],
        "i int, shard string",
        slices=len(shards),
    )

    def _scan(batches):
        for pdf in batches:
            for shard in pdf["shard"]:
                with open(shard, "rb") as fh:
                    data = fh.read()
                name = os.path.basename(shard)
                if digests:
                    want = digests.get(name)
                    got = hashlib.sha256(data).hexdigest()
                    if want is None:
                        raise ValueError(
                            f"{shard}: not in {_MANIFEST} — partial copy?"
                        )
                    if got != want:
                        raise ValueError(
                            f"{shard}: sha256 {got} != manifest {want} — "
                            "corrupted or truncated shard"
                        )
                tbl = pa.ipc.open_stream(pa.BufferReader(data)).read_all()
                if tbl.schema != arrow_schema:
                    raise ValueError(
                        f"{shard}: schema differs from {os.path.basename(shards[0])}"
                    )
                if tbl.num_rows:
                    yield tbl.to_pandas()

    return dirs_df.mapInPandas(_scan, spark_schema)


def _verify_bins(
    manifest: list[dict], par: int, target_task_bytes: int
) -> tuple[int, list[tuple]]:
    """Partition plan for the distributed digest: task count
    proportional to cluster parallelism AND data volume (one task per
    ~target_task_bytes of shard bytes), capped only by the shard count
    — a fixed cap (formerly min(n, 64)) throttled a multi-TB directory
    on a big cluster to 64-way hashing regardless of executors.
    Shards are binned by their CUMULATIVE BYTE MIDPOINT, not by count:
    shards needn't be uniform, so byte-binning keeps task work even.
    Returns ``(n_tasks, [(pid, shard, bytes, sha256), ...])``."""
    total_b = sum(int(m["bytes"]) for m in manifest)
    n_tasks = min(
        len(manifest),
        max(par, -(-total_b // max(1, int(target_task_bytes)))),
    )
    rows = []
    cum = 0
    for m in sorted(manifest, key=lambda m: m["shard"]):
        mid = cum + int(m["bytes"]) / 2.0
        pid = min(n_tasks - 1, int(mid * n_tasks / total_b)) if total_b else 0
        rows.append((pid, m["shard"], int(m["bytes"]), m["sha256"]))
        cum += int(m["bytes"])
    return n_tasks, rows


def verify_arrow_shards(
    path: str,
    spark: SparkSession | None = None,
    target_task_bytes: int = 1 << 30,
) -> dict:
    """Verify a shard directory against its manifest WITHOUT decoding:
    every manifested shard must exist with the exact byte size and
    sha256, and no unmanifested ``shard-*.arrow`` may be present.
    Raises with the offending shard names on any missing / corrupt /
    truncated / extra file; returns ``{shards, rows, bytes}`` totals on
    success — the pre-flight a consumer runs after copying shards
    between filesystems (the epoch manifests' verify_epoch, for the
    interchange format).

    Pass ``spark`` to hash EXECUTOR-side (the ``_digest_shard_files``
    pattern: one task per shard batch, streamed 1 MiB reads, only
    O(shards) digest rows return to the driver) — for a multi-TB
    interchange directory the driver-side loop IS the bottleneck.
    Without ``spark`` the hashing runs as a sequential driver loop
    (fine for test-sized directories). Both paths fail with identical
    messages. Shared-filesystem contract when distributed: ``path``
    must be visible to the executors, same as the writer."""
    import glob as _glob

    mf = os.path.join(path, _MANIFEST)
    if not os.path.exists(mf):
        raise ValueError(f"no {_MANIFEST} under {path}")
    with open(mf) as fh:
        manifest = json.load(fh)
    on_disk = {
        os.path.basename(s) for s in _glob.glob(os.path.join(path, "shard-*.arrow"))
    }
    names = {m["shard"] for m in manifest}
    missing = sorted(names - on_disk)
    extra = sorted(on_disk - names)
    if missing or extra:
        raise ValueError(
            f"{path}: missing={missing[:5]} extra={extra[:5]} vs {_MANIFEST}"
        )

    def _check(name: str, want_bytes: int, want_sha: str) -> str | None:
        full = os.path.join(path, name)
        h = hashlib.sha256()
        n = 0
        with open(full, "rb") as fh:
            for chunk in iter(lambda: fh.read(1 << 20), b""):
                h.update(chunk)
                n += len(chunk)
        if n != want_bytes:
            return f"{name} (size)"
        if h.hexdigest() != want_sha:
            return f"{name} (sha256)"
        return None

    if spark is None:
        bad = []
        for m in manifest:
            b = _check(m["shard"], m["bytes"], m["sha256"])
            if b is not None:
                bad.append(b)
    else:
        import pandas as pd

        n_tasks, rows = _verify_bins(
            manifest,
            max(1, spark.sparkContext.defaultParallelism),
            target_task_bytes,
        )
        jobs = spark.createDataFrame(
            rows, "pid int, shard string, bytes long, sha256 string"
        ).repartitionByRange(n_tasks, "pid")

        def _dig(batches):
            for pdf in batches:
                out = []
                for name, wb, ws in zip(
                    pdf["shard"], pdf["bytes"], pdf["sha256"]
                ):
                    b = _check(str(name), int(wb), str(ws))
                    if b is not None:
                        out.append({"bad": b})
                if out:
                    yield pd.DataFrame(out)

        bad = sorted(r["bad"] for r in jobs.mapInPandas(_dig, "bad string").collect())
    if bad:
        raise ValueError(f"{path}: corrupt shards: {bad[:5]}")
    return {
        "shards": len(manifest),
        "rows": sum(m["rows"] for m in manifest),
        "bytes": sum(m["bytes"] for m in manifest),
    }
