"""WebDataset-style tar shards for multimodal training data.

North-star extension: large multimodal training runs stream their
samples from TAR SHARDS — each member named ``{key}.{field}`` so one
sample's fields sit adjacent (the public WebDataset convention) — and
dataloaders consume shards sequentially with no per-file metadata
round-trips. This module writes and reads that layout Spark-side:

- ``write_tar_shards``: one Arrow-batched pass; each task streams its
  partition into rolling tar files (``shard-<part>-<roll>.tar``,
  capped by rows per shard), so shard count scales with parallelism
  and no driver state grows with data. Tar bytes are DETERMINISTIC:
  fixed epoch mtime, zeroed uid/gid, ustar format — identical input
  partitioning gives byte-identical shards, so shards can be digested
  and re-synced like the sstable components.
- ``read_tar_shards``: one task per shard (same repartitionByRange
  pinning as the sstable source), re-assembling each key's adjacent
  members back into one row per sample. The reader validates the
  adjacency invariant (a key's members must be contiguous) rather than
  buffering the whole shard, so memory is O(sample), not O(shard).

Keys must be unique strings without '.' or '/'; field names become
member extensions and obey the SAME no-'.'/no-'/' rule (members split
on the LAST dot at read time — enforced at write time, and the reader
raises on members whose field is not in ``payload_cols`` instead of
silently dropping them). Binary and string payload columns both ride
as raw bytes (strings are UTF-8).

SHARED-FILESYSTEM CONTRACT: ``path`` is opened with plain ``open()``
ON THE EXECUTORS (one rolling tar writer per task) and globbed on the
driver. On a real cluster it must be a filesystem every executor and
the driver all see (NFS/Lustre/FUSE-mounted object store) — an
executor-local path writes shards nobody can read back. Resolve it
with :func:`sstable_migrator_spark.sinks.scratch_path` (env
``SPARK_GRAFT_SCRATCH``) the way the catalog queries do.
"""

from __future__ import annotations

import io
import json
import os
import tarfile

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_tar_shards", "read_tar_shards"]


def _clean_key(k) -> str:
    k = str(k)
    if "." in k or "/" in k or not k:
        raise ValueError(f"tar shard keys must be non-empty without '.'/'/': {k!r}")
    return k


def write_tar_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    payload_cols: list[str],
    max_rows_per_shard: int = 10000,
) -> list[dict]:
    """Write ``df`` as WebDataset tar shards under ``path``. Returns
    the shard manifests (also persisted as ``_tar_manifests.json``):
    one row per shard with name, samples, bytes."""
    import pandas as pd

    if not payload_cols:
        raise ValueError("need at least one payload column")
    for field in payload_cols:
        # Fields share the member-name grammar with keys (WebDataset
        # splits on the LAST dot): a '.' inside a field name would
        # re-split with the wrong key/field on read, silently mangling
        # samples — reject at write time, same rule as _clean_key.
        if "." in field or "/" in field or not field:
            raise ValueError(
                f"tar shard field names must be non-empty without '.'/'/': {field!r}"
            )
    os.makedirs(path, exist_ok=True)
    cols = [key_col, *payload_cols]

    def _write(batches):
        from pyspark import TaskContext

        part = TaskContext.get().partitionId()
        roll = 0
        tf: tarfile.TarFile | None = None
        fh = None
        n = 0
        out = []

        def _open():
            nonlocal tf, fh
            name = f"shard-{part:05d}-{roll:03d}.tar"
            fh = open(os.path.join(path, name), "wb")
            tf = tarfile.open(fileobj=fh, mode="w", format=tarfile.USTAR_FORMAT)
            return name

        def _close(name):
            nonlocal tf, fh
            tf.close()
            size = fh.tell()
            fh.close()
            tf = fh = None
            out.append({"shard": name, "samples": n, "bytes": size})

        name = None
        for pdf in batches:
            for rec in pdf[cols].itertuples(index=False):
                if tf is None:
                    name = _open()
                key = _clean_key(rec[0])
                for field, val in zip(payload_cols, rec[1:]):
                    if val is None:
                        continue
                    data = (
                        bytes(val)
                        if isinstance(val, (bytes, bytearray, memoryview))
                        else str(val).encode("utf-8")
                    )
                    ti = tarfile.TarInfo(name=f"{key}.{field}")
                    ti.size = len(data)
                    ti.mtime = 0
                    ti.uid = ti.gid = 0
                    ti.uname = ti.gname = ""
                    tf.addfile(ti, io.BytesIO(data))
                n += 1
                if n >= max_rows_per_shard:
                    _close(name)
                    roll += 1
                    n = 0
        if tf is not None:
            _close(name)
        if out:
            yield pd.DataFrame(out)

    manifests = df.select(cols).mapInPandas(
        _write, "shard string, samples long, bytes long"
    ).collect()
    rows = sorted((r.asDict() for r in manifests), key=lambda m: m["shard"])
    with open(os.path.join(path, "_tar_manifests.json"), "w") as fh:
        json.dump(rows, fh)
    return rows


def read_tar_shards(
    spark: SparkSession,
    path: str,
    key_col: str,
    payload_cols: list[str],
    binary_cols: list[str] | None = None,
    strict: bool = True,
) -> DataFrame:
    """Scan every ``shard-*.tar`` under ``path`` back into one row per
    sample — one task per shard. ``binary_cols`` stay bytes; other
    payload columns decode as UTF-8 strings.

    ``strict=True`` (default) raises on any member field not in
    ``payload_cols`` — a schema mismatch should fail loudly, not drop a
    sample's data. Pass ``strict=False`` to PROJECT a column subset out
    of a wider shard (unknown members are then skipped by design)."""
    import glob as _glob

    import pandas as pd

    binary = set(binary_cols or [])
    shards = sorted(_glob.glob(os.path.join(path, "shard-*.tar")))
    if not shards:
        raise ValueError(f"no tar shards under {path}")
    from . import local_rows_df

    dirs_df = local_rows_df(
        spark,
        [(i, s) for i, s in enumerate(shards)],
        "i int, shard string",
        slices=len(shards),
    )
    schema = f"`{key_col}` string, " + ", ".join(
        f"`{c}` {'binary' if c in binary else 'string'}" for c in payload_cols
    )

    def _scan(batches):
        for pdf in batches:
            for shard in pdf["shard"]:
                rows = []
                with tarfile.open(shard, mode="r") as tf:
                    cur_key = None
                    cur: dict = {}
                    seen: set[str] = set()

                    def flush():
                        if cur_key is None:
                            return
                        rows.append(
                            [cur_key]
                            + [
                                cur.get(c)
                                if c in binary
                                else (
                                    cur[c].decode("utf-8") if c in cur else None
                                )
                                for c in payload_cols
                            ]
                        )

                    for m in tf:
                        key, _, field = m.name.rpartition(".")
                        if key != cur_key:
                            flush()
                            if key in seen:
                                raise ValueError(
                                    f"{shard}: key {key!r} not contiguous — "
                                    "not a valid WebDataset member order"
                                )
                            seen.add(key)
                            cur_key, cur = key, {}
                        if field not in payload_cols:
                            if strict:
                                # Unknown members mean the caller's
                                # schema does not match the shard —
                                # raising beats silently dropping a
                                # sample's field.
                                raise ValueError(
                                    f"{shard}: member {m.name!r} has field "
                                    f"{field!r} not in payload_cols "
                                    f"{sorted(payload_cols)} — schema "
                                    "mismatch (strict=False projects a "
                                    "column subset)"
                                )
                            continue
                        cur[field] = tf.extractfile(m).read()
                    flush()
                if rows:
                    yield pd.DataFrame(rows, columns=[key_col, *payload_cols])

    return dirs_df.mapInPandas(_scan, schema)
