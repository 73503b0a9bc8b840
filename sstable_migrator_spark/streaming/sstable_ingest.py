"""Streaming ingestion of SSTable stores (the reverse-migration path
made incremental, SURVEY §2.9 T1 applied to K1's reverse direction).

The batch reverse path (sources/sstable_source.read_sstables) and the
arrival-side wave compactor (sinks/ring.compact_stream_batches) both
assume every wave is on disk when they run; the reference's cadence is
a daily cron (daily_upload.cron) — new generations keep LANDING. This
wrapper makes the compactor incremental with Structured Streaming's
file source as the arrival ledger:

- **Discovery**: a ``text`` file stream over ``root`` filtered to
  ``*-TOC.txt`` markers. TOC.txt is the LAST component the writer
  emits (sstable_format.SSTableWriter.close writes it after every
  other file), so its appearance means the sstable's component set is
  complete — the same publish-marker discipline a real bulk-load
  watcher needs. The source's checkpoint remembers every file it has
  delivered, so each ``availableNow`` drain sees ONLY generations that
  landed since the previous drain — exactly-once discovery without a
  bookkeeping table.
- **Fold**: each drain groups the new sstables per token range
  (driver-side, O(new sstables) path strings) and runs the shared
  distributed compactor (sinks/ring.compact_ranges, one task per
  affected range) with the range's EXISTING compacted snapshot fed
  back in as the lowest-authority input. Rows keep their own write
  timestamps through compaction, so last-write-wins resolves on the
  data's timestamps; only exact timestamp ties fall back to arrival
  order (snapshot < new waves in batch_id order) — the same tie rule
  the batch compactor applies, met as long as wave numbering is
  monotone with authority.
- **Equivalence**: draining waves {0} then {1} across two runs
  reconciles to the same rows as one batch compaction over {0, 1}
  (pinned by tests/test_streaming.py against the q179-style batch
  path). Ranges without new arrivals are untouched — their snapshot
  files are not rewritten.

Scale: driver state is O(new sstables) per drain plus the streaming
source's file ledger; the merge work is one task per AFFECTED range —
a quiet day costs nothing. The collect() in the fold is the path
list, never row data.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

__all__ = ["compact_sstables_available_now"]

_TOC_RE = re.compile(
    r"(?P<batch>batch_id=(?P<bid>\d+))/cass_range=(?P<rid>\d+)/"
    r"(?P<prefix>[^/]+)-TOC\.txt$"
)


def _existing_snapshot(range_dir: str) -> tuple[str, str] | None:
    """The (dir, prefix) of the compacted snapshot already in a range
    directory, if any. compact_ranges guarantees at most one sstable
    per range dir (it deletes the superseded generation after folding
    it in)."""
    if not os.path.isdir(range_dir):
        return None
    tocs = sorted(f for f in os.listdir(range_dir) if f.endswith("-TOC.txt"))
    if not tocs:
        return None
    if len(tocs) > 1:
        raise ValueError(
            f"{range_dir}: {len(tocs)} sstables in a compacted range dir; "
            "a previous fold was interrupted between write and cleanup — "
            "remove the stale lower generation before resuming"
        )
    return range_dir, tocs[0][: -len("-TOC.txt")]


def compact_sstables_available_now(
    spark: SparkSession,
    root: str,
    out_path: str,
    checkpoint: str,
    keyspace: str,
    table: str,
    partition_key: list[str],
    clustering: list[str] | None = None,
) -> list[dict]:
    """One incremental drain: discover sstables that landed under
    ``root/batch_id=*/cass_range=*`` since the previous drain (per the
    ``checkpoint`` ledger) and fold them into the per-range snapshots
    at ``out_path``. Returns the manifests of the ranges compacted in
    THIS drain (empty when nothing new arrived); the cumulative
    per-range manifest is maintained at
    ``out_path/_sstable_manifests.json``."""
    clustering = list(clustering or [])
    stream = (
        spark.readStream.format("text")
        .option("pathGlobFilter", "*-TOC.txt")
        .option("recursiveFileLookup", "true")
        .load(root)
        .select(F.col("_metadata.file_path").alias("path"))
    )

    drained: list[dict] = []

    def _fold(batch_df, _bid: int) -> None:
        paths = [r["path"] for r in batch_df.select("path").distinct().collect()]
        per_range: dict[int, list[tuple[int, str, str]]] = {}
        for p in paths:
            m = _TOC_RE.search(p)
            if not m:
                continue
            local = p[len("file:") :] if p.startswith("file:") else p
            per_range.setdefault(int(m.group("rid")), []).append(
                (int(m.group("bid")), os.path.dirname(local), m.group("prefix"))
            )
        if not per_range:
            return
        fold_inputs: dict[int, list[tuple[str, str]]] = {}
        for rid, waves in per_range.items():
            snap = _existing_snapshot(os.path.join(out_path, f"cass_range={rid}"))
            ordered = [(d, pref) for _b, d, pref in sorted(waves)]
            fold_inputs[rid] = ([snap] if snap else []) + ordered
        from sstable_migrator_spark.sinks.ring import compact_ranges

        drained.extend(
            compact_ranges(
                spark, fold_inputs, out_path,
                keyspace=keyspace, table=table,
                partition_key=partition_key, clustering=clustering,
            )
        )

    q = (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # cumulative manifest: this drain's ranges override, others persist
    manifest_path = os.path.join(out_path, "_sstable_manifests.json")
    merged: dict[int, dict] = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as fh:
            merged = {m["range_id"]: m for m in json.load(fh)}
    for m in drained:
        merged[m["range_id"]] = m
    if merged:
        os.makedirs(out_path, exist_ok=True)
        with open(manifest_path, "w") as fh:
            json.dump([merged[k] for k in sorted(merged)], fh)
    return drained
