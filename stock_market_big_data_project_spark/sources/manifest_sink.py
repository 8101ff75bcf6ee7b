"""A manifest-committing shard sink as a PySpark Python DataSource
writer — the export side of a training-data pipeline.

Packed training shards are only usable with an INDEX: which shard files
exist, how many rows each holds, and a content fingerprint so a trainer
(or an auditor) can verify what it read. This sink writes one parquet
shard per task and has the DRIVER commit a `_MANIFEST.json` assembled
from the tasks' commit messages — Spark's two-phase commit protocol for
v2 writers, surfaced through `pyspark.sql.datasource.DataSourceWriter`:

- task side (`write`): stream the partition's rows to a uniquely-named
  shard via pyarrow, fingerprint as it goes, return a commit message
  (path, n_rows, xor-of-row-md5s);
- driver side (`commit`): runs ONLY if every task succeeded — writes the
  manifest listing exactly the committed shards. A failed/speculative
  task's orphan file is never listed, so readers that trust the manifest
  get exactly-once semantics on any storage (the same contract
  FileOutputCommitter gives Spark's built-in sinks, here made explicit
  and inspectable);
- `abort`: best-effort cleanup of uncommitted shards.

The row fingerprint is an XOR of per-row md5 prefixes — order- and
shard-independent, so the manifest-level XOR of all shards equals the
fingerprint of the whole dataset no matter how rows were partitioned,
and a DuckDB oracle can recompute it with the same formula
(`manifest_fingerprint_sql`).
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)

MANIFEST_NAME = "_MANIFEST.json"
_FP_BITS = 60


def _row_fp(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16)


def manifest_fingerprint_sql(key_expr: str, table: str) -> str:
    """DuckDB twin of the dataset fingerprint: XOR of 60-bit md5 prefixes
    of `key_expr` over `table` (bit_xor aggregate — order-independent,
    like the sink's running XOR)."""
    return (
        f"SELECT bit_xor(CAST(('0x' || substr(md5({key_expr}), 1, 15)) "
        f"AS BIGINT)) AS fp, count(*) AS n_rows FROM {table}"
    )


class _ShardCommit(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int, fp: int):
        self.path, self.n_rows, self.fp = path, n_rows, fp


class ManifestShardWriter(DataSourceWriter):
    def __init__(self, options, schema):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("manifest_shards sink requires option 'path'")
        self.key_col = options.get("keyColumn")
        if not self.key_col:
            raise ValueError("manifest_shards sink requires option 'keyColumn'")
        self.schema = schema

    def write(self, iterator):
        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(self.path, exist_ok=True)
        shard = os.path.join(self.path, f"shard-{uuid.uuid4().hex}.parquet")
        rows, fp = [], 0
        for row in iterator:
            d = row.asDict()
            rows.append(d)
            fp ^= _row_fp(str(d[self.key_col]))
        table = pa.Table.from_pylist(rows) if rows else None
        if table is not None:
            pq.write_table(table, shard)
            return _ShardCommit(os.path.basename(shard), len(rows), fp)
        return _ShardCommit("", 0, 0)

    def commit(self, messages):
        shards = [
            {"file": m.path, "n_rows": m.n_rows, "fp": m.fp}
            for m in messages
            if m.n_rows > 0
        ]
        total_fp = 0
        for s in shards:
            total_fp ^= s["fp"]
        manifest = {
            "shards": sorted(shards, key=lambda s: s["file"]),
            "n_rows": sum(s["n_rows"] for s in shards),
            "fingerprint": total_fp,
            "key_column": self.key_col,
        }
        with open(os.path.join(self.path, MANIFEST_NAME), "w") as fh:
            json.dump(manifest, fh, indent=1)

    def abort(self, messages):
        # Spark passes None for failed/unfinished tasks — filter them or
        # `m.path` raises and masks the original task failure.
        for m in messages:
            if m is not None and m.path:
                try:
                    os.remove(os.path.join(self.path, m.path))
                except OSError:
                    pass


class ManifestStreamWriter(DataSourceStreamWriter):
    """Per-micro-batch manifest commits: every epoch's task shards are
    appended to the manifest ATOMICALLY (write-new + rename) in
    `commit(messages, batchId)`, which Spark invokes exactly once per
    successfully completed batch — a replayed/failed batch's shards are
    never listed, so `read_via_manifest` sees each record exactly once
    even across restarts. Batch ids are recorded per shard, making the
    ingestion history auditable (which tick produced which rows)."""

    def __init__(self, options, schema):
        self._inner = ManifestShardWriter(options, schema)
        self.path = self._inner.path
        self.key_col = self._inner.key_col

    def write(self, iterator):
        return self._inner.write(iterator)

    def commit(self, messages, batchId):
        new = [
            {"file": m.path, "n_rows": m.n_rows, "fp": m.fp, "batch": batchId}
            for m in messages
            if m is not None and m.n_rows > 0
        ]
        manifest_path = os.path.join(self.path, MANIFEST_NAME)
        if os.path.exists(manifest_path):
            with open(manifest_path) as fh:
                manifest = json.load(fh)
        else:
            manifest = {
                "shards": [],
                "n_rows": 0,
                "fingerprint": 0,
                "key_column": self.key_col,
            }
        # Replay detection keys on the manifest-level committed_batches
        # list, NOT only on per-shard "batch" fields: a zero-row epoch
        # produces no shard entries, so without the list its replay would
        # be undetectable (harmless only by determinism), and manifests
        # written before the per-shard field existed carry no markers at
        # all. Legacy manifests (shards but neither marker form) are
        # upgraded conservatively: their shard-derived batch set is all
        # we can recover, and that limitation is recorded in the manifest
        # (`legacy_batchless: true`) instead of silently assumed away.
        committed = set(manifest.get("committed_batches", []))
        committed |= {
            s["batch"] for s in manifest["shards"] if "batch" in s
        }
        if "committed_batches" not in manifest and any(
            "batch" not in s for s in manifest["shards"]
        ):
            manifest["legacy_batchless"] = True
        if batchId in committed:
            # Replayed batch (crash between sink commit and checkpoint
            # commit): the epoch is already in the manifest. Shard file
            # names are uuid4-per-task-attempt, so the re-run's files are
            # brand new — dedup MUST key on batchId, never on file name.
            # Drop the re-run's unlisted shard files so readers that
            # trust the manifest stay exactly-once AND the directory
            # doesn't accumulate orphans.
            for s in new:
                try:
                    os.remove(os.path.join(self.path, s["file"]))
                except OSError:
                    pass
            return
        for s in new:
            manifest["shards"].append(s)
            manifest["n_rows"] += s["n_rows"]
            manifest["fingerprint"] ^= s["fp"]
        manifest["shards"].sort(key=lambda s: s["file"])
        committed.add(batchId)
        manifest["committed_batches"] = sorted(committed)
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1)
        os.replace(tmp, manifest_path)

    def abort(self, messages, batchId):
        self._inner.abort([m for m in messages if m is not None])


class ManifestShardsDataSource(DataSource):
    @classmethod
    def name(cls):
        return "manifest_shards"

    def writer(self, schema, overwrite):
        return ManifestShardWriter(self.options, schema)

    def streamWriter(self, schema, overwrite):
        return ManifestStreamWriter(self.options, schema)


def register_manifest_sink(spark) -> None:
    spark.dataSource.register(ManifestShardsDataSource)


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST_NAME)) as fh:
        return json.load(fh)


def read_via_manifest(spark, path: str):
    """Read ONLY the shards the manifest lists — the reader half of the
    exactly-once contract: an orphan file from a failed/speculative task
    (present in the directory, absent from the manifest) is never read."""
    m = read_manifest(path)
    files = [os.path.join(path, s["file"]) for s in m["shards"]]
    if not files:
        raise ValueError(f"manifest at {path} lists no shards")
    return spark.read.parquet(*files)
