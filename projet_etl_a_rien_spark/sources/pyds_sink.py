"""Custom Python DataSource WRITER (Spark 4 ``pyspark.sql.datasource``):
the write-side twin of ``pyds.py``'s paged reader — together they cover
both halves of the Python DataSource API.

A JSONL directory sink with a MANIFEST commit protocol:

- each write TASK lands its rows in a uniquely named
  ``part-<uuid>.jsonl`` and returns the filename as its commit message;
- the driver-side ``commit()`` writes ``_MANIFEST.json`` listing exactly
  the files of the tasks that succeeded — the atomic publish point;
- ``abort()`` deletes the orphaned part files of a failed job;
- readers (``read_jsonl_sink``) open ONLY manifest-listed files, so a
  torn task file from a crashed job is invisible — the same
  commit-marker discipline as the MV sink's ``_SUCCESS`` gating
  (operators/compaction.py), implemented at the DataSource API layer.

Values cross the text format as exact integers (callers pre-convert
money to cents), so the roundtrip is bit-exact and oracle-comparable —
no float-to-decimal-text hazards.

FILESYSTEM CONTRACT: tasks land part files with local ``open()`` on the
EXECUTORS while ``commit()``/``abort()`` manipulate the same directory on
the DRIVER — the sink therefore requires a filesystem shared by driver
and executors (local mode, NFS, or a FUSE-mounted object store). On a
multi-node cluster without a shared mount, use the parquet/JDBC sinks
instead; this sink exists to exercise the DataSource writer API.

Registered under the short name ``jsonl_manifest``:

    spark.dataSource.register(JsonlManifestDataSource)
    df.write.format("jsonl_manifest").option("path", dir).mode("append").save()
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


class _FileCommit(WriterCommitMessage):
    def __init__(self, filename: str):
        self.filename = filename


class JsonlManifestWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_manifest sink requires option('path', ...)")
        self.overwrite = overwrite

    def write(self, iterator):
        # runs on the EXECUTOR, one call per task: unique name = no
        # cross-task clobbering, retries land a fresh file and only the
        # committed attempt enters the manifest
        os.makedirs(self.path, exist_ok=True)
        fname = f"part-{uuid.uuid4().hex}.jsonl"
        with open(os.path.join(self.path, fname), "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), sort_keys=True) + "\n")
        return _FileCommit(fname)

    def commit(self, messages):
        # driver-side atomic publish: the manifest names the exact file
        # set; files not listed (torn tasks, aborted attempts) stay
        # invisible to readers
        files = sorted(m.filename for m in messages if m is not None)
        manifest = os.path.join(self.path, "_MANIFEST.json")
        prior = []
        if os.path.exists(manifest):
            with open(manifest) as f:
                prior = json.load(f)["files"]
        if self.overwrite:
            survivors = files
        else:
            survivors = sorted(set(prior) | set(files))
        tmp = manifest + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"files": survivors}, f)
        os.replace(tmp, manifest)  # atomic on POSIX
        # overwrite de-lists the prior file set; reclaim those orphans
        # AFTER the new manifest is live (a crash between replace and
        # unlink leaks files but never breaks readers — they only open
        # manifest-listed names)
        for stale in set(prior) - set(survivors):
            try:
                os.remove(os.path.join(self.path, stale))
            except OSError:
                pass

    def abort(self, messages):
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except OSError:
                    pass


class JsonlStreamManifestWriter(DataSourceStreamWriter):
    """STREAMING half of the sink (Spark 4 ``DataSourceStreamWriter``):
    tasks land uniquely-named part files exactly like the batch writer;
    the driver-side ``commit(messages, batchId)`` publishes a PER-BATCH
    manifest ``_MANIFEST-b<id>.json`` via atomic rename. Exactly-once
    across checkpoint-recovery replays comes from the manifest being
    keyed BY BATCH ID: a replayed batch re-lands fresh part files and
    atomically REPLACES its own manifest, de-listing (and deleting) the
    superseded attempt's files — the same idempotent-rewrite discipline
    as the parquet batch_id=N sinks, at the DataSource API layer.
    Readers union every committed batch manifest, so a torn batch
    (files on disk, no manifest) stays invisible. Shares the batch
    writer's shared-filesystem contract."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_manifest sink requires option('path', ...)")

    def write(self, iterator):
        os.makedirs(self.path, exist_ok=True)
        fname = f"part-{uuid.uuid4().hex}.jsonl"
        with open(os.path.join(self.path, fname), "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), sort_keys=True) + "\n")
        return _FileCommit(fname)

    def commit(self, messages, batchId: int) -> None:
        files = sorted(m.filename for m in messages if m is not None)
        manifest = os.path.join(self.path, f"_MANIFEST-b{batchId}.json")
        prior = []
        if os.path.exists(manifest):  # checkpoint-recovery replay
            with open(manifest) as f:
                prior = json.load(f)["files"]
        tmp = manifest + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"files": files}, f)
        os.replace(tmp, manifest)
        for stale in set(prior) - set(files):
            try:
                os.remove(os.path.join(self.path, stale))
            except OSError:
                pass

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except OSError:
                    pass


class JsonlManifestDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_manifest"

    def writer(self, schema, overwrite: bool):
        return JsonlManifestWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        return JsonlStreamManifestWriter(self.options)


def register(spark) -> None:
    """Idempotent registration of the sink's short name."""
    spark.dataSource.register(JsonlManifestDataSource)


def read_jsonl_sink(spark, path: str, schema: str):
    """Committed contents of a ``jsonl_manifest`` sink: only files the
    manifest lists are read. Returns an empty DataFrame of ``schema``
    when nothing has committed."""
    import glob as _glob

    files: list[str] = []
    batch_manifest = os.path.join(path, "_MANIFEST.json")
    if os.path.exists(batch_manifest):
        with open(batch_manifest) as f:
            files += json.load(f)["files"]
    for m in sorted(_glob.glob(os.path.join(path, "_MANIFEST-b*.json"))):
        with open(m) as f:
            files += json.load(f)["files"]
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(
        [os.path.join(path, fn) for fn in sorted(set(files))]
    )
