"""JSONL batch connector through Spark 4's Python DataSource API —
the WRITER half of the surface ``sources/table_stream.py`` exercises
for streaming reads.

``df.write.format("pyjsonl").save(path)`` fans the write out across
the cluster: every input partition's task serializes its own rows to
one ``part-<id>.jsonl`` file (no driver collection, no shuffle added
by the sink), returns a commit message naming the file, and the
driver finalizes the job by writing a ``_SUCCESS`` manifest listing
exactly the committed files — uncommitted/aborted task output is
invisible to readers, mirroring the Hadoop output-committer
contract. The read path lists the manifest and emits one input
partition per file, so a read of an N-file directory parallelizes
N-wide with schema-projected rows.

This is deliberately a *simple, honest* connector: schema support is
the primitive JSON types the engine's tables need (long / double /
string / boolean), nested types refuse loudly, and appends land
whole files — the versioned-table layer (table/versioned.py) is the
transactional story; this demonstrates the extension API itself.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

_SUPPORTED = (T.LongType, T.IntegerType, T.DoubleType, T.StringType, T.BooleanType)


class _FileCommit(WriterCommitMessage):
    def __init__(self, filename: str):
        self.filename = filename


class _JsonlPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


_DEFAULT_RETENTION_SEC = 600.0


class _JsonlWriter(DataSourceWriter):
    def __init__(
        self,
        path: str,
        schema: T.StructType,
        overwrite: bool,
        retention_sec: float = _DEFAULT_RETENTION_SEC,
    ):
        self.path = path
        self.fields = [f.name for f in schema.fields]
        self.overwrite = overwrite
        self.retention_sec = retention_sec

    def write(self, rows: Iterator) -> _FileCommit:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        name = f"part-{pid:05d}-{uuid.uuid4().hex[:8]}.jsonl"
        tmp = os.path.join(self.path, "." + name)
        with open(tmp, "w") as fh:
            for row in rows:
                fh.write(
                    json.dumps({k: row[k] for k in self.fields}, sort_keys=True)
                )
                fh.write("\n")
        os.rename(tmp, os.path.join(self.path, name))
        return _FileCommit(name)

    def _old_manifest(self) -> dict:
        """Prior manifest, or an empty one ONLY when ``_SUCCESS`` is
        genuinely absent. A present-but-unparseable manifest raises:
        swallowing it would let an append silently rewrite the
        manifest without the previously committed files, turning a
        detectable corruption into silent data invisibility
        (ADVICE r6)."""
        try:
            fh = open(os.path.join(self.path, "_SUCCESS"))
        except FileNotFoundError:
            return {"files": [], "superseded": []}
        with fh:
            try:
                data = json.load(fh)
                files = list(data["files"])
            except (ValueError, KeyError, TypeError) as e:
                raise ValueError(
                    f"corrupt pyjsonl manifest at {self.path}/_SUCCESS: "
                    f"{e!r} — refusing to commit over it"
                ) from e
        return {"files": files, "superseded": list(data.get("superseded", []))}

    def commit(self, messages) -> None:
        # All destruction happens HERE, after every task succeeded —
        # never at writer construction (ADVICE r5: destroying at plan
        # time makes an aborted overwrite lose the previously
        # committed dataset). Task files are uniquely named, so old
        # and new coexist until the manifest swap; the rename is the
        # atomic commit point, and readers of the old manifest stay
        # consistent right up to it.
        #
        # The append-mode manifest merge is a read-modify-write:
        # without mutual exclusion two concurrent appenders would both
        # read the same old list and the second rename would silently
        # drop the first job's files (r6 review). An flock on a
        # sidecar lockfile serializes committers — same-host advisory
        # locking, which is exactly this connector's scope (a
        # distributed-FS deployment needs the versioned-table layer's
        # optimistic log, not this demo sink).
        import fcntl
        import time

        new_files = sorted(m.filename for m in messages if m is not None)
        lock_path = os.path.join(self.path, ".commit.lock")
        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            old = self._old_manifest()
            files = (
                new_files
                if self.overwrite
                else sorted(old["files"] + new_files)
            )
            # Overwrite never deletes superseded files at the commit
            # point: a reader that loaded the old _SUCCESS an instant
            # before the rename still holds paths it has not opened
            # yet (readers take no lock). Superseded files become
            # TOMBSTONES with a timestamp — invisible to new readers
            # immediately, physically removed by a LATER commit once
            # older than the retention grace (Delta's remove-tombstone
            # + retention model, scaled to a demo sink; ADVICE r6).
            now = time.time()
            superseded = list(old["superseded"])
            if self.overwrite:
                superseded += [
                    {"file": name, "ts": now}
                    for name in set(old["files"]) - set(files)
                ]
            keep: list[dict] = []
            for entry in superseded:
                if now - float(entry.get("ts", now)) >= self.retention_sec:
                    try:
                        os.remove(os.path.join(self.path, entry["file"]))
                    except OSError:
                        pass
                else:
                    keep.append(entry)
            tmp = os.path.join(self.path, f"._SUCCESS.{uuid.uuid4().hex[:8]}.tmp")
            with open(tmp, "w") as fh:
                json.dump({"files": files, "superseded": keep}, fh)
            os.rename(tmp, os.path.join(self.path, "_SUCCESS"))

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except OSError:
                    pass


class _JsonlReader(DataSourceReader):
    def __init__(self, path: str, schema: T.StructType):
        self.path = path
        self.schema = schema

    def partitions(self) -> list[_JsonlPartition]:
        with open(os.path.join(self.path, "_SUCCESS")) as fh:
            files = json.load(fh)["files"]
        return [
            _JsonlPartition(os.path.join(self.path, f)) for f in files
        ]

    def read(self, partition: _JsonlPartition) -> Iterator[tuple]:
        names = [f.name for f in self.schema.fields]
        with open(partition.path) as fh:
            for line in fh:
                rec = json.loads(line)
                yield tuple(rec.get(n) for n in names)


class JsonlDataSource(DataSource):
    """``format("pyjsonl")`` — flat-typed JSONL files with a
    committed-file manifest."""

    @classmethod
    def name(cls) -> str:
        return "pyjsonl"

    def schema(self):
        stored = self.options.get("schema")
        if not stored:
            raise ValueError(
                "pyjsonl read requires .option('schema', <ddl>) — the "
                "format stores no self-describing footer"
            )
        return stored

    def _check(self, schema: T.StructType) -> None:
        for f in schema.fields:
            if not isinstance(f.dataType, _SUPPORTED):
                raise TypeError(
                    f"pyjsonl supports flat long/int/double/string/bool "
                    f"columns only; {f.name} is {f.dataType.simpleString()}"
                )

    def writer(self, schema: T.StructType, overwrite: bool) -> _JsonlWriter:
        self._check(schema)
        path = self.options["path"]
        os.makedirs(path, exist_ok=True)
        retention = float(
            self.options.get(
                "supersededRetentionSec",
                self.options.get(
                    "supersededretentionsec", _DEFAULT_RETENTION_SEC
                ),
            )
        )
        return _JsonlWriter(path, schema, overwrite, retention_sec=retention)

    def reader(self, schema: T.StructType) -> _JsonlReader:
        self._check(schema)
        return _JsonlReader(self.options["path"], schema)
