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


class _JsonlWriter(DataSourceWriter):
    def __init__(self, path: str, schema: T.StructType, overwrite: bool):
        self.path = path
        self.fields = [f.name for f in schema.fields]
        self.overwrite = overwrite

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

    def _old_manifest(self) -> list[str]:
        try:
            with open(os.path.join(self.path, "_SUCCESS")) as fh:
                return list(json.load(fh)["files"])
        except (OSError, ValueError, KeyError):
            return []

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

        new_files = sorted(m.filename for m in messages if m is not None)
        lock_path = os.path.join(self.path, ".commit.lock")
        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            old_files = self._old_manifest()
            manifest = (
                new_files if self.overwrite else sorted(old_files + new_files)
            )
            tmp = os.path.join(self.path, f"._SUCCESS.{uuid.uuid4().hex[:8]}.tmp")
            with open(tmp, "w") as fh:
                json.dump({"files": manifest}, fh)
            os.rename(tmp, os.path.join(self.path, "_SUCCESS"))
            if self.overwrite:
                # Superseded data files are garbage once the new
                # manifest is durable; a crash between rename and
                # cleanup leaves only invisible orphans, never a
                # broken table.
                for name in set(old_files) - set(manifest):
                    try:
                        os.remove(os.path.join(self.path, name))
                    except OSError:
                        pass

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
        return _JsonlWriter(path, schema, overwrite)

    def reader(self, schema: T.StructType) -> _JsonlReader:
        self._check(schema)
        return _JsonlReader(self.options["path"], schema)
