"""Versioned-Parquet table layer — the Delta-style DML surface.

Re-implements, PySpark-natively, the capabilities the reference gets
from delta-spark (``README.md:9-11``): versioned writes, time travel
by version and timestamp (``api.py:74-80``), MERGE upsert
(``api.py:92-102``), predicate DELETE (``api.py:107``), history
(``api.py:60-67``), plus UPDATE/APPEND/RESTORE/VACUUM from the Delta
DML surface the reference adopts.

Layout::

    <path>/_log/00000000000000000000.json   commit entries (one per version)
    <path>/v=N/part-*.parquet               full snapshot for version N

Commit protocol: write the snapshot directory first, then the log
entry via write-temp + atomic ``os.rename`` — a reader never sees a
version whose data isn't fully on disk. Single-writer is assumed
(documented limitation; Delta's optimistic concurrency would add a
log-contention retry loop on the same layout). Two racing writers
cannot both win a version: the snapshot write uses
``mode("errorifexists")``, so the second committer of version N
fails at the data directory before touching the log — losers error
rather than corrupt; the retry loop is the missing convenience, not
the safety.

Copy-on-write at snapshot granularity: every commit rewrites the
table through a distributed ``df.write.parquet``. At 100 TB the
production variant rewrites only touched files using the per-commit
min/max key stats recorded in the log (data skipping); the log schema
already carries them (``key_stats``), and reads prune snapshot
directories by version, never by scanning data.

The MERGE semantics hazard in the reference is fixed here: multiple
source rows matching one target key raise (Delta's behavior) instead
of nondeterministically duplicating updates, and DELETE predicates
are Column expressions, not f-string SQL (``api.py:107`` renders
``id IN (7,)`` for single ids — invalid SQL — and is injectable).
"""

from __future__ import annotations

import json
import os
import tempfile
import time
import uuid
from datetime import date, datetime, timezone
from decimal import Decimal

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _stat_json(v):
    """JSON-serializable form of a per-file min/max stat, chosen so
    that serialized order matches value order (ISO strings for
    date/time, plain numbers otherwise)."""
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, Decimal):
        return float(v)
    return v


def _stat_key(v):
    """Comparison key aligning query bounds with stored stats."""
    if v is None:
        return None
    return _stat_json(v)


class MergeSourceKeyError(ValueError):
    """Multiple source rows match a single target key (Delta errors too)."""


class MergeSchemaError(ValueError):
    """Source schema drifts from the target and evolution wasn't requested."""


class ConstraintViolationError(ValueError):
    """A commit would write rows violating a table CHECK constraint."""


class VersionedTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._log_dir = os.path.join(path, "_log")

    # ----------------------------------------------------------------- lifecycle

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
        constraints: dict[str, str] | None = None,
    ) -> "VersionedTable":
        """Persist ``df`` as version 0 (``spark_project.py:36`` shape).

        ``partition_by`` lays every snapshot out hive-style on the
        given columns; reads then get directory-level partition
        pruning from Spark for free (the scale path for e.g. events
        partitioned by day — SURVEY.md §4). The choice is recorded in
        the CREATE log entry and applied to all later commits.

        ``constraints`` maps constraint name → SQL boolean expression
        (Delta CHECK constraints): every commit validates the new
        snapshot content and refuses to write rows where any
        expression is false or null — the ingest-time data-quality
        gate. The check is one distributed filter+limit per commit,
        short-circuiting at the first violation found."""
        t = cls(spark, path)
        if t.exists():
            raise FileExistsError(f"versioned table already exists at {path}")
        os.makedirs(t._log_dir, exist_ok=True)
        t._commit(
            df,
            "CREATE",
            {"partitionBy": partition_by or [], "constraints": constraints or {}},
        )
        return t

    @classmethod
    def create_if_absent(
        cls, spark: SparkSession, path: str, seed_df: DataFrame
    ) -> "VersionedTable":
        """Open the table, creating+seeding when missing — the
        reference's try/except AnalysisException flow
        (``spark_project.py:26-37``) without the exception round-trip."""
        t = cls(spark, path)
        if not t.exists():
            return cls.create(spark, path, seed_df)
        return t

    def exists(self) -> bool:
        return os.path.isdir(self._log_dir) and bool(self._versions())

    # ----------------------------------------------------------------- reads

    def to_df(self) -> DataFrame:
        """Latest snapshot (``api.py:74`` — ``names_table.toDF()``)."""
        return self.read()

    def read(
        self, version: int | None = None, timestamp: datetime | str | None = None
    ) -> DataFrame:
        """Snapshot read; time travel via version (``api.py:77``) or
        timestamp (``api.py:80``). Resolution is O(#commits) log
        replay — no data files are touched to pick the snapshot."""
        if version is not None and timestamp is not None:
            raise ValueError("pass either version or timestamp, not both")
        if version is None:
            version = (
                self._resolve_timestamp(timestamp)
                if timestamp is not None
                else self.latest_version()
            )
        versions = self._versions()
        if version not in versions:
            raise ValueError(f"version {version} not in table (have {sorted(versions)})")
        return self.spark.read.parquet(self._snapshot_dir(version))

    def latest_version(self) -> int:
        versions = self._versions()
        if not versions:
            raise FileNotFoundError(f"no versioned table at {self.path}")
        return max(versions)

    def history(self) -> DataFrame:
        """Commit log as a DataFrame (version, timestamp, operation,
        …) — the ``DeltaTable.history()`` surface (``api.py:63``)."""
        entries = [self._read_log(v) for v in sorted(self._versions(), reverse=True)]
        return self.spark.createDataFrame(
            [
                (
                    e["version"],
                    e["timestamp"],
                    e["operation"],
                    json.dumps(e.get("operationParameters", {}), sort_keys=True),
                    e.get("num_rows"),
                )
                for e in entries
            ],
            "version long, timestamp string, operation string, operationParameters string, num_rows long",
        )

    # ----------------------------------------------------------------- DML

    def append(self, df: DataFrame) -> int:
        """INSERT-append (Delta DML surface, ``README.md:11``)."""
        new = self.to_df().unionByName(df)
        return self._commit(new, "APPEND", {})

    def merge(self, source: DataFrame, key: str, evolve_schema: bool = False) -> int:
        """MERGE upsert on ``key``: update matched target rows from the
        source, insert unmatched source rows — exactly the reference's
        ``whenMatchedUpdate(...).whenNotMatchedInsert(...)`` chain
        (``api.py:92-102``), decomposed into anti-join ∪ source.

        Errors when the source has duplicate keys (Delta semantics):
        a target row may match at most one source row.

        Schema drift (the ``api.py:91`` hazard — the reference infers
        the source schema per request while the target's is fixed):
        by default a source missing target columns or carrying extras
        raises ``MergeSchemaError`` with the exact column sets. With
        ``evolve_schema=True``, Delta's autoMerge behavior applies —
        new source columns are added to the table (null for untouched
        rows), missing source columns are filled with null.
        """
        dup = source.groupBy(key).count().filter(F.col("count") > 1).limit(1).collect()
        if dup:
            raise MergeSourceKeyError(
                f"source has multiple rows for key {key}={dup[0][0]!r}"
            )
        target = self.to_df()
        t_cols, s_cols = set(target.columns), set(source.columns)
        if not evolve_schema:
            if t_cols != s_cols:
                raise MergeSchemaError(
                    f"source schema drift: missing={sorted(t_cols - s_cols)} "
                    f"extra={sorted(s_cols - t_cols)}; pass evolve_schema=True to merge anyway"
                )
            source = source.select(*target.columns)  # align column order
        else:
            for c in sorted(t_cols - s_cols):
                source = source.withColumn(c, F.lit(None).cast(target.schema[c].dataType))
            for c in sorted(s_cols - t_cols):
                target = target.withColumn(c, F.lit(None).cast(source.schema[c].dataType))
            source = source.select(*target.columns)
        untouched = target.join(source, key, "left_anti")
        new = untouched.unionByName(source)
        return self._commit(new, "MERGE", {"key": key})

    def delete(self, predicate: Column | str) -> int:
        """DELETE rows matching the predicate (``api.py:107``), taken
        as a Column expression — no f-string SQL construction."""
        pred = F.expr(predicate) if isinstance(predicate, str) else predicate
        new = self.to_df().filter(~pred)
        return self._commit(new, "DELETE", {"predicate": str(predicate)})

    def update(self, set_cols: dict[str, Column], where: Column | str) -> int:
        """UPDATE … SET … WHERE (Delta DML surface, ``README.md:11``)."""
        pred = F.expr(where) if isinstance(where, str) else where
        df = self.to_df()
        for name, value in set_cols.items():
            df = df.withColumn(name, F.when(pred, value).otherwise(F.col(name)))
        return self._commit(df, "UPDATE", {"where": str(where)})

    def restore(self, version: int) -> int:
        """Re-commit an old snapshot as the newest version."""
        snap = self.read(version=version)
        return self._commit(snap, "RESTORE", {"sourceVersion": version})

    def optimize(
        self,
        target_files: int = 8,
        cluster_by: list[str] | None = None,
        zorder_by: list[str] | None = None,
    ) -> int:
        """Delta-style OPTIMIZE: rewrite the latest snapshot into
        ``target_files`` bin-packed files, optionally range-clustered
        on ``cluster_by`` so each file carries a tight min/max band —
        which is what makes ``read_range``'s stats pruning selective.
        Content-identical to the previous version (same rows, new
        layout); at 100 TB this is the periodic maintenance job that
        keeps file counts bounded and skipping effective.

        ``zorder_by`` (mutually exclusive with ``cluster_by``)
        clusters on the Z-order curve of several numeric columns:
        each column is min-max-scaled to a 16-bit rank and the bits
        are interleaved, so files carry tight bands on EVERY listed
        column, not just the first — lexicographic range clustering
        only helps its leading column."""
        if cluster_by and zorder_by:
            raise ValueError("pass either cluster_by or zorder_by, not both")
        df = self.to_df()
        if zorder_by:
            df = df.repartitionByRange(
                target_files, _zorder_key(df, zorder_by)
            ).sortWithinPartitions(_zorder_key(df, zorder_by))
        elif cluster_by:
            df = df.repartitionByRange(target_files, *cluster_by)
        else:
            df = df.coalesce(target_files)
        return self._commit(
            df,
            "OPTIMIZE",
            {
                "targetFiles": target_files,
                "clusterBy": cluster_by or [],
                "zorderBy": zorder_by or [],
            },
        )

    def changes(self, from_version: int, to_version: int | None = None) -> DataFrame:
        """CDC-style change feed between two versions: full-row diff
        with a ``_change_type`` column (``insert`` / ``delete``;
        an update appears as delete+insert of the changed row).
        Computed as two anti-diffs of the snapshots — O(rows) with a
        single shuffle each, no log of row-level deltas needed."""
        if to_version is None:
            to_version = self.latest_version()
        old = self.read(version=from_version)
        new = self.read(version=to_version)
        inserted = new.exceptAll(old).withColumn("_change_type", F.lit("insert"))
        deleted = old.exceptAll(new).withColumn("_change_type", F.lit("delete"))
        return inserted.unionByName(deleted)

    def vacuum(self, retain_last: int = 2) -> list[int]:
        """Drop snapshot data directories beyond the retention window;
        the log is kept so history stays queryable. Returns vacuumed
        versions."""
        import shutil

        keep = set(sorted(self._versions())[-retain_last:])
        dropped = []
        for v in sorted(self._versions()):
            snap = self._snapshot_dir(v)
            if v not in keep and os.path.isdir(snap):
                shutil.rmtree(snap)
                dropped.append(v)
        return dropped

    # ------------------------------------------------------- data skipping

    def read_range(
        self,
        col: str,
        lower=None,
        upper=None,
        version: int | None = None,
    ) -> DataFrame:
        """Range read with file-level data skipping.

        Uses the per-file min/max recorded in the commit log to open
        only files whose ``[min, max]`` overlaps ``[lower, upper]``
        (the Delta data-skipping pattern, approximated at file
        granularity per SURVEY.md §4). The residual predicate is
        still applied, so results are exact regardless of stats.
        At 100 TB this is the difference between touching a handful
        of files and scanning the snapshot: the log read is
        O(#files) JSON, no data I/O happens for pruned files.
        """
        if version is None:
            version = self.latest_version()
        entry = self._read_log(version)
        full = self.read(version=version)
        pred = F.lit(True)
        if lower is not None:
            pred = pred & (F.col(col) >= F.lit(lower))
        if upper is not None:
            pred = pred & (F.col(col) <= F.lit(upper))
        files = entry.get("files")
        if not files:  # pre-stats log entry: correct, unpruned
            return full.filter(pred)
        lo_key, up_key = _stat_key(lower), _stat_key(upper)
        selected = []
        for f in files:
            stats = f.get("stats", {}).get(col)
            if stats is None:  # no stats for this column: must read
                selected.append(f["path"])
                continue
            fmin, fmax = stats
            if fmin is None or fmax is None:  # nulls present / unknown
                selected.append(f["path"])
                continue
            if lo_key is not None and _stat_key(fmax) < lo_key:
                continue
            if up_key is not None and _stat_key(fmin) > up_key:
                continue
            selected.append(f["path"])
        if not selected:
            return full.filter(F.lit(False))
        # basePath keeps hive partition columns resolvable when
        # addressing leaf files directly on a partitioned snapshot.
        return (
            self.spark.read.option("basePath", self._snapshot_dir(version))
            .schema(full.schema)
            .parquet(*selected)
            .filter(pred)
        )

    def _collect_file_stats(self, snap: str) -> tuple[list[dict], int]:
        """One distributed pass: per-file row counts + min/max of
        every atomic column (the commit-log data-skipping stats)."""
        df = self.spark.read.parquet(snap)
        stat_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(
                f.dataType,
                (
                    T.NumericType,
                    T.StringType,
                    T.DateType,
                    T.TimestampType,
                    T.TimestampNTZType,
                    T.BooleanType,
                ),
            )
        ]
        aggs = [F.count(F.lit(1)).alias("__n")]
        for c in stat_cols:
            aggs.append(F.min(c).alias(f"__min_{c}"))
            aggs.append(F.max(c).alias(f"__max_{c}"))
        rows = df.groupBy(F.input_file_name().alias("__file")).agg(*aggs).collect()
        files = [
            {
                "path": r["__file"],
                "num_rows": r["__n"],
                "stats": {
                    c: [_stat_json(r[f"__min_{c}"]), _stat_json(r[f"__max_{c}"])]
                    for c in stat_cols
                },
            }
            for r in rows
        ]
        return files, sum(r["__n"] for r in rows)

    # ----------------------------------------------------------------- internals

    def _versions(self) -> set[int]:
        if not os.path.isdir(self._log_dir):
            return set()
        return {
            int(f.split(".")[0])
            for f in os.listdir(self._log_dir)
            if f.endswith(".json")
        }

    def _snapshot_dir(self, version: int) -> str:
        return os.path.join(self.path, f"v={version}")

    def _read_log(self, version: int) -> dict:
        with open(os.path.join(self._log_dir, f"{version:020d}.json")) as fh:
            return json.load(fh)

    def _resolve_timestamp(self, ts: datetime | str) -> int:
        """Max version with commit timestamp ≤ ts (``api.py:80``)."""
        if isinstance(ts, str):
            ts = datetime.fromisoformat(ts)
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=timezone.utc)
        candidates = [
            v
            for v in self._versions()
            if datetime.fromisoformat(self._read_log(v)["timestamp"]) <= ts
        ]
        if not candidates:
            raise ValueError(f"no version at or before {ts.isoformat()}")
        return max(candidates)

    def partition_columns(self) -> list[str]:
        """Table partitioning, from the CREATE entry (empty if none)."""
        if 0 not in self._versions():
            return []
        return self._read_log(0).get("operationParameters", {}).get("partitionBy", [])

    def constraints(self) -> dict[str, str]:
        """Table CHECK constraints, from the CREATE entry."""
        if 0 not in self._versions():
            return {}
        return self._read_log(0).get("operationParameters", {}).get("constraints", {})

    def _check_constraints(self, df: DataFrame, checks: dict[str, str]) -> None:
        for name, expr in checks.items():
            bad = df.filter(~F.coalesce(F.expr(expr), F.lit(False))).limit(1).collect()
            if bad:
                raise ConstraintViolationError(
                    f"constraint {name!r} ({expr}) violated, e.g. row {bad[0].asDict()}"
                )

    def _commit(self, df: DataFrame, operation: str, params: dict) -> int:
        versions = self._versions()
        version = (max(versions) + 1) if versions else 0
        checks = params.get("constraints") if operation == "CREATE" else self.constraints()
        if checks:
            self._check_constraints(df, checks)
        snap = self._snapshot_dir(version)
        part_cols = params.get("partitionBy") if operation == "CREATE" else self.partition_columns()
        writer = df.write.mode("errorifexists")
        if part_cols:
            writer = writer.partitionBy(*part_cols)
        writer.parquet(snap)
        files, num_rows = self._collect_file_stats(snap)
        entry = {
            "version": version,
            "timestamp": datetime.now(timezone.utc).isoformat(),
            "operation": operation,
            "operationParameters": params,
            "num_rows": num_rows,
            "files": files,
        }
        os.makedirs(self._log_dir, exist_ok=True)
        tmp = os.path.join(self._log_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(entry, fh)
        os.rename(tmp, os.path.join(self._log_dir, f"{version:020d}.json"))
        # distinct wall-clock per commit so timestamp travel is total-ordered
        time.sleep(0.002)
        return version


_Z_BITS = 16


def _zorder_key(df: DataFrame, cols: list[str]) -> Column:
    """Z-order curve value: min-max-scale each column to a _Z_BITS
    rank, interleave the bits. The min/max pass is one tiny aggregate
    (2 scalars per column to the driver)."""
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"hi_{c}") for c in cols],
    ).first()
    n = len(cols)
    z = F.lit(0).cast("long")
    max_rank = (1 << _Z_BITS) - 1
    for i, c in enumerate(cols):
        lo, hi = bounds[f"lo_{c}"], bounds[f"hi_{c}"]
        span = (hi - lo) or 1.0
        rank = F.least(
            F.lit(max_rank),
            F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * max_rank).cast("long"),
        )
        for j in range(_Z_BITS):
            # bit j of rank → bit (j*n + i) of the z value
            z = z + F.shiftleft(F.shiftright(rank, j).bitwiseAND(F.lit(1)), j * n + i)
    return z


def temp_table_path(prefix: str = "vtable") -> str:
    """Fresh path for a throwaway versioned table (tests/queries)."""
    return os.path.join(tempfile.mkdtemp(prefix=f"dlps-{prefix}-"), "table")
