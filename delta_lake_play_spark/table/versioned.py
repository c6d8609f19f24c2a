"""Versioned-Parquet table layer — the Delta-style DML surface.

Re-implements, PySpark-natively, the capabilities the reference gets
from delta-spark (``README.md:9-11``): versioned writes, time travel
by version and timestamp (``api.py:74-80``), MERGE upsert
(``api.py:92-102``), predicate DELETE (``api.py:107``), history
(``api.py:60-67``), plus UPDATE/APPEND/RESTORE/VACUUM from the Delta
DML surface the reference adopts.

Layout::

    <path>/_log/00000000000000000000.json   commit entries (one per version)
    <path>/c-N-<uid>/part-*.parquet         data files written BY commit N
                                            (no "=" in the name, so hive
                                            partition inference ignores it)

Each log entry carries the **complete file list** for its version
(paths relative to the table root + per-file row counts and min/max
stats), so a version is an arbitrary set of files spanning many
commit directories. DML is **file-granular copy-on-write**, the same
algorithm delta-core runs for the reference (``api.py:92-107``):

1. find *touched* files — the files that physically contain rows
   matching the DELETE/UPDATE predicate or MERGE keys (one
   distributed scan with ``input_file_name()``; parquet predicate
   pushdown and file stats keep it cheap),
2. rewrite only those files' rows into a fresh commit directory,
3. carry every untouched file forward **by reference** in the new
   log entry.

A 1-row MERGE on a 100 TB table therefore rewrites one file, not
100 TB; APPEND writes only the new rows; RESTORE writes no data at
all (it re-references the old version's file list).

Commit protocol: data files first (into a commit-unique directory —
two racing writers can never collide on data paths), then the log
entry via write-temp + atomic ``os.link``, which fails if the
version number was taken. Losing writers raise
``VersionConflictError`` and the DML methods retry against the new
latest snapshot (optimistic concurrency, Delta's loop on
``_delta_log`` conflicts). A writer that crashes between data write
and log link leaves an orphaned directory that ``vacuum`` reclaims;
readers never see it because reads go through the log's file list.

Per-file stats come from the parquet **footers** of just-written
files (driver-side ``pyarrow`` metadata reads — no second data
scan). On a cluster with an object store this loop would fan out,
but it is O(#new files) footer fetches either way, never a rescan.

Storage assumption: the commit point is an atomic create-if-absent
of the log entry (``os.link``), which POSIX filesystems and HDFS
provide. Object stores without atomic create (S3) need the same
protocol routed through a conditional-put or a commit/locking
service — exactly the boundary delta-core draws with its
LogStore abstraction; the layout and recovery story are unchanged.
"""

from __future__ import annotations

import json
import os
import re
import tempfile
import uuid
from shutil import rmtree as _rmtree
from datetime import date, datetime, timedelta, timezone
from decimal import Decimal
from urllib.parse import unquote

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"

# Masked reads broadcast the deletion-vector side of the anti-join only
# while the table's total masked-position count stays under this bound
# (~tens of MB of (path, pos) rows); beyond it the join degrades
# gracefully to a shuffled anti-join instead of OOMing the driver.
_DV_BROADCAST_MAX = 4_000_000

_REPLACE_WHERE_VIOLATION = "REPLACE_WHERE_SOURCE_OUTSIDE_SLICE"

# Per-file bloom index geometry (bloom_filter_cols tables): 4096 bits
# (512 B/file/column in the log) with k=3 hashes holds the
# false-positive rate under ~5% up to ~700 distinct values per file
# and degrades gracefully (never incorrectly) beyond.
_BLOOM_BITS = 4096
_BLOOM_HASHES = 3


def _dv_sidecars(f: dict) -> list[str]:
    """Sidecar parquet dirs referenced by a file entry's deletion vector."""
    dv = f.get("dv")
    if isinstance(dv, dict):
        return list(dv.get("sidecars", []))
    return []


def _dv_legacy(f: dict) -> list[int]:
    """Inline row-index list of a pre-sidecar deletion vector."""
    dv = f.get("dv")
    if isinstance(dv, list):
        return dv
    if isinstance(dv, dict):
        return list(dv.get("legacy", []))
    return []


def _dv_count(f: dict) -> int:
    """Exact number of rows masked out of a file by its deletion vector."""
    dv = f.get("dv")
    if not dv:
        return 0
    if isinstance(dv, list):
        return len(dv)
    return int(dv.get("count", 0))

_STAT_TYPES = (
    T.NumericType,
    T.StringType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
    T.BooleanType,
)


def _rekey_file(
    f: dict, rename: dict | None = None, drop: set | None = None
) -> dict:
    """Copy of a log file entry with per-column metadata keys
    (stats / null counts / bloom bitmaps) renamed or dropped —
    RENAME/DROP COLUMN are metadata-only, so the data-skipping
    metadata follows the logical name."""
    out = dict(f)
    for key in ("stats", "nullCounts", "bloom", "bloomTypes"):
        if key in out:
            out[key] = {
                (rename or {}).get(c, c): v
                for c, v in out[key].items()
                if not (drop and c in drop)
            }
    return out


def _stat_json(v):
    """JSON-serializable form of a per-file min/max stat, chosen so
    that serialized order matches value order (ISO strings for
    date/time, plain numbers otherwise)."""
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    return v


def _stat_key(v):
    """Comparison key aligning query bounds with stored stats."""
    if v is None:
        return None
    return _stat_json(v)


_INTEGRALS = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _widen_allowed(from_t: T.DataType, to_t: T.DataType) -> bool:
    """The Delta ``typeWidening`` whitelist, intersected with what
    Spark 4's vectorized parquet reader actually upcasts at scan time
    (PROTOCOL.md type-widening table): integral up-chain,
    integral→double, float→double, date→timestamp_ntz,
    int/long→decimal (enough integer digits), decimal→wider decimal.
    byte/short→decimal is in the Delta spec but Spark's reader
    refuses INT32-with-INT(16/8)-annotation → DECIMAL, so it is
    excluded here — the whitelist is engine-honest, never a promise
    the scan cannot keep."""
    if isinstance(from_t, _INTEGRALS) and isinstance(to_t, _INTEGRALS):
        order = [t.__name__ for t in _INTEGRALS]
        return order.index(type(to_t).__name__) > order.index(type(from_t).__name__)
    if isinstance(from_t, _INTEGRALS) and isinstance(to_t, T.DoubleType):
        return True
    if isinstance(from_t, T.FloatType) and isinstance(to_t, T.DoubleType):
        return True
    if isinstance(from_t, T.DateType) and isinstance(to_t, T.TimestampNTZType):
        return True
    if isinstance(to_t, T.DecimalType):
        digits = to_t.precision - to_t.scale
        if isinstance(from_t, T.IntegerType):
            return digits >= 10
        if isinstance(from_t, T.LongType):
            return digits >= 20
        if isinstance(from_t, T.DecimalType):
            return (
                (to_t.precision, to_t.scale) != (from_t.precision, from_t.scale)
                and to_t.scale >= from_t.scale
                and digits >= from_t.precision - from_t.scale
            )
    return False


def _widen_keeps_stats(from_t: T.DataType, to_t: T.DataType) -> bool:
    """Whether a widened column's carried footer stats stay usable
    for skipping: numeric→numeric bounds compare fine across Python
    int/float/Decimal; date→timestamp_ntz bounds are ISO strings of
    DIFFERENT shapes, so those are dropped (absence degrades to no
    pruning, never to a wrong skip)."""
    return not isinstance(to_t, T.TimestampNTZType)


def _widens(src_t: T.DataType, tgt_t: T.DataType) -> bool:
    """True when ``src_t`` is a STRICTLY wider lossless type than
    ``tgt_t`` — i.e. widening the table column from ``tgt_t`` to
    ``src_t`` is on the whitelist."""
    return _widen_allowed(tgt_t, src_t)


def _check_set_columns(set_cols: dict, schema: T.StructType) -> None:
    """UPDATE SET on a column the table does not have must fail fast
    (the legacy withColumn path raised from Catalyst; the single-select
    pre-image builder iterates the table's columns, so without this
    guard a typo'd SET would silently no-op the whole update)."""
    unknown = sorted(set(set_cols) - {f.name for f in schema.fields})
    if unknown:
        raise ValueError(
            f"UPDATE SET references non-existent column(s) {unknown}; "
            f"table columns: {[f.name for f in schema.fields]}"
        )


def _identity_expr(idcfg: dict, hwm: int):
    """Identity-value assignment for one write (Delta ``GENERATED
    ALWAYS AS IDENTITY``): ``hwm + step * (1 + partition-unique id)``.
    ``monotonically_increasing_id`` is unique within the job with NO
    cross-task coordination — exactly how Delta's writer assigns
    identity values — at the cost of gaps (the partition index rides
    the high bits), which the Delta identity contract explicitly
    allows. The new high-water mark is recovered for free from the
    written files' footer max-stats (``_commit_files``), so
    assignment is collect-free and single-pass at any scale."""
    step = int(idcfg.get("step", 1))
    return (
        F.lit(int(hwm) + step)
        + F.lit(step) * F.monotonically_increasing_id()
    ).cast("long")


class IdentityColumnError(ValueError):
    """Explicit write / ALTER against a GENERATED ALWAYS AS IDENTITY
    column."""


class MergeSourceKeyError(ValueError):
    """Multiple source rows match a single target key (Delta errors too)."""


class MergeSchemaError(ValueError):
    """Source schema drifts from the target and evolution wasn't requested."""


class ConstraintViolationError(ValueError):
    """A commit would write rows violating a table CHECK constraint."""


class TypeWideningError(ValueError):
    """The requested column type change is not a lossless widening."""


class AppendOnlyError(RuntimeError):
    """Row-changing DML attempted on a ``delta.appendOnly`` table."""


class VersionConflictError(RuntimeError):
    """Another writer committed the target version first (retryable)."""


# Delta's own commit loop retries effectively unbounded
# (maxCommitAttempts 10M); 20 keeps heavy multi-writer contention
# green while still surfacing a livelock in finite time. Tunable per
# table via the ``max_commit_retries`` attribute.
_MAX_COMMIT_RETRIES = 20

# Data directories are named c-<version>-<hex8> (deliberately free of
# "=" so Spark never hive-infers partitions from them on leaf reads).
_COMMIT_DIR_RE = re.compile(r"^c-\d+-[0-9a-f]{8}$")


class VersionedTable:
    #: Commits whose file list exceeds this spill the manifest to a
    #: parquet sidecar under ``_log/manifests/`` instead of inlining it
    #: in the JSON entry (see ``_commit_files``). Class-level so tests
    #: can lower it to exercise the spill path on small tables.
    manifest_inline_max: int = 512

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
        bloom_filter_cols: list[str] | None = None,
        generated: dict[str, str] | None = None,
        delta_mirror: bool = False,
        enable_cdf: bool = False,
        identity: dict | None = None,
        row_tracking: bool = False,
        in_commit_timestamps: bool = False,
        checkpoint_policy: str = "classic",
        cluster_by: list[str] | None = None,
        append_only: bool = False,
        dv_mirror_policy: str = "materialize",
        vacuum_protocol_check: bool = False,
    ) -> "VersionedTable":
        """Persist ``df`` as version 0 (``spark_project.py:36`` shape).

        ``partition_by`` lays every commit's files out hive-style on
        the given columns; reads then get directory-level partition
        pruning from Spark for free (the scale path for e.g. events
        partitioned by day — SURVEY.md §4). The choice is recorded in
        the CREATE log entry and applied to all later commits.

        ``constraints`` maps constraint name → SQL boolean expression
        (Delta CHECK constraints): every commit validates the rows it
        is about to WRITE (not the carried files, which were already
        validated at their own commit) and refuses to write rows
        where any expression is false or null — the ingest-time
        data-quality gate, one distributed filter+limit per commit.

        ``bloom_filter_cols`` (Delta bloom-filter-index shape): every
        commit records a small per-file bloom bitmap for each listed
        column; ``read_point`` then skips files whose bloom excludes
        the probe value — the pruning min/max stats cannot give on
        high-cardinality keys whose values are scattered so every
        file spans the full range.

        ``generated`` maps column name → SQL expression (Delta
        ``GENERATED ALWAYS AS``): the column is recomputed from the
        expression at every write (writers may omit it), so e.g.
        ``{"day": "date_trunc('day', ts)"}`` plus
        ``partition_by=["day"]`` gives expression-derived partition
        pruning without trusting writers to derive the value.

        ``delta_mirror=True`` additionally maintains a REAL Delta
        transaction log (``_delta_log/N.json`` + parquet checkpoints
        per the open Delta protocol, see ``table/delta_log.py``) next
        to the private log on every commit, sharing the same data
        files — external Delta readers can then read any snapshot.
        MoR ``delete_mor`` on a mirrored table auto-materializes the
        deletion vectors on the mirror side (survivors rewritten once
        per DV state, ``delta_log.py``) since protocol (1, 2) has no
        DV representation; the private table keeps zero-rewrite MoR
        reads.

        ``enable_cdf=True`` turns on the Change Data Feed (Delta
        ``delta.enableChangeDataFeed``): every row-changing commit
        additionally records the changed rows themselves — with a
        ``_change_type`` of ``insert`` / ``delete`` /
        ``update_preimage`` / ``update_postimage`` — as parquet under
        ``_change_data/``, sized to the CHANGE, not the table.
        ``table_changes(from, to)`` then serves row-level CDC without
        diffing snapshots, and a ``delta_mirror=True`` table emits the
        corresponding protocol ``cdc`` actions so external Delta CDF
        readers see the same feed. Pure appends write no change files
        (readers derive inserts from the added files, exactly the
        Delta protocol's CDF fallback rule)."""
        t = cls(spark, path)
        if t.exists():
            raise FileExistsError(f"versioned table already exists at {path}")
        if checkpoint_policy not in ("classic", "v2"):
            raise ValueError(
                f"checkpoint_policy must be 'classic' or 'v2', got "
                f"{checkpoint_policy!r}"
            )
        if dv_mirror_policy not in ("materialize", "native"):
            raise ValueError(
                f"dv_mirror_policy must be 'materialize' or 'native', "
                f"got {dv_mirror_policy!r}"
            )
        if identity:
            identity = {
                "column": identity["column"],
                "start": int(identity.get("start", 1)),
                "step": int(identity.get("step", 1)),
            }
            if identity["step"] < 1:
                raise ValueError("identity step must be >= 1")
            ic = identity["column"]
            if ic in df.columns:
                raise IdentityColumnError(
                    f"column {ic!r} is GENERATED ALWAYS AS IDENTITY; "
                    f"explicit values are refused — omit it from the input"
                )
            if ic in (generated or {}) or ic in (partition_by or []):
                raise ValueError(
                    f"identity column {ic!r} collides with a generated/"
                    f"partition column"
                )
        if cluster_by:
            missing = [c for c in cluster_by if c not in df.columns]
            if missing:
                raise ValueError(
                    f"cluster_by columns not in the data: {missing}"
                )
            if any(c in (partition_by or []) for c in cluster_by):
                raise ValueError(
                    "cluster_by and partition_by are mutually exclusive "
                    "per column (Delta clustered tables are unpartitioned)"
                )
        os.makedirs(t._log_dir, exist_ok=True)
        for name, expr in (generated or {}).items():
            df = df.withColumn(name, F.expr(expr))
        if identity:
            df = df.withColumn(
                identity["column"],
                _identity_expr(identity, identity["start"] - identity["step"]),
            )
        if cluster_by:
            # initial layout honors the declared clustering: range-
            # partition so each file carries a tight min/max band on
            # the clustering columns from the very first commit
            df = df.repartitionByRange(*cluster_by)
        t._commit_files(
            df,
            [],
            "CREATE",
            {
                "partitionBy": partition_by or [],
                "constraints": constraints or {},
                "bloomFilterCols": bloom_filter_cols or [],
                "generated": generated or {},
                "deltaMirror": bool(delta_mirror),
                "enableCdf": bool(enable_cdf),
                "identity": identity or {},
                "rowTracking": bool(row_tracking),
                "inCommitTimestamps": bool(in_commit_timestamps),
                "checkpointPolicy": checkpoint_policy,
                "clusterBy": list(cluster_by or []),
                "appendOnly": bool(append_only),
                "dvMirrorPolicy": dv_mirror_policy,
                "vacuumProtocolCheck": bool(vacuum_protocol_check),
            },
            df.schema,
        )
        return t

    @classmethod
    def convert(cls, spark: SparkSession, path: str, source_dir: str) -> "VersionedTable":
        """In-place conversion of an existing plain-parquet directory
        (Delta ``CONVERT TO DELTA``): version 0 references the
        existing data files by absolute path — per-file stats come
        from their parquet footers, ZERO bytes of data are rewritten,
        so converting a 100 TB directory costs one footer sweep plus
        one log write. Later DML is copy-on-write under the table's
        own directory; the source files are never mutated (the same
        sharing caveat as a shallow CLONE applies to vacuuming the
        source directory out from under the table).

        Hive-partitioned sources (``key=value`` subdirectories) are
        rejected: their inferred schema contains partition columns the
        parquet footers lack, so a conversion would log files missing
        those columns and fail only at read time. Rewrite through
        ``create(..., partition_by=...)`` instead."""
        t = cls(spark, path)
        if t.exists():
            raise FileExistsError(f"versioned table already exists at {path}")
        for root, dirs, _files in os.walk(source_dir):
            part_dirs = [d for d in dirs if "=" in d]
            if part_dirs:
                raise ValueError(
                    f"convert: {source_dir} is hive-partitioned "
                    f"(e.g. {os.path.join(root, part_dirs[0])!r}); partition "
                    f"columns exist only in directory names, not in parquet "
                    f"footers, so an in-place conversion would produce a "
                    f"table missing them. Load and rewrite via "
                    f"VersionedTable.create(..., partition_by=[...])."
                )
        schema = spark.read.parquet(source_dir).schema
        files = t._footer_entries(
            "", schema, [], base_dir=source_dir, absolute=True
        )
        if not files:
            raise FileNotFoundError(f"no parquet files under {source_dir}")
        os.makedirs(t._log_dir, exist_ok=True)
        entry = {
            "version": 0,
            "timestamp": t._commit_timestamp(0),
            "operation": "CONVERT",
            "operationParameters": {
                "sourceDir": source_dir,
                "partitionBy": [],
                "constraints": {},
            },
            "num_rows": sum(f["num_rows"] for f in files),
            "files": files,
            "schema": json.loads(schema.json()),
        }
        tmp = os.path.join(t._log_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(entry, fh)
        try:
            os.link(tmp, os.path.join(t._log_dir, f"{0:020d}.json"))
        except FileExistsError:
            raise VersionConflictError("version 0 committed by another writer") from None
        finally:
            os.unlink(tmp)
        return t

    @classmethod
    def create_if_absent(
        cls, spark: SparkSession, path: str, seed_df: DataFrame, **create_kwargs
    ) -> "VersionedTable":
        """Open the table, creating+seeding when missing — the
        reference's try/except AnalysisException flow
        (``spark_project.py:26-37``) without the exception round-trip.

        Race-safe: two concurrent callers both seeing the table absent
        both attempt CREATE; version 0's atomic link admits exactly
        one, and the loser opens the winner's table instead of
        surfacing the conflict (its orphaned seed directory is
        vacuum-reclaimable)."""
        t = cls(spark, path)
        if not t.exists():
            try:
                return cls.create(spark, path, seed_df, **create_kwargs)
            except (FileExistsError, VersionConflictError):
                pass  # another creator won the version-0 race
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
        entry = self._read_log(version)
        return self._read_entry(entry)

    def latest_version(self) -> int:
        versions = self._versions()
        if not versions:
            raise FileNotFoundError(f"no versioned table at {self.path}")
        return max(versions)

    def history(self) -> DataFrame:
        """Commit log as a DataFrame (version, timestamp, operation,
        …) — the ``DeltaTable.history()`` surface (``api.py:63``).
        Reads the raw O(1) JSON entries only: file lists (and any
        manifest sidecars) are never resolved, so history over a
        million-file table stays metadata-cheap."""
        entries = [
            self._read_log_raw(v) for v in sorted(self._versions(), reverse=True)
        ]
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

    def append(
        self,
        df: DataFrame,
        txn_app_id: str | None = None,
        txn_version: int | None = None,
    ) -> int:
        """INSERT-append (Delta DML surface, ``README.md:11``): writes
        ONLY the new rows; every existing file is carried by
        reference — O(new data), not O(table).

        ``txn_app_id`` + ``txn_version`` make the append IDEMPOTENT
        (Delta's SetTransaction / ``txn`` action — the exactly-once
        primitive streaming sinks rely on): if the table has already
        recorded a version >= ``txn_version`` for this app id, the
        append is a no-op returning the current table version. The
        check runs INSIDE the optimistic-commit attempt, so a retry
        after a version conflict re-validates against whatever the
        concurrent writer landed — a replayed micro-batch can never
        double-append even under writer races."""
        if (txn_app_id is None) != (txn_version is None):
            raise ValueError("pass both txn_app_id and txn_version, or neither")

        def attempt() -> int:
            base = self.latest_version()
            if txn_app_id is not None:
                last = self.last_txn_version(txn_app_id)
                if last is not None and txn_version <= last:
                    return base  # already applied: idempotent no-op
            entry = self._read_log(base)
            schema = self._entry_schema(entry)
            gen = set(self.generated_columns())
            idcfg = self.identity_info()
            idcols = {idcfg["column"]} if idcfg else set()
            have, want = set(df.columns), {f.name for f in schema.fields}
            if idcfg and idcfg["column"] in have:
                raise IdentityColumnError(
                    f"column {idcfg['column']!r} is GENERATED ALWAYS AS "
                    f"IDENTITY; explicit values are refused — omit it"
                )
            # generated and identity columns may be omitted — they are
            # recomputed / assigned at write time regardless; so may
            # DEFAULT-bearing columns (filled below, Delta
            # allowColumnDefaults semantics)
            defaults = self.column_defaults()
            defaulted = {c for c in defaults if c in want and c not in have}
            if (have - want) or (want - have) - gen - idcols - defaulted:
                raise MergeSchemaError(
                    f"append schema drift: "
                    f"missing={sorted(want - have - gen - idcols - defaulted)} "
                    f"extra={sorted(have - want)}"
                )
            wide = [
                f.name
                for f in schema.fields
                if f.name in have and _widens(df.schema[f.name].dataType, f.dataType)
            ]
            if wide:  # silent downcast would truncate — make it loud
                raise MergeSchemaError(
                    f"append would narrow wider source columns {wide}; "
                    f"widen the table via merge(evolve_schema=True) first"
                )
            adf = df
            if defaulted:
                field_of = {f.name: f for f in schema.fields}
                for c in sorted(defaulted):
                    adf = adf.withColumn(
                        c, F.expr(defaults[c]).cast(field_of[c].dataType)
                    )
                have = have | defaulted
            if idcfg:
                # assign above the CURRENT high-water mark; a conflict
                # retry re-reads the entry, so racing appends can
                # never hand out overlapping ids
                adf = adf.withColumn(
                    idcfg["column"],
                    _identity_expr(idcfg, self._identity_hwm(entry, idcfg)),
                )
                have = have | idcols
            aligned = adf.select(
                *[
                    F.col(f.name).cast(f.dataType)
                    for f in schema.fields
                    if f.name in have
                ]
            )
            return self._commit_files(
                aligned, list(entry["files"]), "APPEND", {}, schema,
                base_version=base,
                txn=(
                    {"appId": txn_app_id, "version": int(txn_version)}
                    if txn_app_id is not None
                    else None
                ),
                column_map=entry.get("columnMap"),
                retired_physical=entry.get("retiredPhysical"),
            )

        return self._retrying(attempt)

    def last_txn_version(self, app_id: str) -> int | None:
        """Latest SetTransaction version recorded for ``app_id``
        (Delta ``txn`` action), or None. Metadata-only: scans log
        entries newest-first and stops at the first hit."""
        for v in sorted(self._versions(), reverse=True):
            txn = self._read_log_raw(v).get("txn")
            if txn and txn.get("appId") == app_id:
                return int(txn["version"])
        return None

    def merge(
        self,
        source: DataFrame,
        key: str,
        evolve_schema: bool = False,
        delete_matched_where: Column | str | None = None,
    ) -> int:
        """MERGE upsert on ``key``: update matched target rows from the
        source, insert unmatched source rows — exactly the reference's
        ``whenMatchedUpdate(...).whenNotMatchedInsert(...)`` chain
        (``api.py:92-102``). File-granular: only files physically
        holding a matched key are rewritten; the rest carry forward.

        ``delete_matched_where`` adds Delta's ``whenMatchedDelete``
        clause: a matched source row whose (source-side) predicate is
        TRUE deletes the target row instead of updating it, and is not
        inserted. The tombstone-feed pattern — one MERGE applies a CDC
        batch of upserts AND deletes. No extra scan: the delete rows
        ride the same touched-file detection and the clause is one
        filter on the source.

        Errors when the source has duplicate keys (Delta semantics):
        a target row may match at most one source row.

        Schema drift (the ``api.py:91`` hazard — the reference infers
        the source schema per request while the target's is fixed):
        by default a source missing target columns or carrying extras
        raises ``MergeSchemaError`` with the exact column sets. With
        ``evolve_schema=True``, Delta's autoMerge behavior applies —
        new source columns are added to the table schema (carried
        files simply read as null for them; no rewrite), missing
        source columns are filled with null.
        """
        self._refuse_if_append_only("MERGE")
        # One source aggregation serves both the duplicate-key check
        # (Delta semantics: a target row may match at most one source
        # row) and the touched-file semi-join below — no second scan.
        # The check itself is FUSED into the touched-file probe job
        # (optimization r12, guide §7.3 driver-side fixed cost): the
        # commit-bound keys run 25-30 sub-second jobs each and every
        # extra action costs a scheduling gap, so the dup probe rides
        # the same collect as the file probe instead of its own job.
        src_keys = source.groupBy(key).count().persist()

        def attempt() -> int:
            base = self.latest_version()
            entry = self._read_log(base)
            schema = self._entry_schema(entry)
            t_cols = [f.name for f in schema.fields]
            s_cols = set(source.columns)
            src = source
            idcfg = self.identity_info()
            idcols = {idcfg["column"]} if idcfg else set()
            if idcfg and idcfg["column"] in s_cols:
                raise IdentityColumnError(
                    f"column {idcfg['column']!r} is GENERATED ALWAYS AS "
                    f"IDENTITY; merge sources must omit it (matched rows "
                    f"keep the target's value, inserts are assigned)"
                )
            if not evolve_schema:
                if set(t_cols) - idcols != s_cols:
                    raise MergeSchemaError(
                        f"source schema drift: missing={sorted(set(t_cols) - s_cols)} "
                        f"extra={sorted(s_cols - set(t_cols))}; pass evolve_schema=True to merge anyway"
                    )
                new_schema = schema
            else:
                extra = sorted(s_cols - set(t_cols))
                # Delta type widening: a source column of a strictly
                # wider type upgrades the TABLE schema (int→long,
                # float→double) instead of silently narrowing the
                # source; carried files keep their narrower physical
                # type and Spark 4's parquet reader promotes them at
                # scan time — no rewrite.
                new_schema = T.StructType(
                    [
                        T.StructField(
                            f.name,
                            src.schema[f.name].dataType
                            if f.name in s_cols
                            and _widens(src.schema[f.name].dataType, f.dataType)
                            else f.dataType,
                            True,
                        )
                        for f in schema.fields
                    ]
                    + [T.StructField(c, src.schema[c].dataType, True) for c in extra]
                )
            for f in new_schema.fields:
                if f.name not in src.columns:
                    src = src.withColumn(f.name, F.lit(None).cast(f.dataType))
            src = src.select(*[f.name for f in new_schema.fields])
            # Column mapping: evolution may re-add a name whose
            # PHYSICAL column still exists in old files (dropped
            # earlier) — give it a fresh physical name so stale bytes
            # can never resurface (Delta's never-reuse-physical rule).
            merge_map = dict(entry.get("columnMap") or {})
            retired = set(entry.get("retiredPhysical") or [])
            old_names = {f.name for f in schema.fields}
            for f in new_schema.fields:
                if (
                    f.name not in old_names
                    and f.name not in merge_map
                    and f.name in retired
                ):
                    merge_map[f.name] = f"{f.name}-{uuid.uuid4().hex[:8]}"

            cmap = entry.get("columnMap")
            target = self._read_files(
                entry["files"], schema, keep_path="__file", column_map=cmap
            )
            # One probe job: distinct touched files UNION'd with (at
            # most one) duplicated source key — both branches read
            # relations this attempt needs anyway (the persisted
            # src_keys aggregate and the touched-file semi-join), so
            # the dup check costs no extra action. Tag 'd' rows win
            # the error before any file is interpreted.
            probe = (
                target.join(src_keys.select(key), key, "left_semi")
                .select(F.lit("f").alias("__t"), F.col("__file").alias("__v"))
                .distinct()
                .unionByName(
                    src_keys.filter(F.col("count") > 1)
                    .limit(1)
                    .select(
                        F.lit("d").alias("__t"),
                        F.col(key).cast("string").alias("__v"),
                    )
                )
                .collect()
            )
            dup = [r["__v"] for r in probe if r["__t"] == "d"]
            if dup:
                raise MergeSourceKeyError(
                    f"source has multiple rows for key {key}={dup[0]!r}"
                )
            touched = {
                self._norm_file(r["__v"]) for r in probe if r["__t"] == "f"
            }
            hit_files = [
                f for f in entry["files"] if self._abs(f["path"]) in touched
            ]
            carried = [
                f for f in entry["files"] if self._abs(f["path"]) not in touched
            ]
            # Type widening invalidates bloom bitmaps whose hash dtype
            # was never recorded (legacy entries): probing them with
            # the widened schema type would falsely exclude the file
            # (xxhash64(int) != xxhash64(long)). Strip those; absence
            # safely degrades to no pruning. Entries WITH a recorded
            # bloomTypes keep their bitmaps — _point_files probes them
            # under the recorded type.
            widened = [
                f.name
                for f in schema.fields
                if new_schema[f.name].dataType != f.dataType
            ]
            if widened:
                for fe in carried:
                    for c in widened:
                        if c in fe.get("bloom", {}) and c not in fe.get(
                            "bloomTypes", {}
                        ):
                            del fe["bloom"][c]
            touched_df = self._read_files(hit_files, schema, column_map=cmap)
            for f in new_schema.fields:
                if f.name not in touched_df.columns:
                    touched_df = touched_df.withColumn(f.name, F.lit(None).cast(f.dataType))
            touched_df = touched_df.select(*[f.name for f in new_schema.fields])
            params: dict = {"key": key}
            src_apply = src
            if delete_matched_where is not None:
                dpred = (
                    F.expr(delete_matched_where)
                    if isinstance(delete_matched_where, str)
                    else delete_matched_where
                )
                # Tombstone semantics: a delete-marked source row
                # removes its matched target row and is NEVER inserted
                # (matched or not) — the anti-join below already drops
                # every source key from the target side.
                src_apply = src.filter(~F.coalesce(dpred, F.lit(False)))
                params["deleteMatchedWhere"] = str(delete_matched_where)
            if idcfg:
                # GENERATED ALWAYS AS IDENTITY under MERGE: matched
                # rows keep the target's id (one keyed join against
                # the touched files — change-sized), unmatched inserts
                # are assigned above the high-water mark.
                # Tentative ids are computed BELOW the join (on the
                # deterministic source scan), not after it: a
                # post-shuffle monotonically_increasing_id could
                # differ between the data-write job and the CDC-write
                # job re-evaluating the same plan.
                ic = idcfg["column"]
                tgt_ids = touched_df.groupBy(key).agg(
                    F.min(ic).alias("__tgt_id")
                )
                src_apply = (
                    src_apply.drop(ic)
                    .withColumn(
                        "__new_id",
                        _identity_expr(
                            idcfg, self._identity_hwm(entry, idcfg)
                        ),
                    )
                    .join(tgt_ids, key, "left")
                    .withColumn(
                        ic, F.coalesce(F.col("__tgt_id"), F.col("__new_id"))
                    )
                    .drop("__tgt_id", "__new_id")
                    .select(*[f.name for f in new_schema.fields])
                )
            new_rows = touched_df.join(src, key, "left_anti").unionByName(src_apply)
            cdc = None
            if self.cdf_enabled():
                # Matched target rows: pre-image (or delete, for
                # delete_matched_where hits); matched source rows:
                # post-image; unmatched source rows: insert. All four
                # legs are semi/anti joins on the key against
                # change-sized inputs — touched files and the source.
                matched_pre = touched_df.join(src.select(key), key, "left_semi")
                tgt_keys = touched_df.select(key)
                if delete_matched_where is not None:
                    del_keys = src.filter(
                        F.coalesce(dpred, F.lit(False))
                    ).select(key)
                    pre = (
                        matched_pre.join(del_keys, key, "left_semi")
                        .withColumn("_change_type", F.lit("delete"))
                        .unionByName(
                            matched_pre.join(del_keys, key, "left_anti")
                            .withColumn(
                                "_change_type", F.lit("update_preimage")
                            )
                        )
                    )
                else:
                    pre = matched_pre.withColumn(
                        "_change_type", F.lit("update_preimage")
                    )
                post = src_apply.join(tgt_keys, key, "left_semi").withColumn(
                    "_change_type", F.lit("update_postimage")
                )
                ins = src_apply.join(tgt_keys, key, "left_anti").withColumn(
                    "_change_type", F.lit("insert")
                )
                cdc = pre.unionByName(post).unionByName(ins)
            return self._commit_files(
                new_rows, carried, "MERGE", params, new_schema,
                base_version=base, cdc_df=cdc, column_map=merge_map,
                retired_physical=entry.get("retiredPhysical"),
            )

        try:
            return self._retrying(attempt)
        finally:
            src_keys.unpersist()

    def delete(self, predicate: Column | str) -> int:
        """DELETE rows matching the predicate (``api.py:107``), taken
        as a Column expression — no f-string SQL construction. SQL
        DELETE semantics: only rows where the predicate is TRUE are
        removed; NULL-predicate rows are kept. Only files physically
        containing a matching row are rewritten."""
        self._refuse_if_append_only("DELETE")
        pred = F.expr(predicate) if isinstance(predicate, str) else predicate
        hit = F.coalesce(pred, F.lit(False))

        def attempt() -> int:
            base = self.latest_version()
            entry = self._read_log(base)
            schema = self._entry_schema(entry)
            cmap = entry.get("columnMap")
            cur = self._read_files(
                entry["files"], schema, keep_path="__file", column_map=cmap
            )
            touched = self._distinct_files(cur.filter(hit))
            hit_files = [
                f for f in entry["files"] if self._abs(f["path"]) in touched
            ]
            carried = [
                f for f in entry["files"] if self._abs(f["path"]) not in touched
            ]
            params = {"predicate": str(predicate)}
            if not touched:
                return self._commit_files(
                    None, carried, "DELETE", params, schema,
                    base_version=base, column_map=cmap,
                    retired_physical=entry.get("retiredPhysical"),
                )
            kept = self._read_files(hit_files, schema, column_map=cmap).filter(~hit)
            cdc = None
            if self.cdf_enabled():
                cdc = (
                    self._read_files(hit_files, schema, column_map=cmap)
                    .filter(hit)
                    .withColumn("_change_type", F.lit("delete"))
                )
            return self._commit_files(
                kept, carried, "DELETE", params, schema, base_version=base,
                cdc_df=cdc, column_map=cmap,
                retired_physical=entry.get("retiredPhysical"),
            )

        return self._retrying(attempt)

    def update(self, set_cols: dict[str, Column], where: Column | str) -> int:
        """UPDATE … SET … WHERE (Delta DML surface, ``README.md:11``).
        Rewrites only the files containing a row where the predicate
        is TRUE (NULL ⇒ row unchanged, SQL semantics)."""
        self._refuse_if_append_only("UPDATE")
        idcfg = self.identity_info()
        if idcfg and idcfg["column"] in set_cols:
            raise IdentityColumnError(
                f"cannot UPDATE identity column {idcfg['column']!r} "
                f"(GENERATED ALWAYS AS IDENTITY)"
            )
        pred = F.expr(where) if isinstance(where, str) else where
        hit = F.coalesce(pred, F.lit(False))

        def attempt() -> int:
            base = self.latest_version()
            entry = self._read_log(base)
            schema = self._entry_schema(entry)
            _check_set_columns(set_cols, schema)
            cmap = entry.get("columnMap")
            cur = self._read_files(
                entry["files"], schema, keep_path="__file", column_map=cmap
            )
            touched = self._distinct_files(cur.filter(hit))
            hit_files = [
                f for f in entry["files"] if self._abs(f["path"]) in touched
            ]
            carried = [
                f for f in entry["files"] if self._abs(f["path"]) not in touched
            ]
            params = {"where": str(where)}
            if not touched:
                return self._commit_files(
                    None, carried, "UPDATE", params, schema,
                    base_version=base, column_map=cmap,
                    retired_physical=entry.get("retiredPhysical"),
                )
            updated = self._read_files(hit_files, schema, column_map=cmap)
            # One select so every SET expression (and the predicate)
            # evaluates against the PRE-image row (Delta UPDATE
            # semantics: SET a=b, b=a swaps). Sequential withColumn
            # would let a later SET read an earlier SET's post-image.
            updated = updated.select(
                *[
                    (
                        F.when(hit, set_cols[c]).otherwise(F.col(c)).alias(c)
                        if c in set_cols
                        else F.col(c)
                    )
                    for c in updated.columns
                ]
            )
            cdc = None
            if self.cdf_enabled():
                # Post-images are the PRE rows with SET applied
                # unconditionally — filtering `updated` on the
                # predicate again would mis-evaluate it over the new
                # values when SET touches a predicate column.
                pre_rows = self._read_files(
                    hit_files, schema, column_map=cmap
                ).filter(hit)
                # Single select: every SET sees the pre-image (above).
                post = pre_rows.select(
                    *[
                        set_cols[c].alias(c) if c in set_cols else F.col(c)
                        for c in pre_rows.columns
                    ]
                )
                cdc = pre_rows.withColumn(
                    "_change_type", F.lit("update_preimage")
                ).unionByName(
                    post.withColumn("_change_type", F.lit("update_postimage"))
                )
            return self._commit_files(
                updated, carried, "UPDATE", params, schema, base_version=base,
                cdc_df=cdc, column_map=cmap,
                retired_physical=entry.get("retiredPhysical"),
            )

        return self._retrying(attempt)

    def delete_mor(self, predicate: Column | str) -> int:
        """Merge-on-read DELETE via deletion vectors (Delta DV
        feature): instead of rewriting every touched file
        (copy-on-write — ``delete``), record the matching row
        POSITIONS per file in the commit log and mask them at read
        time. A point delete on a 100 TB table writes zero data
        bytes. Reads apply the mask as a broadcast anti-join on
        (file, row position); ``optimize`` hardens DVs by rewriting
        the masked rows away.

        The trade: CoW pays at write time, MoR at read time — use
        ``delete_mor`` for selective deletes between OPTIMIZE runs,
        ``delete`` for bulk deletes. Positions are stored in a
        **sidecar parquet** per commit (columns ``path``, ``pos`` —
        the role Delta's roaring-bitmap DV files play): matched
        positions never touch the driver, the log entry records only
        sidecar references + per-file counts, so both driver memory
        and log size are independent of how many rows the predicate
        matches."""
        self._refuse_if_append_only("DELETE (merge-on-read)")
        if (
            self.row_tracking_enabled()
            and self.delta_mirror_enabled()
            and self.dv_mirror_policy() != "native"
        ):
            # (native DV mirroring never rewrites survivors, so
            # row-id ranges stay valid — no refusal needed there)
            # Refuse BEFORE the private commit: the mirror's sync()
            # raises on DV files of row-tracking tables (delta_log.py
            # _unit_adds — materialization invalidates row-id ranges),
            # but sync runs only after the private commit is durably
            # linked. Committing first and raising in sync would wedge
            # the table: every later commit replays sync, hits the DV
            # version, and raises again, so the mirror could never
            # advance. Failing here leaves no committed DV behind.
            from .delta_log import DeltaMirrorError

            raise DeltaMirrorError(
                "deletion vectors cannot be mirrored on a row-tracking "
                "table: DV materialization rewrites survivors, which "
                "invalidates the file's row-id range. Use copy-on-write "
                "DELETE/UPDATE (delete/update_where) on row-tracking "
                "tables."
            )
        pred = F.expr(predicate) if isinstance(predicate, str) else predicate
        hit = F.coalesce(pred, F.lit(False))

        def attempt() -> int:
            base = self.latest_version()
            entry = self._read_log(base)
            schema = self._entry_schema(entry)
            files = entry["files"]
            cmap = entry.get("columnMap")
            cur = self._read_paths(
                [self._abs(f["path"]) for f in files], schema, with_meta=True,
                column_map=cmap,
            )
            matched = cur.filter(hit).select("__path", "__row_idx")
            # Already-masked rows match again on re-delete; exclude them
            # distributedly so per-file counts stay exact.
            existing = self._dv_df(files)
            if existing is not None:
                matched = matched.join(
                    existing, ["__path", "__row_idx"], "left_anti"
                )
            # Translate scan paths (absolute) back to the logged path
            # strings — an O(#files) broadcast map, not a collect.
            map_df = self.spark.createDataFrame(
                [(self._abs(f["path"]), f["path"]) for f in files],
                "__path string, path string",
            )
            new_dv = (
                matched.join(F.broadcast(map_df), "__path")
                .select("path", F.col("__row_idx").alias("pos"))
                # hash-partition by file so a file's positions are
                # contiguous; AQE coalesces the small partitions.
                .repartition("path")
            )
            rel_sidecar = f"dv-{entry['version'] + 1}-{uuid.uuid4().hex[:8]}"
            sidecar_dir = os.path.join(self.path, rel_sidecar)
            new_dv.write.mode("errorifexists").parquet(sidecar_dir)
            # Per-file counts read back from the sidecar alone —
            # O(#touched files) on the driver, never O(matched rows).
            counts = {
                r["path"]: r["n"]
                for r in self.spark.read.parquet(sidecar_dir)
                .groupBy("path")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            params = {"predicate": str(predicate)}
            if not counts:  # no-op delete: drop the empty sidecar
                _rmtree(sidecar_dir)
                return self._commit_files(
                    None, list(files), "DELETE_MOR", params, schema,
                    base_version=base, column_map=cmap,
                    retired_physical=entry.get("retiredPhysical"),
                )
            out = []
            for f in files:
                n = counts.get(f["path"])
                if n is None:
                    out.append(f)
                else:
                    out.append(
                        {
                            **f,
                            "dv": {
                                "sidecars": _dv_sidecars(f) + [rel_sidecar],
                                "legacy": _dv_legacy(f),
                                "count": _dv_count(f) + int(n),
                            },
                        }
                    )
            cdc = None
            if self.cdf_enabled():
                # The newly masked rows, rematerialized by position —
                # change-sized (reads only rows whose positions landed
                # in this commit's sidecar).
                cdc = (
                    cur.join(matched, ["__path", "__row_idx"], "left_semi")
                    .drop("__path", "__row_idx")
                    .withColumn("_change_type", F.lit("delete"))
                )
            return self._commit_files(
                None, out, "DELETE_MOR", params, schema, base_version=base,
                cdc_df=cdc, column_map=cmap,
                retired_physical=entry.get("retiredPhysical"),
            )

        return self._retrying(attempt)

    def update_mor(self, set_cols: dict[str, Column], where: Column | str) -> int:
        """Merge-on-read UPDATE (Delta's DV-backed UPDATE): mask the
        matched row positions with deletion vectors — zero survivor
        rows rewritten — and append ONE change-sized file holding the
        updated versions, in a single atomic commit. A point update
        on a 100 TB table writes bytes proportional to the rows it
        changes, never to the files it touches; ``optimize`` hardens
        the masks away later. Shares the DV sidecar machinery (and
        every guard) with ``delete_mor``; rows already masked by a
        prior MoR delete are logically gone and are neither re-masked
        nor resurrected by the SET."""
        self._refuse_if_append_only("UPDATE (merge-on-read)")
        idcfg = self.identity_info()
        if idcfg and idcfg["column"] in set_cols:
            raise IdentityColumnError(
                f"cannot UPDATE identity column {idcfg['column']!r} "
                f"(GENERATED ALWAYS AS IDENTITY)"
            )
        if (
            self.row_tracking_enabled()
            and self.delta_mirror_enabled()
            and self.dv_mirror_policy() != "native"
        ):
            from .delta_log import DeltaMirrorError

            raise DeltaMirrorError(
                "deletion vectors cannot be mirrored on a row-tracking "
                "table: DV materialization rewrites survivors, which "
                "invalidates the file's row-id range. Use copy-on-write "
                "UPDATE (update) on row-tracking tables."
            )
        pred = F.expr(where) if isinstance(where, str) else where
        hit = F.coalesce(pred, F.lit(False))

        def attempt() -> int:
            base = self.latest_version()
            entry = self._read_log(base)
            schema = self._entry_schema(entry)
            files = entry["files"]
            cmap = entry.get("columnMap")
            cur = self._read_paths(
                [self._abs(f["path"]) for f in files], schema, with_meta=True,
                column_map=cmap,
            )
            _check_set_columns(set_cols, schema)
            matched = cur.filter(hit)
            existing = self._dv_df(files)
            if existing is not None:
                matched = matched.join(
                    existing, ["__path", "__row_idx"], "left_anti"
                )
            map_df = self.spark.createDataFrame(
                [(self._abs(f["path"]), f["path"]) for f in files],
                "__path string, path string",
            )
            new_dv = (
                matched.select("__path", "__row_idx")
                .join(F.broadcast(map_df), "__path")
                .select("path", F.col("__row_idx").alias("pos"))
                .repartition("path")
            )
            rel_sidecar = f"dv-{entry['version'] + 1}-{uuid.uuid4().hex[:8]}"
            sidecar_dir = os.path.join(self.path, rel_sidecar)
            new_dv.write.mode("errorifexists").parquet(sidecar_dir)
            counts = {
                r["path"]: r["n"]
                for r in self.spark.read.parquet(sidecar_dir)
                .groupBy("path")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            params = {"where": str(where)}
            if not counts:  # no-op update: drop the empty sidecar
                _rmtree(sidecar_dir)
                return self._commit_files(
                    None, list(files), "UPDATE_MOR", params, schema,
                    base_version=base, column_map=cmap,
                    retired_physical=entry.get("retiredPhysical"),
                )
            out = []
            for f in files:
                n = counts.get(f["path"])
                if n is None:
                    out.append(f)
                else:
                    out.append(
                        {
                            **f,
                            "dv": {
                                "sidecars": _dv_sidecars(f) + [rel_sidecar],
                                "legacy": _dv_legacy(f),
                                "count": _dv_count(f) + int(n),
                            },
                        }
                    )
            pre = matched.drop("__path", "__row_idx")
            # Single select: every SET expression evaluates against the
            # PRE-image simultaneously (Delta UPDATE semantics — SET
            # a=b, b=a swaps); sequential withColumn would leak a
            # post-image into a later SET.
            post = pre.select(
                *[
                    set_cols[c].alias(c) if c in set_cols else F.col(c)
                    for c in pre.columns
                ]
            )
            cdc = None
            if self.cdf_enabled():
                cdc = pre.withColumn(
                    "_change_type", F.lit("update_preimage")
                ).unionByName(
                    post.withColumn("_change_type", F.lit("update_postimage"))
                )
            return self._commit_files(
                post, out, "UPDATE_MOR", params, schema, base_version=base,
                cdc_df=cdc, column_map=cmap,
                retired_physical=entry.get("retiredPhysical"),
            )

        return self._retrying(attempt)

    def overwrite_where(self, df: DataFrame, predicate: Column | str) -> int:
        """Delta ``replaceWhere``: atomically replace every row
        matching the predicate with ``df``'s rows, in one commit.
        The idempotent-backfill primitive — rerunning a day's
        pipeline swaps that day's slice without touching the rest.

        Like Delta, incoming rows are validated against the
        predicate (a backfill that writes outside its declared slice
        is a bug, not an overwrite) — inline in the write pass, not
        as a separate pre-scan: the first output column carries a
        ``raise_error`` guard on out-of-slice rows, so the source
        plan is evaluated exactly once (one job per replaceWhere
        commit) and a violation aborts the write job, leaving only an
        orphan directory for ``vacuum``. File-granular: only files
        physically containing a matching row are rewritten; at scale,
        a predicate aligned with the partition/clustering layout means
        the rewrite set is exactly the slice's files and everything
        else is carried by reference."""
        self._refuse_if_append_only("replaceWhere")
        pred = F.expr(predicate) if isinstance(predicate, str) else predicate
        hit = F.coalesce(pred, F.lit(False))
        idcfg = self.identity_info()
        if idcfg and idcfg["column"] in df.columns:
            raise IdentityColumnError(
                f"column {idcfg['column']!r} is GENERATED ALWAYS AS "
                f"IDENTITY; explicit values are refused — omit it"
            )

        def attempt() -> int:
            base = self.latest_version()
            entry = self._read_log(base)
            schema = self._entry_schema(entry)
            cmap = entry.get("columnMap")
            cur = self._read_files(
                entry["files"], schema, keep_path="__file", column_map=cmap
            )
            touched = self._distinct_files(cur.filter(hit))
            hit_files = [
                f for f in entry["files"] if self._abs(f["path"]) in touched
            ]
            carried = [
                f for f in entry["files"] if self._abs(f["path"]) not in touched
            ]
            params = {"predicate": str(predicate)}
            src_df = df
            if idcfg:
                # incoming replacement rows are NEW rows — assigned
                # fresh ids above the high-water mark
                src_df = src_df.withColumn(
                    idcfg["column"],
                    _identity_expr(idcfg, self._identity_hwm(entry, idcfg)),
                )
            # Guard rides the first output column (an output column is
            # never pruned away), firing per-row during the write.
            guard = schema.fields[0]
            aligned = src_df.select(
                F.when(hit, F.col(guard.name).cast(guard.dataType))
                .otherwise(
                    F.raise_error(
                        F.lit(_REPLACE_WHERE_VIOLATION)
                    ).cast(guard.dataType)
                )
                .alias(guard.name),
                *[
                    F.col(f.name).cast(f.dataType)
                    for f in schema.fields[1:]
                ],
            )
            if touched:
                kept = self._read_files(
                    hit_files, schema, column_map=cmap
                ).filter(~hit)
                aligned = kept.unionByName(aligned)
            cdc = None
            if self.cdf_enabled():
                # Replaced slice rows out as deletes, incoming rows as
                # inserts (the raw source, not the guard-wrapped plan —
                # the guarded main write runs first and aborts the
                # commit before any change file exists).
                cdc = (
                    self._read_files(hit_files, schema, column_map=cmap)
                    .filter(hit)
                    .withColumn("_change_type", F.lit("delete"))
                    .unionByName(
                        src_df.select(
                            *[
                                F.col(f.name).cast(f.dataType)
                                for f in schema.fields
                            ]
                        ).withColumn("_change_type", F.lit("insert"))
                    )
                )
            return self._commit_files(
                aligned, carried, "REPLACE_WHERE", params, schema,
                base_version=base, cdc_df=cdc, column_map=cmap,
                retired_physical=entry.get("retiredPhysical"),
            )

        try:
            return self._retrying(attempt)
        except Exception as e:  # surface the guard as the API error
            if _REPLACE_WHERE_VIOLATION in str(e):
                raise ValueError(
                    f"overwrite_where source rows outside predicate "
                    f"slice {predicate!r}"
                ) from None
            raise

    def overwrite_for_keys(
        self,
        df: DataFrame,
        key_cols: list[str] | str,
        keys_df: DataFrame | None = None,
    ) -> int:
        """``replaceWhere`` keyed by a DISTRIBUTED key set: atomically
        replace every row whose key tuple appears in ``keys_df``
        (default: ``df``'s own distinct keys) with ``df``'s rows, in
        one commit. The join-based twin of :meth:`overwrite_where`
        for change-sized key sets — a literal IN-list predicate pays
        per-element driver marshalling plus expression analysis
        (measured: 11.3 s for a 16.5 k-key ``isin`` commit vs 0.8 s
        for the same rows through joins), and at cluster scale the
        key set must never be enumerated on the driver at all:
        membership here is a broadcast semi-/anti-join against the
        change-sized key table, so a million-key micro-batch costs
        the same plan shape as a hundred-key one.

        When ``keys_df`` is passed explicitly, incoming rows are
        validated against it (a row outside the declared key slice
        aborts the commit), via a left-join marker riding the write
        pass — the same evaluate-once guard as ``overwrite_where``.
        With the default (keys derived from ``df``), no violation is
        possible and the guard is skipped."""
        self._refuse_if_append_only("replaceWhere (keyed)")
        key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
        explicit = keys_df is not None
        keys = (
            (keys_df if explicit else df).select(*key_cols).distinct()
        ).persist()
        idcfg = self.identity_info()
        if idcfg and idcfg["column"] in df.columns:
            raise IdentityColumnError(
                f"column {idcfg['column']!r} is GENERATED ALWAYS AS "
                f"IDENTITY; explicit values are refused — omit it"
            )

        def attempt() -> int:
            base = self.latest_version()
            entry = self._read_log(base)
            schema = self._entry_schema(entry)
            cmap = entry.get("columnMap")
            cur = self._read_files(
                entry["files"], schema, keep_path="__file", column_map=cmap
            )
            touched = self._distinct_files(
                cur.join(F.broadcast(keys), key_cols, "leftsemi")
            )
            hit_files = [
                f for f in entry["files"] if self._abs(f["path"]) in touched
            ]
            carried = [
                f for f in entry["files"] if self._abs(f["path"]) not in touched
            ]
            params = {"predicate": f"KEY IN keys_df ({', '.join(key_cols)})"}
            src_df = df
            if idcfg:
                src_df = src_df.withColumn(
                    idcfg["column"],
                    _identity_expr(idcfg, self._identity_hwm(entry, idcfg)),
                )
            if explicit:
                guard = schema.fields[0]
                marked = src_df.join(
                    F.broadcast(keys.withColumn("__in_slice", F.lit(True))),
                    key_cols,
                    "left",
                )
                aligned = marked.select(
                    F.when(
                        F.col("__in_slice"),
                        F.col(guard.name).cast(guard.dataType),
                    )
                    .otherwise(
                        F.raise_error(
                            F.lit(_REPLACE_WHERE_VIOLATION)
                        ).cast(guard.dataType)
                    )
                    .alias(guard.name),
                    *[
                        F.col(f.name).cast(f.dataType)
                        for f in schema.fields[1:]
                    ],
                )
            else:
                aligned = src_df.select(
                    *[F.col(f.name).cast(f.dataType) for f in schema.fields]
                )
            if touched:
                kept = self._read_files(
                    hit_files, schema, column_map=cmap
                ).join(F.broadcast(keys), key_cols, "left_anti")
                aligned = kept.unionByName(aligned)
            cdc = None
            if self.cdf_enabled():
                cdc = (
                    self._read_files(hit_files, schema, column_map=cmap)
                    .join(F.broadcast(keys), key_cols, "leftsemi")
                    .withColumn("_change_type", F.lit("delete"))
                    .unionByName(
                        src_df.select(
                            *[
                                F.col(f.name).cast(f.dataType)
                                for f in schema.fields
                            ]
                        ).withColumn("_change_type", F.lit("insert"))
                    )
                )
            return self._commit_files(
                aligned, carried, "REPLACE_WHERE", params, schema,
                base_version=base, cdc_df=cdc, column_map=cmap,
                retired_physical=entry.get("retiredPhysical"),
            )

        try:
            return self._retrying(attempt)
        except Exception as e:
            if _REPLACE_WHERE_VIOLATION in str(e):
                raise ValueError(
                    "overwrite_for_keys source rows outside the "
                    f"declared key slice on ({', '.join(key_cols)})"
                ) from None
            raise
        finally:
            keys.unpersist()

    def restore(
        self, version: int | None = None, timestamp: datetime | str | None = None
    ) -> int:
        """Re-commit an old snapshot as the newest version — pure
        metadata: the new log entry re-references the old version's
        files, no data is read or written. Accepts either a version
        number or a wall-clock timestamp (Delta ``RESTORE ...
        TIMESTAMP AS OF``), resolved the same way as ``read``."""
        if (version is None) == (timestamp is None):
            raise ValueError("pass exactly one of version or timestamp")
        if version is None:
            version = self._resolve_timestamp(timestamp)

        def attempt() -> int:
            base = self.latest_version()
            entry = self._read_log(version)
            cdc = None
            if self.cdf_enabled():
                # RESTORE's change feed is the row diff current→target
                # (Delta emits the same shape). Shared files cancel by
                # identity, so the diff reads only files present in
                # exactly one of the two snapshots.
                cdc = self._snapshot_diff(self._read_log(base), entry)
            params: dict = {"sourceVersion": version}
            # ADVICE r9 (medium): without this, column_defaults()'s
            # newest-record-wins scan would keep a post-sourceVersion
            # ADD COLUMN ... DEFAULT alive past the RESTORE — the
            # table would declare allowColumnDefaults for a schema
            # with no such column, and a later re-add of the name
            # would silently inherit the ghost default. Record the
            # restored version's EFFECTIVE defaults (as-of
            # sourceVersion, filtered to the restored schema), the
            # same complete-dict convention rename/drop use.
            asof = {
                k: v
                for k, v in self.column_defaults(as_of=version).items()
                if k in {f.name for f in self._entry_schema(entry).fields}
            }
            if asof or self.column_defaults():
                params["columnDefaults"] = asof
            return self._commit_files(
                None,
                list(entry["files"]),
                "RESTORE",
                params,
                self._entry_schema(entry),
                base_version=base,
                cdc_df=cdc,
                column_map=entry.get("columnMap"),
                retired_physical=entry.get("retiredPhysical"),
            )

        return self._retrying(attempt)

    def rename_column(self, old: str, new: str) -> int:
        """ALTER TABLE RENAME COLUMN — metadata-only (Delta column
        mapping): the PHYSICAL parquet column name is stable since
        creation, so a rename touches zero data bytes at any table
        size. The commit rewrites the logical schema, records
        logical→physical in the entry's ``columnMap``, and re-keys
        carried files' stats/bloom metadata so skipping keeps working
        under the new name. Partition, generated, constraint- and
        bloom-indexed columns are structural and refuse to rename
        (same restriction class as Delta's)."""

        def attempt() -> int:
            base = self.latest_version()
            entry = self._read_log(base)
            schema = self._entry_schema(entry)
            names = [f.name for f in schema.fields]
            if old not in names:
                raise ValueError(f"no such column {old!r}")
            if new in names:
                raise ValueError(f"column {new!r} already exists")
            self._guard_structural(old, "rename")
            cmap = dict(entry.get("columnMap") or {})
            physical = cmap.pop(old, old)
            if physical != new:
                cmap[new] = physical
            new_schema = T.StructType(
                [
                    T.StructField(
                        new if f.name == old else f.name, f.dataType, True
                    )
                    for f in schema.fields
                ]
            )
            files = [_rekey_file(f, rename={old: new}) for f in entry["files"]]
            params: dict = {"oldName": old, "newName": new}
            defaults = self.column_defaults()
            if old in defaults:  # the default follows the rename
                params["columnDefaults"] = {
                    (new if k == old else k): v for k, v in defaults.items()
                }
            return self._commit_files(
                None,
                files,
                "RENAME_COLUMN",
                params,
                new_schema,
                base_version=base,
                column_map=cmap,
                retired_physical=entry.get("retiredPhysical"),
            )

        return self._retrying(attempt)

    def drop_column(self, name: str) -> int:
        """ALTER TABLE DROP COLUMN — metadata-only (Delta column
        mapping): the physical column stays in existing files but is
        never read again. Its physical name is recorded as RETIRED so
        a later schema evolution re-adding the same logical name gets
        a FRESH physical name — stale bytes can never resurface.
        Structural columns refuse to drop (see rename_column)."""

        def attempt() -> int:
            base = self.latest_version()
            entry = self._read_log(base)
            schema = self._entry_schema(entry)
            names = [f.name for f in schema.fields]
            if name not in names:
                raise ValueError(f"no such column {name!r}")
            if len(names) == 1:
                raise ValueError("cannot drop the only column")
            self._guard_structural(name, "drop")
            cmap = dict(entry.get("columnMap") or {})
            physical = cmap.pop(name, name)
            retired = set(entry.get("retiredPhysical") or []) | {physical}
            new_schema = T.StructType(
                [f for f in schema.fields if f.name != name]
            )
            files = [_rekey_file(f, drop={name}) for f in entry["files"]]
            params: dict = {"name": name}
            defaults = self.column_defaults()
            if name in defaults:  # the default dies with the column
                params["columnDefaults"] = {
                    k: v for k, v in defaults.items() if k != name
                }
            return self._commit_files(
                None,
                files,
                "DROP_COLUMN",
                params,
                new_schema,
                base_version=base,
                column_map=cmap,
                retired_physical=sorted(retired),
            )

        return self._retrying(attempt)

    def add_column(
        self,
        name: str,
        dtype: T.DataType | str,
        default: str | None = None,
    ) -> int:
        """ALTER TABLE ADD COLUMN [DEFAULT <sql literal>] —
        metadata-only at any table size: every existing file is
        carried by reference and serves NULL for the new column at
        read time (the same mechanism merge schema evolution uses).

        ``default`` is a SQL expression string (Delta column defaults,
        writer feature ``allowColumnDefaults``): a later ``append``
        that OMITS the column fills it with the default instead of
        NULL; existing rows keep reading NULL (Delta's CURRENT_DEFAULT
        semantics — defaults apply to future writes, never backfill).
        The expression must be constant-foldable and cast to the
        column type — validated here, so a bad default fails the
        ALTER, not some later ingest."""
        field_t = (
            dtype
            if isinstance(dtype, T.DataType)
            else T.StructType.fromDDL(f"__c {dtype}")[0].dataType
        )

        def attempt() -> int:
            base = self.latest_version()
            entry = self._read_log(base)
            schema = self._entry_schema(entry)
            if name in {f.name for f in schema.fields}:
                raise ValueError(f"column {name!r} already exists")
            if default is not None:
                # constant-fold + cast check on a 1-row ZERO-COLUMN
                # plan: Delta requires literal/foldable defaults, and
                # an exposed input column (range(1)'s `id`) would let
                # a row-dependent expression like "id + 1" slip
                # through validation only to bind row-wise at append
                # time (ADVICE r9). With no attributes in scope, any
                # column reference fails the ALTER here instead.
                self.spark.range(1).select().select(
                    F.expr(default).cast(field_t)
                ).collect()
            cmap = dict(entry.get("columnMap") or {})
            retired = set(entry.get("retiredPhysical") or [])
            if name not in cmap and name in retired:
                # never reuse a retired physical name (Delta rule)
                cmap[name] = f"{name}-{uuid.uuid4().hex[:8]}"
            params: dict = {"name": name, "type": field_t.simpleString()}
            defaults = {
                k: v for k, v in self.column_defaults().items() if k != name
            }
            if default is not None:
                defaults[name] = default
            params["columnDefaults"] = defaults
            new_schema = T.StructType(
                list(schema.fields) + [T.StructField(name, field_t, True)]
            )
            return self._commit_files(
                None,
                list(entry["files"]),
                "ADD_COLUMN",
                params,
                new_schema,
                base_version=base,
                column_map=cmap or None,
                retired_physical=entry.get("retiredPhysical"),
            )

        return self._retrying(attempt)

    def column_defaults(self, as_of: int | None = None) -> dict[str, str]:
        """Per-column DEFAULT expressions (Delta allowColumnDefaults):
        the newest commit at or before ``as_of`` (default: latest)
        that recorded a ``columnDefaults`` state wins — every commit
        that changes the set (add/rename/drop/restore) writes the
        complete updated dict.

        The latest-state path is memoized per latest version: only
        commits newer than the previous scan are read, so the common
        append/mirror call is O(new commits), not O(all versions)
        (the cumulative O(V^2) log-read pattern ADVICE r9 flagged)."""
        if as_of is not None:
            # memoized per as_of: historical versions are immutable,
            # so a cached answer never goes stale. The walk ALSO
            # stops at any version with a cached answer, so a full
            # backfill export (which asks for every version, twice —
            # metaData + protocol) costs O(V) log reads total instead
            # of the O(V^2) pattern ADVICE r9 flagged on the append
            # path (self-review r10 found it re-created here).
            cache: dict[int, dict] = getattr(self, "_defaults_asof_cache", {})
            self._defaults_asof_cache = cache
            if as_of in cache:
                return dict(cache[as_of])
            result: dict[str, str] = {}
            for v in sorted(self._versions(), reverse=True):
                if v > as_of:
                    continue
                if v != as_of and v in cache:
                    result = cache[v]
                    break
                params = self._read_log_raw(v).get("operationParameters", {})
                if "columnDefaults" in params:
                    result = dict(params["columnDefaults"])
                    break
            cache[as_of] = result
            return dict(result)
        versions = sorted(self._versions())
        top = versions[-1] if versions else -1
        cached_top, cached = getattr(self, "_defaults_cache", (-1, {}))
        if top != cached_top:
            found = None
            for v in reversed(versions):
                if v <= cached_top:
                    break  # older state already folded into `cached`
                params = self._read_log_raw(v).get("operationParameters", {})
                if "columnDefaults" in params:
                    found = dict(params["columnDefaults"])
                    break
            cached = found if found is not None else cached
            self._defaults_cache = (top, cached)
        return dict(cached)

    def _guard_structural(self, col: str, op: str) -> None:
        """Refuse rename/drop of columns other table machinery is
        built on — partitioning (hive paths bake the name in),
        generated columns (target or expression source), CHECK
        constraints, bloom indexes."""
        import re as _re

        word = _re.compile(rf"\b{_re.escape(col)}\b")
        if col in self.partition_columns():
            raise ValueError(f"cannot {op} partition column {col!r}")
        for gname, expr in self.generated_columns().items():
            if col == gname or word.search(expr):
                raise ValueError(
                    f"cannot {op} column {col!r}: referenced by generated "
                    f"column {gname!r} ({expr})"
                )
        for cname, expr in self.constraints().items():
            if word.search(expr):
                raise ValueError(
                    f"cannot {op} column {col!r}: referenced by constraint "
                    f"{cname!r} ({expr})"
                )
        if col in self.bloom_filter_columns():
            raise ValueError(f"cannot {op} bloom-indexed column {col!r}")
        idcfg = self.identity_info()
        if idcfg and col == idcfg["column"]:
            raise IdentityColumnError(
                f"cannot {op} identity column {col!r} (GENERATED ALWAYS "
                f"AS IDENTITY)"
            )

    def optimize_small(
        self, min_rows_per_file: int, target_files: int = 1
    ) -> int | None:
        """Partial OPTIMIZE — the production compaction shape: bin-pack
        ONLY files whose live row count (after DV masking) is under
        ``min_rows_per_file`` into ``target_files`` new files, carrying
        every already-healthy file by reference. Cost is O(small
        files), never O(table) — on a 100 TB table the nightly compactor
        rewrites the day's trickle of small commits, not the snapshot
        (the full-rewrite ``optimize`` is the re-layout tool, this is
        the maintenance loop). Small files' deletion vectors are
        applied during the rewrite, so their DVs disappear too.

        Returns the new version, or ``None`` when fewer than two files
        qualify (nothing to compact)."""

        def attempt() -> int | None:
            base = self.latest_version()
            entry = self._read_log(base)
            schema = self._entry_schema(entry)
            small = [
                f
                for f in entry["files"]
                if f.get("num_rows", 0) - _dv_count(f) < min_rows_per_file
            ]
            if len(small) < 2:
                return None
            small_paths = {f["path"] for f in small}
            carried = [f for f in entry["files"] if f["path"] not in small_paths]
            packed = self._read_files(
                small, schema, column_map=entry.get("columnMap")
            ).coalesce(target_files)
            return self._commit_files(
                packed,
                carried,
                "OPTIMIZE",
                {
                    "mode": "small-files",
                    "minRowsPerFile": min_rows_per_file,
                    "compacted": len(small),
                    "targetFiles": target_files,
                },
                schema,
                base_version=base,
                column_map=entry.get("columnMap"),
                retired_physical=entry.get("retiredPhysical"),
            )

        return self._retrying(attempt)

    def files_df(self, version: int | None = None) -> DataFrame:
        """A snapshot's file inventory as a queryable DataFrame
        (Iceberg's ``table.files`` metadata-table shape): path, live
        row count, DV-masked count, and the per-column min/max and
        null-count stats as JSON — the surface an operator uses to ask
        "which files would this predicate touch" or "how skewed is the
        layout" without scanning data. Metadata-only: built from the
        commit log, zero file I/O."""
        if version is None:
            version = self.latest_version()
        entry = self._read_log(version)
        rows = [
            (
                f["path"],
                int(f.get("num_rows", 0)),
                _dv_count(f),
                json.dumps(f.get("stats", {}), sort_keys=True),
                json.dumps(f.get("nullCounts", {}), sort_keys=True),
            )
            for f in entry["files"]
        ]
        return self.spark.createDataFrame(
            rows,
            "path string, num_rows long, dv_masked long, "
            "stats string, null_counts string",
        )

    def export_delta_log(self, materialize_dvs: bool = False) -> int:
        """One-shot export of the full commit history as a REAL Delta
        transaction log (``_delta_log/`` JSON actions + checkpoints,
        ``table/delta_log.py``) for a table that was NOT created with
        ``delta_mirror=True`` — e.g. before handing the directory to
        an external Delta reader. Idempotent; re-run after further
        commits to extend the log. Vacuumed history is skipped behind
        a full-snapshot re-base + checkpoint at the oldest
        fully-present version. MoR deletion-vector snapshots are
        refused unless ``materialize_dvs=True``, which rewrites each
        masked file's survivors once per DV state so the exported log
        stays protocol (1, 2). Returns the latest exported version."""
        from .delta_log import sync as _delta_sync

        return _delta_sync(self, materialize_dvs=materialize_dvs)

    def export_symlink_manifest(self, version: int | None = None) -> str:
        """Write a Presto/Trino-style symlink-format manifest for a
        snapshot (Delta's ``GENERATE symlink_format_manifest``): a
        plain-text file of absolute data-file paths under
        ``_symlink_format_manifest/``, which any engine that can read
        parquet + a file list (Trino, Hive, DuckDB's read_parquet
        list form) uses to see exactly this snapshot — no knowledge
        of the commit log needed. Files with deletion vectors are
        refused (an external engine would resurrect masked rows;
        compact the DVs away with ``delete`` rewrite or OPTIMIZE
        first — the same restriction Delta's generate has).

        Returns the manifest file path. Metadata-only: O(#files)
        driver work, zero data I/O."""
        if version is None:
            version = self.latest_version()
        entry = self._read_log(version)
        dv_files = [f["path"] for f in entry["files"] if _dv_count(f) > 0]
        if dv_files:
            raise ValueError(
                f"symlink manifest cannot represent deletion vectors "
                f"({len(dv_files)} masked files, e.g. {dv_files[0]!r}); "
                f"rewrite them first (OPTIMIZE / copy-on-write delete)"
            )
        if self.partition_columns():
            # partition values live in directory names, not parquet
            # footers — a flat file list would silently drop those
            # columns for an engine that doesn't hive-infer from paths
            raise ValueError(
                "symlink manifest of a hive-partitioned table would lose "
                f"partition columns {self.partition_columns()} for readers "
                "that do not infer them from paths; export per-partition "
                "manifests or rewrite unpartitioned first"
            )
        man_dir = os.path.join(self.path, "_symlink_format_manifest")
        os.makedirs(man_dir, exist_ok=True)
        out = os.path.join(man_dir, f"manifest-{version:020d}.txt")
        tmp = os.path.join(man_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            for f in entry["files"]:
                fh.write(self._abs(f["path"]) + "\n")
        os.replace(tmp, out)
        return out

    def clone_to(self, path: str, version: int | None = None) -> "VersionedTable":
        """Shallow clone (Delta ``CLONE``): a new table at ``path``
        whose version-0 entry references this table's data files by
        absolute path — metadata-only, zero bytes of data copied, so
        cloning a 100 TB table costs one log write. Copy-on-write
        makes later DML on either table invisible to the other: new
        commits write their files under their own table directory and
        only drop references to the shared ones. Same caveat as Delta
        shallow clones: ``vacuum`` on the SOURCE can reclaim files the
        clone still references (the clone's own vacuum never walks
        outside its directory), so deep-copy via
        ``VersionedTable.create(spark, path, self.to_df())`` before
        retiring the source."""
        src = self._read_log(
            self.latest_version() if version is None else version
        )
        clone = VersionedTable(self.spark, path)
        if clone.exists():
            raise FileExistsError(f"versioned table already exists at {path}")
        os.makedirs(clone._log_dir, exist_ok=True)
        def clone_entry(f: dict) -> dict:
            g = {**f, "path": self._abs(f["path"])}
            if _dv_sidecars(f):  # sidecars live under the SOURCE table
                g["dv"] = {
                    **g["dv"],
                    "sidecars": [self._abs(s) for s in _dv_sidecars(f)],
                }
            return g

        files = [clone_entry(f) for f in src["files"]]
        entry = {
            "version": 0,
            "timestamp": clone._commit_timestamp(0),
            "operation": "CLONE",
            "operationParameters": {
                "sourcePath": self.path,
                "sourceVersion": src["version"],
                "partitionBy": self.partition_columns(),
                "constraints": self.constraints(),
            },
            "num_rows": src["num_rows"],
            "files": files,
            "schema": src["schema"],
        }
        # a renamed/dropped-column source reads through its map; the
        # clone inherits it (and the retired set, so later evolution
        # on the clone can't resurface dropped bytes)
        if src.get("columnMap"):
            entry["columnMap"] = src["columnMap"]
        if src.get("retiredPhysical"):
            entry["retiredPhysical"] = src["retiredPhysical"]
        if src.get("clusterBy"):
            entry["clusterBy"] = src["clusterBy"]
        with open(os.path.join(clone._log_dir, f"{0:020d}.json"), "w") as fh:
            json.dump(entry, fh)
        return clone

    def optimize(
        self,
        target_files: int = 8,
        cluster_by: list[str] | None = None,
        zorder_by: list[str] | None = None,
        where: str | None = None,
    ) -> int:
        """Delta-style OPTIMIZE: rewrite the latest snapshot into
        ``target_files`` bin-packed files, optionally range-clustered
        on ``cluster_by`` so each file carries a tight min/max band —
        which is what makes ``read_range``'s stats pruning selective.
        Content-identical to the previous version (same rows, new
        layout); at 100 TB this is the periodic maintenance job that
        keeps file counts bounded and skipping effective. (The full
        rewrite is OPTIMIZE's job — the production refinement is
        bin-packing per partition/size bucket, same commit shape.)

        ``zorder_by`` (mutually exclusive with ``cluster_by``)
        clusters on the Z-order curve of several numeric columns:
        each column is min-max-scaled to a 16-bit rank and the bits
        are interleaved, so files carry tight bands on EVERY listed
        column, not just the first — lexicographic range clustering
        only helps its leading column.

        ``where`` (Delta's ``OPTIMIZE ... WHERE``) scopes the rewrite
        to the files whose HIVE PARTITION VALUES satisfy the
        predicate; every other file is carried by reference. This is
        the operational shape at 100 TB — compact yesterday's
        partition after the backfill lands, never rewrite the table.
        The predicate is evaluated per file on its partition values
        (O(#files) driver-side metadata, one tiny local plan, zero
        data reads for pruning) and may reference partition columns
        only — anything else fails analysis loudly. A predicate
        matching no files is a no-op returning the current version."""
        if cluster_by and zorder_by:
            raise ValueError("pass either cluster_by or zorder_by, not both")
        part_cols = self.partition_columns()
        if where is not None and not part_cols:
            raise ValueError(
                "optimize(where=...) prunes on hive partition values; "
                "this table is unpartitioned — run a full optimize()"
            )

        def attempt() -> int:
            base = self.latest_version()
            entry = self._read_log(base)
            schema = self._entry_schema(entry)
            hit, carried = list(entry["files"]), []
            if where is not None:
                from .delta_log import _partition_values_raw

                by_name = {f.name: f.dataType for f in schema.fields}
                # Partition values travel as RAW HIVE STRINGS and are
                # cast to the schema types through Spark's own
                # string→type casts — date/timestamp/decimal partition
                # columns prune correctly (a typed createDataFrame
                # from python-side parsing rejected them, r6 review).
                pschema = T.StructType(
                    [T.StructField("__idx", T.LongType())]
                    + [T.StructField(c, T.StringType(), True) for c in part_cols]
                )
                rows = []
                for i, f in enumerate(entry["files"]):
                    pv = _partition_values_raw(
                        f["path"].replace(os.sep, "/"), part_cols
                    )
                    rows.append((i, *[pv.get(c) for c in part_cols]))
                typed = self.spark.createDataFrame(rows, pschema).select(
                    "__idx",
                    *[F.col(c).cast(by_name[c]).alias(c) for c in part_cols],
                )
                keep = {
                    r["__idx"] for r in typed.filter(F.expr(where)).collect()
                }
                hit = [f for i, f in enumerate(entry["files"]) if i in keep]
                carried = [
                    f for i, f in enumerate(entry["files"]) if i not in keep
                ]
                if not hit:
                    return base  # nothing in scope: no-op, no commit
            df = self._read_entry({**entry, "files": hit})
            # A clustered table's plain OPTIMIZE applies the DECLARED
            # clustering columns (Delta: OPTIMIZE on a clustered table
            # clusters; you never pass columns to it). Explicit
            # cluster_by/zorder_by args override for this rewrite only
            # — the declared state is never mutated here.
            eff_cluster = cluster_by
            if not cluster_by and not zorder_by:
                eff_cluster = entry.get("clusterBy") or None
            if zorder_by:
                out = df.repartitionByRange(
                    target_files, _zorder_key(df, zorder_by)
                ).sortWithinPartitions(_zorder_key(df, zorder_by))
            elif eff_cluster:
                out = df.repartitionByRange(target_files, *eff_cluster)
            else:
                out = df.coalesce(target_files)
            return self._commit_files(
                out,
                carried,
                "OPTIMIZE",
                {
                    "targetFiles": target_files,
                    "clusterBy": eff_cluster or [],
                    "zorderBy": zorder_by or [],
                    **({"predicate": where} if where is not None else {}),
                },
                schema,
                base_version=base,
                column_map=entry.get("columnMap"),
                retired_physical=entry.get("retiredPhysical"),
            )

        return self._retrying(attempt)

    def changes(self, from_version: int, to_version: int | None = None) -> DataFrame:
        """CDC-style change feed between two versions: full-row diff
        with a ``_change_type`` column (``insert`` / ``delete``;
        an update appears as delete+insert of the changed row).
        Because versions share untouched files by reference, the diff
        only reads files present in exactly ONE of the two versions —
        shared files cancel in the multiset difference by identity,
        so a 1-file change on a 10k-file table diffs 2 files."""
        if to_version is None:
            to_version = self.latest_version()
        return self._snapshot_diff(
            self._read_log(from_version), self._read_log(to_version)
        )

    def _snapshot_diff(self, e_old: dict, e_new: dict) -> DataFrame:
        """Row-level diff between two log entries' snapshots (the body
        of :meth:`changes`, also the RESTORE change-feed capture)."""
        ident = self._file_ident
        old_ids = {ident(f) for f in e_old["files"]}
        new_ids = {ident(f) for f in e_new["files"]}
        schema = self._entry_schema(e_new)
        # Both sides read under the NEW entry's schema + column map:
        # physical names are stable across renames, so a renamed
        # column's values carry through instead of null-diffing.
        cmap = e_new.get("columnMap")
        old_only = self._read_files(
            sorted(
                (f for f in e_old["files"] if ident(f) not in new_ids),
                key=lambda f: f["path"],
            ),
            schema,
            column_map=cmap,
        )
        new_only = self._read_files(
            sorted(
                (f for f in e_new["files"] if ident(f) not in old_ids),
                key=lambda f: f["path"],
            ),
            schema,
            column_map=cmap,
        )
        for f in schema.fields:
            if f.name not in old_only.columns:
                old_only = old_only.withColumn(f.name, F.lit(None).cast(f.dataType))
        old_only = old_only.select(*[f.name for f in schema.fields])
        inserted = new_only.exceptAll(old_only).withColumn("_change_type", F.lit("insert"))
        deleted = old_only.exceptAll(new_only).withColumn("_change_type", F.lit("delete"))
        return inserted.unionByName(deleted)

    def _file_ident(self, f: dict) -> tuple:
        """File identity for snapshot diffs. Includes the deletion
        vector: a file whose DV grew between versions is a real change
        (its masked rows were deleted) and must not cancel out."""
        return (
            self._abs(f["path"]),
            tuple(_dv_legacy(f)),
            tuple(_dv_sidecars(f)),
            _dv_count(f),
        )

    def table_changes(
        self, starting_version: int, ending_version: int | None = None
    ) -> DataFrame:
        """Delta ``table_changes``: the row-level Change Data Feed of
        commits ``starting_version .. ending_version`` (both
        inclusive), with ``_change_type`` (``insert`` / ``delete`` /
        ``update_preimage`` / ``update_postimage``), ``_commit_version``
        and ``_commit_timestamp`` columns.

        Per commit, the feed comes from the change files the commit
        captured (``enable_cdf=True`` tables — exact pre/post images,
        change-sized reads); pure file ADDITIONS are derived as
        ``insert`` straight from the added data files (the protocol's
        CDF fallback — no change file is ever written for appends);
        data-neutral OPTIMIZE commits contribute nothing. A commit
        that removed or DV-masked files WITHOUT captured change files
        (a rewrite on a table created without ``enable_cdf``) raises —
        use :meth:`changes` for the snapshot-diff approximation there.

        Scale: the driver walks log metadata only; every row is read
        distributedly from change files or added files, all sized to
        the change, never the table."""
        end = self.latest_version() if ending_version is None else ending_version
        if starting_version < 0 or end < starting_version:
            raise ValueError(
                f"bad CDF range [{starting_version}, {end}]"
            )
        ident = self._file_ident
        prev_entry = (
            self._read_log(starting_version - 1) if starting_version > 0 else None
        )
        # Every batch reads under the END version's schema + column
        # map (Delta's CDF contract): physical names are stable, so a
        # column renamed mid-range carries its values through under
        # its final name; columns added mid-range read as null before
        # they existed; dropped columns are absent.
        end_entry = self._read_log(end)
        schema = self._entry_schema(end_entry)
        end_map = end_entry.get("columnMap")
        cdc_schema = T.StructType(
            list(schema.fields)
            + [T.StructField("_change_type", T.StringType(), True)]
        )
        out = None
        for v in range(starting_version, end + 1):
            entry = self._read_log(v)
            op = entry.get("operation")
            df = None
            if "cdcFiles" in entry:
                # key present = capture RAN; an empty list is a
                # legitimate zero-change commit (contributes nothing)
                if entry["cdcFiles"]:
                    df = self._read_files(
                        entry["cdcFiles"], cdc_schema, column_map=end_map
                    )
            elif op != "OPTIMIZE":
                prev_ids = (
                    {ident(f) for f in prev_entry["files"]} if prev_entry else set()
                )
                removed = prev_ids - {ident(f) for f in entry["files"]}
                added = [f for f in entry["files"] if ident(f) not in prev_ids]
                if removed:
                    raise ValueError(
                        f"version {v} ({op}) removed or rewrote files but "
                        "captured no change data — create the table with "
                        "enable_cdf=True, or diff snapshots via changes()"
                    )
                if added:
                    df = self._read_files(
                        added, schema, column_map=end_map
                    ).withColumn("_change_type", F.lit("insert"))
            prev_entry = entry
            if df is None:
                continue
            df = df.select(
                *[f.name for f in schema.fields],
                "_change_type",
                F.lit(v).cast("long").alias("_commit_version"),
                F.lit(entry["timestamp"])
                .cast("timestamp")
                .alias("_commit_timestamp"),
            )
            out = df if out is None else out.unionByName(df)
        if out is not None:
            return out
        end_schema = schema
        empty_schema = T.StructType(
            list(end_schema.fields)
            + [
                T.StructField("_change_type", T.StringType(), True),
                T.StructField("_commit_version", T.LongType(), True),
                T.StructField("_commit_timestamp", T.TimestampType(), True),
            ]
        )
        return self.spark.createDataFrame([], empty_schema)

    def vacuum(
        self,
        retain_last: int = 2,
        dry_run: bool = False,
        min_age_seconds: float = 3600.0,
    ) -> list:
        """Delete data files not referenced by the last
        ``retain_last`` versions; the log is kept so history stays
        queryable. Because versions share files, a file is only
        reclaimed when NO retained version references it (so e.g. a
        RESTORE target's files survive a vacuum that drops the
        intermediate version). Returns the versions that are no
        longer fully readable.

        ``min_age_seconds`` is the same safety Delta's VACUUM
        retention duration provides: a CONCURRENT writer mid-commit
        has already written its parquet under a fresh ``c-<v>-…``
        directory but not yet linked its log entry — to this vacuum
        those files are indistinguishable from orphans, and deleting
        them would corrupt the commit that lands a moment later.
        Files younger than the threshold are therefore never
        reclaimed. Pass ``0`` only when no other writer can be active
        (Delta likewise requires disabling a safety check to go below
        its retention floor).

        ``dry_run=True`` (Delta ``VACUUM ... DRY RUN``): deletes
        nothing and returns the file paths that WOULD be removed —
        the operator's pre-flight check before an irreversible
        reclaim."""
        import time as _time

        self._vacuum_check_mirror_protocol()
        age_floor = _time.time() - min_age_seconds
        versions = sorted(self._versions())
        keep = set(versions[-retain_last:]) if retain_last > 0 else set()
        referenced: set[str] = set()
        for v in keep:
            for f in self._read_log(v)["files"]:
                referenced.add(self._abs(f["path"]))
                for s in _dv_sidecars(f):  # keep retained DV sidecars
                    sp = self._abs(s)
                    if os.path.isdir(sp):
                        for root, _d, fns in os.walk(sp):
                            referenced.update(
                                os.path.join(root, fn) for fn in fns
                            )
                    else:
                        referenced.add(sp)
        would_delete: list[str] = []
        for name in sorted(os.listdir(self.path)):
            sub = os.path.join(self.path, name)
            # "_"-prefixed dirs are table metadata (the commit log,
            # exported symlink manifests), never vacuumable data.
            if name.startswith("_") or not os.path.isdir(sub):
                continue
            for root, _dirs, fnames in os.walk(sub, topdown=False):
                for fn in fnames:
                    fp = os.path.join(root, fn)
                    if fp not in referenced:
                        try:
                            if os.path.getmtime(fp) > age_floor:
                                continue  # too young: possibly an in-flight commit
                        except OSError:
                            continue
                        if dry_run:
                            would_delete.append(fp)
                        else:
                            os.remove(fp)
                if not dry_run:
                    try:
                        os.rmdir(root)  # prune now-empty dirs
                    except OSError:
                        pass
        # Change-data sweep: "_change_data" is metadata-adjacent (the
        # main sweep skips "_"-prefixed dirs) but a commit attempt that
        # LOST the version race leaves its change files orphaned there.
        # Reclaim files referenced by NO logged version's cdcFiles —
        # every live version keeps its feed readable, dropped-version
        # feeds included (history stays queryable after vacuum).
        cdc_dir = os.path.join(self.path, "_change_data")
        if os.path.isdir(cdc_dir):
            cdc_referenced: set[str] = set()
            for v in versions:
                for f in self._read_log(v).get("cdcFiles", []):
                    cdc_referenced.add(self._abs(f["path"]))
            for root, _dirs, fnames in os.walk(cdc_dir, topdown=False):
                for fn in fnames:
                    fp = os.path.join(root, fn)
                    if fp in cdc_referenced:
                        continue
                    try:
                        if os.path.getmtime(fp) > age_floor:
                            continue  # possibly an in-flight commit
                    except OSError:
                        continue
                    if dry_run:
                        would_delete.append(fp)
                    else:
                        os.remove(fp)
                if not dry_run and root != cdc_dir:
                    try:
                        os.rmdir(root)
                    except OSError:
                        pass
        if dry_run:
            return sorted(would_delete)
        dropped = []
        for v in versions:
            if v in keep:
                continue
            if not all(
                os.path.exists(self._abs(f["path"]))
                for f in self._read_log(v)["files"]
            ):
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
        schema = self._entry_schema(entry)
        pred = F.lit(True)
        if lower is not None:
            pred = pred & (F.col(col) >= F.lit(lower))
        if upper is not None:
            pred = pred & (F.col(col) <= F.lit(upper))
        lo_key, up_key = _stat_key(lower), _stat_key(upper)
        selected = []
        for f in entry["files"]:
            stats = f.get("stats", {}).get(col)
            if stats is not None:
                fmin, fmax = stats
                if fmin is not None and fmax is not None:
                    if lo_key is not None and _stat_key(fmax) < lo_key:
                        continue
                    if up_key is not None and _stat_key(fmin) > up_key:
                        continue
            selected.append(f)
        return self._read_files(
            selected, schema, column_map=entry.get("columnMap")
        ).filter(pred)

    def read_where_null(self, col: str, version: int | None = None) -> DataFrame:
        """``WHERE col IS NULL`` with file skipping on the per-file
        null counts recorded from the parquet footers at commit time
        (Delta's ``nullCount`` stat): a file whose null count is 0
        provably has no matching row and is never opened. The typical
        consumer is a data-quality audit ("show me the rows that
        failed enrichment") on a mostly-complete 100 TB table, where
        nearly every file prunes."""
        if version is None:
            version = self.latest_version()
        entry = self._read_log(version)
        schema = self._entry_schema(entry)
        selected = [
            f
            for f in entry["files"]
            if f.get("nullCounts", {}).get(col) != 0
        ]
        return self._read_files(
            selected, schema, column_map=entry.get("columnMap")
        ).filter(F.col(col).isNull())

    def read_point(self, col: str, value, version: int | None = None) -> DataFrame:
        """Equality read with min/max AND bloom-filter file skipping.

        Min/max stats prune nothing on a high-cardinality key whose
        values are scattered (every file spans the full range); the
        per-file bloom bitmaps recorded at commit time (for
        ``bloom_filter_cols`` tables) prune exactly those scans. A
        bloom can only over-approximate membership, so skipped files
        provably lack the value and results stay exact; the residual
        equality filter still applies. At 100 TB this turns a
        needle-in-haystack lookup from a snapshot scan into opening a
        handful of (false-positive) files."""
        if version is None:
            version = self.latest_version()
        entry = self._read_log(version)
        schema = self._entry_schema(entry)
        selected = self._point_files(entry, schema, col, value)
        return self._read_files(
            selected, schema, column_map=entry.get("columnMap")
        ).filter(F.col(col) == F.lit(value))

    def _point_files(self, entry: dict, schema: T.StructType, col: str, value) -> list[dict]:
        """Files of ``entry`` that may contain ``col == value`` per
        min/max stats and (when present) per-file bloom bitmaps.

        xxhash64 is TYPE-sensitive (int and long hash differently),
        so each bitmap is probed with the dtype it was HASHED under —
        recorded per file entry at commit time (``bloomTypes``). After
        ``merge(evolve_schema=True)`` widens a bloom-indexed column,
        carried pre-widening files keep bitmaps hashed under the old
        narrow type; probing them with the new schema type would
        falsely exclude every such file and silently drop matching
        rows. Legacy entries without a recorded type fall back to the
        current schema type (only correct pre-widening; the merge
        widening path strips such bitmaps, see ``merge``)."""
        import base64

        key = _stat_key(value)
        files = entry["files"]
        cur_dtype = {f.name: f.dataType for f in schema.fields}[col]
        probe_cache: dict[str, list[int] | None] = {}

        def probe_for(hash_type: str) -> list[int] | None:
            if hash_type not in probe_cache:
                probe_cache[hash_type] = self._bloom_positions(
                    value, hash_type, cur_dtype
                )
            return probe_cache[hash_type]

        selected = []
        for f in files:
            # an equality probe is null-rejecting: an all-null file
            # (which has no min/max to prune on) can still be skipped
            # via its null count
            if f.get("nullCounts", {}).get(col) == f.get("num_rows"):
                continue
            stats = f.get("stats", {}).get(col)
            if stats is not None and key is not None:
                fmin, fmax = stats
                if fmin is not None and fmax is not None:
                    if _stat_key(fmin) > key or _stat_key(fmax) < key:
                        continue
            bm64 = f.get("bloom", {}).get(col)
            if bm64 is not None and value is not None:
                hash_type = (
                    f.get("bloomTypes", {}).get(col) or cur_dtype.simpleString()
                )
                probe = probe_for(hash_type)
                if probe is None:
                    # the probe value is not representable in the
                    # file's physical type (e.g. probing a
                    # post-widening long beyond int range) — the file
                    # provably cannot contain it
                    continue
                bm = base64.b64decode(bm64)
                if any(not (bm[p // 8] >> (p % 8)) & 1 for p in probe):
                    continue
            selected.append(f)
        return selected

    def _bloom_positions(
        self, value, hash_type: str, cur_dtype: T.DataType
    ) -> list[int] | None:
        """Bit positions ``value`` must have set in a bitmap hashed
        under ``hash_type`` — computed with the SAME JVM xxhash64 used
        at write time (a one-row Spark job, so write and probe hashing
        can never drift), with the literal cast to the HASHED type.
        Returns None when the value does not round-trip through
        ``hash_type`` (overflow / precision loss): a file physically
        written with that type provably cannot contain the value."""
        hv = F.lit(value).cast(cur_dtype).try_cast(hash_type)
        ok = hv.isNotNull() & (hv.cast(cur_dtype) == F.lit(value).cast(cur_dtype))
        row = (
            self.spark.range(1)
            .select(
                ok.alias("ok"),
                F.array(
                    *[
                        F.pmod(F.xxhash64(hv, F.lit(i)), F.lit(_BLOOM_BITS))
                        for i in range(_BLOOM_HASHES)
                    ]
                ).alias("a"),
            )
            .head()
        )
        if not row["ok"]:
            return None
        return [int(p) for p in row["a"]]

    def _attach_blooms(
        self, entries: list[dict], schema: T.StructType, cols: list[str]
    ) -> None:
        """Record a per-file bloom bitmap for each indexed column on
        the just-written file entries. One distributed pass over the
        NEW files only (never the carried ones — their entries keep
        the blooms computed at their own commit): k=3 JVM xxhash64
        positions per row, deduplicated per file with a map-side
        combined ``collect_set`` bounded by the bitmap width, so the
        driver collects O(#new_files × bitmap_bits) ints, never rows."""
        import base64

        names = {f.name for f in schema.fields}
        cols = [c for c in cols if c in names]
        if not entries or not cols:
            return
        paths = [self._abs(f["path"]) for f in entries]
        df = self._read_paths(paths, schema, with_meta=True)
        for c in cols:
            arr = F.array(
                *[
                    F.pmod(F.xxhash64(F.col(c), F.lit(i)), F.lit(_BLOOM_BITS))
                    for i in range(_BLOOM_HASHES)
                ]
            )
            rows = (
                df.select(F.col("__path").alias("p"), F.explode(arr).alias("b"))
                .groupBy("p")
                .agg(F.collect_set("b").alias("bits"))
                .collect()
            )
            by_path = {r["p"]: r["bits"] for r in rows}
            for f in entries:
                bits = by_path.get(self._abs(f["path"]))
                if bits is None:
                    continue
                bm = bytearray(_BLOOM_BITS // 8)
                for b in bits:
                    bm[b // 8] |= 1 << (b % 8)
                f.setdefault("bloom", {})[c] = base64.b64encode(bytes(bm)).decode()
                # record the dtype the bitmap was hashed under —
                # xxhash64 is type-sensitive, and after type widening
                # this file's probe must hash with the ORIGINAL type
                f.setdefault("bloomTypes", {})[c] = schema[c].dataType.simpleString()

    # ----------------------------------------------------------------- internals

    def _versions(self) -> set[int]:
        if not os.path.isdir(self._log_dir):
            return set()
        return {
            int(f.split(".")[0])
            for f in os.listdir(self._log_dir)
            if f.endswith(".json")
        }

    def _read_log_raw(self, version: int) -> dict:
        """The JSON entry as written — no manifest resolution, O(1)
        even for spilled commits. ``files`` may be absent."""
        with open(os.path.join(self._log_dir, f"{version:020d}.json")) as fh:
            return json.load(fh)

    def _read_log(self, version: int) -> dict:
        entry = self._read_log_raw(version)
        if "filesManifest" in entry:
            entry["files"] = self._read_manifest(entry["filesManifest"])
        return entry

    # ------------------------------------------------- manifest sidecars
    #
    # A commit's file list is the only O(#files) payload in the log. For
    # small tables it inlines in the JSON entry; past
    # ``manifest_inline_max`` files it spills to a parquet sidecar
    # (``_log/manifests/<version>-<uid>.parquet``) so the JSON entry
    # stays O(1) and the manifest is columnar, compressed, and — at
    # cluster scale — readable as a DataFrame for distributed planning
    # (the Iceberg manifest-file / Delta parquet-checkpoint shape).
    # Vacuum never descends into ``_log``, so manifests persist exactly
    # as long as their log entries do.

    def _write_manifest(self, version: int, files: list[dict]) -> str:
        import pyarrow as pa
        import pyarrow.parquet as pq

        man_dir = os.path.join(self._log_dir, "manifests")
        os.makedirs(man_dir, exist_ok=True)
        rel = os.path.join("manifests", f"{version:020d}-{uuid.uuid4().hex[:8]}.parquet")
        table = pa.table(
            {
                "path": pa.array([f["path"] for f in files], pa.string()),
                "num_rows": pa.array(
                    [int(f.get("num_rows", 0)) for f in files], pa.int64()
                ),
                # stats / dv / partitionValues vary per schema — carried
                # as a JSON column; promote hot stat columns to native
                # parquet columns if manifest-level pushdown is needed.
                "meta_json": pa.array(
                    [
                        json.dumps(
                            {k: v for k, v in f.items() if k not in ("path", "num_rows")}
                        )
                        for f in files
                    ],
                    pa.string(),
                ),
            }
        )
        tmp = os.path.join(man_dir, f".tmp-{uuid.uuid4().hex}")
        pq.write_table(table, tmp, compression="zstd")
        os.rename(tmp, os.path.join(self._log_dir, rel))
        return rel

    def _read_manifest(self, rel: str) -> list[dict]:
        import pyarrow.parquet as pq

        table = pq.read_table(os.path.join(self._log_dir, rel))
        files = []
        for path, num_rows, meta in zip(
            table["path"].to_pylist(),
            table["num_rows"].to_pylist(),
            table["meta_json"].to_pylist(),
        ):
            f = {"path": path, "num_rows": num_rows}
            f.update(json.loads(meta))
            files.append(f)
        return files

    def _entry_schema(self, entry: dict) -> T.StructType:
        return T.StructType.fromJson(entry["schema"])

    def _abs(self, rel: str) -> str:
        return rel if rel.startswith("/") else os.path.join(self.path, rel)

    @staticmethod
    def _norm_file(uri: str) -> str:
        """``input_file_name()`` URI → local filesystem path."""
        p = unquote(uri)
        if p.startswith("file://"):
            p = p[len("file:") :]
            while p.startswith("//"):
                p = p[1:]
        elif p.startswith("file:"):
            p = p[len("file:") :]
        return p

    def _distinct_files(self, tagged: DataFrame) -> set[str]:
        """Distinct source files of the rows in ``tagged`` (which must
        carry a ``__file`` = input_file_name() column). One distributed
        scan; the projection is a single string column."""
        return {
            self._norm_file(r["__file"])
            for r in tagged.select("__file").distinct().collect()
        }

    def _read_paths(
        self,
        paths: list[str],
        schema: T.StructType,
        with_meta: bool = False,
        column_map: dict | None = None,
    ) -> DataFrame:
        """Assemble a DataFrame from an explicit file list under the
        logged schema. Files written by partitioned commits live under
        hive-style subdirs of their commit directory, so reads group
        by commit dir and set ``basePath`` per group — partition
        columns stay resolvable while addressing leaf files.

        ``with_meta`` appends ``__path`` (normalized source file path)
        and ``__row_idx`` (position within that file) from the hidden
        ``_metadata`` struct — the join keys for deletion vectors and
        the touched-file detection. Selected at the scan, these are
        zero-cost generated columns, not data reads."""
        schema = _nullable(schema)
        if not paths:
            out = self.spark.createDataFrame([], schema)
            if with_meta:
                out = out.withColumn("__path", F.lit(None).cast("string")).withColumn(
                    "__row_idx", F.lit(None).cast("long")
                )
            return out

        # Column mapping: data files carry PHYSICAL names (stable
        # since column creation); read under the physical schema and
        # alias back to the logical names the caller asked for.
        # Partition columns are rename-guarded, so hive directory
        # names are always logical==physical.
        cmap = {k: v for k, v in (column_map or {}).items() if k != v}
        read_schema = (
            T.StructType(
                [
                    T.StructField(cmap.get(f.name, f.name), f.dataType, True)
                    for f in schema.fields
                ]
            )
            if cmap
            else schema
        )

        meta_cols = [
            F.regexp_replace(F.col("_metadata.file_path"), "^file:/+", "/").alias(
                "__path"
            ),
            F.col("_metadata.row_index").alias("__row_idx"),
        ]

        def _finish(df: DataFrame) -> DataFrame:
            if cmap:
                logical = [
                    F.col(cmap.get(f.name, f.name)).alias(f.name)
                    for f in schema.fields
                ]
                return df.select(*logical, *meta_cols) if with_meta else df.select(*logical)
            return df.select("*", *meta_cols) if with_meta else df

        part_cols = self.partition_columns()
        if not part_cols:
            return _finish(self.spark.read.schema(read_schema).parquet(*paths))
        groups: dict[str, list[str]] = {}
        for p in paths:
            groups.setdefault(self._commit_base(p), []).append(p)
        out = None
        for base, grp in sorted(groups.items()):
            df = _finish(
                self.spark.read.option("basePath", base)
                .schema(read_schema)
                .parquet(*grp)
            )
            out = df if out is None else out.unionByName(df)
        return out

    def _read_files(
        self,
        file_entries: list[dict],
        schema: T.StructType,
        keep_path: str | None = None,
        column_map: dict | None = None,
    ) -> DataFrame:
        """Read a list of log file entries, applying each file's
        deletion vector (``dv``: positions masked out by a
        merge-on-read DELETE, stored in sidecar parquet files). The
        DV side joins left-anti on (file, row position) — broadcast
        while the masked-position total is under
        ``_DV_BROADCAST_MAX``, a shuffled anti-join beyond that — so
        the scan itself is untouched and pushdown/pruning survive.
        ``keep_path`` retains the normalized source-file column under
        that name (for touched-file detection)."""
        paths = [self._abs(f["path"]) for f in file_entries]
        dv_df = self._dv_df(file_entries)
        if dv_df is None and keep_path is None:
            return self._read_paths(paths, schema, column_map=column_map)
        df = self._read_paths(paths, schema, with_meta=True, column_map=column_map)
        if dv_df is not None:
            total = sum(_dv_count(f) for f in file_entries)
            if total <= _DV_BROADCAST_MAX:
                dv_df = F.broadcast(dv_df)
            df = df.join(dv_df, ["__path", "__row_idx"], "left_anti")
        if keep_path is not None:
            df = df.withColumnRenamed("__path", keep_path).drop("__row_idx")
        else:
            df = df.drop("__path", "__row_idx")
        return df

    def _dv_df(self, file_entries: list[dict]) -> DataFrame | None:
        """All deletion-vector positions for these files as a
        ``(__path, __row_idx)`` DataFrame (absolute paths), or None
        when nothing is masked. Sidecars are read distributedly by
        Spark; only pre-sidecar inline lists (legacy entries) go
        through ``createDataFrame``. Sidecar rows for files outside
        ``file_entries`` are filtered out by the path-map join, so
        partial reads (stats-pruned scans, change feeds) stay exact."""
        legacy_rows = [
            (self._abs(f["path"]), int(i))
            for f in file_entries
            for i in _dv_legacy(f)
        ]
        sidecars = sorted({s for f in file_entries for s in _dv_sidecars(f)})
        if not legacy_rows and not sidecars:
            return None
        out = None
        if sidecars:
            map_df = self.spark.createDataFrame(
                [(f["path"], self._abs(f["path"])) for f in file_entries],
                "path string, __path string",
            ).dropDuplicates(["path"])
            sc = self.spark.read.parquet(*[self._abs(s) for s in sidecars])
            out = sc.join(F.broadcast(map_df), "path").select(
                "__path", F.col("pos").alias("__row_idx")
            )
        if legacy_rows:
            ldf = self.spark.createDataFrame(
                legacy_rows, "__path string, __row_idx long"
            )
            out = ldf if out is None else out.unionByName(ldf)
        return out

    def _commit_base(self, p: str) -> str:
        """``basePath`` for a leaf file of a partitioned commit: its
        enclosing commit directory (``c-<version>-<hex>``). Resolved
        structurally rather than relative to ``self.path`` because a
        shallow clone's file list points into ANOTHER table's
        directory."""
        d = os.path.dirname(p)
        while d and d != os.sep:
            if _COMMIT_DIR_RE.match(os.path.basename(d)):
                return d
            d = os.path.dirname(d)
        rel = os.path.relpath(p, self.path)
        return os.path.join(self.path, rel.split(os.sep)[0])

    def _read_entry(self, entry: dict) -> DataFrame:
        return self._read_files(
            entry["files"],
            self._entry_schema(entry),
            column_map=entry.get("columnMap"),
        )

    def _resolve_timestamp(self, ts: datetime | str) -> int:
        """Max version with commit timestamp ≤ ts (``api.py:80``).
        Commit timestamps are strictly increasing (enforced at commit
        time), so the mapping is unambiguous."""
        if isinstance(ts, str):
            ts = datetime.fromisoformat(ts)
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=timezone.utc)
        candidates = [
            v
            for v in self._versions()
            if datetime.fromisoformat(self._read_log_raw(v)["timestamp"]) <= ts
        ]
        if not candidates:
            raise ValueError(f"no version at or before {ts.isoformat()}")
        return max(candidates)

    def partition_columns(self) -> list[str]:
        """Table partitioning, from the CREATE entry (empty if none).
        Memoized — partitioning is fixed at CREATE time."""
        cached = getattr(self, "_part_cols", None)
        if cached is not None:
            return cached
        if 0 not in self._versions():
            return []
        cols = self._read_log_raw(0).get("operationParameters", {}).get("partitionBy", [])
        self._part_cols = cols
        return cols

    def constraints(self) -> dict[str, str]:
        """Table CHECK constraints, from the CREATE entry."""
        if 0 not in self._versions():
            return {}
        return self._read_log_raw(0).get("operationParameters", {}).get("constraints", {})

    def bloom_filter_columns(self) -> list[str]:
        """Columns with per-file bloom indexes, from the CREATE entry."""
        if 0 not in self._versions():
            return []
        return self._read_log_raw(0).get("operationParameters", {}).get(
            "bloomFilterCols", []
        )

    def generated_columns(self) -> dict[str, str]:
        """Generated-column expressions, from the CREATE entry."""
        if 0 not in self._versions():
            return {}
        return self._read_log_raw(0).get("operationParameters", {}).get(
            "generated", {}
        )

    def identity_info(self) -> dict | None:
        """Identity-column config (Delta ``GENERATED ALWAYS AS
        IDENTITY``) from the CREATE entry — ``{"column", "start",
        "step"}`` — or None. The running high-water mark lives in
        each commit entry (``identityHighWaterMark``), never here."""
        if 0 not in self._versions():
            return None
        return (
            self._read_log_raw(0)
            .get("operationParameters", {})
            .get("identity")
            or None
        )

    def _identity_hwm(self, entry: dict, idcfg: dict) -> int:
        return int(
            entry.get(
                "identityHighWaterMark",
                int(idcfg.get("start", 1)) - int(idcfg.get("step", 1)),
            )
        )

    def delta_mirror_enabled(self) -> bool:
        """Whether every commit also maintains the open-protocol
        Delta log (``_delta_log``), from the CREATE entry."""
        if 0 not in self._versions():
            return False
        return bool(
            self._read_log_raw(0).get("operationParameters", {}).get(
                "deltaMirror", False
            )
        )

    def cdf_enabled(self) -> bool:
        """Whether commits capture the Change Data Feed (Delta
        ``delta.enableChangeDataFeed``), from the CREATE entry."""
        if 0 not in self._versions():
            return False
        return bool(
            self._read_log_raw(0).get("operationParameters", {}).get(
                "enableCdf", False
            )
        )

    def append_only_enabled(self) -> bool:
        """Whether the table refuses row-changing DML (Delta
        ``delta.appendOnly``), from the CREATE entry."""
        if 0 not in self._versions():
            return False
        return bool(
            self._read_log_raw(0).get("operationParameters", {}).get(
                "appendOnly", False
            )
        )

    def dv_mirror_policy(self) -> str:
        """How MoR deletion vectors reach the mirror: ``materialize``
        (rewrite survivors, protocol stays (1, 2)) or ``native``
        (protocol ``deletionVector`` specs + roaring .bin files, the
        ``deletionVectors`` reader-writer feature). From the CREATE
        entry."""
        if 0 not in self._versions():
            return "materialize"
        return (
            self._read_log_raw(0)
            .get("operationParameters", {})
            .get("dvMirrorPolicy")
            or "materialize"
        )

    def vacuum_protocol_check_enabled(self) -> bool:
        """Whether the mirror declares the ``vacuumProtocolCheck``
        reader-writer marker feature (PROTOCOL.md): VACUUM must
        verify it understands the table's protocol before reclaiming
        files. From the CREATE entry."""
        if 0 not in self._versions():
            return False
        return bool(
            self._read_log_raw(0).get("operationParameters", {}).get(
                "vacuumProtocolCheck", False
            )
        )

    def _vacuum_check_mirror_protocol(self) -> None:
        """The vacuumProtocolCheck obligation: before deleting ANY
        file, re-read the mirrored protocol and refuse if it names a
        writer feature this implementation does not understand — an
        unknown scheme (say, a DV format we don't parse) may hold
        references to files this sweep would classify as orphans.
        No-op for unmirrored tables (no external protocol exists) and
        for protocols without the marker feature."""
        ddir = os.path.join(self.path, "_delta_log")
        if not os.path.isdir(ddir):
            return
        from .delta_log import (
            _SUPPORTED_WRITER_FEATURES,
            DeltaMirrorError,
            latest_mirror_protocol,
        )

        proto = latest_mirror_protocol(self)
        if proto is None:
            return
        feats = set(proto.get("writerFeatures") or [])
        if "vacuumProtocolCheck" not in feats:
            return
        # Version bounds first: a future protocol may raise the
        # reader/writer version without naming a recognizable feature
        # (PROTOCOL.md caps feature-based protocols at reader 3 /
        # writer 7 today; anything higher is by definition unknown).
        reader_v = int(proto.get("minReaderVersion") or 1)
        writer_v = int(proto.get("minWriterVersion") or 1)
        if reader_v > 3 or writer_v > 7:
            raise DeltaMirrorError(
                f"VACUUM refused: table protocol demands "
                f"minReaderVersion={reader_v}/minWriterVersion={writer_v}, "
                f"beyond the feature-protocol bounds (3/7) this "
                f"implementation understands (vacuumProtocolCheck)"
            )
        unknown = feats - _SUPPORTED_WRITER_FEATURES
        if unknown:
            raise DeltaMirrorError(
                f"VACUUM refused: table protocol demands writer features "
                f"{sorted(unknown)} this implementation does not "
                f"understand (vacuumProtocolCheck)"
            )

    def _refuse_if_append_only(self, op: str) -> None:
        """Delta ``delta.appendOnly`` enforcement: DELETE / UPDATE /
        MERGE / replaceWhere change or remove existing rows and are
        refused; append, OPTIMIZE (layout-only) and metadata commits
        stay legal. External writers see the same contract through
        the mirrored table property."""
        if self.append_only_enabled():
            raise AppendOnlyError(
                f"{op} is not allowed: this table was created with "
                f"append_only=True (delta.appendOnly) — only appends "
                f"and layout/metadata commits are permitted"
            )

    def checkpoint_policy(self) -> str:
        """Mirror checkpoint policy from the CREATE entry: ``classic``
        (single-file parquet checkpoint) or ``v2`` (uuid-named
        manifest + file-action sidecars under ``_delta_log/_sidecars``
        — the reader-writer table feature ``v2Checkpoint``). V2 is the
        100 TB policy: the top-level file stays O(#shards) while
        millions of add actions shard across parallel sidecars."""
        if 0 not in self._versions():
            return "classic"
        return (
            self._read_log_raw(0)
            .get("operationParameters", {})
            .get("checkpointPolicy")
            or "classic"
        )

    def set_cluster_by(self, cols: list[str]) -> int:
        """Declare (or clear, with ``[]``) the table's clustering
        columns — Delta's ``ALTER TABLE ... CLUSTER BY`` surface for
        clustered tables (liquid clustering). Metadata-only commit:
        every file is carried by reference, O(1) for any table size;
        the next :meth:`optimize` applies the declared layout. On a
        mirrored table the commit emits the ``delta.clustering``
        domainMetadata (plus the ``clustering`` writer-feature
        protocol upgrade the first time), so external clients discover
        the clustering columns through the protocol."""

        def attempt() -> int:
            base = self.latest_version()
            entry = self._read_log(base)
            schema = self._entry_schema(entry)
            names = {f.name for f in schema.fields}
            missing = [c for c in cols if c not in names]
            if missing:
                raise ValueError(
                    f"cluster_by columns not in schema: {missing}"
                )
            if any(c in self.partition_columns() for c in cols):
                raise ValueError(
                    "cluster_by and partition_by are mutually exclusive "
                    "per column (Delta clustered tables are unpartitioned)"
                )
            return self._commit_files(
                None,
                list(entry["files"]),
                "CLUSTER BY",
                {"clusterBy": list(cols)},
                schema,
                base_version=base,
                column_map=entry.get("columnMap"),
                retired_physical=entry.get("retiredPhysical"),
            )

        return self._retrying(attempt)

    def cluster_by_columns(self) -> list[str]:
        """The declared clustering columns (empty when the table is
        not clustered), from the latest commit's carried state."""
        return list(
            self._read_log_raw(self.latest_version()).get("clusterBy") or []
        )

    def checkpoint_mirror(
        self, materialize_dvs: bool = False, parts: int | None = None
    ) -> int:
        """Force a mirror checkpoint at the latest version (Delta's
        explicit ``DeltaLog.checkpoint()``), in the table's declared
        policy; ``parts=N`` writes the multi-part classic form (the
        split external writers use past ``checkpoint.partSize``).
        Syncs first; returns the checkpointed version."""
        from .delta_log import write_checkpoint as _wcp

        return _wcp(self, materialize_dvs=materialize_dvs, parts=parts)

    def cleanup_log_mirror(
        self, retention_ms: int | None = None, now_ms: int | None = None
    ) -> list[str]:
        """Mirror metadata cleanup (Delta ``delta.logRetentionDuration``):
        delete mirrored log files below the latest checkpoint once
        older than the retention window, including V2 sidecar GC.
        Returns the deleted names. The PRIVATE commit log is never
        touched — time travel through this layer keeps its full
        history; only the open-protocol mirror's replay horizon is
        bounded, exactly as an external Delta deployment's would be.

        A table created without ``delta_mirror=True`` has no
        ``_delta_log`` directory: a no-op (returns ``[]``), matching
        the other mirror entry points' guard-or-create behavior."""
        from .delta_log import _LOG_RETENTION_MS, cleanup_expired_logs

        if not os.path.isdir(os.path.join(self.path, "_delta_log")):
            return []
        return cleanup_expired_logs(
            self,
            retention_ms=_LOG_RETENTION_MS if retention_ms is None else retention_ms,
            now_ms=now_ms,
        )

    def row_tracking_enabled(self) -> bool:
        """Whether commits assign row-id ranges to fresh files (Delta
        ``delta.enableRowTracking``), from the CREATE entry. Fresh
        (non-materialized) row tracking: every file added to the table
        gets a contiguous id range ``[baseRowId, baseRowId +
        num_rows - 1]`` above a commit-logged high-water mark, so a
        row's id is ``baseRowId + position``. Rewrites (copy-on-write
        DELETE/UPDATE survivors, OPTIMIZE output) allocate FRESH ids —
        preserving ids across rewrites requires materialized row-id
        columns, which this layer deliberately does not add to data
        files (zero write amplification; same trade Delta makes when
        ``delta.rowTracking.preserved`` is unavailable)."""
        if 0 not in self._versions():
            return False
        return bool(
            self._read_log_raw(0).get("operationParameters", {}).get(
                "rowTracking", False
            )
        )

    def ict_enabled(self) -> bool:
        """Whether the mirror advertises Delta in-commit timestamps
        (writer feature ``inCommitTimestamp``), from the CREATE entry.
        The private log's commit timestamps are ALREADY the in-commit
        clock — strictly increasing, bumped past the previous commit
        (``_commit_timestamp``) — so the feature costs nothing here;
        what it adds is the protocol declaration that lets external
        readers time-travel by the log's clock instead of trusting
        commit-file modification times."""
        if 0 not in self._versions():
            return False
        return bool(
            self._read_log_raw(0).get("operationParameters", {}).get(
                "inCommitTimestamps", False
            )
        )

    def row_id_high_water_mark(self, version: int | None = None) -> int:
        """The highest row id ever assigned as of ``version`` (latest
        if None); -1 before any rows."""
        if version is None:
            version = max(self._versions())
        return int(self._read_log_raw(version).get("rowIdHighWaterMark", -1))

    def _check_constraints(self, df: DataFrame, checks: dict[str, str]) -> None:
        for name, expr in checks.items():
            bad = df.filter(~F.coalesce(F.expr(expr), F.lit(False))).limit(1).collect()
            if bad:
                raise ConstraintViolationError(
                    f"constraint {name!r} ({expr}) violated, e.g. row {bad[0].asDict()}"
                )

    max_commit_retries: int = _MAX_COMMIT_RETRIES

    def _retrying(self, attempt):
        """Optimistic-concurrency loop: re-run the whole DML attempt
        (which re-reads the latest snapshot) when another writer took
        our target version."""
        for _ in range(self.max_commit_retries - 1):
            try:
                return attempt()
            except VersionConflictError:
                continue
        return attempt()  # last try surfaces the conflict

    # ----------------------------------------------------------------- commit

    def _commit_files(
        self,
        new_df: DataFrame | None,
        carried: list[dict],
        operation: str,
        params: dict,
        schema: T.StructType,
        base_version: int | None = None,
        cdc_df: DataFrame | None = None,
        txn: dict | None = None,
        column_map: dict | None = None,
        retired_physical: list | None = None,
    ) -> int:
        """Write ``new_df`` (if any) as fresh data files, then commit
        a log entry whose file list is ``carried`` + the new files.
        Raises :class:`VersionConflictError` if the version was taken
        between read and commit (the written data directory is left
        orphaned for ``vacuum`` — readers never see it).

        ``base_version`` is the snapshot version the caller's attempt
        READ; the commit targets exactly ``base_version + 1``. This is
        what makes the optimistic concurrency sound: picking the
        version at commit time (``_next_version``) instead would let a
        writer that read snapshot N succeed at N+2 after another
        writer landed N+1 — silently dropping N+1's changes (a lost
        update; caught by the r4 concurrent-writer torture test).
        ``None`` (CREATE only) falls back to next-version discovery."""
        version = self._next_version() if base_version is None else base_version + 1
        mirror = (
            params.get("deltaMirror")
            if operation == "CREATE"
            else self.delta_mirror_enabled()
        )
        gen = (
            params.get("generated") if operation == "CREATE" else self.generated_columns()
        )
        if gen and new_df is not None:
            # Generated columns (Delta GENERATED ALWAYS AS shape) are
            # recomputed from their expressions at EVERY write — the
            # invariant holds by construction, a writer-supplied value
            # can never diverge, and a writer may omit them entirely.
            for name, expr in gen.items():
                new_df = new_df.withColumn(name, F.expr(expr))
        checks = (
            params.get("constraints") if operation == "CREATE" else self.constraints()
        )
        if checks and new_df is not None and operation != "OPTIMIZE":
            self._check_constraints(new_df, checks)
        part_cols = (
            params.get("partitionBy") if operation == "CREATE" else self.partition_columns()
        )
        # Column mapping (rename/drop support): logical names may
        # differ from the PHYSICAL parquet column names (stable since
        # column creation). Data/change files are always written with
        # physical names; footer stats are re-keyed back to logical so
        # every stats consumer (skipping, blooms, pruning) stays in
        # logical space. Identity map = zero-cost no-op path.
        cmap = {k: v for k, v in (column_map or {}).items() if k != v}
        inv_cmap = {v: k for k, v in cmap.items()}

        def _phys_schema(s: T.StructType) -> T.StructType:
            return T.StructType(
                [
                    T.StructField(cmap.get(f.name, f.name), f.dataType, True)
                    for f in s.fields
                ]
            )

        def _logical_keys(entries: list[dict]) -> None:
            for e in entries:
                for key in ("stats", "nullCounts", "bloom", "bloomTypes"):
                    if key in e:
                        e[key] = {
                            inv_cmap.get(c, c): v for c, v in e[key].items()
                        }

        new_entries: list[dict] = []
        if new_df is not None and _is_empty_local(new_df):
            # A provably-empty LOCAL relation (e.g. the empty seed of
            # a CREATE: spark.createDataFrame([], schema)) writes no
            # files and yields no entries — skip the Spark write job
            # outright (optimization r12, guide §7.3 fixed cost: an
            # empty create otherwise pays a full job + committer
            # round-trip for zero rows; a 0-row parquet file is
            # skipped by _footer_entries anyway, so the commit entry
            # is byte-identical).
            new_df = None
        if new_df is not None:
            # Schema enforcement (Delta writer behavior): everything
            # written conforms to the logged schema, whatever types the
            # source expressions produced.
            new_df = new_df.select(
                *[F.col(f.name).cast(f.dataType) for f in schema.fields]
            )
            if cmap:
                new_df = new_df.select(
                    *[
                        F.col(f.name).alias(cmap.get(f.name, f.name))
                        for f in schema.fields
                    ]
                )
            rel_dir = f"c-{version}-{uuid.uuid4().hex[:8]}"
            data_dir = os.path.join(self.path, rel_dir)
            writer = new_df.write.mode("errorifexists")
            if part_cols:
                writer = writer.partitionBy(*part_cols)
            writer.parquet(data_dir)
            new_entries = self._footer_entries(
                rel_dir, _phys_schema(schema) if cmap else schema, part_cols or []
            )
            if cmap:
                _logical_keys(new_entries)
            bloom_cols = (
                params.get("bloomFilterCols")
                if operation == "CREATE"
                else self.bloom_filter_columns()
            )
            if bloom_cols:
                self._attach_blooms(new_entries, schema, bloom_cols)
        cdc_entries: list[dict] = []
        if cdc_df is not None:
            # Change Data Feed capture: the changed rows themselves,
            # written under "_change_data/" (a "_"-prefixed dir, so
            # vacuum's data sweep never touches it) and laid out with
            # the table's own partitioning so the mirror's protocol
            # ``cdc`` actions carry true partitionValues. The write is
            # CHANGE-sized — DML callers pass exactly the touched
            # rows, never the table. Generated columns are recomputed
            # the same way as for data files (post-image rows must
            # show the stored values; pre-image/delete rows recompute
            # to their already-stored values, a no-op).
            if gen:
                for name, expr in gen.items():
                    cdc_df = cdc_df.withColumn(name, F.expr(expr))
            cdc_schema = T.StructType(
                list(schema.fields)
                + [T.StructField("_change_type", T.StringType(), True)]
            )
            cdc_df = cdc_df.select(
                *[
                    F.col(f.name)
                    .cast(f.dataType)
                    .alias(cmap.get(f.name, f.name))
                    for f in schema.fields
                ],
                F.col("_change_type").cast("string"),
            )
            rel_cdc = os.path.join(
                "_change_data", f"c-{version}-{uuid.uuid4().hex[:8]}"
            )
            cdc_writer = cdc_df.write.mode("errorifexists")
            if part_cols:
                cdc_writer = cdc_writer.partitionBy(*part_cols)
            cdc_writer.parquet(os.path.join(self.path, rel_cdc))
            cdc_entries = self._footer_entries(
                rel_cdc,
                _phys_schema(cdc_schema) if cmap else cdc_schema,
                part_cols or [],
            )
            if cmap:
                _logical_keys(cdc_entries)
        files = carried + new_entries
        entry = {
            "version": version,
            "timestamp": self._commit_timestamp(version),
            "operation": operation,
            "operationParameters": params,
            "num_rows": sum(f["num_rows"] - _dv_count(f) for f in files),
            "schema": json.loads(schema.json()),
        }
        rt = (
            params.get("rowTracking")
            if operation == "CREATE"
            else self.row_tracking_enabled()
        )
        if rt:
            # Fresh row-id assignment (Delta rowTracking): each new
            # file takes the next contiguous id range above the
            # base snapshot's high-water mark; carried files keep the
            # baseRowId they were assigned at their own commit (MoR
            # deletion vectors leave survivor ids stable — the mask
            # never moves rows). Zero extra jobs: ranges come from the
            # footer row counts already in hand. The mark is monotone
            # across every commit, so ids are never reused.
            hwm = -1
            if base_version is not None:
                hwm = int(
                    self._read_log_raw(base_version).get("rowIdHighWaterMark", -1)
                )
            for e in new_entries:
                e["baseRowId"] = hwm + 1
                e["defaultRowCommitVersion"] = version
                hwm += int(e["num_rows"])
            entry["rowIdHighWaterMark"] = hwm
        idcfg = (
            params.get("identity") if operation == "CREATE" else self.identity_info()
        )
        if idcfg:
            # High-water mark advance costs nothing: the max assigned
            # id comes from the written files' footer stats, and it is
            # monotone across EVERY commit (delete/restore/optimize
            # carry the previous mark forward) so ids are never reused.
            prev = int(idcfg["start"]) - int(idcfg["step"])
            if base_version is not None:
                prev = int(
                    self._read_log_raw(base_version).get(
                        "identityHighWaterMark", prev
                    )
                )
            cand = [prev]
            for e in new_entries:
                s = e.get("stats", {}).get(idcfg["column"])
                if s and s[1] is not None:
                    cand.append(int(s[1]))
            entry["identityHighWaterMark"] = max(cand)
        # Clustering columns (Delta clustered tables): declared at
        # CREATE or by the CLUSTER BY alter commit; every other commit
        # carries the declaration forward unchanged — OPTIMIZE's
        # ad-hoc layout params never mutate the declared state.
        cb = (
            params.get("clusterBy")
            if operation in ("CREATE", "CLUSTER BY")
            else None
        )
        if cb is None and base_version is not None:
            cb = self._read_log_raw(base_version).get("clusterBy")
        if cb:
            entry["clusterBy"] = list(cb)
        if cdc_df is not None:
            # Recorded even when EMPTY: a zero-row capture (e.g. a
            # RESTORE that reverts a layout-only OPTIMIZE — files
            # move, no row changes) must stay distinguishable from
            # "never captured", or every CDF reader would refuse the
            # commit as a rewrite without change data.
            entry["cdcFiles"] = cdc_entries
        if txn is not None:
            entry["txn"] = txn
        if cmap:
            entry["columnMap"] = cmap
        if retired_physical:
            entry["retiredPhysical"] = sorted(set(retired_physical))
        os.makedirs(self._log_dir, exist_ok=True)
        if len(files) > self.manifest_inline_max:
            entry["filesManifest"] = self._write_manifest(version, files)
            entry["num_files"] = len(files)
        else:
            entry["files"] = files
        tmp = os.path.join(self._log_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(entry, fh)
        final = os.path.join(self._log_dir, f"{version:020d}.json")
        try:
            os.link(tmp, final)  # atomic create — fails if version taken
        except FileExistsError:
            if "filesManifest" in entry:  # reclaim the loser's sidecar
                try:
                    os.unlink(os.path.join(self._log_dir, entry["filesManifest"]))
                except OSError:
                    pass
            raise VersionConflictError(
                f"version {version} committed by another writer"
            ) from None
        finally:
            os.unlink(tmp)
        if mirror:
            # After the private commit won the version race: mirror it
            # into the open-protocol Delta log. sync() is idempotent
            # and self-healing, so a crash right here is repaired by
            # the next commit's sync. A delta_mirror=True table has
            # declared "the open log tracks every commit", so MoR
            # deletion vectors are auto-materialized rather than
            # refused (delta_log.py DV-materialization section).
            from .delta_log import sync as _delta_sync

            _delta_sync(self, materialize_dvs=True)
        return version

    def _next_version(self) -> int:
        """Target version for a commit — the race window optimistic
        concurrency closes: two writers may both pick N, only one
        ``os.link``s the log entry, the other retries."""
        versions = self._versions()
        return (max(versions) + 1) if versions else 0

    def _commit_timestamp(self, version: int) -> str:
        """Wall-clock, bumped to strictly after the previous commit so
        timestamp travel is total-ordered without sleeping."""
        now = datetime.now(timezone.utc)
        if version > 0:
            try:
                prev = datetime.fromisoformat(
                    self._read_log_raw(version - 1)["timestamp"]
                )
            except FileNotFoundError:
                return now.isoformat()
            floor = prev + timedelta(milliseconds=1)
            if now < floor:
                now = floor
        return now.isoformat()

    def _footer_entries(
        self,
        rel_dir: str,
        schema: T.StructType,
        part_cols: list[str],
        base_dir: str | None = None,
        absolute: bool = False,
    ) -> list[dict]:
        """Per-file row counts + min/max stats read from the parquet
        FOOTERS of the files a commit just wrote — no data rescan.
        Partition-column stats come from the directory names (each
        file holds exactly one partition value)."""
        import pyarrow.parquet as pq

        atomic = {
            f.name: f
            for f in schema.fields
            if isinstance(f.dataType, _STAT_TYPES) and f.name not in part_cols
        }
        entries = []
        base = base_dir if base_dir is not None else os.path.join(self.path, rel_dir)
        for root, _dirs, fnames in os.walk(base):
            for fn in sorted(fnames):
                if not fn.endswith(".parquet"):
                    continue
                fp = os.path.join(root, fn)
                md = pq.ParquetFile(fp).metadata
                if md.num_rows == 0:
                    continue
                mins: dict[str, object] = {}
                maxs: dict[str, object] = {}
                nulls: dict[str, int] = {}
                known = set(atomic)
                null_known = set(atomic)
                for rg in range(md.num_row_groups):
                    group = md.row_group(rg)
                    seen = set()
                    null_seen = set()
                    for ci in range(group.num_columns):
                        col = group.column(ci)
                        name = col.path_in_schema
                        if name not in atomic:
                            continue
                        st = col.statistics
                        if st is None:
                            continue
                        if st.null_count is not None:
                            null_seen.add(name)
                            nulls[name] = nulls.get(name, 0) + st.null_count
                        if name not in known or not st.has_min_max:
                            continue
                        lo, hi = _stat_json(st.min), _stat_json(st.max)
                        if lo is None or hi is None:
                            continue
                        seen.add(name)
                        mins[name] = lo if name not in mins else min(mins[name], lo)
                        maxs[name] = hi if name not in maxs else max(maxs[name], hi)
                    # a column must have valid stats in EVERY row group
                    known &= seen
                    null_known &= null_seen
                stats = {
                    c: [mins[c], maxs[c]] for c in known if c in mins and c in maxs
                }
                null_counts = {c: nulls[c] for c in null_known}
                rel_file = fp if absolute else os.path.relpath(fp, self.path)
                for c, v in _partition_values(rel_file, part_cols, schema).items():
                    if v is not None:
                        stats[c] = [v, v]
                        null_counts[c] = 0
                entry = {"path": rel_file, "num_rows": md.num_rows, "stats": stats}
                if null_counts:
                    entry["nullCounts"] = null_counts
                entries.append(entry)
        return entries


def empty_df(spark: SparkSession, schema: T.StructType | str) -> DataFrame:
    """Empty DataFrame that OPTIMIZES to an empty LocalRelation —
    emptiness is then a driver-side-provable plan fact, so committing
    it as a table seed skips the data-write job (``_is_empty_local``).
    ``createDataFrame([], schema)`` instead parallelizes an empty RDD
    (a LogicalRDD plan) whose emptiness only a job can prove."""
    s = (
        schema
        if isinstance(schema, T.StructType)
        else T._parse_datatype_string(schema)
    )
    cols = [F.lit(None).cast(f.dataType).alias(f.name) for f in s.fields]
    return spark.range(1).select(*cols).where(F.lit(False))


def _is_empty_local(df: DataFrame) -> bool:
    """True iff ``df`` optimizes to an EMPTY LocalRelation — a plan
    whose row count is a driver-side fact (no job needed). Used to
    skip the data-write job of empty commits; any uncertainty (a real
    scan, a non-collapsed projection, Connect) returns False and the
    normal write path runs."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        return (
            plan.getClass().getSimpleName() == "LocalRelation"
            and plan.data().isEmpty()
        )
    except Exception:
        return False


def _nullable(schema: T.StructType) -> T.StructType:
    """All-nullable copy: carried files may legitimately lack evolved
    columns, and parquet readers treat user schemas as nullable."""
    return T.StructType(
        [T.StructField(f.name, f.dataType, True, f.metadata) for f in schema.fields]
    )


def _partition_values(
    rel_file: str, part_cols: list[str], schema: T.StructType
) -> dict[str, object]:
    """Hive-style ``col=value`` components of a data file path, cast
    to the schema's column types (None for the hive null marker)."""
    out: dict[str, object] = {}
    if not part_cols:
        return out
    by_name = {f.name: f.dataType for f in schema.fields}
    for comp in rel_file.split(os.sep)[1:-1]:
        if "=" not in comp:
            continue
        name, _, raw = comp.partition("=")
        if name not in part_cols:
            continue
        raw = unquote(raw)
        if raw == _HIVE_NULL:
            out[name] = None
            continue
        dt = by_name.get(name)
        if isinstance(dt, T.BooleanType):
            out[name] = raw.lower() == "true"
        elif isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
            out[name] = float(raw)
        elif isinstance(dt, T.NumericType):
            out[name] = int(raw)
        else:
            out[name] = raw
    return out


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
