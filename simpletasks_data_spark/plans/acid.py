"""ACID table backend: a transaction-log over plain parquet.

The reference commits each import in ONE database transaction
(``/root/reference/simpletasks_data/importtask.py:370``); the default
parquet backend here reproduces that with a directory swap
(``plans/target.py``), which is atomic for one writer but gives no
isolation story for CONCURRENT writers and no history of committed states.
This module closes that gap with the design the open table formats
(Delta Lake's ``_delta_log``, Iceberg's snapshot metadata) made standard —
re-implemented minimally because those jars are not in this environment:

- **Layout**: immutable data files under ``<path>/data/<commit-uuid>/``,
  plus an append-only log ``<path>/_txn_log/<version 10 digits>.json``.
  A table's state at version V is the replay of add/remove actions of all
  commits <= V. Data files are NEVER mutated or deleted by a commit —
  ``remove`` is a logical tombstone, which is what makes time travel and
  snapshot isolation free.
- **Atomic commit**: a commit is the creation of the next log file with
  ``open(..., "x")`` (O_EXCL) — exactly one writer can create version
  V+1; everyone else gets ``FileExistsError``. On object stores this
  maps to a put-if-absent on the log key (how Delta commits on S3/ABFS).
  The log record is fully written to a temp file first and atomically
  renamed into a staging name before the O_EXCL link, so a reader can
  never observe a torn JSON.
- **Snapshot isolation**: readers resolve the latest version ONCE and
  read only files added by commits <= that version. A concurrent
  writer's data files are invisible until its log record lands, and a
  remove tombstone never deletes bytes a running reader may still scan.
- **Optimistic concurrency**: writers stage data files, then try to
  commit at (snapshot version + 1), retrying on collision. Blind
  ``append`` commutes with anything and auto-retries. ``overwrite`` /
  read-modify-write ops declare the snapshot version they READ; if
  someone else committed since, the writer raises ``CommitConflict``
  instead of silently clobbering (the caller re-runs on the new
  snapshot) — the same rule Delta applies to non-serializable conflicts.
- **Log checkpoints**: every ``checkpoint_every`` commits the full
  file-list state is written to ``<version>.checkpoint.json``; readers
  start from the newest checkpoint and replay only the tail. At 100 TB
  a table accrues millions of commits — O(1) state resolution instead
  of O(commits) is what keeps planning time flat (Delta checkpoints its
  log identically, as parquet).

Scale notes (100 TB): the log holds file-level metadata only (path +
row count), a few hundred bytes per commit — state resolution never
touches data. Reads hand Spark an explicit file list, so partition
pruning/pushdown work unchanged. Commit contention is one tiny
put-if-absent per writer per transaction, independent of data volume;
high-frequency writers serialize on it for append workloads exactly as
they do on Delta's log.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .target import TargetTable

__all__ = ["TxnTable", "TxnTargetTable", "CommitConflict", "SchemaEvolutionError"]

_LOG_DIR = "_txn_log"
_PAD = 10


class CommitConflict(RuntimeError):
    """Another writer committed a version this transaction's read
    snapshot did not include, and the operation does not commute."""


class SchemaEvolutionError(RuntimeError):
    """A commit tried to drop or retype existing columns — only ADDITIVE
    evolution (new nullable columns) is supported, the rule that keeps
    every historical file readable under the latest schema."""


def _vname(v: int) -> str:
    return f"{v:0{_PAD}d}.json"


def _ckname(v: int) -> str:
    return f"{v:0{_PAD}d}.checkpoint.json"


def _coerce_partition_value(v: str):
    """Hive path values are strings; coerce numerics so stats pruning
    compares like with like."""
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            continue
    return v


class TxnTable:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        schema: Optional[T.StructType] = None,
        checkpoint_every: int = 10,
    ) -> None:
        self.spark = spark
        self.path = path
        self.schema = schema
        self.checkpoint_every = checkpoint_every
        os.makedirs(os.path.join(path, _LOG_DIR), exist_ok=True)
        os.makedirs(os.path.join(path, "data"), exist_ok=True)

    # -- log plumbing -------------------------------------------------------

    def _log_dir(self) -> str:
        return os.path.join(self.path, _LOG_DIR)

    def latest_version(self) -> int:
        """Highest committed version, -1 for an empty table."""
        vs = [
            int(n[:_PAD])
            for n in os.listdir(self._log_dir())
            if n.endswith(".json") and not n.endswith(".checkpoint.json")
        ]
        return max(vs, default=-1)

    def _read_commit(self, v: int) -> dict:
        with open(os.path.join(self._log_dir(), _vname(v))) as f:
            return json.load(f)

    def _files_at(self, version: int) -> Dict[str, dict]:
        """Replay the log up to ``version``: {relative path: add-action}.
        Starts from the newest checkpoint <= version (O(tail), not
        O(commits))."""
        ck_versions = [
            int(n[:_PAD])
            for n in os.listdir(self._log_dir())
            if n.endswith(".checkpoint.json") and int(n[:_PAD]) <= version
        ]
        state: Dict[str, dict] = {}
        start = 0
        if ck_versions:
            ck = max(ck_versions)
            with open(os.path.join(self._log_dir(), _ckname(ck))) as f:
                state = {a["path"]: a for a in json.load(f)["files"]}
            start = ck + 1
        for v in range(start, version + 1):
            rec = self._read_commit(v)
            for action in rec["actions"]:
                if "add" in action:
                    state[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    state.pop(action["remove"], None)
                elif "dv" in action:
                    # merge-on-read deletion vector: mark row positions
                    # of an EXISTING file as deleted without rewriting
                    # it; a later add (rewrite) of the path clears them.
                    # A vector for a path absent from the state is log
                    # corruption — fail loudly, never drop it silently.
                    tgt = state.get(action["dv"]["path"])
                    if tgt is None:
                        raise ValueError(
                            f"commit {v}: deletion vector targets unknown "
                            f"file {action['dv']['path']!r}"
                        )
                    merged = set(tgt.get("dv") or []) | set(action["dv"]["positions"])
                    tgt["dv"] = sorted(merged)
        return state

    def _try_commit(self, version: int, record: dict) -> bool:
        """Atomically create log file ``version``; False if taken. The
        record is staged to a temp name and hard-linked into place so the
        O_EXCL winner's file is complete the instant it is visible."""
        final = os.path.join(self._log_dir(), _vname(version))
        tmp = os.path.join(self._log_dir(), f".tmp_{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(record, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, final)  # atomic create-exclusive (EEXIST if taken)
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def _maybe_checkpoint(self, version: int) -> None:
        if version % self.checkpoint_every != 0 or version == 0:
            return
        files = list(self._files_at(version).values())
        tmp = os.path.join(self._log_dir(), f".tmp_{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump({"version": version, "files": files}, f)
        os.replace(tmp, os.path.join(self._log_dir(), _ckname(version)))

    # -- write path ---------------------------------------------------------

    def _stage(
        self, df: DataFrame, partition_by: Optional[List[str]] = None
    ) -> List[dict]:
        """Write the frame's data files under a fresh commit directory and
        return their add-actions, each carrying per-column min/max pulled
        from the parquet FOOTERS (no data read) — the file-level statistics
        that let ``read(prune=...)`` skip whole files from log metadata
        alone, before any scan task is scheduled (how Delta/Iceberg prune
        at planning time). ``partition_by`` writes hive layout; each
        partition column lands in the file's stats as an EXACT [v, v]
        range parsed from the path, so partition pruning is just the
        stats pruning — one mechanism, no special casing. The hive
        directories are written on COPY columns (``_p_<col>``) and the
        real column stays IN the parquet data: snapshot reads address
        leaf files directly (commit dirs differ per transaction, so
        directory-based partition inference across commits is
        structurally ambiguous — Spark rejects it), and a file is
        self-describing wherever it is moved. Staged files are
        invisible until a log record references them."""
        cid = uuid.uuid4().hex[:12]
        reldir = os.path.join("data", cid)
        absdir = os.path.join(self.path, reldir)
        out_df = df
        if partition_by:
            for c in partition_by:
                out_df = out_df.withColumn(f"_p_{c}", F.col(c))
        writer = out_df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*[f"_p_{c}" for c in partition_by])
        writer.parquet(absdir)
        adds = []
        for root, _dirs, names in sorted(os.walk(absdir)):
            for name in sorted(names):
                if name.startswith(("_", ".")):
                    continue
                absf = os.path.join(root, name)
                stats = self._footer_stats(absf)
                for seg in os.path.relpath(absf, absdir).split(os.sep):
                    if "=" in seg:
                        k, v = seg.split("=", 1)
                        if k.startswith("_p_"):
                            k = k[3:]
                        cv = _coerce_partition_value(v)
                        stats[k] = [cv, cv]
                adds.append(
                    {"add": {"path": os.path.relpath(absf, self.path), "stats": stats}}
                )
        if self.schema is None:
            self.schema = df.schema
        return adds

    @staticmethod
    def _footer_stats(abspath: str) -> Dict[str, list]:
        """Per-column [min, max] over all row groups, from parquet footer
        metadata only. Restricted to JSON-safe primitives (int/float/str);
        columns without usable stats are simply absent — absence always
        means 'cannot skip', never 'skip'."""
        try:
            import pyarrow.parquet as pq

            md = pq.ParquetFile(abspath).metadata
        except Exception:
            return {}
        out: Dict[str, list] = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                st = col.statistics
                if st is None or not st.has_min_max:
                    continue
                lo, hi = st.min, st.max
                if not all(isinstance(v, (int, float, str)) for v in (lo, hi)):
                    continue
                name = col.path_in_schema
                if name in out:
                    out[name] = [min(out[name][0], lo), max(out[name][1], hi)]
                else:
                    out[name] = [lo, hi]
        return out

    def _check_evolution(self, new_schema: T.StructType) -> None:
        """Additive-only: every existing column must survive with the same
        type. New columns are fine (old files read them as NULL)."""
        if self.schema is None:
            return
        new_fields = {f.name: f.dataType for f in new_schema.fields}
        for f in self.schema.fields:
            if f.name not in new_fields:
                raise SchemaEvolutionError(f"column {f.name!r} dropped")
            if new_fields[f.name] != f.dataType:
                raise SchemaEvolutionError(
                    f"column {f.name!r} retyped {f.dataType} -> {new_fields[f.name]}"
                )

    def append(
        self,
        df: DataFrame,
        max_retries: int = 20,
        txn_app: Optional[str] = None,
        txn_version: Optional[int] = None,
        partition_by: Optional[List[str]] = None,
    ) -> int:
        """Blind append: stage files, commit at the next free version.
        Commutes with every other operation, so collisions just retry the
        (tiny) log write — the staged data is never re-written. The
        commit records the (additively evolved) schema, so new nullable
        columns land without rewriting history.

        ``txn_app``/``txn_version``: idempotent-writer token. A commit
        carrying the pair is a no-op (returns the existing version) if
        ANY committed record already carries the same pair — the
        exactly-once contract for streaming sinks: foreachBatch passes
        (query name, epoch id), and a re-delivered micro-batch after a
        crash lands zero duplicate rows. The check re-runs inside the
        commit race loop, so two workers replaying the same epoch cannot
        both land."""
        if (txn_app is None) != (txn_version is None):
            raise ValueError("txn_app and txn_version must be set together")

        def _already() -> Optional[int]:
            if txn_app is None:
                return None
            for v in range(self.latest_version(), -1, -1):
                rec = self._read_commit(v)
                txn = rec.get("txn")
                if txn and txn["app"] == txn_app and txn["version"] == txn_version:
                    return v
            return None

        dup = _already()
        if dup is not None:
            return dup
        self._check_evolution(df.schema)
        adds = self._stage(df, partition_by=partition_by)
        for _ in range(max_retries):
            dup = _already()
            if dup is not None:
                return dup
            v = self.latest_version() + 1
            rec = {
                "version": v,
                "op": "append",
                "ts": time.time(),
                "actions": adds,
                "schema": df.schema.json(),
            }
            if txn_app is not None:
                rec["txn"] = {"app": txn_app, "version": txn_version}
            if self._try_commit(v, rec):
                self.schema = df.schema
                self._maybe_checkpoint(v)
                return v
        raise CommitConflict(f"append lost the commit race {max_retries} times")

    def streaming_sink(self, query_name: str):
        """``foreachBatch`` handler appending each micro-batch as one
        idempotent transaction: ``writeStream.foreachBatch(
        table.streaming_sink("my_query"))``. Epoch re-deliveries (crash
        between sink write and checkpoint commit — the classic
        duplicate-delivery window) are absorbed by the writer token, so
        the table sees each epoch exactly once."""

        def handle(batch_df: DataFrame, epoch_id: int) -> None:
            if batch_df.isEmpty():
                return
            self.append(batch_df, txn_app=query_name, txn_version=int(epoch_id))

        return handle

    def overwrite(self, df: DataFrame, read_version: Optional[int] = None) -> int:
        """Replace the table contents. ``read_version`` is the snapshot the
        new contents were derived from (None = whatever is current now);
        if anyone committed past it, raise ``CommitConflict`` — a
        read-modify-write result must not clobber state it never saw."""
        if read_version is None:
            read_version = self.latest_version()
        self._check_evolution(df.schema)
        adds = self._stage(df)
        removes = [{"remove": p} for p in self._files_at(read_version)]
        v = read_version + 1
        rec = {
            "version": v,
            "op": "overwrite",
            "ts": time.time(),
            "actions": removes + adds,
            "schema": df.schema.json(),
        }
        if not self._try_commit(v, rec):
            raise CommitConflict(
                f"snapshot v{read_version} is stale: v{v} already committed"
            )
        self.schema = df.schema
        self._maybe_checkpoint(v)
        return v

    # -- read path ----------------------------------------------------------

    def _schema_at(self, version: int) -> Optional[T.StructType]:
        """Schema as of ``version``: the newest commit <= version that
        recorded one (older files missing later-added columns read as
        NULL under it — the additive-evolution contract)."""
        for v in range(version, -1, -1):
            rec = self._read_commit(v)
            if "schema" in rec:
                return T.StructType.fromJson(json.loads(rec["schema"]))
        return self.schema

    def version_at_timestamp(self, ts: float) -> int:
        """Latest version whose commit wall-clock is <= ``ts`` (Delta's
        timestamp-travel rule); -1 when every commit is newer. Scans the
        log records (driver metadata, same cost class as ``history``)
        rather than assuming commit timestamps are monotone — concurrent
        writers with clock skew can interleave."""
        best = -1
        for v in range(self.latest_version() + 1):
            if self._read_commit(v).get("ts", 0.0) <= ts:
                best = max(best, v)
        return best

    def read(
        self,
        version: Optional[int] = None,
        prune: Optional[Dict[str, tuple]] = None,
        timestamp: Optional[float] = None,
    ) -> DataFrame:
        """Snapshot read; ``version`` = time travel to that commit,
        ``timestamp`` = time travel to the table as of that wall-clock
        instant (latest commit at or before it — mutually exclusive
        with ``version``).

        ``prune``: {column: (lo, hi)} — skip files whose footer min/max
        (recorded in the log at commit time) cannot intersect the range,
        BEFORE Spark plans a single task. Pure planning optimization: a
        file without stats for the column is always kept, and callers
        still apply the real filter — results are identical with or
        without pruning, only the scanned file set shrinks."""
        if timestamp is not None:
            if version is not None:
                raise ValueError("pass version OR timestamp, not both")
            version = self.version_at_timestamp(timestamp)
        latest = self.latest_version()
        if version is None:
            version = latest
        if version > latest or version < -1:
            raise ValueError(f"version {version} does not exist (latest {latest})")
        schema = self._schema_at(version) if version >= 0 else self.schema
        if version == -1:
            if schema is None:
                raise ValueError(
                    f"TxnTable.read: table '{self.path}' has no committed"
                    " snapshots and no declared schema — empty or"
                    " never-written table"
                )
            return self.spark.createDataFrame([], schema)
        files = self._files_at(version)
        if prune:
            files = {
                p: a
                for p, a in files.items()
                if self._may_match(a.get("stats") or {}, prune)
            }
        paths = [os.path.join(self.path, p) for p in files]
        if not paths:
            if schema is None:
                raise ValueError("empty snapshot with no known schema")
            return self.spark.createDataFrame([], schema)
        reader = self.spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return self._apply_dvs(reader.parquet(*paths), files)

    def _apply_dvs(self, df: DataFrame, files: Dict[str, dict]) -> DataFrame:
        """Filter out rows covered by deletion vectors (merge-on-read):
        one broadcast anti-join on (file NAME, row position) — the
        hidden ``_metadata`` columns come straight from the scan, so no
        data column is touched and the plan stays one pruned scan +
        broadcast anti-join. No-op (and no plan change) when the
        snapshot carries no DVs.

        Matching is on ``_metadata.file_name`` vs basename(rel), never
        on a hand-built absolute ``file:`` URI: URI representation
        (symlinks, encoding, scheme) diverges silently between the
        driver's ``os.path`` view and Spark's scan, and a missed match
        would RESURRECT deleted rows. File names inside the table are
        Spark-staged ``part-*.parquet`` (no URL-encodable characters),
        and any basename ambiguity across the snapshot raises loudly
        instead of risking a wrong-file match."""
        dv_rows = []
        dv_bases = set()
        for rel, action in files.items():
            if action.get("dv"):
                dv_bases.add(os.path.basename(rel))
                for pos in action["dv"]:
                    dv_rows.append((os.path.basename(rel), int(pos)))
        if not dv_rows:
            return df
        all_bases = [os.path.basename(rel) for rel in files]
        dupes = dv_bases & {b for b in all_bases if all_bases.count(b) > 1}
        if dupes:
            raise ValueError(
                f"deletion-vector file names {sorted(dupes)} are ambiguous in "
                "this snapshot (same basename under multiple directories); "
                "run compact() to materialize the vectors first"
            )
        dv_df = self.spark.createDataFrame(dv_rows, "_dv_file string, _dv_pos long")
        tagged = df.withColumn("_f", F.col("_metadata.file_name")).withColumn(
            "_p", F.col("_metadata.row_index")
        )
        kept = tagged.join(
            F.broadcast(dv_df),  # b: param
            (F.col("_f") == F.col("_dv_file")) & (F.col("_p") == F.col("_dv_pos")),
            "left_anti",
        )
        return kept.drop("_f", "_p")

    def delete_dv(
        self,
        condition,
        read_version: Optional[int] = None,
        max_positions: int = 200_000,
    ) -> int:
        """Merge-on-read predicate delete: record the matching rows'
        (file, position) pairs as DELETION VECTORS in the log instead of
        rewriting any data file — O(matched rows) metadata per commit vs
        ``delete``'s O(matching files) rewrite. Readers subtract DVs with
        a broadcast anti-join; ``compact`` MATERIALIZES them (it reads
        through the DV filter and its rewrite clears every vector), which
        is the copy-on-write escape hatch when vectors accumulate.

        Positions live in the JSON log (sandbox stand-in for Delta's
        roaring-bitmap DV files); ``max_positions`` guards the driver —
        past it, use ``delete`` (the rewrite is cheaper than the
        metadata at that selectivity)."""
        if read_version is None:
            read_version = self.latest_version()
        files = self._files_at(read_version)
        paths = [os.path.join(self.path, p) for p in files]
        if not paths:
            raise ValueError("empty snapshot")
        schema = self._schema_at(read_version)
        reader = self.spark.read
        if schema is not None:
            reader = reader.schema(schema)
        live = self._apply_dvs(reader.parquet(*paths), files)
        matches = (
            live.where(condition)
            .select(
                F.col("_metadata.file_name").alias("_f"),
                F.col("_metadata.row_index").alias("_p"),
            )
            .collect()  # c: gated
        )
        if len(matches) > max_positions:
            raise ValueError(
                f"{len(matches)} matched rows > max_positions={max_positions}; "
                "use delete() (copy-on-write) for this selectivity"
            )
        # Map scanned file NAMES back to the snapshot's relative paths on
        # the driver (never by URI prefix-stripping — representation
        # divergence there would silently mis-key the vector). An unknown
        # or ambiguous name raises HERE, at write time, not at read time.
        base_to_rel: Dict[str, str] = {}
        for rel in files:
            b = os.path.basename(rel)
            base_to_rel[b] = None if b in base_to_rel else rel
        by_rel: Dict[str, list] = {}
        for r in matches:
            rel = base_to_rel.get(r["_f"], "")
            if not rel:
                raise ValueError(
                    f"matched row in file {r['_f']!r} which is "
                    + ("ambiguous" if rel is None else "not")
                    + " in the snapshot — cannot record a deletion vector"
                )
            by_rel.setdefault(rel, []).append(int(r["_p"]))
        actions = [
            {"dv": {"path": rel, "positions": sorted(ps)}}
            for rel, ps in sorted(by_rel.items())
        ]
        v = read_version + 1
        rec = {
            "version": v,
            "op": "delete_dv",
            "ts": time.time(),
            "actions": actions,
        }
        if not self._try_commit(v, rec):
            raise CommitConflict(
                f"snapshot v{read_version} is stale: v{v} already committed"
            )
        self._maybe_checkpoint(v)
        return v

    @staticmethod
    def _may_match(stats: Dict[str, list], prune: Dict[str, tuple]) -> bool:
        for col, (lo, hi) in prune.items():
            rng = stats.get(col)
            if rng is None:
                continue  # no stats -> cannot prove exclusion -> keep
            if (hi is not None and rng[0] > hi) or (lo is not None and rng[1] < lo):
                return False
        return True

    def _zorder_expr(self, df: DataFrame, cols: List[str], bits: int = 8):
        """Morton (z-order) interleave of ``cols``: each column normalizes
        to ``bits`` bits against its own min/max (one tiny planning agg —
        table-level metadata, same class of driver work as resolving the
        log), then the bit planes interleave so rows close in ANY of the
        columns land close in z. Range-partitioning files by this value
        gives every file a narrow min/max in EVERY clustered column —
        which is what turns the log-stats pruning into MULTI-dimensional
        data skipping."""
        aggs = []
        for c in cols:
            aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
        row = df.agg(*aggs).collect()[0]  # c: 1row
        top = (1 << bits) - 1
        k = len(cols)
        z = F.lit(0).cast("long")
        for i, c in enumerate(cols):
            lo, hi = row[f"_lo_{c}"], row[f"_hi_{c}"]
            span = float(hi - lo) if hi is not None and hi != lo else 1.0
            n = F.floor(
                (F.col(c).cast("double") - F.lit(float(lo or 0))) / F.lit(span) * top
            ).cast("long")
            n = F.greatest(F.lit(0), F.least(F.lit(top), n))
            for b in range(bits):
                z = z + F.shiftleft(F.shiftright(n, b).bitwiseAND(1), b * k + i)
        return z

    def compact(
        self, target_files: int = 1, zorder: Optional[List[str]] = None
    ) -> int:
        """Bin-pack the current snapshot into ``target_files`` files and
        commit the rewrite as one transaction (remove every current file,
        add the compacted ones). Contents are IDENTICAL before and after —
        it is a pure layout operation, the maintenance pass that keeps
        streaming/append tables from drowning in small files (every
        append is its own file set; scan cost and footer overhead grow
        with file count, not bytes). Runs as a normal read-modify-write:
        a concurrent commit since the snapshot was read raises
        ``CommitConflict`` and the table is untouched. Old files stay on
        disk for time travel until ``vacuum``.

        ``zorder``: cluster the rewrite on the Morton interleave of these
        (numeric) columns — the OPTIMIZE ZORDER analogue. Files then carry
        narrow footer min/max in every listed column, so subsequent
        ``read(prune=)`` skips files for range predicates on ANY of them,
        not just a single sort key."""
        read_version = self.latest_version()
        if read_version < 0:
            return read_version
        snap = self.read(version=read_version)
        if zorder:
            snap = (
                snap.withColumn("_z", self._zorder_expr(snap, list(zorder)))
                .repartitionByRange(target_files, "_z")
                .sortWithinPartitions("_z")
                .drop("_z")
            )
        else:
            snap = snap.coalesce(target_files)
        adds = self._stage(snap)
        removes = [{"remove": p} for p in self._files_at(read_version)]
        v = read_version + 1
        rec = {
            "version": v,
            "op": "compact",
            "ts": time.time(),
            "actions": removes + adds,
        }
        if not self._try_commit(v, rec):
            raise CommitConflict(
                f"snapshot v{read_version} is stale: v{v} already committed"
            )
        self._maybe_checkpoint(v)
        return v

    def delete(
        self,
        condition,
        prune: Optional[Dict[str, tuple]] = None,
        read_version: Optional[int] = None,
    ) -> int:
        """Predicate delete: rewrite the snapshot without matching rows,
        as one read-modify-write transaction (same staleness rule as
        ``overwrite``). ``condition`` is a Column predicate; ``prune``
        optionally declares the predicate's column bounds ({col: (lo,
        hi)}) so files whose log stats rule out ANY match carry over
        UNREWRITTEN — a selective delete then costs O(matching files),
        not O(table). Correctness never depends on ``prune``: a file
        kept by pruning provably contains no matching row."""
        if read_version is None:
            read_version = self.latest_version()
        files = self._files_at(read_version)
        keep_paths, rewrite_paths = [], []
        for rel, action in files.items():
            stats = action.get("stats") or {}
            if prune is not None and not self._may_match(stats, prune):
                keep_paths.append((rel, action))
            else:
                rewrite_paths.append(rel)
        adds = [{"add": a} for _, a in keep_paths]
        if rewrite_paths:
            schema = self._schema_at(read_version)
            reader = self.spark.read
            if schema is not None:
                reader = reader.schema(schema)
            remaining = self._apply_dvs(
                reader.parquet(*[os.path.join(self.path, p) for p in rewrite_paths]),
                {p: files[p] for p in rewrite_paths},
            ).where(~condition)
            adds += self._stage(remaining)
        removes = [{"remove": p} for p in rewrite_paths]
        v = read_version + 1
        rec = {
            "version": v,
            "op": "delete",
            "ts": time.time(),
            "actions": removes + adds,
        }
        if not self._try_commit(v, rec):
            raise CommitConflict(
                f"snapshot v{read_version} is stale: v{v} already committed"
            )
        self._maybe_checkpoint(v)
        return v

    def replace_where(
        self,
        df: DataFrame,
        condition,
        prune: Optional[Dict[str, tuple]] = None,
        read_version: Optional[int] = None,
        partition_by: Optional[List[str]] = None,
    ) -> int:
        """Selective overwrite (Delta's ``replaceWhere``): atomically
        swap the rows matching ``condition`` for ``df``'s rows — the
        idempotent-backfill primitive (recompute one day/region/source
        and land it as ONE transaction; rerunning the same backfill
        converges to the same table). Semantics: delete matching rows,
        insert ``df``, one commit.

        ``prune`` ({col: (lo, hi)}, the predicate's bounds) lets files
        the log proves predicate-free carry over untouched, so a
        one-partition backfill costs O(that partition), not O(table).
        Incoming rows are NOT validated against ``condition`` — like
        Delta with constraint checks off; pass pre-filtered input when
        that matters. Raises ``CommitConflict`` on a concurrent commit.
        """
        if read_version is None:
            read_version = self.latest_version()
        files = self._files_at(read_version) if read_version >= 0 else {}
        keep, rewrite = [], []
        for rel, action in files.items():
            stats = action.get("stats") or {}
            if prune is not None and not self._may_match(stats, prune):
                keep.append((rel, action))
            else:
                rewrite.append(rel)
        adds = [{"add": a} for _, a in keep]
        if rewrite:
            schema = self._schema_at(read_version)
            reader = self.spark.read
            if schema is not None:
                reader = reader.schema(schema)
            survivors = self._apply_dvs(
                reader.parquet(*[os.path.join(self.path, p) for p in rewrite]),
                {p: files[p] for p in rewrite},
            ).where(~condition)
            adds += self._stage(survivors, partition_by=partition_by)
        adds += self._stage(df, partition_by=partition_by)
        removes = [{"remove": p} for p in rewrite]
        v = read_version + 1
        rec = {
            "version": v,
            "op": "replace_where",
            "ts": time.time(),
            "actions": removes + adds,
        }
        if not self._try_commit(v, rec):
            raise CommitConflict(
                f"snapshot v{read_version} is stale: v{v} already committed"
            )
        self._maybe_checkpoint(v)
        return v

    def read_changes(self, from_version: int, to_version: Optional[int] = None) -> DataFrame:
        """Append-only change feed: the rows ADDED by commits in
        (from_version, to_version], tagged with their commit version —
        the incremental-consumer contract for streaming-ingest tables
        (process exactly the new rows since the last checkpointed
        version). Raises for ranges containing non-append commits:
        overwrite/delete/compact change data non-monotonically, and their
        row-level diffs belong to the merge engine's CDC history sink
        (plans/history.py), not to file-add replay."""
        if to_version is None:
            to_version = self.latest_version()
        out = None
        for v in range(from_version + 1, to_version + 1):
            rec = self._read_commit(v)
            if rec["op"] != "append":
                raise ValueError(
                    f"v{v} is {rec['op']!r}: change feed covers append-only "
                    "ranges; row-level merge diffs live in the CDC history sink"
                )
            paths = [
                os.path.join(self.path, a["add"]["path"])
                for a in rec["actions"]
                if "add" in a
            ]
            if not paths:
                continue
            schema = self._schema_at(v)
            reader = self.spark.read
            if schema is not None:
                reader = reader.schema(schema)
            part = reader.parquet(*paths).withColumn(
                "_commit_version", F.lit(v).cast("long")
            )
            out = part if out is None else out.unionByName(part)
        if out is None:
            schema = self._schema_at(to_version) if to_version >= 0 else self.schema
            if schema is None:
                raise ValueError("empty change range with no known schema")
            empty = self.spark.createDataFrame([], schema)
            return empty.withColumn("_commit_version", F.lit(None).cast("long"))
        return out

    def vacuum(self, retain_versions: int = 0) -> List[str]:
        """Physically delete data files not referenced by ANY version in
        the retained window [latest - retain_versions, latest] — the only
        operation that destroys bytes, so it is the explicit trade of
        time-travel depth for storage. Files referenced by any retained
        snapshot are never touched, so readers of those versions are safe;
        ``retain_versions=0`` keeps only the current snapshot (plus every
        staged-but-newer file, which may belong to an in-flight commit).
        Returns the deleted relative paths."""
        latest = self.latest_version()
        if latest < 0:
            return []
        keep: set = set()
        horizon = max(0, latest - retain_versions)
        for v in range(horizon, latest + 1):
            keep.update(self._files_at(v))
        # Files referenced only by pre-horizon versions are deletable;
        # files on disk but in NO commit at all are a writer's in-flight
        # stage — leave them (their commit may still land).
        referenced_ever: set = set()
        for v in range(0, latest + 1):
            rec = self._read_commit(v)
            for action in rec["actions"]:
                if "add" in action:
                    referenced_ever.add(action["add"]["path"])
        deleted = []
        for rel in sorted(referenced_ever - keep):
            p = os.path.join(self.path, rel)
            if os.path.exists(p):
                os.unlink(p)
                deleted.append(rel)
        return deleted

    def history(self) -> List[dict]:
        """Commit records, oldest first (op, ts, action counts)."""
        out = []
        for v in range(self.latest_version() + 1):
            rec = self._read_commit(v)
            out.append(
                {
                    "version": rec["version"],
                    "op": rec["op"],
                    "ts": rec.get("ts"),
                    "n_added": sum(1 for a in rec["actions"] if "add" in a),
                    "n_removed": sum(1 for a in rec["actions"] if "remove" in a),
                }
            )
        return out


class TxnTargetTable(TargetTable):
    """``TargetTable`` adapter over a ``TxnTable`` — drop-in ACID backend
    for the merge engine: ``ImportJob`` reads the current snapshot and its
    commit becomes one log transaction (the reference's single
    ``session.commit()``, ``importtask.py:370``, with real isolation).
    A dry-run job never calls ``overwrite``, so it commits nothing, and a
    failed job leaves only unreferenced staged files (garbage-collectable,
    never visible)."""

    def __init__(
        self,
        spark: SparkSession,
        schema: T.StructType,
        path: str,
        primary_keys: Sequence[str] = ("id",),
        **kwargs,
    ) -> None:
        super().__init__(schema=schema, path=path, primary_keys=primary_keys, **kwargs)
        self.txn = TxnTable(spark, path, schema=schema)
        self._read_version: Optional[int] = None

    def read(self, spark: SparkSession) -> DataFrame:
        self._read_version = self.txn.latest_version()
        return self.txn.read(self._read_version)

    def overwrite(self, df: DataFrame) -> None:
        self.txn.overwrite(df, read_version=self._read_version)
