"""Writable table sinks — the cluster-scale DML write path.

The engine's default DML is registry-swap on in-memory DataFrames (correct
semantics, right for the reference's membtree/memdb-style sources). At
100 TB the write path must target a transactional table format instead:
this module maps the reference's connection capability interfaces
(/root/reference/schema/datasource.go:96-161 — ConnUpsert.PutMulti,
ConnPatchWhere.PatchWhere, ConnDeletion.DeleteExpression) onto Delta
Lake's MERGE INTO / UPDATE / DELETE.

Delta is an OPTIONAL dependency (no jar in this container): the sink
detects availability at import-probe time, constructs only when present,
and the test suite skips cleanly otherwise. ``ParquetMergeSink`` is the
no-dependency durable fallback — same protocol, snapshot-and-swap parquet
versions — so the MERGE write path (batch DML and the streaming upsert
sink) is e2e-tested on disk even without the Delta jar. Engine
integration:

    eng.register_sink("users", DeltaMergeSink(spark, path, key="user_id"))
    eng.execute('UPSERT INTO users (user_id, name) VALUES ("u1", "Aa")')
    eng.execute('UPDATE users SET name = "Bb" WHERE user_id = "u1"')
    eng.execute('DELETE FROM users WHERE user_id = "u1"')

INSERT appends; UPSERT compiles to ``MERGE INTO ... whenMatchedUpdateAll
whenNotMatchedInsertAll``; UPDATE/DELETE push the translated predicate
into Delta (file-skipping + transactional rewrite — no full-table swap).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession


class SinkCapabilityError(ValueError):
    """A sink cannot honor the requested operation mode (e.g. Delta's
    time-based retention vs RETAIN n VERSIONS). The engine converts this
    to ExecError; unrelated ValueErrors from inside a sink propagate."""


class ConcurrentWriteError(RuntimeError):
    """A read-dependent mutation (UPDATE/DELETE/MERGE/OPTIMIZE/RESTORE)
    lost the commit race: another writer committed between this
    statement's snapshot read and its promote. The statement wrote
    nothing — re-run it against the new current snapshot. Blind appends
    never raise this (they rebase and retry automatically); this is the
    ParquetMergeSink analogue of Delta's ConcurrentModificationException
    under Serializable isolation."""


#: batch_key_conjunct sentinel: every key in the batch is NULL, so an
#: equality join on the key can match no target row at all
_ALL_NULL_KEYS = object()


class _CommitConflict(Exception):
    """Internal: the promote CAS (rename into the next version slot)
    lost. ``current`` carries the pointer observed after the loss."""

    def __init__(self, current: int):
        self.current = current
        super().__init__(f"commit conflict; current version is now {current}")


def delta_available() -> bool:
    """True when the delta-spark package (and its jar) is importable."""
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


class DeltaMergeSink:
    """Delta-backed writable table (ConnUpsert/ConnPatchWhere/ConnDeletion
    parity, schema/datasource.go:96-161)."""

    def __init__(self, spark: SparkSession, path: str, key: str):
        if not delta_available():
            raise ImportError(
                "DeltaMergeSink requires the optional 'delta-spark' package "
                "(pip install delta-spark, with spark.sql.extensions="
                "io.delta.sql.DeltaSparkSessionExtension); the engine's "
                "default in-memory DML path needs no extra dependency"
            )
        self.spark = spark
        self.path = path
        self.key = key

    # -- reads ----------------------------------------------------------
    def scan(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Current table state, or a past snapshot via ``version``
        (Delta ``versionAsOf`` — engine ``FROM t VERSION AS OF n``)."""
        reader = spark.read.format("delta")
        if version is not None:
            reader = reader.option("versionAsOf", version)
        return reader.load(self.path)

    # -- writes ---------------------------------------------------------
    def ensure(self, df: DataFrame) -> None:
        """Create the table from ``df`` if it does not exist yet."""
        import os

        if not os.path.exists(self.path):
            df.write.format("delta").mode("overwrite").save(self.path)

    def _table(self):
        from delta.tables import DeltaTable

        return DeltaTable.forPath(self.spark, self.path)

    def insert_append(self, new: DataFrame) -> None:
        new.write.format("delta").mode("append").save(self.path)

    def merge_upsert(self, new: DataFrame, key: str | None = None) -> None:
        k = key or self.key
        (
            self._table()
            .alias("t")
            .merge(new.alias("s"), f"t.`{k}` = s.`{k}`")
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )

    def overwrite(self, df: DataFrame) -> None:
        """Replace the table contents transactionally (engine MERGE INTO
        commit path)."""
        df.write.format("delta").mode("overwrite").save(self.path)

    def merge_when(
        self,
        source: DataFrame,
        on_sql: str,
        clauses: list[dict],
        t_alias: str = "t",
        s_alias: str = "s",
    ) -> int:
        """Native MERGE INTO: the engine's when-chains lowered onto
        Delta's merge builder — file-pruned and incremental, NO
        full-table rewrite (the generic engine path overwrites the whole
        table). ``clauses`` entries: ``{matched, action:
        'update'|'delete'|'insert', cond: sql|None, set: '*'|{col: sql},
        values: '*'|{col: sql}}`` — expressions are Spark SQL strings
        referencing ``t_alias``/``s_alias``, pre-validated by the engine.
        Returns rows affected, from the commit's operationMetrics.
        First-match-wins clause order is preserved (Delta evaluates
        when-clauses in builder order)."""
        b = self._table().alias(t_alias).merge(source.alias(s_alias), on_sql)
        for cl in clauses:
            cond = cl.get("cond")
            if cl["action"] == "update":
                if cl["set"] == "*":
                    b = b.whenMatchedUpdateAll(condition=cond)
                else:
                    b = b.whenMatchedUpdate(condition=cond, set=cl["set"])
            elif cl["action"] == "delete":
                b = b.whenMatchedDelete(condition=cond)
            else:  # insert
                if cl["values"] == "*":
                    b = b.whenNotMatchedInsertAll(condition=cond)
                else:
                    b = b.whenNotMatchedInsert(condition=cond, values=cl["values"])
        b.execute()
        om = self._table().history(1).collect()[0].asDict().get("operationMetrics") or {}
        return sum(
            int(om.get(k, 0) or 0)
            for k in ("numTargetRowsUpdated", "numTargetRowsDeleted", "numTargetRowsInserted")
        )

    def update_where(self, cond: Column, assignments: dict[str, Column]) -> None:
        self._table().update(cond, assignments)

    def delete_where(self, cond: Column | None) -> None:
        if cond is None:
            self._table().delete()
        else:
            self._table().delete(cond)

    def restore(self, version: int | None = None, timestamp: str | None = None) -> int:
        """Delta RESTORE TABLE (engine ``RESTORE`` statement): rolls the
        table back to a past version/timestamp via Delta's native restore
        (file-level, transactional). Returns the post-restore version."""
        if (version is None) == (timestamp is None):
            raise ValueError("restore takes exactly one of version= or timestamp=")
        t = self._table()
        if version is not None:
            t.restoreToVersion(int(version))
        else:
            t.restoreToTimestamp(timestamp)
        return int(t.history(1).collect()[0]["version"])

    def vacuum(self, keep: int | None = None, retention_hours: float | None = None) -> int:
        """Delta VACUUM (protocol parity with ParquetMergeSink.vacuum —
        the engine's ``VACUUM t`` statement routes here). Delta retention
        is TIME-based only: ``RETAIN n VERSIONS`` (keep=) cannot be
        honored and raises instead of silently doing nothing —
        previously the count was validated, ignored, and 0 returned
        while disk kept growing. Use ``RETAIN h HOURS``; with neither,
        Delta's own default retention applies. Returns 0 — Delta does
        not report a removed-version count."""
        if keep is not None:
            raise SinkCapabilityError(
                "Delta retention is time-based: use VACUUM t RETAIN <h> HOURS "
                "(RETAIN n VERSIONS is only supported by ParquetMergeSink)"
            )
        if retention_hours is None:
            self._table().vacuum()
        else:
            self._table().vacuum(retention_hours)
        return 0

    def optimize(self, zorder_by: list[str] | None = None,
                 target_file_mb: int | None = None, bits_per_col: int = 8) -> dict:
        """Delta OPTIMIZE (the engine's ``OPTIMIZE t [ZORDER BY ...]``
        statement routes here): native bin-packing compaction or
        multi-dimensional Z-order clustering — file-level and
        incremental, no snapshot rewrite. File sizing follows Delta's
        own session confs (``target_file_mb`` is the ParquetMergeSink
        knob); metrics come from the commit."""
        b = self._table().optimize()
        rows = (b.executeZOrderBy(*zorder_by) if zorder_by else b.executeCompaction()).collect()
        m = rows[0].asDict().get("metrics") if rows else None
        md = m.asDict() if m is not None and hasattr(m, "asDict") else {}
        return {
            "version": int(self._table().history(1).collect()[0]["version"]),
            "files_before": md.get("numFilesRemoved"),
            "files_after": md.get("numFilesAdded"),
            "zorder_by": list(zorder_by or []),
        }


class ParquetMergeSink:
    """Durable MERGE-capable sink over plain parquet — the no-extra-
    dependency fallback for DeltaMergeSink (same protocol, so the engine
    and the streaming upsert sink route identically).

    Transactionality is snapshot-and-swap: every mutation writes a NEW
    versioned directory (``<path>/v<N>``) from a staging dir, then
    atomically advances the ``_VERSION`` pointer file (write-temp +
    ``os.replace``). Readers resolve the pointer at scan time, so they see
    either the old or the new snapshot — never a partial write. Old
    versions remain until ``vacuum()``.

    Predicate DML is COPY-ON-WRITE at file granularity (``_commit_cow``):
    only files whose stats sidecar could match the predicate are
    rewritten, the rest hardlink into the new snapshot — Delta's
    file-level rewrite economics; swap in DeltaMergeSink where the jar
    is available for its native log-based protocol.

    Multi-writer safe via optimistic concurrency (``_promote``): the
    rename into the next version slot is the commit CAS; blind appends
    and upserts REBASE and retry on a lost race, read-dependent
    mutations (UPDATE/DELETE/MERGE/OPTIMIZE/RESTORE) raise
    ConcurrentWriteError — Delta's Serializable-isolation behavior.
    Same-host POSIX semantics (the reference's mutable sources are
    in-process single-writer — /root/reference/datasource/membtree.go;
    this is a strict superset). VACUUM remains an administrative
    operation: don't run it concurrently with writers.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key: str,
        partition_by: list[str] | None = None,
        cluster_by: list[str] | None = None,
    ):
        import json
        import os

        self.spark = spark
        self.path = path
        self.key = key
        #: observability for the data-skipping scan path: the last
        #: scan_pruned call's {files_total, files_read, version}, or None
        #: when the last pruned scan fell back to a full read
        self.last_scan: dict | None = None
        #: observability for the write path: the last commit's {mode:
        #: 'full'|'cow'[, files_linked, files_rewritten]}
        self.last_commit: dict | None = None
        os.makedirs(path, exist_ok=True)
        # hive partitioning and clustering are TABLE properties, not
        # handle properties: persisted in _meta.json at creation and
        # inherited by re-opened handles (a conflicting explicit spec is
        # an error, not a silent layout change)
        meta = None
        try:
            with open(os.path.join(path, "_meta.json")) as f:
                meta = json.load(f)
        except (OSError, ValueError):
            pass
        if meta is not None:
            stored = list(meta.get("partition_by") or [])
            if partition_by is not None and list(partition_by) != stored:
                raise ValueError(
                    f"{path} is partitioned by {stored}; cannot reopen with "
                    f"partition_by={list(partition_by)}"
                )
            self.partition_by = stored
            stored_cl = list(meta.get("cluster_by") or [])
            if cluster_by is not None and list(cluster_by) != stored_cl:
                raise ValueError(
                    f"{path} is clustered by {stored_cl}; cannot reopen with "
                    f"cluster_by={list(cluster_by)}"
                )
            self.cluster_by = stored_cl
        else:
            self.partition_by = list(partition_by or [])
            self.cluster_by = list(cluster_by or [])
            if self.partition_by or self.cluster_by:
                tmp = os.path.join(path, "_meta.json.tmp")
                with open(tmp, "w") as f:
                    json.dump(
                        {
                            "partition_by": self.partition_by,
                            "cluster_by": self.cluster_by,
                            "key": key,
                        },
                        f,
                    )
                os.replace(tmp, os.path.join(path, "_meta.json"))

    # -- version bookkeeping -------------------------------------------
    def _version_file(self) -> str:
        import os

        return os.path.join(self.path, "_VERSION")

    def _version(self) -> int:
        """Current committed version, or -1 when uninitialized."""
        import os

        try:
            with open(self._version_file()) as f:
                return int(f.read().strip())
        except (OSError, ValueError):
            return -1

    def _data_dir(self, version: int) -> str:
        import os

        return os.path.join(self.path, f"v{version}")

    def _commits_file(self) -> str:
        import os

        return os.path.join(self.path, "_commits")

    def _load_commits(self) -> dict:
        """version → ISO-8601 UTC commit timestamp. The global ``_commits``
        sidecar is a cache; the authoritative stamp is the ``_commit_ts``
        file written INTO each version dir before its promote rename, so
        concurrent writers can never lose each other's entries to a
        read-modify-write race on the shared sidecar."""
        import json
        import os

        try:
            with open(self._commits_file()) as f:
                commits = {int(k): v for k, v in json.load(f).items()}
        except (OSError, ValueError):
            commits = {}
        for v in self.versions():
            if v not in commits:
                try:
                    with open(os.path.join(self._data_dir(v), "_commit_ts")) as f:
                        commits[v] = f.read().strip()
                except OSError:
                    pass
        return commits

    def _save_commits(self, commits: dict) -> None:
        """Atomically rewrite the ``_commits`` sidecar (write-temp +
        os.replace, same protocol as the _VERSION pointer)."""
        import json
        import os

        ctmp = self._commits_file() + ".tmp"
        with open(ctmp, "w") as f:
            json.dump({str(k): v for k, v in commits.items()}, f)
        os.replace(ctmp, self._commits_file())

    def _commit_time_from(self, commits: dict, version: int):
        """Resolve one version's commit time from an already-loaded
        sidecar dict (mtime fallback for legacy dirs) — lets batch
        callers (vacuum, version_at, DESCRIBE HISTORY) read the sidecar
        once instead of once per version."""
        import datetime
        import os

        iso = commits.get(int(version))
        if iso is not None:
            ts = datetime.datetime.fromisoformat(iso)
            return ts if ts.tzinfo else ts.replace(tzinfo=datetime.timezone.utc)
        return datetime.datetime.fromtimestamp(
            os.path.getmtime(self._data_dir(version)), datetime.timezone.utc
        )

    def commit_time(self, version: int):
        """Real (durable) commit timestamp of ``version`` as a tz-aware
        UTC datetime. Resolved from the ``_commits`` sidecar written at
        commit time — survives rsync/copy, unlike directory mtimes — with
        an mtime fallback only for legacy version dirs predating the
        sidecar."""
        return self._commit_time_from(self._load_commits(), version)

    def _changes_dir(self, version: int) -> str:
        import os

        return os.path.join(self.path, f"c{version}")

    def _record_changes(self, version: int, changes) -> None:
        """Persist the commit's change rows alongside the snapshot so the
        change feed (TABLE_CHANGES / changes_since) reads O(|changes|)
        instead of diffing adjacent O(|base|) snapshots — the Delta CDC
        ``_change_data`` design. ``changes`` is a DataFrame of base rows
        + ``_change_type``, or one of the markers ``"all_insert"`` (every
        row of this snapshot is an insert — avoids duplicating a bulk
        load's data) / ``"none"`` (layout-only commit, e.g. OPTIMIZE:
        logically nothing changed). Best-effort: on failure the commit
        stands and the feed falls back to the snapshot diff."""
        import os
        import shutil
        import uuid

        d = self._changes_dir(version)
        staging = None
        try:
            if isinstance(changes, str):
                os.makedirs(d, exist_ok=True)
                marker = {
                    "all_insert": "_ALL_INSERT",
                    # delete-all(v-1) + insert-all(v), Delta CDF-for-
                    # overwrite semantics — the feed derives both sides
                    # from the flanking snapshots, so recording is O(1)
                    # driver-side and never duplicates table data
                    "overwrite": "_OVERWRITE",
                }.get(changes, "_NO_CHANGES")
                open(os.path.join(d, marker), "w").close()
                return
            staging = os.path.join(self.path, f".cstaging-{uuid.uuid4().hex}")
            changes.write.mode("overwrite").parquet(staging)
            os.rename(staging, d)
        except Exception:
            # clean up THIS call's staging leftovers only — never the
            # final dir: if ``d`` already exists it belongs to an earlier
            # recording for this version (e.g. the rename failed because
            # the slot is occupied) and deleting it would degrade that
            # commit's feed to the snapshot-diff fallback. Stray
            # .cstaging-* dirs from crashed writers are swept by vacuum().
            if staging is not None:
                shutil.rmtree(staging, ignore_errors=True)

    def snapshot_columns(self, version: int) -> list[str] | None:
        """Committed column names of one snapshot, from the stats
        sidecar's stored schema — a driver-side file read, NOT a Spark
        schema-inference job. None when the snapshot predates the
        sidecar (callers fall back to a real scan)."""
        import json

        from .skipping import load_stats_sidecar

        sj = (load_stats_sidecar(self._data_dir(version)) or {}).get("schema")
        if not sj:
            return None
        try:
            fields = json.loads(sj).get("fields") or []
        except ValueError:
            return None
        names = [f.get("name") for f in fields]
        return names if names and all(names) else None

    def recording_kind(self, version: int) -> str:
        """``'none' | 'no_changes' | 'all_insert' | 'overwrite' |
        'files'`` — what kind of commit-time change recording ``version``
        has, from driver-side path checks ONLY (no Spark read). Feed
        planning over an N-commit backlog costs N stat calls, not N
        schema-inference jobs: the engine batches every ``'files'``
        version into ONE parquet read. ``'overwrite'`` means delete-all
        of version−1 plus insert-all of this version (both flanking
        snapshots must still be on disk to read it)."""
        import os

        d = self._changes_dir(version)
        if not os.path.isdir(d):
            return "none"
        if os.path.exists(os.path.join(d, "_NO_CHANGES")):
            return "no_changes"
        if os.path.exists(os.path.join(d, "_ALL_INSERT")):
            return "all_insert"
        if os.path.exists(os.path.join(d, "_OVERWRITE")):
            return "overwrite"
        # same visibility filter as recorded_changes: hidden/underscore
        # artifacts (_SUCCESS-style markers, dot-tempfiles) are not data,
        # and a dir holding ONLY those must plan as 'none' (diff
        # fallback), not as an empty 'files' recording
        if any(
            n.endswith(".parquet") and not n.startswith((".", "_"))
            for n in os.listdir(d)
        ):
            return "files"
        return "none"  # torn recording → diff fallback

    def _write_commit_info(self, staging: str, op: str, mode: str, **extra) -> None:
        """Stamp the commit's OPERATION into the staging dir (Delta
        history-parity: DESCRIBE HISTORY shows what each version was —
        MERGE vs OPTIMIZE vs UPDATE — not just when). Best-effort; an
        absent file renders as NULL operation for legacy versions."""
        import json
        import os

        try:
            with open(os.path.join(staging, "_commit_info"), "w") as f:
                json.dump(dict({"op": op, "mode": mode}, **extra), f)
        except OSError:
            pass

    def commit_info(self, version: int) -> dict | None:
        """The ``_commit_info`` stamp of one retained version, or None
        (legacy / vacuumed)."""
        import json
        import os

        try:
            with open(os.path.join(self._data_dir(version), "_commit_info")) as f:
                return json.load(f)
        except (OSError, ValueError):
            return None

    def recorded_changes(self, spark: SparkSession, version: int):
        """Change rows recorded at commit time for ``version`` (base
        columns + ``_change_type``), or None when this commit has no
        recording (pre-recording warehouses, restore/upsert commits) —
        the caller falls back to the snapshot diff."""
        import os

        d = self._changes_dir(version)
        if not os.path.isdir(d):
            return None
        base_cols_frame = lambda: self.scan(spark, version)  # noqa: E731
        if os.path.exists(os.path.join(d, "_NO_CHANGES")):
            from pyspark.sql import functions as F

            return base_cols_frame().limit(0).withColumn("_change_type", F.lit(""))
        if os.path.exists(os.path.join(d, "_ALL_INSERT")):
            from pyspark.sql import functions as F

            return base_cols_frame().withColumn("_change_type", F.lit("insert"))
        if os.path.exists(os.path.join(d, "_OVERWRITE")):
            # delete-all of the previous snapshot + insert-all of this one
            # (Delta CDF-for-overwrite semantics): two plain scans, no
            # join, no shuffle — the recording itself is one marker file
            from pyspark.sql import functions as F

            prev = self.scan(spark, version - 1).withColumn(
                "_change_type", F.lit("delete")
            )
            return prev.unionByName(
                base_cols_frame().withColumn("_change_type", F.lit("insert")),
                allowMissingColumns=True,
            )
        if not any(
            n.endswith(".parquet") and not n.startswith((".", "_"))
            for n in os.listdir(d)
        ):
            # no VISIBLE data files (hidden/underscore artifacts don't
            # count — spark.read.parquet skips them): torn recording →
            # diff fallback, matching recording_kind's 'none'
            return None
        return spark.read.parquet(d)

    def _commit(self, df: DataFrame, changes=None, base: int | None = None,
                op: str = "WRITE") -> None:
        """Write ``df`` to a staging dir, promote it to the next version,
        record the commit timestamp, then atomically advance the pointer.
        ``changes`` optionally records the commit's change rows for
        O(|changes|) feed reads (see _record_changes). ``base`` pins the
        version this commit's content was COMPUTED FROM: the promote
        targets base+1, so a concurrent commit in between loses the CAS
        and raises ConcurrentWriteError instead of silently clobbering
        the intervening writer (Serializable isolation). base=None reads
        the pointer at entry (blind writes whose content is
        base-independent)."""
        import os
        import shutil
        import uuid

        nxt = (self._version() if base is None else base) + 1
        staging = os.path.join(self.path, f".staging-{uuid.uuid4().hex}")
        self._write_staging(df, staging)
        self._write_commit_info(staging, op, "full")
        try:
            # data-skipping sidecar: per-file min/max/null-count stats from
            # the just-written parquet FOOTERS (driver-side metadata read).
            # Written before the pointer advances, so a committed version
            # always has its sidecar; best-effort — a failure only
            # disables pruning for this snapshot, never the commit
            from .skipping import write_stats_sidecar

            write_stats_sidecar(staging, schema_json=df.schema.json())
        except Exception:
            pass
        try:
            self._promote(nxt, staging, changes)
        except _CommitConflict as c:
            shutil.rmtree(staging, ignore_errors=True)
            raise ConcurrentWriteError(
                f"{self.path}: another writer committed version {c.current} "
                f"while this statement was computing against version {nxt - 1}; "
                "nothing was written — re-run the statement"
            ) from None
        self.last_commit = {"mode": "full"}

    def _promote(self, nxt: int, staging: str, changes) -> None:
        """Rename a fully-staged snapshot dir into the ``v<nxt>`` slot,
        record changes, and advance the pointer.

        The rename IS the commit CAS: POSIX rename onto an existing
        non-empty directory fails with ENOTEMPTY, so of N concurrent
        writers targeting the same slot exactly one wins and the rest get
        _CommitConflict — no lock is held across the (slow) data write.
        The commit timestamp is stamped INTO the staging dir before the
        rename (still writer-exclusive), so history never races. If the
        slot is occupied but the pointer never advances (a writer died
        between rename and pointer write), the fully-staged orphan is
        ADOPTED — the pointer rolls forward to it and the caller rebases
        onto it like any other lost race. Single-host POSIX semantics
        (rename atomicity, flock); an object-store deployment would swap
        this for a log-based commit protocol as Delta does."""
        import datetime
        import os
        import time

        with open(os.path.join(staging, "_commit_ts"), "w") as f:
            f.write(datetime.datetime.now(datetime.timezone.utc).isoformat())
        final = self._data_dir(nxt)
        try:
            os.rename(staging, final)
        except OSError:
            if not os.path.isdir(final):
                raise
            # lost the CAS. Either the winner is about to advance the
            # pointer (normal race — wait for it) or it died post-rename
            # (torn commit — the slot holds a complete, durable snapshot;
            # adopt it so the table never wedges)
            deadline = time.monotonic() + 2.0
            while self._version() < nxt and time.monotonic() < deadline:
                time.sleep(0.02)
            if self._version() < nxt:
                self._advance_pointer(nxt)
            raise _CommitConflict(self._version()) from None
        if changes is not None:
            self._record_changes(nxt, changes)
        self._advance_pointer(nxt)

    def _advance_pointer(self, nxt: int) -> None:
        """Monotonically advance the ``_VERSION`` pointer to ``nxt`` and
        fold the new version's stamp into the ``_commits`` cache, under a
        short flock-ed critical section (microseconds — no data I/O): a
        slow writer that already won an EARLIER slot can never regress
        the pointer over a later commit, and concurrent sidecar updates
        can't drop each other's entries."""
        import fcntl
        import os

        with open(os.path.join(self.path, "_LOCK"), "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            try:
                if self._version() < nxt:
                    tmp = self._version_file() + ".tmp"
                    with open(tmp, "w") as f:
                        f.write(str(nxt))
                    os.replace(tmp, self._version_file())  # atomic on POSIX
                self._save_commits(self._load_commits())
            finally:
                fcntl.flock(lock, fcntl.LOCK_UN)

    def _write_staging(self, df: DataFrame, staging: str) -> None:
        """Write a snapshot's data files to a staging dir, in the table's
        layout (hive ``col=value`` dirs when partitioned)."""
        w = df.write.mode("overwrite")
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        w.parquet(staging)

    def _typed_read(self, df: DataFrame, vdir: str) -> DataFrame:
        """Undo hive partition-value TYPE INFERENCE: directory values are
        strings, and Spark guesses their type on read (a string column
        holding '3' comes back as int). The committed schema travels in
        the stats sidecar — cast partition columns back to it and restore
        the original column order, so a partitioned table round-trips
        schema-identically. Best-effort for legacy snapshots without a
        sidecar schema (inference stands)."""
        if not self.partition_by:
            return df
        import json

        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        from .skipping import load_stats_sidecar

        schema_json = (load_stats_sidecar(vdir) or {}).get("schema")
        if not schema_json:
            return df
        try:
            want = T.StructType.fromJson(json.loads(schema_json))
        except Exception:
            return df
        have = {f.name: f.dataType for f in df.schema.fields}
        cols = []
        for f in want.fields:
            if f.name not in have:
                continue
            c = F.col(f.name)
            if f.name in self.partition_by and have[f.name] != f.dataType:
                c = c.cast(f.dataType).alias(f.name)
            cols.append(c)
        extras = [F.col(n) for n in df.columns if n not in {f.name for f in want.fields}]
        return df.select(*cols, *extras)

    def _read_files(self, vdir: str, rels: list[str]) -> DataFrame:
        """Read an explicit subset of a snapshot's data files. basePath
        keeps hive partition columns derivable from the leaf paths."""
        import os

        return self._typed_read(
            self.spark.read.option("basePath", vdir).parquet(
                *[os.path.join(vdir, r) for r in rels]
            ),
            vdir,
        )

    def _data_rels(self, version: int) -> list[str]:
        """Relative paths of the data files of one snapshot dir."""
        import os

        vdir = self._data_dir(version)
        out = []
        for root, _, names in os.walk(vdir):
            for fn in names:
                if fn.endswith(".parquet") and not fn.startswith(("_", ".")):
                    out.append(os.path.relpath(os.path.join(root, fn), vdir))
        return sorted(out)

    def _commit_cow(
        self, new_df: DataFrame, link_rels: list[str], changes=None,
        base: int | None = None, op: str = "WRITE",
    ) -> None:
        """Copy-on-write commit: write ONLY ``new_df`` as fresh parquet
        files and HARDLINK the unchanged ``link_rels`` from the current
        snapshot into the next version dir — the snapshot-per-version
        model keeps its atomic-pointer simplicity while a mutation's I/O
        drops from O(table) to O(changed files) (Delta's file-level
        rewrite economics). Data files are immutable once committed, so
        links are safe across versions; vacuum's rmtree just drops link
        counts. The stats sidecar CARRIES the linked files' entries
        (no footer re-reads — at 80k files per snapshot that matters)
        and collects fresh entries for the new files only."""
        import os
        import shutil
        import uuid

        from .skipping import STATS_FILE, collect_file_stats, load_stats_sidecar

        cur = self._version() if base is None else base
        vdir = self._data_dir(cur)
        nxt = cur + 1
        staging = os.path.join(self.path, f".staging-{uuid.uuid4().hex}")
        self._write_staging(new_df, staging)
        self._write_commit_info(staging, op, "cow", files_linked=len(link_rels))
        try:
            stats = collect_file_stats(staging, schema_json=new_df.schema.json())
        except Exception:
            stats = None
        old_files = (load_stats_sidecar(vdir) or {}).get("files") or {}
        for rel in link_rels:
            dst = os.path.join(staging, rel)
            # linked files keep their RELATIVE paths, so hive-partitioned
            # layouts link partition-dir structure intact (and flat-layout
            # basenames can never collide across snapshots)
            if os.sep in rel:
                os.makedirs(os.path.dirname(dst), exist_ok=True)
            try:
                os.link(os.path.join(vdir, rel), dst)
            except OSError:
                shutil.copy2(os.path.join(vdir, rel), dst)
            if stats is not None:
                ent = old_files.get(rel)
                if ent is None:
                    stats = None  # legacy snapshot without stats for this file
                else:
                    stats["files"][rel] = ent
        if stats is None and link_rels:
            # fall back to a full footer sweep (legacy warehouses) — a
            # sidecar that misses a data file would make scan_pruned skip
            # it silently, so the sidecar must be complete or absent
            try:
                stats = collect_file_stats(staging, schema_json=new_df.schema.json())
            except Exception:
                stats = None
        if stats is not None:
            import json as _json

            tmp = os.path.join(staging, STATS_FILE + ".tmp")
            with open(tmp, "w") as f:
                _json.dump(stats, f)
            os.replace(tmp, os.path.join(staging, STATS_FILE))
        else:
            try:
                os.remove(os.path.join(staging, STATS_FILE))
            except OSError:
                pass
        try:
            self._promote(nxt, staging, changes)
        except _CommitConflict as c:
            shutil.rmtree(staging, ignore_errors=True)
            raise ConcurrentWriteError(
                f"{self.path}: another writer committed version {c.current} "
                f"while this statement was computing against version {cur}; "
                "nothing was written — re-run the statement"
            ) from None

    def _cow_split(
        self, conjuncts, base: int | None = None
    ) -> tuple[list[str], list[str]] | None:
        """(files to rewrite, files to link) for a predicate DML, or None
        when copy-on-write cannot be proven safe: no pushable conjuncts,
        no/legacy sidecar, a sidecar that does not cover every data file,
        or pruning that keeps everything anyway (no benefit). Files NOT
        kept by ``prune_files`` provably contain no matching row (the
        same conservative contract scan-time skipping relies on), so
        linking them unchanged preserves exact semantics."""
        from .skipping import load_stats_sidecar, prune_files

        if not conjuncts:
            return None
        cur = self._version() if base is None else base
        if cur < 0:
            return None
        stats = load_stats_sidecar(self._data_dir(cur))
        if stats is None:
            return None
        actual = self._data_rels(cur)
        sidecar_files = set((stats.get("files") or {}))
        if not set(actual) <= sidecar_files:
            return None
        kept, total = prune_files(stats, conjuncts)
        kept_set = set(kept) & set(actual)
        link = [r for r in actual if r not in kept_set]
        if not link:
            return None
        return sorted(kept_set), link

    def vacuum(
        self, keep: int = 1, retention_hours: float | None = None, dry_run: bool = False
    ) -> int | list[dict]:
        """Drop old committed versions; returns the number removed.

        ``keep`` retains the newest N versions (count-based).
        ``retention_hours`` instead drops every non-current version whose
        commit time (sidecar) is older than now−hours — the Delta-style
        time-based model, resolvable here thanks to the durable
        ``_commits`` timestamps; the CURRENT version is never dropped.
        ``dry_run`` (Delta ``VACUUM ... DRY RUN`` parity) deletes NOTHING
        and instead returns the would-be victims as ``[{version, files,
        bytes}]`` — the audit step before an irreversible prune."""
        import datetime
        import os
        import re
        import shutil

        if retention_hours is not None and keep != 1:
            raise ValueError("vacuum takes either keep= or retention_hours=, not both")
        cur = self._version()
        if retention_hours is not None:
            commits = self._load_commits()  # ONE sidecar read for all versions
            cutoff = datetime.datetime.now(datetime.timezone.utc) - datetime.timedelta(
                hours=retention_hours
            )
            victims = {
                v
                for v in self.versions()
                if v != cur and self._commit_time_from(commits, v) < cutoff
            }
        else:
            victims = {v for v in self.versions() if v <= cur - keep}
        if dry_run:
            out = []
            for v in sorted(victims):
                n, b = self._snapshot_stats(v)
                out.append({"version": v, "files": n, "bytes": b})
            return out
        removed = 0
        dropped = []
        for name in os.listdir(self.path):
            # vacuum a version's change recording (c<N>) with its snapshot
            m = re.fullmatch(r"([vc])(\d+)", name)
            if m and int(m.group(2)) in victims:
                shutil.rmtree(os.path.join(self.path, name), ignore_errors=True)
                if m.group(1) == "v":
                    dropped.append(int(m.group(2)))
                    removed += 1
        if dropped:
            commits = self._load_commits()
            for v in dropped:
                commits.pop(v, None)
            self._save_commits(commits)
        self._sweep_stale_staging()
        return removed

    #: staging dirs older than this are presumed abandoned (a writer died
    #: before promote/rename). Generous: an in-flight commit's staging dir
    #: must never be swept under a live writer.
    _STAGING_TTL_SECONDS = 24 * 3600

    def _sweep_stale_staging(self) -> None:
        """Remove abandoned ``.staging-*`` / ``.cstaging-*`` dirs left by
        writers that died mid-commit (promote never ran) or whose change
        recording failed before its rename. Age-gated so a concurrent
        writer's LIVE staging dir is never deleted."""
        import os
        import shutil
        import time

        cutoff = time.time() - self._STAGING_TTL_SECONDS
        for name in os.listdir(self.path):
            if not name.startswith((".staging-", ".cstaging-")):
                continue
            p = os.path.join(self.path, name)
            try:
                if os.path.isdir(p) and os.path.getmtime(p) < cutoff:
                    shutil.rmtree(p, ignore_errors=True)
            except OSError:
                continue

    # -- reads ----------------------------------------------------------
    def scan(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Current committed state, or the ``version`` snapshot (engine
        ``FROM t VERSION AS OF n`` — reproducible reads: a training run
        pins the dataset version it saw). Vacuumed versions raise with
        the retained list."""
        import os

        cur = self._version()
        if cur < 0:
            raise FileNotFoundError(f"ParquetMergeSink at {self.path} has no committed version")
        v = cur if version is None else int(version)
        if not 0 <= v <= cur or not os.path.isdir(self._data_dir(v)):
            raise FileNotFoundError(
                f"version {v} of {self.path} is not available "
                f"(current {cur}, retained: {self.versions()})"
            )
        return self._typed_read(spark.read.parquet(self._data_dir(v)), self._data_dir(v))

    def scan_pruned(
        self, spark: SparkSession, conjuncts: list, version: int | None = None
    ) -> DataFrame:
        """Snapshot scan with FILE-LEVEL data skipping: only files whose
        ``_stats.json`` min/max/null stats could satisfy every conjunct
        are handed to the parquet reader (skipping.py — Delta-parity
        design). Falls back to the full scan when the snapshot predates
        the sidecar. Pruning is conservative and the engine re-applies
        the full WHERE afterwards, so results are identical to an
        unpruned scan — only the I/O differs.

        When every file is pruned, ONE file is still read: its rows are
        provably non-matching (the engine's residual filter drops them)
        and it pins the correct schema without a createDataFrame round-
        trip. ``last_scan`` records {files_total, files_read, version}
        for observability (EXPLAIN ANALYZE / tests)."""
        import os

        from .skipping import load_stats_sidecar, prune_files

        cur = self._version()
        if cur < 0:
            raise FileNotFoundError(f"ParquetMergeSink at {self.path} has no committed version")
        v = cur if version is None else int(version)
        if not 0 <= v <= cur or not os.path.isdir(self._data_dir(v)):
            raise FileNotFoundError(
                f"version {v} of {self.path} is not available "
                f"(current {cur}, retained: {self.versions()})"
            )
        vdir = self._data_dir(v)
        stats = load_stats_sidecar(vdir) if conjuncts else None
        if stats is None:
            self.last_scan = None
            return self._typed_read(spark.read.parquet(vdir), vdir)
        kept, total = prune_files(stats, conjuncts)
        all_files = sorted(stats.get("files") or {})
        if not all_files:
            self.last_scan = None
            return self._typed_read(spark.read.parquet(vdir), vdir)
        if not kept:
            kept = [all_files[0]]
        self.last_scan = {"files_total": total, "files_read": len(kept), "version": v}
        if self.partition_by:
            # hive layouts: partition-dir grain alongside the file grain.
            # Partition values prune through the same sidecar machinery
            # (constant min=max entries derived from the col=value path at
            # commit time — skipping._partition_entries), and the explicit
            # file list below means non-matching partition dirs are never
            # even LISTED, let alone opened.
            import os as _os

            pdirs = lambda rels: {_os.path.dirname(r) for r in rels if _os.sep in r}  # noqa: E731
            self.last_scan["partitions_total"] = len(pdirs(all_files))
            self.last_scan["partitions_read"] = len(pdirs(kept))
        return self._read_files(vdir, kept)

    def versions(self) -> list[int]:
        """Committed versions still on disk (ascending)."""
        import os
        import re

        out = []
        for name in os.listdir(self.path):
            m = re.fullmatch(r"v(\d+)", name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def version_at(self, ts: str) -> int:
        """Latest retained version committed at or before wall time ``ts``
        (ISO format, interpreted as UTC). Commit times come from the
        durable ``_commits`` sidecar written at commit time — stable
        across rsync/copy of the warehouse (mtimes are only a fallback
        for legacy dirs); Delta-parity with its transaction-log
        timestamps."""
        import datetime

        want = datetime.datetime.fromisoformat(ts)
        if want.tzinfo is None:
            want = want.replace(tzinfo=datetime.timezone.utc)
        best = None
        commits = self._load_commits()
        for v in self.versions():
            if self._commit_time_from(commits, v) <= want:
                best = v
        if best is None:
            raise FileNotFoundError(
                f"no version of {self.path} committed at or before {ts!r} "
                f"(retained: {self.versions()})"
            )
        return best

    def cache_token(self):
        """Fingerprint of the externally-visible table state for the
        engine's plan/fold caches: (current version, every retained
        version). Commits extend it; ANY vacuum — including a time-based
        one that drops a middle version while older ones survive —
        changes it, so cached ``VERSION AS OF`` plans pinned to a
        since-vacuumed snapshot miss instead of failing mid-scan. The
        versions() listdir already happens for scans; this adds no new
        I/O class."""
        return (self._version(), tuple(self.versions()))

    # -- writes ---------------------------------------------------------
    #: bounded rebase attempts for auto-retrying writes (append/upsert);
    #: each retry recomputes against the NEW current snapshot, so the
    #: retried operation is serializable — the bound only guards livelock
    _OCC_RETRIES = 12

    def ensure(self, df: DataFrame) -> None:
        """Create the table from ``df`` if it does not exist yet.
        Losing the creation race to a concurrent writer satisfies the
        contract (the table exists) — no error."""
        if self._version() < 0:
            try:
                self._commit(df, changes="all_insert", base=-1, op="CREATE TABLE")
            except ConcurrentWriteError:
                if self._version() < 0:
                    raise

    def insert_append(self, new: DataFrame) -> None:
        """Blind append. Concurrent appends never fail: a lost commit
        race REBASES — the whole append recomputes against the new
        current snapshot and retries (Delta-parity: blind appends
        auto-resolve under any concurrent commit; the content written is
        independent of the base, so the retry is serializable)."""
        from pyspark.sql import functions as F

        last = None
        for _ in range(self._OCC_RETRIES):
            basev = self._version()
            cur = self.scan(self.spark, basev)
            # recorded change rows carry the SNAPSHOT's column set (missing
            # source columns null-fill, exactly as the appended data does)
            aligned = cur.limit(0).unionByName(new, allowMissingColumns=True)
            rec = aligned.withColumn("_change_type", F.lit("insert"))
            cur_cols = {c.lower() for c in cur.columns}
            # COW-eligible only when the batch introduces no new columns
            # AND no type changes: unionByName coerces mismatched types to
            # the wider one, so a long batch appended into an int column
            # would write wide-typed new files while hardlinking the old
            # narrow-typed ones — a mixed-type snapshot later scans fail
            # on ('Parquet column cannot be converted'). Exact dtype
            # equality of the aligned frame against the snapshot schema
            # keeps the linked files honest; any drift → full rewrite at
            # the merged type (the pre-COW behavior).
            same_types = [f.dataType for f in aligned.schema.fields] == [
                f.dataType for f in cur.schema.fields
            ]
            try:
                if same_types and all(c.lower() in cur_cols for c in new.columns):
                    # copy-on-write append: every existing file links
                    # unchanged; only the new rows are written — O(|new|)
                    link = self._data_rels(basev)
                    if link:
                        self._commit_cow(aligned, link, changes=rec, base=basev, op="WRITE")
                        self.last_commit = {
                            "mode": "cow",
                            "files_linked": len(link),
                            "files_rewritten": 0,
                        }
                        return
                # schema-widening append (new columns) keeps the full
                # rewrite so every data file carries the merged schema
                self._commit(
                    cur.unionByName(new, allowMissingColumns=True), changes=rec,
                    base=basev, op="WRITE",
                )
                return
            except ConcurrentWriteError as e:
                last = e
                continue
        raise last

    def merge_upsert(self, new: DataFrame, key: str | None = None) -> None:
        """MERGE semantics: matched rows replaced by the source row, new
        keys inserted (whenMatchedUpdateAll/whenNotMatchedInsertAll).

        File-pruned copy-on-write when the stats sidecar allows it
        (Delta's MERGE economics): the incoming batch's KEYS become
        skipping conjuncts — an IN-set for small batches, a min/max range
        for large ones — and every file whose key stats PROVE no overlap
        hardlinks unchanged; only overlapping files are anti-joined and
        rewritten. A typical CDC batch touching one day of a
        date-clustered 80k-file table rewrites that day's files, not the
        table. Falls back to the full rewrite when stats are missing,
        keys aren't prunable literals, or the batch widens the schema.

        Changes are RECORDED at commit time like every other commit
        class (under the sink's keyed contract — one row per key per
        snapshot — the pre/post pairing is well-defined): matched keys
        whose row actually changed emit update_preimage/postimage (an
        x = x upsert emits nothing, matching the engine MERGE and the
        snapshot-diff semantics), unmatched keys emit insert. The
        preimage read is bounded by the OVERLAPPING files — pruned files
        provably hold no matched key, so the recording costs O(touched
        files + batch), never O(table). A lost commit race rebases (the
        full upsert recomputes against the new snapshot — serializable,
        and what the streaming upsert sink wants under a concurrent
        batch writer)."""
        from pyspark.sql import functions as F

        k = key or self.key
        # ANSI MERGE cardinality rule: a source batch with duplicate
        # (non-null) keys is rejected — otherwise the inner join in
        # _changes would emit cross-product pre/post pairs AND the table
        # would gain duplicate key rows, breaking the keyed contract the
        # change feed folds under. One bounded agg job over the batch;
        # NULL keys never match a merge join, so duplicates there are
        # plain multi-row inserts and stay allowed.
        card = new.agg(
            F.count(F.col(k)).alias("__n"),
            F.countDistinct(F.col(k)).alias("__d"),
        ).first()
        if card["__n"] != card["__d"]:
            raise SinkCapabilityError(
                f"MERGE source batch has duplicate values in key column {k!r} "
                f"({card['__n']} non-null rows, {card['__d']} distinct keys); "
                "deduplicate the batch (e.g. keep the newest row per key) first"
            )

        def _changes(old_scope: DataFrame, aligned: DataFrame):
            """insert / changed-only update pre+post rows for upserting
            ``aligned`` into ``old_scope`` (the rows that could match —
            the overlapping files in the COW path, the snapshot in the
            full path)."""
            cols = aligned.columns
            others = [c for c in cols if c != k]
            # widening batch: conform the old side to the new columns and
            # dtypes (absent old values are NULL; a union-coerced dtype
            # must match on both sides or the struct compare won't analyze)
            old_scope = old_scope.select(
                *[
                    (
                        F.col(c).cast(aligned.schema[c].dataType)
                        if c in old_scope.columns
                        else F.lit(None).cast(aligned.schema[c].dataType)
                    ).alias(c)
                    for c in cols
                ]
            )
            o2 = old_scope.select(
                F.col(k), F.struct(*[F.col(c) for c in others]).alias("__oldr")
            )
            n2 = aligned.select(
                F.col(k), F.struct(*[F.col(c) for c in others]).alias("__newr")
            )
            diff = o2.join(n2, on=k, how="inner").filter(
                ~F.col("__oldr").eqNullSafe(F.col("__newr"))
            )
            pre = diff.select(
                F.col(k), *[F.col(f"__oldr.{c}").alias(c) for c in others]
            ).withColumn("_change_type", F.lit("update_preimage"))
            post = diff.select(
                F.col(k), *[F.col(f"__newr.{c}").alias(c) for c in others]
            ).withColumn("_change_type", F.lit("update_postimage"))
            ins = aligned.join(old_scope.select(k), on=k, how="left_anti").withColumn(
                "_change_type", F.lit("insert")
            )
            return (
                pre.unionByName(post, allowMissingColumns=True)
                .unionByName(ins, allowMissingColumns=True)
                .select(*cols, "_change_type")
            )

        last = None
        for _ in range(self._OCC_RETRIES):
            basev = self._version()
            try:
                if basev < 0:
                    self._commit(new, changes="all_insert", base=-1, op="MERGE")
                    return
                split = self._upsert_cow_split(new, k, basev)
                if split is not None:
                    rewrite, link = split
                    aligned = (
                        self.scan(self.spark, basev)
                        .limit(0)
                        .unionByName(new, allowMissingColumns=True)
                    )
                    if rewrite:
                        hit = self._read_files(self._data_dir(basev), rewrite)
                        kept = hit.join(new.select(k).distinct(), on=k, how="left_anti")
                        out = kept.unionByName(aligned)
                        # pruned files provably hold no matched key, so
                        # the overlapping files ARE the preimage scope
                        ch = _changes(hit, aligned)
                    else:
                        out = aligned
                        ch = aligned.withColumn("_change_type", F.lit("insert"))
                    self._commit_cow(out, link, changes=ch, base=basev, op="MERGE")
                    self.last_commit = {
                        "mode": "cow",
                        "files_linked": len(link),
                        "files_rewritten": len(rewrite),
                    }
                    return
                cur = self.scan(self.spark, basev)
                aligned = cur.limit(0).unionByName(new, allowMissingColumns=True)
                kept = cur.join(new.select(k).distinct(), on=k, how="left_anti")
                self._commit(
                    kept.unionByName(aligned, allowMissingColumns=True),
                    changes=_changes(cur, aligned),
                    base=basev,
                    op="MERGE",
                )
                return
            except ConcurrentWriteError as e:
                last = e
                continue
        raise last

    #: collect at most this many distinct keys driver-side for the
    #: IN-set conjunct; bigger batches prune on the min/max range instead
    _UPSERT_KEY_CAP = 4096

    def _upsert_cow_split(
        self, new: DataFrame, k: str, basev: int
    ) -> tuple[list[str], list[str]] | None:
        """(files to rewrite, files to link) for an upsert of ``new`` on
        key ``k``, or None when file-pruned COW cannot be proven safe or
        buys nothing. Sound because key-equality is null-rejecting: a
        pruned file provably holds no row whose key appears in ``new``,
        and null-keyed rows on either side never match a merge join."""
        import json

        from .skipping import load_stats_sidecar, prune_files

        stats = load_stats_sidecar(self._data_dir(basev))
        if stats is None:
            return None
        actual = self._data_rels(basev)
        files = stats.get("files") or {}
        if not actual or not set(actual) <= set(files):
            return None
        # COW links old files untouched, so a batch that WIDENS the schema
        # needs the full rewrite (every data file must carry the columns)
        schema_json = stats.get("schema")
        if not schema_json:
            return None
        try:
            snap_cols = {
                f.get("name", "").lower() for f in json.loads(schema_json).get("fields") or []
            }
        except ValueError:
            return None
        if not {c.lower() for c in new.columns} <= snap_cols:
            return None

        conj = self.batch_key_conjunct(new, k)
        if conj is _ALL_NULL_KEYS:  # pure insert, nothing can match
            return [], actual
        if conj is None:
            return None
        kept, _total = prune_files(stats, [conj])
        rewrite = [r for r in actual if r in set(kept)]
        link = [r for r in actual if r not in set(kept)]
        if not link:
            return None  # every file may hold a matching key — no benefit
        return rewrite, link

    def batch_key_conjunct(self, df: DataFrame, col: str):
        """Skipping conjunct describing ``df[col]``'s value set: an
        IN-set for batches up to ``_UPSERT_KEY_CAP`` distinct keys (ONE
        bounded collect), else the min/max range (one tiny agg — at 100 TB
        the summary job is O(|batch|), never O(table)). Returns
        ``_ALL_NULL_KEYS`` when every key is NULL (an equality on the
        column can match nothing), or None when the values don't fit the
        skipping literal domain (→ caller must not prune)."""
        import datetime as _dt
        import decimal as _dec

        from pyspark.sql import functions as F

        from .skipping import InConjunct, RangeConjunct

        def lit(v):
            if isinstance(v, (bool, int, float, str)):
                return v
            if isinstance(v, (_dt.datetime, _dt.date)):
                return v.isoformat()
            if isinstance(v, _dec.Decimal) and v == v.to_integral_value():
                return int(v)
            return None

        head = (
            df.select(F.col(col).alias("k")).distinct().limit(self._UPSERT_KEY_CAP + 1).collect()
        )
        vals = [r.k for r in head if r.k is not None]
        if len(head) <= self._UPSERT_KEY_CAP:
            if not vals:
                return _ALL_NULL_KEYS
            conv = [lit(v) for v in vals]
            if any(c is None for c in conv):
                return None
            return InConjunct(col.lower(), tuple(conv))
        row = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).collect()[0]
        lo, hi = lit(row.lo), lit(row.hi)
        if lo is None or hi is None:
            return None
        return RangeConjunct(col.lower(), lo=lo, hi=hi)

    def overwrite_cow(
        self,
        df: DataFrame,
        link_rels: list[str],
        changes=None,
        base: int | None = None,
        files_rewritten: int | None = None,
    ) -> None:
        """COW variant of ``overwrite`` for callers (the engine's MERGE)
        that PROVED which files a statement cannot touch: ``df`` holds the
        new content of the rewritten region only; ``link_rels`` hardlink
        unchanged from the base snapshot. Read-dependent — a lost commit
        race raises ConcurrentWriteError (nothing written)."""
        self._commit_cow(df, link_rels, changes=changes, base=base, op="MERGE")
        self.last_commit = {
            "mode": "cow",
            "files_linked": len(link_rels),
            "files_rewritten": files_rewritten if files_rewritten is not None else 0,
        }

    def overwrite(self, df: DataFrame, changes=None, base: int | None = None,
                  op: str = "OVERWRITE") -> None:
        """Replace the table contents as a NEW committed version (engine
        MERGE INTO commit path; old snapshots stay time-travelable).
        ``changes`` optionally records the commit's change rows (the
        engine's MERGE knows them exactly) for O(|changes|) feed reads.
        With ``changes`` the commit is read-dependent (the change rows
        were computed against a specific base), so a lost race raises
        ConcurrentWriteError; ``base`` pins the version the content was
        COMPUTED FROM — the promote CAS targets base+1, so a concurrent
        commit landing anywhere in the (multi-second) scan→commit window
        loses the race loudly instead of being silently clobbered. A bare
        overwrite is blind and retries. A bare overwrite still RECORDS
        its changes as the O(1) ``'overwrite'`` marker (delete-all of the
        previous snapshot + insert-all of this one — Delta's CDF
        semantics for overwrite), so the change feed never degrades to
        the snapshot-diff fallback for replace commits."""
        if changes is not None or base is not None:
            self._commit(df, changes=changes, base=base, op=op)
            return
        last = None
        for _ in range(self._OCC_RETRIES):
            try:
                marker = "overwrite" if self._version() >= 0 else "all_insert"
                self._commit(df, changes=marker, op=op)
                return
            except ConcurrentWriteError as e:
                last = e
                continue
        raise last

    # -- layout maintenance ---------------------------------------------
    def _snapshot_stats(self, version: int) -> tuple[int, int]:
        """(data files, data bytes) of one committed snapshot dir."""
        import os

        n = total = 0
        root_dir = self._data_dir(version)
        for root, _, files in os.walk(root_dir):
            for fn in files:
                if fn.startswith(("_", ".")):
                    continue
                n += 1
                try:
                    total += os.path.getsize(os.path.join(root, fn))
                except OSError:
                    pass  # concurrent VACUUM between walk and stat
        return n, total

    def optimize(self, zorder_by: list[str] | None = None,
                 target_file_mb: float = 128, bits_per_col: int = 8,
                 curve: str = "morton", scope_conjuncts: list | None = None,
                 scope_dirs: list[str] | None = None) -> dict:
        """Compact (and optionally Z-order cluster) the CURRENT snapshot
        as a new commit — the engine's ``OPTIMIZE t [WHERE ...]
        [ZORDER BY ...]``.

        Plain compaction (no ``zorder_by``) is INCREMENTAL, Delta-parity:
        only files under ``target_file_mb`` are read and rewritten into
        ~target-sized files; every already-right-sized file HARDLINKS
        into the new snapshot unchanged (the _commit_cow machinery — at
        100 TB, fixing 2 GB of small CDC files costs 2 GB of I/O, not an
        O(table) snapshot rewrite). With nothing to compact (fewer than
        two small files) this is a metadata no-op: no commit at all.

        ``scope_conjuncts`` (the engine's ``WHERE``) restricts the
        candidate set to files whose stats sidecar says could hold a
        matching row — partition predicates map exactly to partition
        dirs. Row content is never filtered: whole candidate files
        rewrite, everything else links, so the table is byte-identical.
        With a scope, ZORDER becomes incremental too: cluster ONE
        partition's files and hardlink the other three years'.

        ``zorder_by`` lays rows on the Morton (default) or Hilbert
        (``curve='hilbert'``) curve of those columns so parquet min/max
        stats prune scans filtered on ANY of them (see
        datapipe/zorder.py) — unscoped clustering re-sorts every row, so
        it stays a full rewrite. Old versions stay time-travelable until
        vacuum.

        ``scope_dirs`` (internal; engine auto-compaction) restricts the
        candidate set to files inside the given snapshot-relative
        partition directories — on a hive-partitioned table, steady-state
        CDC compaction then never re-reads cold partitions' small-file
        survivors; only the partitions the triggering DML touched are
        considered. No sidecar needed: the dirs come straight off the
        commit's own file listing."""
        import os

        from .datapipe.zorder import cluster_frame, estimate_num_files
        from .skipping import load_stats_sidecar, prune_files

        cur = self._version()
        if cur < 0:
            raise ValueError("optimize: sink has no committed data yet")
        files_before, data_bytes = self._snapshot_stats(cur)
        vdir = self._data_dir(cur)
        rels = self._data_rels(cur)
        candidates = rels
        if scope_conjuncts:
            stats = load_stats_sidecar(vdir)
            if stats is None or not set(rels) <= set(stats.get("files") or {}):
                raise ValueError(
                    "OPTIMIZE WHERE needs the stats sidecar to scope files; "
                    "this snapshot predates it — run an unscoped OPTIMIZE first"
                )
            kept, _total = prune_files(stats, scope_conjuncts)
            candidates = [r for r in rels if r in set(kept)]
        if scope_dirs is not None:
            sd = set(scope_dirs)
            candidates = [r for r in candidates if os.path.dirname(r) in sd]

        def _noop() -> dict:
            self.last_commit = {
                "mode": "noop",
                "files_linked": files_before,
                "files_rewritten": 0,
            }
            return {
                "version": cur,
                "files_before": files_before,
                "files_after": files_before,
                "zorder_by": list(zorder_by or []),
            }

        if not zorder_by:
            # incremental small-file compaction: bin-pack ONLY the
            # under-target candidate files; link the rest. A table
            # declared with ``cluster_by`` (liquid-clustering parity)
            # also lays the REWRITTEN rows on its clustering curve — new
            # CDC data gets incrementally clustered as it compacts while
            # already-right-sized files stay untouched; an explicit
            # ZORDER BY remains the full re-cluster.
            thresh = int(target_file_mb * (1 << 20))

            def _size(rel: str) -> int:
                # a concurrent VACUUM can remove this snapshot between
                # the listing and the stat; treat a vanished file as
                # size 0 here and let the COW commit's base check (OCC)
                # or the read raise the coherent error instead of a raw
                # OSError out of a size probe
                try:
                    return os.path.getsize(os.path.join(vdir, rel))
                except OSError:
                    return 0

            small = [r for r in candidates if _size(r) < thresh]
            if len(small) < 2:
                return _noop()  # nothing worth compacting — no commit
            link = [r for r in rels if r not in set(small)]
            small_bytes = sum(_size(r) for r in small)
            n_files = estimate_num_files(small_bytes, target_file_mb)
            self._commit_cow(
                cluster_frame(
                    self._read_files(vdir, small),
                    self.cluster_by or None,
                    n_files,
                    bits_per_col,
                    curve=curve,
                ),
                link,
                changes="none",  # layout-only: the feed records a logical no-op
                base=cur,  # a concurrent commit must not be clobbered
                op="OPTIMIZE (clustered)" if self.cluster_by else "OPTIMIZE",
            )
            self.last_commit = {
                "mode": "cow",
                "files_linked": len(link),
                "files_rewritten": len(small),
            }
        elif scope_conjuncts:
            # scoped clustering: re-sort ONLY the candidate files; the
            # rest of the table hardlinks through untouched
            if not candidates:
                return _noop()
            link = [r for r in rels if r not in set(candidates)]
            cand_bytes = 0
            for r in candidates:
                try:
                    cand_bytes += os.path.getsize(os.path.join(vdir, r))
                except OSError:
                    pass  # concurrent VACUUM; OCC base check decides
            n_files = estimate_num_files(cand_bytes, target_file_mb)
            self._commit_cow(
                cluster_frame(
                    self._read_files(vdir, candidates), zorder_by, n_files,
                    bits_per_col, curve=curve,
                ),
                link,
                changes="none",
                base=cur,
                op="OPTIMIZE ZORDER BY (" + ", ".join(zorder_by) + ")",
            )
            self.last_commit = {
                "mode": "cow",
                "files_linked": len(link),
                "files_rewritten": len(candidates),
            }
        else:
            n_files = estimate_num_files(data_bytes, target_file_mb)
            self._commit(
                cluster_frame(self.scan(self.spark, cur), zorder_by, n_files, bits_per_col, curve=curve),
                changes="none",  # layout-only: the feed records a logical no-op
                base=cur,  # a concurrent commit must not be clobbered by a layout rewrite
                op="OPTIMIZE ZORDER BY (" + ", ".join(zorder_by) + ")",
            )
        files_after, _ = self._snapshot_stats(self._version())
        return {
            "version": self._version(),
            "files_before": files_before,
            "files_after": files_after,
            "zorder_by": list(zorder_by or []),
        }

    def _restore_changes(self, v_target: int, cur: int):
        """Change rows for a RESTORE commit (cur → v_target), computed by
        INVERTING the recorded changes of the window (v_target, cur] —
        O(|window changes|), never O(|base|): per key, the first recorded
        event's preimage is the key's state AT v_target and the last
        event's postimage its state AT cur; the restore emits the
        transition back. Returns a DataFrame of base cols +
        ``_change_type``, the string ``"none"`` for an empty window, or
        None when any window commit lacks a recording (the feed's
        snapshot-diff fallback handles it, as before this optimization).
        Requires the sink's keyed contract (one row per key per
        snapshot) — the same invariant the diff fallback's key join
        already assumes."""
        from pyspark.sql import functions as F

        if v_target >= cur:
            return "none"
        window = list(range(v_target + 1, cur + 1))
        kinds = {w: self.recording_kind(w) for w in window}
        if any(k == "none" for k in kinds.values()):
            return None
        cols = self.snapshot_columns(v_target)
        if cols is None:
            cols = self.scan(self.spark, v_target).columns

        def _sel(df, ctype=None):
            picked = [
                (F.col(c) if c in df.columns else F.lit(None)).alias(c) for c in cols
            ]
            ct = F.lit(ctype) if ctype else F.col("_change_type")
            return df.select(*picked, ct.alias("_change_type"))

        parts = []
        try:
            for w in window:
                k = kinds[w]
                if k == "no_changes":
                    continue
                if k == "all_insert":
                    parts.append((w, _sel(self.scan(self.spark, w), "insert")))
                elif k == "overwrite":
                    parts.append((w, _sel(self.scan(self.spark, w - 1), "delete")))
                    parts.append((w, _sel(self.scan(self.spark, w), "insert")))
                else:  # files
                    parts.append(
                        (w, _sel(self.spark.read.parquet(self._changes_dir(w))))
                    )
        except Exception:
            return None  # vacuumed endpoint mid-window → diff fallback
        if not parts:
            return "none"
        union = None
        for w, df in parts:
            step = df.withColumn("_commit_version", F.lit(w).cast("long"))
            union = step if union is None else union.unionByName(
                step, allowMissingColumns=True
            )
        # per key: first event = state at v_target side, last = state at
        # cur side. Intra-commit order: preimage/delete (the "before"
        # row) sorts before insert/postimage (the "after" row).
        rank = (
            F.when(F.col("_change_type").isin("update_preimage", "delete"), F.lit(0))
            .otherwise(F.lit(1))
        )
        ev = union.select(
            F.col(self.key).alias("_k"),
            F.struct(
                F.col("_commit_version").alias("_v"),
                rank.alias("_r"),
                F.col("_change_type").alias("_t"),
                F.struct(*[F.col(c).alias(c) for c in cols]).alias("_row"),
            ).alias("_e"),
        )
        agg = ev.groupBy("_k").agg(F.min("_e").alias("_f"), F.max("_e").alias("_l"))
        # state at v_target exists unless the key's first event created it
        before_present = F.col("_f._t") != F.lit("insert")
        # state at cur exists unless the key's last event deleted it
        after_present = F.col("_l._t") != F.lit("delete")
        before_row, after_row = F.col("_f._row"), F.col("_l._row")
        changed = before_present & after_present & ~before_row.eqNullSafe(after_row)
        rec = lambda ct, row: F.struct(  # noqa: E731
            F.lit(ct).alias("_ct"), row.alias("_row")
        )
        pairs = F.array(
            F.when(after_present & ~before_present, rec("delete", after_row)).when(
                changed, rec("update_preimage", after_row)
            ),
            F.when(before_present & ~after_present, rec("insert", before_row)).when(
                changed, rec("update_postimage", before_row)
            ),
        )
        return (
            agg.select(F.explode(pairs).alias("_e"))
            .filter(F.col("_e").isNotNull())
            .select(
                *[F.col(f"_e._row.{c}").alias(c) for c in cols],
                F.col("_e._ct").alias("_change_type"),
            )
        )

    def restore(self, version: int | None = None, timestamp: str | None = None) -> int:
        """Roll back to a past snapshot by committing it as the NEW
        current version (engine ``RESTORE TABLE``; Delta-parity). History
        is preserved — the restore itself is a commit that can be
        time-traveled past or vacuumed like any other. The restore's NET
        change rows (keys whose state differs between the current and
        restored snapshots) are recorded at commit time by inverting the
        window's recordings — O(|window changes|) — so the change feed
        replays restores without the O(|base|) snapshot diff. Returns the
        new current version number."""
        if (version is None) == (timestamp is None):
            raise ValueError("restore takes exactly one of version= or timestamp=")
        v = int(version) if version is not None else self.version_at(timestamp)
        import os
        import shutil
        import uuid

        cur = self._version()
        if not 0 <= v <= cur or not os.path.isdir(self._data_dir(v)):
            raise FileNotFoundError(
                f"version {v} of {self.path} is not available "
                f"(current {cur}, retained: {self.versions()})"
            )
        restore_rec = self._restore_changes(v, cur)
        rels = self._data_rels(v)
        if rels:
            # pure metadata restore: hardlink every data file of the target
            # snapshot (partition-dir structure intact) and carry its
            # sidecar — ZERO Spark jobs, O(#files) driver syscalls instead
            # of an O(table) rewrite
            from .skipping import STATS_FILE

            src_dir = self._data_dir(v)
            staging = os.path.join(self.path, f".staging-{uuid.uuid4().hex}")
            os.makedirs(staging)
            try:
                for rel in rels:
                    dst = os.path.join(staging, rel)
                    if os.sep in rel:
                        os.makedirs(os.path.dirname(dst), exist_ok=True)
                    try:
                        os.link(os.path.join(src_dir, rel), dst)
                    except OSError:
                        shutil.copy2(os.path.join(src_dir, rel), dst)
                sc = os.path.join(src_dir, STATS_FILE)
                if os.path.exists(sc):
                    shutil.copy2(sc, os.path.join(staging, STATS_FILE))
                self._write_commit_info(staging, f"RESTORE (to v{v})", "cow")
            except Exception:
                shutil.rmtree(staging, ignore_errors=True)
                raise
            try:
                self._promote(cur + 1, staging, restore_rec)
            except _CommitConflict as c:
                shutil.rmtree(staging, ignore_errors=True)
                raise ConcurrentWriteError(
                    f"{self.path}: another writer committed version {c.current} "
                    f"during RESTORE from version {cur}; nothing was written"
                ) from None
            self.last_commit = {"mode": "cow", "files_linked": len(rels), "files_rewritten": 0}
        else:
            self._commit(
                self.scan(self.spark, v),
                changes=restore_rec,
                base=cur,
                op=f"RESTORE (to v{v})",
            )
        return self._version()

    def update_where(
        self, cond: Column, assignments: dict[str, Column], conjuncts=None
    ) -> int:
        """Returns the number of condition-matching rows, measured ON the
        rewrite job itself (``df.observe`` CollectMetrics — no separate
        count scan: at 100 TB an extra full pass per statement just to
        report the affected count is the difference between one pruned
        rewrite and an O(table) read)."""
        from functools import reduce

        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        basev = self._version()
        split = self._cow_split(conjuncts, base=basev)
        empty_rewrite = False
        if split is not None:
            # file-pruned UPDATE: only files whose stats could match the
            # predicate are read and rewritten; the rest hardlink into the
            # new snapshot (O(changed files), Delta-style rewrite economics)
            rewrite, link = split
            vdir = self._data_dir(basev)
            base = self.scan(self.spark, basev)
            df = (
                self._read_files(vdir, rewrite)
                if rewrite
                else base.limit(0)
            )
            empty_rewrite = not rewrite
            self.last_commit = {
                "mode": "cow",
                "files_linked": len(link),
                "files_rewritten": len(rewrite),
            }
        else:
            df, link = self.scan(self.spark, basev), None
        # affected count piggybacks on the staging write (one job). The
        # COW-linked files provably hold no cond-matching row, so counting
        # the rewrite subset IS the global count. Observed on a branch the
        # change-recording frame does NOT share — Observation supports one
        # action. An empty rewrite subset skips the metric (the optimizer
        # folds empty relations, which would drop the CollectMetrics
        # node): its count is provably 0.
        obs = Observation()
        src = df if empty_rewrite else df.observe(
            obs, F.sum(F.when(cond, 1).otherwise(0)).alias("n")
        )
        out = src.withColumns({c: F.when(cond, v).otherwise(F.col(c)) for c, v in assignments.items()})
        # recorded changes: rows the condition touches AND whose assigned
        # values actually differ — matching the snapshot-diff semantics
        # (an x = x update emits nothing there either). Under COW the
        # linked files provably hold no cond-matching row, so computing
        # from the rewrite subset records the identical change set.
        differs = reduce(
            lambda a, b: a | b, [~F.col(c).eqNullSafe(v) for c, v in assignments.items()]
        )
        touched = df.filter(cond & differs)
        rec = touched.withColumn("_change_type", F.lit("update_preimage")).unionByName(
            touched.withColumns(dict(assignments)).withColumn(
                "_change_type", F.lit("update_postimage")
            )
        )
        if link is not None:
            self._commit_cow(out, link, changes=rec, base=basev, op="UPDATE")
        else:
            self._commit(out, changes=rec, base=basev, op="UPDATE")
        return 0 if empty_rewrite else int(obs.get["n"] or 0)

    def delete_where(self, cond: Column | None, conjuncts=None) -> int:
        """Returns the number of deleted rows, measured on the rewrite
        job via ``df.observe`` (no separate count scan — see
        update_where). A full-table DELETE (cond None) counts the rows it
        removes with one scan (its change recording reads them anyway)."""
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        basev = self._version()
        if cond is None:
            cur = self.scan(self.spark, basev)
            n = cur.count()
            self._commit(
                cur.limit(0),
                changes=cur.withColumn("_change_type", F.lit("delete")),
                base=basev,
                op="DELETE",
            )
            return n
        split = self._cow_split(conjuncts, base=basev)
        if split is not None:
            rewrite, link = split
            vdir = self._data_dir(basev)
            base = self.scan(self.spark, basev)
            self.last_commit = {
                "mode": "cow",
                "files_linked": len(link),
                "files_rewritten": len(rewrite),
            }
            if not rewrite:
                # no file can hold a matching row: deleted count is
                # provably 0 (and an observed empty relation would lose
                # its CollectMetrics node to the optimizer)
                cur = base.limit(0)
                self._commit_cow(
                    cur,
                    link,
                    changes=cur.filter(cond).withColumn("_change_type", F.lit("delete")),
                    base=basev,
                    op="DELETE",
                )
                return 0
            cur = self._read_files(vdir, rewrite)
            obs = Observation()
            src = cur.observe(obs, F.sum(F.when(cond, 1).otherwise(0)).alias("n"))
            self._commit_cow(
                src.filter(~cond | cond.isNull()),
                link,
                changes=cur.filter(cond).withColumn("_change_type", F.lit("delete")),
                base=basev,
                op="DELETE",
            )
            return int(obs.get["n"] or 0)
        cur = self.scan(self.spark, basev)
        obs = Observation()
        src = cur.observe(obs, F.sum(F.when(cond, 1).otherwise(0)).alias("n"))
        self._commit(
            src.filter(~cond | cond.isNull()),
            changes=cur.filter(cond).withColumn("_change_type", F.lit("delete")),
            base=basev,
            op="DELETE",
        )
        return int(obs.get["n"] or 0)
