"""Streaming change-data-feed source over a versioned parquet sink.

Exposes a :class:`~qlbridge_spark.sinks.ParquetMergeSink` warehouse as a
real Structured Streaming source (``spark.readStream.format(
"qlb_table_changes")``) via PySpark's Python Data Source API — the
streaming counterpart of the engine's batch ``FROM TABLE_CHANGES('t',
...)`` and the parity point for Delta's ``readChangeFeed`` stream
(reference: qlbridge has no streaming CDF; this is Spark-native surface
layered on the sink's Delta-``_change_data``-style commit recordings).

Scale design:

- **Offsets are sink versions** (``{"version": N}`` = all commits <= N
  processed). ``latestOffset`` is ONE driver-side pointer-file read; no
  data is touched until a micro-batch is planned, and Spark's
  checkpoint makes consumption exactly-once across restarts.
- **Partitions are change FILES.** Each commit in ``(start, end]``
  contributes one input partition per recorded parquet file (``c<N>``
  dirs written at commit time), so a micro-batch reads O(|changes|)
  bytes, fanned across executors — never a snapshot diff, never a
  driver collect. Bulk-load commits (``_ALL_INSERT`` marker) map to the
  snapshot's own files with a constant ``insert`` tag; layout-only
  commits (``_NO_CHANGES``, e.g. OPTIMIZE) contribute nothing.
- **Executor reads are Arrow.** ``read()`` opens its one parquet file
  with pyarrow and yields RecordBatches cast to the expected Arrow
  schema — vectorized transfer, no per-row Python.
- **Unrecorded commits fail loudly.** ``merge_upsert``/``overwrite``/
  ``restore`` commits and recordings vacuumed past the checkpoint lag
  have no O(|changes|) representation; streaming raises instead of
  silently skipping or falling back to an O(table) diff inside a
  micro-batch (commit 0 without a recording is the documented
  exception: it IS the initial bulk insert, batch-CDF parity).

Output schema = base columns + ``_change_type`` / ``_commit_version`` /
``_commit_timestamp`` — identical to batch ``TABLE_CHANGES`` so a
pipeline can switch between batch backfill and streaming tail without
rewriting a projection.
"""

from __future__ import annotations

import dataclasses
import json
import os

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

FORMAT_NAME = "qlb_table_changes"
META_COLS = ("_change_type", "_commit_version", "_commit_timestamp")


@dataclasses.dataclass(frozen=True)
class ChangeFilePartition(InputPartition):
    """A batch of change-set parquet files forming ONE input partition.

    ``items`` is a tuple of ``(file, version, change_type, commit_ts,
    root)`` tuples: ``change_type`` is None when the file already carries
    a ``_change_type`` column (a recorded ``c<N>`` file) and the constant
    tag to apply otherwise (an ``_ALL_INSERT`` / commit-0 snapshot file);
    ``commit_ts`` is the ISO commit timestamp (may be None); ``root`` is
    the snapshot dir the file lives under when it is a hive-partitioned
    data file — partition-column values are derived from the
    ``col=value`` path components relative to it (hive data files don't
    store partition columns). Tiny files from many small CDC commits are
    packed together (size-bounded) so a micro-batch costs O(partitions
    worth of bytes), not one Python worker task per 4 KB file."""

    items: tuple


def _read_pointer(path: str) -> int:
    try:
        with open(os.path.join(path, "_VERSION")) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return -1


def _load_commit_times(path: str) -> dict[int, str]:
    try:
        with open(os.path.join(path, "_commits")) as f:
            raw = json.load(f)
        return {int(k): v for k, v in raw.items()}
    except (OSError, ValueError):
        return {}


def _parquet_files(d: str) -> list[str]:
    """Recursive: hive-partitioned snapshots keep data files under
    ``col=value`` subdirectories."""
    out = []
    for root, _, names in os.walk(d):
        for n in names:
            if n.endswith(".parquet") and not n.startswith((".", "_")):
                out.append(os.path.join(root, n))
    return sorted(out)


def _partition_path_values(file: str, root: str) -> dict[str, str | None]:
    """Lower-cased hive partition column → decoded string value (None for
    ``__HIVE_DEFAULT_PARTITION__``) from the ``col=value`` components of
    ``file``'s path under ``root``."""
    import urllib.parse

    out: dict[str, str | None] = {}
    rel = os.path.relpath(file, root)
    for comp in rel.split(os.sep)[:-1]:
        if "=" not in comp:
            continue
        k, _, raw = comp.partition("=")
        out[k.lower()] = (
            None if raw == "__HIVE_DEFAULT_PARTITION__" else urllib.parse.unquote(raw)
        )
    return out


#: pack change files into input partitions up to this many bytes — many
#: small CDC commits otherwise cost one Python-worker task per tiny file
_PACK_BYTES = 32 << 20


class TableChangesStreamReader(DataSourceStreamReader):
    def __init__(self, schema, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError(f"format {FORMAT_NAME!r} requires .option('path', <sink root>)")
        self.schema = schema  # full CDF schema (base + meta cols)
        self.starting = str(options.get("startingversion", "0"))
        # Spark→Arrow schema conversion happens HERE, on the driver: the
        # converter lives in pyspark.sql.pandas.types, whose import drags
        # pandas into the process — paid once per micro-batch in a fresh
        # executor Python worker if left inside read() (profiled: the
        # dominant share of the per-batch consume floor). pa.Schema
        # pickles with the reader, so workers get it for free.
        from pyspark.sql.pandas.types import to_arrow_schema

        self._arrow_schema = to_arrow_schema(schema)

    # -- offsets (driver-side, metadata-only) ---------------------------
    def initialOffset(self) -> dict:
        cur = _read_pointer(self.path)
        if self.starting.lower() == "latest":
            return {"version": cur}
        start = int(self.starting)
        if start < 0:
            raise ValueError(f"startingVersion must be >= 0 or 'latest', got {start}")
        return {"version": start - 1}

    def latestOffset(self) -> dict:
        return {"version": max(_read_pointer(self.path), -1)}

    # -- micro-batch planning (driver-side, file listing only) ----------
    def partitions(self, start: dict, end: dict):
        v_from, v_to = int(start["version"]) + 1, int(end["version"])
        commit_ts = _load_commit_times(self.path) if v_from <= v_to else {}
        items: list[tuple] = []  # (file, version, tag, ts, root)
        for v in range(v_from, v_to + 1):
            ts = commit_ts.get(v)
            cdir = os.path.join(self.path, f"c{v}")
            vdir = os.path.join(self.path, f"v{v}")
            if os.path.isdir(cdir):
                if os.path.exists(os.path.join(cdir, "_NO_CHANGES")):
                    continue
                if os.path.exists(os.path.join(cdir, "_ALL_INSERT")):
                    # snapshot data files — hive-partitioned layouts keep
                    # them under col=value dirs; root lets read() inject
                    # the partition-column values the files don't store
                    files, tag, root = _parquet_files(vdir), "insert", vdir
                elif os.path.exists(os.path.join(cdir, "_OVERWRITE")):
                    # replace commit: delete-all of v-1 + insert-all of v
                    # (Delta CDF-for-overwrite semantics); needs the
                    # previous snapshot still on disk for the preimages
                    pdir = os.path.join(self.path, f"v{v - 1}")
                    if not os.path.isdir(pdir):
                        raise RuntimeError(
                            f"streaming TABLE_CHANGES: commit {v} of {self.path} is an "
                            "overwrite whose previous snapshot was vacuumed; consume "
                            "via batch TABLE_CHANGES or re-seed the stream."
                        )
                    items.extend(
                        (f, v, "delete", ts, pdir) for f in _parquet_files(pdir)
                    )
                    files, tag, root = _parquet_files(vdir), "insert", vdir
                else:
                    files, tag, root = _parquet_files(cdir), None, None
                    if not files:  # torn recording
                        raise RuntimeError(
                            f"streaming TABLE_CHANGES: commit {v} of {self.path} has a torn "
                            "change recording; re-record or consume via batch TABLE_CHANGES "
                            "(snapshot-diff fallback)"
                        )
            elif v == 0 and os.path.isdir(vdir):
                # batch-CDF parity: commit 0 IS the initial bulk insert
                files, tag, root = _parquet_files(vdir), "insert", vdir
            else:
                raise RuntimeError(
                    f"streaming TABLE_CHANGES: commit {v} of {self.path} has no change "
                    "recording (merge_upsert/overwrite/restore commit, pre-recording "
                    "warehouse, or recording vacuumed past this stream's checkpoint "
                    "lag). Streaming reads are O(|changes|) by design — consume "
                    "unrecorded commits via batch TABLE_CHANGES, or re-seed the "
                    "stream from a newer startingVersion."
                )
            items.extend((f, v, tag, ts, root) for f in files)
        # pack tiny files into few partitions (size-bounded, order kept):
        # a 20-commit CDC backlog of 4 KB recordings becomes ONE task,
        # not 20 planner round-trips' worth of Python workers
        parts: list[ChangeFilePartition] = []
        batch: list[tuple] = []
        batch_bytes = 0
        for it in items:
            try:
                sz = os.path.getsize(it[0])
            except OSError:
                sz = _PACK_BYTES  # unknown size → its own partition
            if batch and batch_bytes + sz > _PACK_BYTES:
                parts.append(ChangeFilePartition(tuple(batch)))
                batch, batch_bytes = [], 0
            batch.append(it)
            batch_bytes += sz
        if batch:
            parts.append(ChangeFilePartition(tuple(batch)))
        return parts or [ChangeFilePartition(())]  # empty batch sentinel

    # -- executor-side read (Arrow-vectorized) --------------------------
    def read(self, partition: ChangeFilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        target = self._arrow_schema
        for file, version, change_type, commit_ts, root in partition.items:
            tbl = pq.read_table(file)
            n = tbl.num_rows
            cols = {name.lower(): col for name, col in zip(tbl.column_names, tbl.itercolumns())}
            pvals = _partition_path_values(file, root) if root else {}
            ts = None
            if commit_ts is not None:
                import datetime

                ts = datetime.datetime.fromisoformat(commit_ts)
            arrays = []
            for field in target:
                lname = field.name.lower()
                if lname == "_change_type" and change_type is not None:
                    arr = pa.array([change_type] * n, type=pa.string())
                elif lname == "_commit_version":
                    arr = pa.array([version] * n, type=pa.int64())
                elif lname == "_commit_timestamp":
                    arr = pa.array([ts] * n).cast(field.type)
                elif lname in cols:
                    arr = cols[lname]
                elif lname in pvals:
                    # hive partition column: constant across the file,
                    # value decoded from the col=value path component
                    raw = pvals[lname]
                    if raw is None:
                        arr = pa.nulls(n, type=field.type)
                    elif pa.types.is_boolean(field.type):
                        arr = pa.array([raw.lower() == "true"] * n, type=pa.bool_())
                    else:
                        try:
                            arr = pa.array([raw] * n, type=pa.string()).cast(field.type)
                        except pa.ArrowInvalid as e:
                            raise RuntimeError(
                                f"streaming TABLE_CHANGES: partition value {raw!r} of "
                                f"{field.name!r} in {file} does not cast to {field.type}"
                            ) from e
                else:
                    raise RuntimeError(
                        f"streaming TABLE_CHANGES: change file {file} lacks column "
                        f"{field.name!r} (schema drift between recording and current snapshot)"
                    )
                arrays.append(arr)
            out = pa.Table.from_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in arrays],
                names=[f.name for f in target],
            ).cast(target)
            yield from out.to_batches()

    def commit(self, end: dict) -> None:
        pass  # checkpointing is Spark's; recordings are vacuumed by the sink


class TableChangesDataSource(DataSource):
    """``spark.readStream.format("qlb_table_changes").schema(cdf_schema)
    .option("path", sink_root)[.option("startingVersion", n|'latest')]``.

    The engine front door is :meth:`qlbridge_spark.engine.Engine.
    stream_changes`, which registers this source, computes the CDF schema
    from the sink, and returns the streaming DataFrame."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        # standalone use (no engine): derive base schema from the current
        # snapshot's parquet footer, driver-side metadata read only
        path = self.options.get("path")
        if not path:
            raise ValueError(f"format {FORMAT_NAME!r} requires .option('path', <sink root>)")
        cur = _read_pointer(path)
        if cur < 0:
            raise ValueError(f"{path} has no committed version to infer a schema from")
        from pyspark.sql.types import LongType, StringType, StructType, TimestampType

        vdir = os.path.join(path, f"v{cur}")
        # sidecar first: it carries the COMMITTED Spark schema, including
        # hive partition columns the data files themselves don't store
        base = None
        try:
            with open(os.path.join(vdir, "_stats.json")) as f:
                sj = json.load(f).get("schema")
            if sj:
                base = StructType.fromJson(json.loads(sj))
        except (OSError, ValueError):
            base = None
        if base is None:
            import pyarrow.parquet as pq

            from pyspark.sql.pandas.types import from_arrow_schema

            files = _parquet_files(vdir)
            if not files:
                raise ValueError(f"{path}/v{cur} holds no parquet files")
            base = from_arrow_schema(pq.read_schema(files[0]))
        return (
            base.add("_change_type", StringType())
            .add("_commit_version", LongType())
            .add("_commit_timestamp", TimestampType())
        )

    def streamReader(self, schema):
        return TableChangesStreamReader(schema, self.options)


def register(spark) -> None:
    """Idempotently register the format with this session."""
    if not getattr(spark, "_qlb_cdf_registered", False):
        spark.dataSource.register(TableChangesDataSource)
        spark._qlb_cdf_registered = True
