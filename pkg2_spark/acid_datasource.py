"""The ACID table format served through Spark 4's Python Data Source API.

``spark.dataSource.register(AcidDataSource)`` makes the commit-log format
a first-class ``spark.read.format("pkg2acid")`` source — the extensibility
surface a user reaches for when a format has no JVM connector: schema
resolution from the table LOG (not file footers), snapshot isolation and
time travel via ``option("version", N)``, one InputPartition per live
data file (distributed scan planning — a 100k-file table fans out to
100k tasks, never a driver-side read), and footer-stats FILE PRUNING
driven by Catalyst's pushed filters.

Pruning is planning-level only and therefore always correct:
``pushFilters`` keeps every filter as a RESIDUAL for Spark to re-apply
row-by-row, while recording the comparisons it can use to drop whole
files whose logged [min, max] range cannot match — exactly how
Table.read's merge pruning uses the same stats, and how Delta/Iceberg
data skipping composes with execution-time filtering.

Honest posture: the JVM parquet reader (``Table.read``) is the FAST path
for this format — whole-stage codegen, vectorized decode, no Python
workers. This source exists for the API surface (and is the template for
formats that genuinely have no JVM reader); its per-partition read path
ships Arrow RecordBatches (never per-row Python objects) harmonized to
the logged schema, so files written before a column evolved in surface
it as nulls, byte-compatible with Table.read's semantics.
"""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

from pkg2_spark.tableformat import _live_entries, latest_version, log_schema


def _nullable(dt):
    """A nullable-ized deep copy of a Spark type (see AcidDataSource.schema)."""
    from pyspark.sql.types import ArrayType, MapType, StructField, StructType

    if isinstance(dt, StructType):
        return StructType(
            [StructField(f.name, _nullable(f.dataType), True) for f in dt.fields]
        )
    if isinstance(dt, ArrayType):
        return ArrayType(_nullable(dt.elementType), True)
    if isinstance(dt, MapType):
        return MapType(_nullable(dt.keyType), _nullable(dt.valueType), True)
    return dt


class AcidFilePartition(InputPartition):
    def __init__(self, path: str, rows: int | None, dead: list | None = None):
        self.path = path
        self.rows = rows
        # deletion-vector row indexes for THIS file (merge-on-read
        # deletes) — resolved driver-side at planning from the folded DV
        # state, filtered executor-side by running row offset
        self.dead = dead


class AcidCdfInsertPartition(InputPartition):
    """One ADDED file of a create/append commit in change-feed mode —
    pure inserts, so the data path stays one distributed Arrow scan task
    per file (no diff needed)."""

    def __init__(self, path: str, version: int):
        self.path = path
        self.version = version


class AcidCdfDvPartition(InputPartition):
    """One DELETION-VECTOR commit in change-feed mode: carries the
    commit's dv sidecar paths plus the table root; the executor resolves
    the (file, row_index) positions back to full rows and emits them as
    delete images — merge-on-read deletes reach the feed without any
    data file having been rewritten."""

    def __init__(self, dv_paths: list, table_root: str, version: int):
        self.dv_paths = dv_paths
        self.table_root = table_root
        self.version = version


class AcidCdfDiffPartition(InputPartition):
    """One REWRITING commit (merge/delete/restore/compact) in change-feed
    mode: carries the commit's full add/remove file lists so the row-level
    insert/delete images can be derived executor-side by multiset
    cancellation — the same file-set-difference semantics as
    Table.changes (tableformat.py), which is the batch oracle.

    Each side reads under ITS version's deletion-vector state
    (add = post-commit, remove = pre-commit): a row merge-on-read-deleted
    BEFORE this commit is absent from the rewrite's output, and reading
    the removed file raw would re-emit it as a second delete image."""

    def __init__(
        self,
        add_paths: list,
        remove_paths: list,
        version: int,
        add_dead: dict | None = None,
        remove_dead: dict | None = None,
    ):
        self.add_paths = add_paths
        self.remove_paths = remove_paths
        self.version = version
        self.add_dead = add_dead or {}
        self.remove_dead = remove_dead or {}


def _stat_comparable(value, lo):
    """Convert a pushed-filter literal to the logged-stats domain, or None
    when the pair is not safely comparable (prune only on same-type
    comparisons; everything else stays un-pruned and Spark's residual
    filter does the work)."""
    if isinstance(value, bool) or isinstance(lo, bool):
        return None
    if isinstance(value, (int, float)) and isinstance(lo, (int, float)):
        return value
    if hasattr(value, "isoformat") and isinstance(lo, str):
        return value.isoformat()  # date/timestamp stats are logged ISO
    if isinstance(value, str) and isinstance(lo, str):
        return value
    return None


class AcidDataSourceReader(DataSourceReader):
    def __init__(self, schema, options):
        self.read_schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pkg2acid requires load(<table path>)")
        if str(options.get("change_feed", "")).lower() == "true":
            raise ValueError(
                "change_feed is a STREAMING option (readStream); for a "
                "batch change set use Table.changes(v_from, v_to)"
            )
        v = options.get("version")
        self.version = int(v) if v is not None else None
        self.pushed: list = []

    # -------------------------------------------------------- planning
    def pushFilters(self, filters):
        """Record single-column comparisons for file pruning; return ALL
        filters as residuals (pruning never substitutes for row-level
        evaluation, so a stats gap or type mismatch can only cost
        speed, never correctness)."""
        for f in filters:
            if isinstance(
                f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan,
                    LessThanOrEqual),
            ) and len(f.attribute) == 1:
                self.pushed.append(f)
            yield f

    def _file_matches(self, stats: dict) -> bool:
        for f in self.pushed:
            rng = stats.get(f.attribute[0])
            if not rng:
                continue  # no stats for this column: cannot prune
            lo, hi = rng
            v = _stat_comparable(f.value, lo)
            if v is None:
                continue
            if isinstance(f, EqualTo) and (v < lo or v > hi):
                return False
            if isinstance(f, GreaterThan) and hi <= v:
                return False
            if isinstance(f, GreaterThanOrEqual) and hi < v:
                return False
            if isinstance(f, LessThan) and lo >= v:
                return False
            if isinstance(f, LessThanOrEqual) and lo > v:
                return False
        return True

    def partitions(self):
        cut = (
            latest_version(self.path) if self.version is None else self.version
        )
        entries = _live_entries(self.path, cut)
        dead = _dv_rows_by_file(self.path, cut)
        parts = [
            AcidFilePartition(
                os.path.join(self.path, rel), e.get("rows"), dead.get(rel)
            )
            for rel, e in sorted(entries.items())
            if self._file_matches(e.get("stats") or {})
        ]
        # Spark requires at least one partition; a fully-pruned (or empty)
        # snapshot reads as zero rows through a no-op partition.
        return parts or [AcidFilePartition("", 0)]

    # ------------------------------------------------------- execution
    def read(self, partition: AcidFilePartition) -> Iterator:
        return _read_file_as_arrow(partition, self.read_schema)


def _dv_rows_by_file(path: str, cut: int | None) -> dict[str, list[int]]:
    """The folded DELETION-VECTOR rows at ``cut``, grouped per data file —
    driver-side planning metadata (the sidecars are small by the
    merge-on-read contract), attached to each file's InputPartition so
    the executor read skips deleted row indexes."""
    import pyarrow.parquet as pq

    from pkg2_spark.tableformat import dv_state

    out: dict[str, list[int]] = {}
    for e in dv_state(path, cut):
        t = pq.read_table(os.path.join(path, e["path"]), columns=["file", "ri"])
        for f, ri in zip(t.column("file").to_pylist(), t.column("ri").to_pylist()):
            out.setdefault(f, []).append(ri)
    return out


def _read_file_as_arrow(partition: AcidFilePartition, read_schema) -> Iterator:
    """Executor-side file read shared by the batch and stream readers:
    Arrow RecordBatches harmonized to the logged schema — files that
    predate an evolved column surface it as nulls, matching Table.read's
    pinned-log-schema semantics."""
    if not partition.path:
        return
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_schema

    target = to_arrow_schema(read_schema)
    # Peak-memory contract: stream the file ONE BATCH AT A TIME
    # (iter_batches caps a batch at a row group), harmonizing each batch
    # as it passes — a task holds one row group, never the whole file,
    # so a large data file costs the same task memory as a small one
    # (r13 verdict #4; matches the docstring's RecordBatch posture).
    pf = pq.ParquetFile(partition.path)
    present = set(pf.schema_arrow.names)
    read_cols = [f.name for f in target if f.name in present]
    dead = set(getattr(partition, "dead", None) or ())
    offset = 0
    for batch in pf.iter_batches(columns=read_cols or None):
        n = batch.num_rows
        if dead:
            keep = [i for i in range(n) if (offset + i) not in dead]
            offset += n
            if not keep:
                continue
            if len(keep) < n:
                batch = batch.take(pa.array(keep, pa.int32()))
        cols = []
        for field in target:
            if field.name in present:
                cols.append(batch.column(field.name).cast(field.type))
            else:
                cols.append(pa.nulls(batch.num_rows, field.type))
        yield pa.RecordBatch.from_arrays(cols, schema=target)


CDF_TYPE_COL = "change_type"
CDF_VERSION_COL = "_commit_version"


def _cdf_base_schema(read_schema):
    """The table schema under a change-feed read schema (the reader is
    handed the FULL CDF schema — base columns plus the two appended
    change columns; files on disk hold only the base columns)."""
    from pyspark.sql.types import StructType

    return StructType(
        [
            f
            for f in read_schema.fields
            if f.name not in (CDF_TYPE_COL, CDF_VERSION_COL)
        ]
    )


def _row_key(v):
    """Hashable canonical form of one row value for multiset diffing
    (lists/maps/structs arrive as Python lists/dicts off Arrow)."""
    if isinstance(v, list):
        return tuple(_row_key(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _row_key(x)) for k, x in v.items()))
    return v


def _cdf_diff_batches(partition: AcidCdfDiffPartition, read_schema):
    """Row-level change images for one rewriting commit, executor-side:
    read the commit's added and removed files (each harmonized to the
    logged base schema, one row-group batch at a time), cancel identical
    rows by MULTISET difference, and emit the survivors tagged
    insert/delete — exactly Table.changes' exceptAll semantics, so the
    batch change-set replay is the oracle. Rows re-added unchanged by a
    rewrite (merge's untouched rows in touched files, compaction's whole
    point) cancel to nothing.

    Memory posture: one task holds the commit's REWRITE REGION as row
    counters — the bounded merge/delete footprint (stats-pruned touched
    files), never table size; a compaction commit's region is larger but
    cancels to zero output. For bulk historical rewrites beyond task
    memory, replay that commit through batch Table.changes instead —
    the streamed feed targets the incremental tail."""
    from collections import Counter

    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import ArrayType, AtomicType

    base = _cdf_base_schema(read_schema)
    names = [f.name for f in base.fields]
    counts: Counter = Counter()
    rep: dict = {}

    # Fast path (r14, the hot loop of the whole diff): when every column
    # is a scalar or a list of scalars, a row's canonical key is just its
    # value tuple with lists tuplified — built by C-level map/zip and
    # counted by Counter.update/subtract (C iteration), no per-value
    # Python recursion. Temporal columns are cast to their integer epoch
    # representation BEFORE to_pydict (Arrow's python conversion builds a
    # tz-aware datetime per value — measured as ~2/3 of the fold) and cast
    # back losslessly at emit. The key then IS the representative
    # (pa.array accepts tuples for list types), so the rep dict
    # disappears. Measured 1.15 s → ~0.1 s for the merge-region diff at
    # sf0.1.
    def _tuplify(v):
        return None if v is None else tuple(v)

    def _col_conv(dt):
        if isinstance(dt, AtomicType):
            return None
        if isinstance(dt, ArrayType) and isinstance(dt.elementType, AtomicType):
            return _tuplify
        return _row_key  # nested struct/map: generic canonical walk

    convs = [_col_conv(f.dataType) for f in base.fields]
    fast = _row_key not in convs
    target = to_arrow_schema(read_schema)

    def _int_form(at):
        # lossless integer twin for temporal arrow types (epoch units)
        if pa.types.is_timestamp(at):
            return pa.int64()
        if pa.types.is_date32(at):
            return pa.int32()
        if pa.types.is_date64(at):
            return pa.int64()
        return None

    key_casts = [_int_form(target.field(i).type) if fast else None for i in range(len(names))]

    def fold(paths, sign, dead_by_path):
        for p in paths:
            part = AcidFilePartition(p, None, dead_by_path.get(p))
            for batch in _read_file_as_arrow(part, base):
                # columnar walk (to_pydict + zip), not per-row dicts
                if fast:
                    data = {
                        n: (
                            batch.column(i).cast(kc) if kc is not None else batch.column(i)
                        ).to_pylist()
                        for i, (n, kc) in enumerate(zip(names, key_casts))
                    }
                else:
                    data = batch.to_pydict()
                cols = [
                    list(map(conv, data[n])) if conv else data[n]
                    for n, conv in zip(names, convs)
                ]
                if fast:
                    if sign > 0:
                        counts.update(zip(*cols))
                    else:
                        counts.subtract(zip(*cols))
                else:
                    for vals, k in zip(
                        zip(*(data[n] for n in names)), zip(*cols)
                    ):
                        counts[k] += sign
                        if k not in rep:
                            rep[k] = vals

    fold(partition.add_paths, +1, partition.add_dead)
    fold(partition.remove_paths, -1, partition.remove_dead)
    if fast:
        rep = None

    def emit(rows):
        arrays = []
        for i in range(len(names)):
            ft = target.field(i).type
            vals = [r[0][i] for r in rows]
            if rep is None and key_casts[i] is not None:
                arrays.append(pa.array(vals, key_casts[i]).cast(ft))
            else:
                arrays.append(pa.array(vals, ft))
        arrays.append(pa.array([r[1] for r in rows], target.field(CDF_TYPE_COL).type))
        arrays.append(
            pa.array(
                [partition.version] * len(rows),
                target.field(CDF_VERSION_COL).type,
            )
        )
        return pa.RecordBatch.from_arrays(arrays, schema=target)

    out = []
    for k, c in counts.items():
        if c == 0:
            continue
        tagged = (k if rep is None else rep[k], "insert" if c > 0 else "delete")
        out.extend([tagged] * abs(c))
        if len(out) >= 65536:
            yield emit(out)
            out = []
    if out:
        yield emit(out)


def _cdf_dv_batches(partition: AcidCdfDvPartition, read_schema):
    """Delete images for one DV commit: read the sidecars' (file, ri)
    positions, then stream each referenced file batch-at-a-time taking
    exactly the dead rows. Cost ∝ referenced files' size for the read,
    sidecar size for the state — never the table."""
    from collections import defaultdict

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_schema

    base = _cdf_base_schema(read_schema)
    target = to_arrow_schema(read_schema)
    wanted: dict[str, set] = defaultdict(set)
    for dvp in partition.dv_paths:
        t = pq.read_table(dvp, columns=["file", "ri"])
        for f, ri in zip(t.column("file").to_pylist(), t.column("ri").to_pylist()):
            wanted[f].add(ri)
    for rel, idxs in sorted(wanted.items()):
        path = os.path.join(partition.table_root, rel)
        offset = 0
        for batch in _read_file_as_arrow(AcidFilePartition(path, None), base):
            n = batch.num_rows
            local = sorted(
                i - offset for i in idxs if offset <= i < offset + n
            )
            offset += n
            if not local:
                continue
            taken = batch.take(pa.array(local, pa.int32()))
            cols = list(taken.columns)
            cols.append(
                pa.array(["delete"] * len(local), target.field(CDF_TYPE_COL).type)
            )
            cols.append(
                pa.array(
                    [partition.version] * len(local),
                    target.field(CDF_VERSION_COL).type,
                )
            )
            yield pa.RecordBatch.from_arrays(cols, schema=target)


def _cdf_insert_batches(partition: AcidCdfInsertPartition, read_schema):
    """Change-feed rows for one ADDED file of an append/create commit:
    the file's rows pass through tagged insert — constant-column append
    on the streamed Arrow batches, no diff, no buffering."""
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema

    base = _cdf_base_schema(read_schema)
    target = to_arrow_schema(read_schema)
    for batch in _read_file_as_arrow(
        AcidFilePartition(partition.path, None), base
    ):
        n = batch.num_rows
        cols = list(batch.columns)
        cols.append(pa.array(["insert"] * n, target.field(CDF_TYPE_COL).type))
        cols.append(
            pa.array([partition.version] * n, target.field(CDF_VERSION_COL).type)
        )
        yield pa.RecordBatch.from_arrays(cols, schema=target)


class AcidStreamReader(DataSourceStreamReader):
    """CDC TAILING of the commit log — ``spark.readStream.format("pkg2acid")``
    turns the table's ordered versions into streaming offsets: each
    micro-batch reads exactly the files ADDED by the commits in
    (start.version, end.version], so every appended row is emitted
    exactly once (the checkpoint stores the version watermark — restart
    resumes from the committed offset, never re-emits). This is the
    Delta/Iceberg streaming-source design: the LOG is already an ordered
    change journal; tailing it needs no listener, no polling of data
    files, and no state beyond one integer.

    Append-only discipline: a merge/delete/restore commit REWRITES rows
    (its add-list re-adds old rows in new files), which an append-tail
    must not re-emit. Such commits raise by default; pass
    ``option("skip_change_commits", "true")`` to skip them (the Delta
    ``skipChangeCommits`` posture) when downstream tolerates missing
    the rewritten rows' new images.

    CHANGE FEED mode — ``option("change_feed", "true")`` (the Delta
    ``readChangeFeed`` surface): instead of raw appended rows, every
    commit emits ROW-LEVEL CHANGE IMAGES with two extra columns —
    ``change_type`` ('insert'/'delete'; an update under merge = delete
    of the old image + insert of the new) and ``_commit_version``.
    Appends/creates stream their files through tagged insert (still one
    task per file); rewriting commits derive their net images by
    multiset cancellation over the commit's add/remove file sets —
    byte-equal to batch ``Table.changes(v-1, v)`` replayed per commit,
    which is exactly the oracle q_stream_acid_cdf checks. This is what
    lets an incremental view (q_acid_ivm's dataflow) maintain itself
    from the stream: + on insert, - on delete, exactly once per commit.

    Scale shape: offset resolution is a driver-side O(new commits) log
    read per micro-batch; the data path is one task per added file on
    the executors (the same Arrow read as the batch source), plus one
    task per REWRITING commit holding that commit's bounded rewrite
    region (see _cdf_diff_batches)."""

    def __init__(self, schema, options):
        self.read_schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pkg2acid requires load(<table path>)")
        self.skip_change = (
            str(options.get("skip_change_commits", "")).lower() == "true"
        )
        self.change_feed = (
            str(options.get("change_feed", "")).lower() == "true"
        )
        # starting_version (the Delta startingVersion surface): begin the
        # tail AT commit N instead of the table's start — the handoff
        # point for "bootstrap from a snapshot, then tail the changes"
        # consumers (an index built on version N-1's content subscribes
        # from N). Only consulted for a FRESH checkpoint; a resumed query
        # keeps its committed offset.
        sv = options.get("starting_version")
        # clamped at 0: a negative start would walk the offset range into
        # nonexistent commit files
        self.starting_version = max(0, int(sv)) if sv is not None else 0

    def initialOffset(self) -> dict:
        return {"version": self.starting_version - 1}

    def latestOffset(self) -> dict:
        return {"version": latest_version(self.path)}

    def partitions(self, start: dict, end: dict):
        from pkg2_spark.tableformat import _read_commit

        parts: list[InputPartition] = []
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            rec = _read_commit(self.path, v)
            op = rec.get("op")
            if op in ("create", "append"):
                if self.change_feed:
                    parts.extend(
                        AcidCdfInsertPartition(
                            os.path.join(self.path, e["path"]), v
                        )
                        for e in rec.get("add", [])
                    )
                else:
                    parts.extend(
                        AcidFilePartition(
                            os.path.join(self.path, e["path"]), e.get("rows")
                        )
                        for e in rec.get("add", [])
                    )
            elif rec.get("add") or rec.get("remove") or rec.get("dv"):
                if self.change_feed:
                    if rec.get("add") or rec.get("remove"):
                        def _abs_dead(cut):
                            return {
                                os.path.join(self.path, rel): idxs
                                for rel, idxs in _dv_rows_by_file(
                                    self.path, cut
                                ).items()
                            }

                        parts.append(
                            AcidCdfDiffPartition(
                                [
                                    os.path.join(self.path, e["path"])
                                    for e in rec.get("add", [])
                                ],
                                [
                                    os.path.join(self.path, rel)
                                    for rel in rec.get("remove", [])
                                ],
                                v,
                                add_dead=_abs_dead(v),
                                remove_dead=_abs_dead(v - 1),
                            )
                        )
                    if rec.get("dv"):
                        parts.append(
                            AcidCdfDvPartition(
                                [
                                    os.path.join(self.path, e["path"])
                                    for e in rec["dv"]
                                ],
                                self.path,
                                v,
                            )
                        )
                elif not self.skip_change:
                    raise ValueError(
                        f"streaming tail of {self.path} hit a "
                        f"row-rewriting '{op}' commit at version {v}; set "
                        'option("skip_change_commits", "true") to skip '
                        "rewrites (their rows will not be re-emitted), or "
                        'option("change_feed", "true") to stream their '
                        "row-level insert/delete images"
                    )
        return parts or [AcidFilePartition("", 0)]

    def read(self, partition):
        if isinstance(partition, AcidCdfInsertPartition):
            return _cdf_insert_batches(partition, self.read_schema)
        if isinstance(partition, AcidCdfDiffPartition):
            return _cdf_diff_batches(partition, self.read_schema)
        if isinstance(partition, AcidCdfDvPartition):
            return _cdf_dv_batches(partition, self.read_schema)
        return _read_file_as_arrow(partition, self.read_schema)

    def commit(self, end: dict) -> None:
        pass  # offsets are durable in the log itself; nothing to reap


def _commit_schema_json(path: str, plan_schema_json: dict) -> dict:
    """The schema to RECORD for a commit that was planned under
    ``plan_schema_json`` but is landing NOW: re-read the current log
    schema and merge, instead of blindly recording the plan-time
    snapshot. A concurrent allow_schema_evolution append can land during
    the (potentially long) plan -> execute -> commit window; recording
    the stale plan-time schema would silently REVERT that evolution in
    the log_schema fold (the fold resolves to the latest schema record —
    r13 advice). Merge rules mirror append's: the evolved current schema
    wins for every column it has (types must agree with the plan's, else
    the table was retyped under us — refuse loudly), and columns only
    the plan has (this writer's own validated evolution) append after.
    Call INSIDE the commit retry loop — each attempt re-reads the log."""
    from pyspark.sql.types import StructField, StructType

    current = log_schema(path)
    if current is None:
        return plan_schema_json
    plan = StructType.fromJson(plan_schema_json)
    plan_by_name = {f.name: f for f in plan.fields}
    retyped = sorted(
        f.name
        for f in current.fields
        if f.name in plan_by_name and plan_by_name[f.name].dataType != f.dataType
    )
    if retyped:
        raise ValueError(
            f"append to {path} hit concurrent schema drift: columns "
            f"{retyped} were retyped between plan time and commit time"
        )
    merged = list(current.fields) + [
        StructField(f.name, f.dataType, True)
        for f in plan.fields
        if f.name not in {c.name for c in current.fields}
    ]
    return StructType(merged).jsonValue()


class AcidCommitMessage(WriterCommitMessage):
    def __init__(self, rel: str | None, rows: int):
        self.rel = rel
        self.rows = rows


class AcidDataSourceWriter(DataSourceArrowWriter):
    """Distributed APPEND through the Python Data Source write protocol —
    the two-phase commit shape every table format uses: each task writes
    its partition to an immutable file under the table's data dir and
    returns a commit message (path + row count); the DRIVER then folds
    all messages into ONE atomic log commit (O_EXCL, loser-retry — the
    same protocol Table.append uses, so Python-API writers and JVM
    writers serialize against each other correctly). Files from aborted
    or failed attempts are never referenced by the log and stay
    invisible to readers (the format's orphan posture).

    Schema is enforced at PLAN time against the log (same rules as
    Table.append: evolution may only ADD columns, and only with
    option("allow_schema_evolution", "true")); per-file min/max stats
    for the table's tracked columns are computed at commit from the
    written footers, so stats-pruned reads keep working across writers.
    """

    def __init__(self, schema, options, overwrite: bool):
        if overwrite:
            raise ValueError(
                "pkg2acid is append-only through the DataFrame writer; "
                "use Table.restore/delete_where/merge for rewrites"
            )
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pkg2acid requires save(<table path>)")
        current = log_schema(self.path)
        self.schema_json = schema.jsonValue()
        if current is not None:
            cur = {f.name: f.dataType for f in current.fields}
            new = {f.name: f.dataType for f in schema.fields}
            dropped = sorted(set(cur) - set(new))
            added = sorted(set(new) - set(cur))
            retyped = sorted(n for n in set(cur) & set(new) if cur[n] != new[n])
            if dropped or retyped:
                raise ValueError(
                    f"append to {self.path} is schema-incompatible: "
                    f"dropped={dropped} retyped={retyped} (evolution may "
                    "only ADD columns)"
                )
            if added and str(options.get("allow_schema_evolution", "")).lower() != "true":
                raise ValueError(
                    f"append to {self.path} adds columns {added}; set "
                    'option("allow_schema_evolution", "true") to evolve'
                )
        # Stats continuity: track whatever columns the live log already
        # carries stats for (no session, no Table object needed).
        head = latest_version(self.path)
        self.stats_cols = sorted(
            {
                k
                for e in _live_entries(self.path, head).values()
                for k in (e.get("stats") or {})
            }
        )
        import uuid

        self.commit_dir = os.path.join("data", f"pyds-{uuid.uuid4().hex[:12]}")

    # Runs on EXECUTORS (self is pickled there): stream the task's Arrow
    # batches into one parquet file; empty tasks write nothing.
    def write(self, iterator) -> AcidCommitMessage:
        import uuid

        import pyarrow.parquet as pq

        full_dir = os.path.join(self.path, self.commit_dir)
        rel = os.path.join(self.commit_dir, f"part-{uuid.uuid4().hex}.parquet")
        full = os.path.join(self.path, rel)
        writer = None
        rows = 0
        try:
            for batch in iterator:
                if writer is None:
                    os.makedirs(full_dir, exist_ok=True)
                    writer = pq.ParquetWriter(full, batch.schema)
                writer.write_batch(batch)
                rows += batch.num_rows
        finally:
            if writer is not None:
                writer.close()
        return AcidCommitMessage(rel if writer is not None else None, rows)

    # Runs on the DRIVER: one atomic log commit for the whole job.
    def commit(self, messages) -> None:
        from pkg2_spark.tableformat import (
            ConcurrentCommitError,
            _commit,
            _file_stats,
        )

        written = [m for m in messages if m is not None and m.rel]
        metas = _file_stats(
            [os.path.join(self.path, m.rel) for m in written], self.stats_cols
        )
        add = [
            {"path": m.rel, "rows": meta["rows"], "stats": meta["stats"]}
            for m, meta in zip(written, metas)
        ]
        for _ in range(20):
            v = latest_version(self.path) + 1
            try:
                _commit(
                    self.path, v, "append", add, [],
                    meta={"writer": "pkg2acid-python-datasource"},
                    # Re-resolved per attempt: a concurrent evolution
                    # landing in the plan->commit window must survive
                    # into the recorded schema, not be reverted by the
                    # stale plan-time snapshot.
                    schema=_commit_schema_json(self.path, self.schema_json),
                )
                return
            except ConcurrentCommitError:
                continue
        raise ConcurrentCommitError(
            f"pkg2acid append to {self.path} kept losing commit races"
        )

    def abort(self, messages) -> None:
        # Written files are unreferenced by the log — readers never see
        # them. Best-effort cleanup of this attempt's directory.
        import shutil

        shutil.rmtree(os.path.join(self.path, self.commit_dir), ignore_errors=True)


class AcidStreamWriter(DataSourceStreamArrowWriter):
    """EXACTLY-ONCE streaming sink — ``df.writeStream.format("pkg2acid")``.
    Tasks write per-epoch files exactly like the batch writer; the
    driver's per-epoch commit records the epoch's ``batchId`` in the
    commit meta and SKIPS epochs already in the log — the same ledger
    Table.append_batch keeps (shared meta key, so foreachBatch sinks and
    this sink dedup against each other), which upgrades Structured
    Streaming's at-least-once epoch delivery to exactly-once across
    restarts: a crash between file write and log commit replays
    harmlessly (the orphan files are never referenced)."""

    def __init__(self, schema, options, overwrite: bool):
        if overwrite:
            raise ValueError(
                "pkg2acid streaming sink is append-only (outputMode append)"
            )
        self._w = AcidDataSourceWriter(schema, options, overwrite=False)

    def write(self, iterator) -> AcidCommitMessage:
        return self._w.write(iterator)

    def commit(self, messages, batchId: int) -> None:
        from pkg2_spark.tableformat import (
            ConcurrentCommitError,
            _commit,
            _file_stats,
            _read_commit,
            _versions,
        )

        w = self._w
        written = [m for m in messages if m is not None and m.rel]
        metas = _file_stats(
            [os.path.join(w.path, m.rel) for m in written], w.stats_cols
        )
        add = [
            {"path": m.rel, "rows": meta["rows"], "stats": meta["stats"]}
            for m, meta in zip(written, metas)
        ]
        for _ in range(20):
            seen = {
                _read_commit(w.path, v).get("meta", {}).get("batchId")
                for v in _versions(w.path)
            }
            if batchId in seen:
                return  # epoch already landed: exactly-once skip
            v = latest_version(w.path) + 1
            try:
                _commit(
                    w.path, v, "append", add, [],
                    meta={
                        "writer": "pkg2acid-python-datasource",
                        "batchId": batchId,
                    },
                    # Same drift rule as the batch writer: merge against
                    # the log's CURRENT schema per attempt.
                    schema=_commit_schema_json(w.path, w.schema_json),
                )
                return
            except ConcurrentCommitError:
                continue  # refold: maybe the winner WAS this epoch
        raise ConcurrentCommitError(
            f"pkg2acid stream append to {w.path} kept losing commit races"
        )

    def abort(self, messages, batchId: int) -> None:
        self._w.abort(messages)


class AcidDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "pkg2acid"

    def schema(self):
        sch = log_schema(
            self.options.get("path"),
            int(self.options["version"]) if self.options.get("version") is not None else None,
        )
        if sch is None:
            raise ValueError(
                "table log predates schema recording; pass an explicit "
                ".schema(...) to read it through pkg2acid"
            )
        # Reader posture: every column is declared NULLABLE. A column
        # added by schema evolution may be logged non-nullable (the
        # writer's frame was), but files written before it existed read
        # it as null — a non-null declaration would let codegen NPE on
        # exactly those rows.
        sch = _nullable(sch)
        if str(self.options.get("change_feed", "")).lower() == "true":
            from pyspark.sql.types import LongType, StringType, StructField

            sch = sch.add(StructField(CDF_TYPE_COL, StringType(), True)).add(
                StructField(CDF_VERSION_COL, LongType(), True)
            )
        return sch

    def reader(self, schema) -> AcidDataSourceReader:
        return AcidDataSourceReader(schema, self.options)

    def writer(self, schema, overwrite: bool) -> AcidDataSourceWriter:
        return AcidDataSourceWriter(schema, self.options, overwrite)

    def streamReader(self, schema) -> AcidStreamReader:
        return AcidStreamReader(schema, self.options)

    def streamWriter(self, schema, overwrite: bool) -> AcidStreamWriter:
        return AcidStreamWriter(schema, self.options, overwrite)


def register_acid_source(spark) -> None:
    """Idempotent registration of the pkg2acid format on a session.
    Python-source filter pushdown is opt-in in Spark 4.1 (readers that
    implement pushFilters fail fast without it) — enable it alongside."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(AcidDataSource)
