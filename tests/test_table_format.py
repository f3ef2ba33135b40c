"""ACID table format (pkg2_spark/tableformat.py): commit protocol,
snapshot isolation / time travel, stats-pruned merge, file-pruned CDC,
delete, vacuum. The registered q_acid_* queries cover the oracle-checked
dataflows; these tests pin the PROTOCOL properties no SQL oracle can see
(atomicity of the exclusive-create commit, pruning actually happening,
orphan invisibility, vacuum scope)."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest

from pkg2_spark.tableformat import (
    ConcurrentCommitError,
    Table,
    _commit,
    latest_version,
    snapshot_files,
)


def _mk(spark, lo, hi, tag="a"):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).alias("val"), F.lit(tag).alias("tag")
    )


@pytest.fixture()
def table(spark, tmp_path):
    # num_files pinned: AQE would coalesce this tiny table to ONE file and
    # the pruning assertions would have nothing to skip.
    t = Table(
        spark, str(tmp_path / "t"), stats_cols=["id"], cluster_by="id",
        num_files=8,
    )
    t.create(_mk(spark, 0, 1000))
    return t


def test_create_append_time_travel(spark, table):
    assert latest_version(table.path) == 0
    table.append(_mk(spark, 1000, 1500, tag="b"))
    assert latest_version(table.path) == 1
    assert table.read(version=0).count() == 1000
    assert table.read(version=1).count() == 1500
    assert table.read().count() == 1500
    ops = [c["op"] for c in table.history()]
    assert ops == ["create", "append"]
    with pytest.raises(ValueError):
        table.read(version=7)
    with pytest.raises(FileExistsError):
        table.create(_mk(spark, 0, 1))


def test_exclusive_create_commit_is_atomic(spark, table):
    # Two writers racing to the same version: exactly one exclusive
    # create wins; the loser gets ConcurrentCommitError and must refold.
    _commit(table.path, 1, "append", add=[], remove=[])
    with pytest.raises(ConcurrentCommitError):
        _commit(table.path, 1, "append", add=[], remove=[])
    # The retry loop in append() refolds and lands on the NEXT version.
    v = table.append(_mk(spark, 1000, 1001))
    assert v == 2
    assert table.read().count() == 1001


def test_uncommitted_data_is_invisible(spark, table):
    # A writer that wrote data files but died before its commit: readers
    # fold the log, never list data/, so the orphan dir is invisible.
    orphan = os.path.join(table.path, "data", "v9-deadbeef")
    _mk(spark, 5000, 6000).write.parquet(orphan)
    assert table.read().count() == 1000
    assert not any("deadbeef" in f for f in snapshot_files(table.path))


def test_merge_prunes_by_footer_stats(spark, table):
    # Range-clustered layout: updating a narrow key range must rewrite
    # only the files whose [min, max] intersects it — the rest carry
    # over BY REFERENCE (same file paths before and after).
    before = set(snapshot_files(table.path))
    upd = spark.range(10, 21).select(
        F.col("id"), F.lit(-1).cast("long").alias("val"), F.lit("u").alias("tag")
    )
    v = table.merge(upd, key="id")
    meta = table.history()[-1]["meta"]
    assert meta["rewritten_files"] >= 1
    assert meta["pruned_files"] >= 1, "stats pruning never engaged"
    after = set(snapshot_files(table.path, v))
    carried = before & after
    assert len(carried) == meta["pruned_files"]
    got = {r["id"]: r["val"] for r in table.read().collect()}
    assert len(got) == 1000
    assert all(got[i] == -1 for i in range(10, 21))
    assert got[500] == 1000 and got[0] == 0


def test_merge_inserts_new_keys(spark, table):
    upd = spark.range(995, 1005).select(
        F.col("id"), F.lit(7).cast("long").alias("val"), F.lit("u").alias("tag")
    )
    table.merge(upd, key="id")
    got = {r["id"]: r["val"] for r in table.read().collect()}
    assert len(got) == 1005
    assert got[994] == 1988 and got[995] == 7 and got[1004] == 7
    # Pure inserts (every key above every existing file) must rewrite
    # NOTHING — the findTouchedFiles join, not the raw stats bounds,
    # decides what is touched.
    pure = spark.range(5000, 5010).select(
        F.col("id"), F.lit(1).cast("long").alias("val"), F.lit("i").alias("tag")
    )
    table.merge(pure, key="id")
    meta = table.history()[-1]["meta"]
    assert meta["rewritten_files"] == 0
    assert table.read().count() == 1015


def test_changes_reads_only_differing_files(spark, table):
    table.append(_mk(spark, 1000, 1200, tag="b"))
    ch = table.changes(0, 1)
    rows = ch.collect()
    assert len(rows) == 200
    assert all(r["change_type"] == "insert" for r in rows)
    # merge: updated keys = delete(old) + insert(new); empty diff = empty
    upd = spark.range(0, 5).select(
        F.col("id"), F.lit(-9).cast("long").alias("val"), F.lit("u").alias("tag")
    )
    v = table.merge(upd, key="id")
    by_type = {
        (r["change_type"], r["id"]): r["val"] for r in table.changes(1, v).collect()
    }
    assert all(by_type[("insert", i)] == -9 for i in range(5))
    assert all(by_type[("delete", i)] == 2 * i for i in range(5))
    assert table.changes(v, v).count() == 0


def test_delete_where_and_vacuum(spark, table):
    table.delete_where("id >= 500")
    assert table.read().count() == 500
    assert table.read(version=0).count() == 1000  # time travel still intact
    victims = table.vacuum(keep_versions=1)
    assert victims, "vacuum removed nothing although v0 files were dropped"
    assert table.read().count() == 500  # latest snapshot untouched
    for f in victims:
        assert not os.path.exists(f)
    # time travel past the retention window fails EAGERLY and says why
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        table.read(version=0)
    # log entries survive vacuum (history is metadata), only data died
    assert [c["op"] for c in table.history()] == ["create", "delete"]


def test_stats_recorded_in_log(spark, table):
    # The commit log carries per-file [min, max] for stats_cols — the
    # data-skipping metadata merge() prunes with.
    with open(
        os.path.join(table.path, "_log", f"{0:020d}.json")
    ) as f:
        rec = json.load(f)
    assert rec["add"], "create committed no files"
    nonempty = [e for e in rec["add"] if e["rows"] > 0]
    assert nonempty
    for entry in nonempty:
        lo, hi = entry["stats"]["id"]
        assert 0 <= lo <= hi <= 999
    # range clustering => files cover near-disjoint ranges: total span
    # across files ~ n, not files * n
    spans = sorted((e["stats"]["id"][0], e["stats"]["id"][1]) for e in nonempty)
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, "range-clustered files must not interleave"


def test_compact_is_logical_noop(spark, table):
    table.append(_mk(spark, 1000, 1300, tag="b"))
    files_before = len(snapshot_files(table.path))
    v = table.compact(max_files=2)
    assert table.history()[-1]["op"] == "compact"
    assert table.history()[-1]["meta"]["compacted_files"] == files_before
    assert len(snapshot_files(table.path)) <= 2
    # logical no-op: the file-pruned CDC across the compact commit is empty
    assert table.changes(v - 1, v).count() == 0
    assert table.read().count() == 1300
    # and time travel across it still works
    assert table.read(version=0).count() == 1000


def test_append_batch_ledger_is_exactly_once(spark, tmp_path):
    t = Table(spark, str(tmp_path / "s"))
    b0 = _mk(spark, 0, 100)
    b1 = _mk(spark, 100, 150, tag="b")
    assert t.append_batch(b0, 0) == 0
    assert t.append_batch(b1, 1) == 1
    # at-least-once redelivery (restart replay): the ledger refuses both
    assert t.append_batch(b0, 0) is None
    assert t.append_batch(b1, 1) is None
    assert t.read().count() == 150
    assert t.committed_batch_ids() == {0, 1}
    # a NEW batch id still lands
    assert t.append_batch(_mk(spark, 150, 160, tag="c"), 2) == 2
    assert t.read().count() == 160


def test_schema_enforcement_and_evolution(spark, table):
    # Enforcement: silently dropping or retyping a column is refused.
    with pytest.raises(ValueError, match="dropped"):
        table.append(spark.range(5).select("id", (F.col("id") * 2).alias("val")))
    with pytest.raises(ValueError, match="retyped"):
        table.append(
            spark.range(5).select(
                "id",
                F.col("id").cast("string").alias("val"),
                F.lit("a").alias("tag"),
            )
        )
    # Adding a column needs the explicit evolution flag...
    widened = _mk(spark, 2000, 2010).withColumn("extra", F.lit(9).cast("long"))
    with pytest.raises(ValueError, match="allow_schema_evolution"):
        table.append(widened)
    v1 = table.append(widened, allow_schema_evolution=True)
    # ...after which the LOG owns the union schema: pre-evolution files
    # surface the new column as null, and time travel reads the version's
    # OWN schema (v0 has no 'extra').
    latest = table.read()
    assert "extra" in latest.columns
    vals = {r["id"]: r["extra"] for r in latest.collect()}
    assert vals[2005] == 9 and vals[5] is None
    assert "extra" not in table.read(version=0).columns
    # CDC across the evolution commit aligns both sides under the new
    # schema (old side reads 'extra' as null) instead of failing.
    ch = table.changes(0, v1).collect()
    assert len(ch) == 10 and all(r["extra"] == 9 for r in ch)


def test_concurrent_writers_race_safely(spark, tmp_path):
    # Four threads race 3 appends each through the REAL protocol (no
    # mocks): every commit must land exactly once, versions must be the
    # contiguous fold 0..12, and the final snapshot must hold every row.
    import threading

    t = Table(spark, str(tmp_path / "race"), max_retries=50)
    t.create(_mk(spark, 0, 10))
    errs = []

    def writer(i):
        try:
            for j in range(3):
                lo = 1000 * (i + 1) + 10 * j
                t.append(_mk(spark, lo, lo + 10, tag=f"w{i}"))
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    hist = t.history()
    assert [c["version"] for c in hist] == list(range(13))
    assert sum(c["op"] == "append" for c in hist) == 12
    assert t.read().count() == 10 + 12 * 10


def test_streaming_restart_resumes_exactly_once(spark, tmp_path):
    # A REAL restart: run an availableNow stream into the ACID sink, add
    # more source files, run AGAIN with the SAME checkpoint — only the
    # new files land, each epoch exactly once, and the final table equals
    # the full source with no duplicates. This pins the interplay the
    # registered query can't: Spark's checkpoint advances the source
    # offsets across runs while the batchId ledger guards replays within
    # and across them.
    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    t = Table(spark, str(tmp_path / "sink"))

    def land(lo, hi, name):
        _mk(spark, lo, hi).coalesce(1).write.mode("overwrite").parquet(
            str(src / name)
        )

    land(0, 100, "f0")
    land(100, 250, "f1")
    schema = spark.read.parquet(str(src / "f0")).schema

    def run_stream():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: t.append_batch(df, bid)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_stream()
    first_batches = t.committed_batch_ids()
    assert t.read().count() == 250
    land(250, 300, "f2")
    land(300, 340, "f3")
    run_stream()  # SAME checkpoint: resumes at the next offset
    assert t.read().count() == 340
    assert {r["id"] for r in t.read().collect()} == set(range(340))
    assert len(t.committed_batch_ids()) > len(first_batches)
    # and a third run with no new data commits nothing
    v = latest_version(t.path)
    run_stream()
    assert latest_version(t.path) == v


def test_zorder_compaction_localizes_both_dimensions(spark, tmp_path):
    # OPTIMIZE ZORDER: after a z-ordered rewrite, per-file footer ranges
    # must be narrow on BOTH dimensions (quadrant-shaped files), so stats
    # pruning works for scans filtered on either column — a single-column
    # range clustering can only ever localize one of them.
    t = Table(
        spark, str(tmp_path / "z"), stats_cols=["a", "b"], num_files=16
    )
    rows = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("a"),
        (F.col("id") / 64).cast("long").alias("b"),
        F.col("id").alias("payload"),
    )
    t.create(rows)
    v = t.compact(max_files=16, zorder_by=["a", "b"])
    assert t.history()[-1]["meta"]["zorder_by"] == ["a", "b"]
    assert t.changes(v - 1, v).count() == 0  # still a logical no-op
    assert t.read().count() == 4096
    rec = t.history()[-1]
    spans = {
        c: [
            e["stats"][c][1] - e["stats"][c][0]
            for e in rec["add"]
            if e["rows"] > 0 and c in e["stats"]
        ]
        for c in ("a", "b")
    }
    # full span is 63 on each dim; 16 z-ordered files => ~quadrant files.
    # Demand better than half-span on BOTH dims for the typical file.
    for c in ("a", "b"):
        assert spans[c], c
        avg = sum(spans[c]) / len(spans[c])
        assert avg <= 32, (c, spans[c])


def test_rewrites_preserve_evolved_schema(spark, table):
    # REGRESSION: after a schema evolution the live set mixes files with
    # and without the added column; a rewrite that scans with plain
    # parquet inference picks one footer arbitrarily and can silently
    # drop the evolved column. compact / delete_where / merge must all
    # scan through the LOG-pinned schema instead.
    widened = _mk(spark, 1000, 1010).withColumn("extra", F.lit(5).cast("long"))
    table.append(widened, allow_schema_evolution=True)
    table.compact(max_files=2)
    got = {r["id"]: r["extra"] for r in table.read().collect()}
    assert len(got) == 1010
    assert got[1005] == 5 and got[3] is None
    table.delete_where("id < 100")
    got = {r["id"]: r["extra"] for r in table.read().collect()}
    assert len(got) == 910 and got[1005] == 5
    upd = spark.range(1000, 1003).select(
        F.col("id"), F.lit(0).cast("long").alias("val"),
        F.lit("u").alias("tag"), F.lit(9).cast("long").alias("extra"),
    )
    table.merge(upd, key="id")
    got = {r["id"]: r["extra"] for r in table.read().collect()}
    assert got[1001] == 9 and got[1005] == 5 and got[500] is None
    # zorder rejects non-numeric / unknown columns by name
    with pytest.raises(ValueError, match="numeric"):
        table.compact(zorder_by=["tag"])
    with pytest.raises(ValueError, match="numeric"):
        table.compact(zorder_by=["nope"])


def test_restore_is_metadata_only_and_data_correct(spark, table):
    table.append(_mk(spark, 1000, 1500, tag="b"))
    table.merge(
        _mk(spark, 200, 300, tag="MERGED"), key="id"
    )
    pre_dirs = set(os.listdir(os.path.join(table.path, "data")))
    v = table.restore(1)
    assert v == 3
    # metadata-only: no data directory was created for the restore commit
    assert set(os.listdir(os.path.join(table.path, "data"))) == pre_dirs
    # head == v1 as data
    assert table.read().count() == 1500
    assert table.read().filter(F.col("tag") == "MERGED").count() == 0
    assert table.changes(1, 3).count() == 0
    # history preserved: the merge snapshot is still time-travelable
    assert table.read(version=2).filter(F.col("tag") == "MERGED").count() == 100
    # commit meta records the rollback
    assert table.history()[-1]["meta"]["restored_to"] == 1
    assert table.history()[-1]["meta"]["files_rewritten"] == 0


def test_restore_reverts_schema_evolution(spark, table):
    evolved = _mk(spark, 1000, 1100).withColumn("extra", F.lit(7))
    table.append(evolved, allow_schema_evolution=True)
    assert "extra" in table.read().columns
    table.restore(0)
    assert "extra" not in table.read().columns
    assert table.read().count() == 1000


def test_restore_to_pre_schema_version_reverts_schema_to_none(spark, table):
    # r11 advice: restore() promises schema revert, but a target version
    # that PREDATES schema recording used to leave the restore commit
    # schemaless — the fold then resolved to the LATER evolved schema.
    # The fix records an explicit {"__none__": true} marker. Simulate an
    # old log by stripping v0's recorded schema.
    import json as _json

    from pkg2_spark.tableformat import _log_dir, _LOG_FMT

    log0 = os.path.join(_log_dir(table.path), _LOG_FMT.format(0))
    rec = _json.loads(open(log0).read())
    assert rec.pop("schema", None) is not None
    with open(log0, "w") as f:
        _json.dump(rec, f, indent=1)
    assert table.schema_at(0) is None  # the simulated pre-schema state
    evolved = _mk(spark, 1000, 1100).withColumn("extra", F.lit(7))
    table.append(evolved, allow_schema_evolution=True)
    assert "extra" in {f.name for f in table.schema_at().fields}
    head = table.restore(0)
    # the restored head reports the TARGET's schema state (None), not the
    # evolved schema a later commit recorded
    assert table.schema_at(head) is None
    assert table.schema_at() is None
    # and the evolved version is still time-travelable with ITS schema
    assert "extra" in {f.name for f in table.schema_at(1).fields}


def _race_appender(path: str, writer: str, n: int) -> list[int]:
    # Runs in a SEPARATE Python process (spawn): the loser-retry commit
    # loop over the O_EXCL protocol, no Spark session involved — the
    # contention under test is filesystem-level, exactly what two real
    # writers on a shared table path exercise.
    from pkg2_spark.tableformat import (
        ConcurrentCommitError,
        _commit,
        latest_version,
    )

    won: list[int] = []
    for i in range(n):
        while True:
            v = latest_version(path) + 1
            try:
                _commit(path, v, "append", [], [],
                        meta={"writer": writer, "i": i})
                won.append(v)
                break
            except ConcurrentCommitError:
                continue
    return won


def test_two_process_commit_race_serializes_linearly(spark, table):
    # r12 verdict #7: the exclusive-create commit protocol tested ACROSS
    # REAL PROCESSES, not just in-process — two spawned Python processes
    # contend 15 appends each on one table dir; every commit must land,
    # versions must be distinct and gap-free, and the log linear with
    # each writer's own commits in its submission order.
    import multiprocessing as mp

    ctx = mp.get_context("spawn")
    n = 15
    with ctx.Pool(2) as pool:
        r1 = pool.apply_async(_race_appender, (table.path, "w1", n))
        r2 = pool.apply_async(_race_appender, (table.path, "w2", n))
        v1, v2 = r1.get(120), r2.get(120)
    assert len(v1) == n and len(v2) == n
    assert not set(v1) & set(v2), "two writers won the same version"
    assert sorted(set(v1) | set(v2)) == list(range(1, 2 * n + 1))
    hist = table.history()
    assert [c["version"] for c in hist] == list(range(0, 2 * n + 1))
    # per-writer order is preserved (writer i-counters ascend with version)
    for w in ("w1", "w2"):
        seq = [c["meta"]["i"] for c in hist if c["meta"].get("writer") == w]
        assert seq == list(range(n))
    # and the table still reads: the metadata-only appends added no files,
    # so the live set is exactly the create's.
    assert table.read().count() == 1000


def test_restore_vacuum_race_compensates_before_raising(spark, table, monkeypatch):
    # r12 advice: when a vacuum reaps the restore target's files INSIDE
    # restore's check-then-commit window (after the restore commit won the
    # log race), the poisoned head must not be left for a catch-and-retry
    # caller to stack more poisoned heads on. restore() now auto-commits a
    # compensating metadata-only restore back to the pre-restore state and
    # raises RestorePoisonedError carrying both version numbers.
    import pkg2_spark.tableformat as tf

    table.compact(max_files=2)  # v1 rewrites the live set; v0 files now dead
    pre_head = latest_version(table.path)  # 1
    v0_files = snapshot_files(table.path, 0)
    real_commit = tf._commit
    state = {"fired": False}

    def racing_commit(
        path, version, op, add, remove, meta=None, schema=None, **kw
    ):
        real_commit(
            path, version, op, add, remove, meta=meta, schema=schema, **kw
        )
        if not state["fired"] and meta and meta.get("restored_to") == 0:
            # Simulate the concurrent vacuum landing in the window between
            # the restore commit and its post-commit re-verify.
            state["fired"] = True
            for f in v0_files:
                if os.path.exists(f):
                    os.remove(f)

    monkeypatch.setattr(tf, "_commit", racing_commit)
    with pytest.raises(tf.RestorePoisonedError, match="compensating restore") as ei:
        table.restore(0)
    assert ei.value.poisoned_version == pre_head + 1
    assert ei.value.compensated_version == pre_head + 2
    # The head is the compensating commit, it reads (pre-restore data),
    # and its meta records what it compensates.
    assert latest_version(table.path) == pre_head + 2
    assert table.read().count() == 1000
    hist = table.history()
    assert hist[-1]["op"] == "restore"
    assert hist[-1]["meta"]["compensates"] == pre_head + 1
    assert hist[-1]["meta"]["restored_to"] == pre_head
    # The schema fold reverts too: head schema equals the pre-restore one.
    assert table.schema_at() == table.schema_at(pre_head)


def test_restore_to_head_is_noop_and_vacuumed_target_fails(spark, table):
    assert table.restore(latest_version(table.path)) == 0
    assert latest_version(table.path) == 0  # no commit written
    table.compact(max_files=2)  # v1 rewrites the whole live set
    table.vacuum(keep_versions=1)  # v0's files die
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        table.restore(0)


def test_restore_compensation_skipped_when_its_own_files_are_gone(
    spark, table, monkeypatch
):
    # r13 advice: the compensating restore re-adds the pre-restore
    # snapshot BY REFERENCE — if a second vacuum racing in the same
    # window (with the poisoned restore as retained head) reaped
    # pre-restore-only files, committing that reference would recreate
    # the unreadable-head condition the mechanism exists to prevent.
    # restore() must re-verify the compensation's own file set and SKIP
    # the commit (compensated_version=None, manual-remedy message)
    # instead of stacking a second poisoned head.
    import pkg2_spark.tableformat as tf

    table.compact(max_files=2)  # v1 rewrites the live set
    pre_head = latest_version(table.path)  # 1
    v0_files = snapshot_files(table.path, 0)
    v1_files = snapshot_files(table.path, pre_head)
    real_commit = tf._commit
    state = {"fired": False}

    def racing_commit(
        path, version, op, add, remove, meta=None, schema=None, **kw
    ):
        real_commit(
            path, version, op, add, remove, meta=meta, schema=schema, **kw
        )
        if not state["fired"] and meta and meta.get("restored_to") == 0:
            # The simulated vacuum reaps BOTH the restore target's files
            # and the pre-restore head's (a keep_versions=1 vacuum with
            # the poisoned restore as head retains neither snapshot).
            state["fired"] = True
            for f in v0_files + v1_files:
                if os.path.exists(f):
                    os.remove(f)

    monkeypatch.setattr(tf, "_commit", racing_commit)
    with pytest.raises(
        tf.RestorePoisonedError, match="compensation skipped"
    ) as ei:
        table.restore(0)
    assert ei.value.poisoned_version == pre_head + 1
    assert ei.value.compensated_version is None
    # No second head was stacked: the poisoned restore stays the head.
    assert latest_version(table.path) == pre_head + 1


def test_dv_delete_is_merge_on_read(spark, table):
    # delete_where_dv records POSITIONS, rewrites nothing: the live file
    # set is unchanged, the rows disappear from read(), time travel to
    # the pre-delete version still sees them, and a second identical
    # delete records zero rows (the position scan reads through the DV).
    from pkg2_spark.tableformat import dv_state

    files_before = set(snapshot_files(table.path))
    v = table.delete_where_dv("id % 10 = 3")
    assert set(snapshot_files(table.path)) == files_before  # no rewrite
    assert table.read().count() == 900
    assert table.read().filter("id % 10 = 3").count() == 0
    assert table.read(version=v - 1).count() == 1000  # time travel intact
    hist = table.history()
    assert hist[-1]["op"] == "delete" and hist[-1]["meta"]["mode"] == "dv"
    assert hist[-1]["meta"]["rows_deleted"] == 100
    assert sum(e["rows"] for e in dv_state(table.path)) == 100
    # idempotent re-delete: positions already dead are not re-recorded
    table.delete_where_dv("id % 10 = 3")
    assert table.history()[-1]["meta"]["rows_deleted"] == 0
    assert table.read().count() == 900


def test_dv_rewrites_never_resurrect_and_compact_materializes(spark, table):
    # The resurrection hazard: merge/compact rewrite files that still
    # CONTAIN dv-deleted rows — the rewrite must read DV-applied. After
    # compact the deletes are materialized and the DV set resets.
    from pkg2_spark.tableformat import dv_state

    table.delete_where_dv("id < 100")
    assert table.read().count() == 900
    # merge touches low-key files (where the dv'd rows live)
    table.merge(_mk(spark, 100, 120, tag="upd"), key="id")
    assert table.read().count() == 900  # deleted rows stayed dead
    assert table.read().filter("id < 100").count() == 0
    assert table.read().filter("tag = 'upd'").count() == 20
    table.compact(max_files=2)
    assert dv_state(table.path) == []  # reset: deletes are in the files now
    assert table.read().count() == 900
    assert table.read().filter("id < 100").count() == 0
    # compact stayed a logical no-op as data: CDC across it is empty
    assert table.changes(
        latest_version(table.path) - 1, latest_version(table.path)
    ).count() == 0


def test_dv_changes_and_restore(spark, table):
    # CDC across a dv commit = delete images of exactly the dv'd rows;
    # restore to the pre-delete version un-deletes (dv_base reverts) and
    # CDC across the restore shows them back as inserts.
    import pyspark.sql.functions as F

    v0 = latest_version(table.path)
    v1 = table.delete_where_dv("id BETWEEN 200 AND 249")
    ch = table.changes(v0, v1)
    assert ch.count() == 50
    assert ch.select("change_type").distinct().collect()[0][0] == "delete"
    assert sorted(r["id"] for r in ch.collect()) == list(range(200, 250))
    v2 = table.restore(v0)
    assert table.read().count() == 1000
    back = table.changes(v1, v2)
    assert back.count() == 50
    assert back.select("change_type").distinct().collect()[0][0] == "insert"
    # and the un-deleted rows read back with full images
    assert back.agg(F.sum("id")).collect()[0][0] == sum(range(200, 250))


def test_dv_vacuum_keeps_live_sidecars(spark, table):
    import os as _os

    from pkg2_spark.tableformat import dv_state

    table.delete_where_dv("id >= 990")
    dv_files = [
        _os.path.join(table.path, e["path"]) for e in dv_state(table.path)
    ]
    assert dv_files
    table.vacuum(keep_versions=1)
    assert all(_os.path.exists(f) for f in dv_files)  # live DV survives
    assert table.read().count() == 990
    # after compact (DVs materialized + reset), vacuum reaps the sidecars
    table.compact(max_files=2)
    table.vacuum(keep_versions=1)
    assert not any(_os.path.exists(f) for f in dv_files)
    assert table.read().count() == 990


def test_dv_across_schema_evolution(spark, table):
    # DV positions recorded before a schema evolution keep applying after
    # it (the anti-join keys on position, not content); a DV delete AFTER
    # the evolution can match on the evolved column, and its CDC delete
    # images read under the evolved schema with old rows null-filled.
    import pyspark.sql.functions as F

    table.delete_where_dv("id < 50")  # pre-evolution DV
    table.append(_mk(spark, 1000, 1100).withColumn("src", F.lit("new")),
                 allow_schema_evolution=True)
    assert table.read().count() == 1050
    assert table.read().filter("id < 50").count() == 0  # still dead
    # post-evolution DV delete matching on the evolved column
    v_before = latest_version(table.path)
    table.delete_where_dv("src = 'new' AND id >= 1090")
    assert table.read().count() == 1040
    ch = table.changes(v_before, v_before + 1)
    assert ch.count() == 10
    assert {r["src"] for r in ch.collect()} == {"new"}
    # the pre-evolution window's diff stays pinned to ITS schema (time
    # travel is schema-correct): no evolved column, 50 delete images
    ch0 = table.changes(0, 1)
    assert "src" not in ch0.columns
    assert ch0.count() == 50
    assert {r["change_type"] for r in ch0.collect()} == {"delete"}
    # a window SPANNING the evolution diffs under the evolved schema:
    # the DV'd old rows' images carry the evolved column null-filled
    span = table.changes(0, latest_version(table.path)).filter(
        "change_type = 'delete' AND id < 50"
    )
    assert span.count() == 50
    assert {r["src"] for r in span.collect()} == {None}


def test_update_where_simultaneous_assignments(spark, table):
    # UPDATE semantics: all RHS evaluate against the OLD row (swap test),
    # non-matching rows byte-identical, CDC across the commit shows
    # exactly the changed rows as delete(old)+insert(new), and an
    # assignment can never retype a column (cast back to declared type).
    import pyspark.sql.functions as F

    v0 = latest_version(table.path)
    table.update_where("id < 10", {"id": "val", "val": "id"})
    got = {r["id"]: r["val"] for r in table.read().filter(
        "tag = 'a' AND (id < 10 OR val < 10)").collect()}
    # old rows (id=i, val=2i) for i<10 became (id=2i, val=i)
    for i in range(10):
        assert got[2 * i] == i
    assert table.read().count() == 1000
    # 9, not 10: row (id=0, val=0) swaps to itself, and CDC is NET
    # changes — the unchanged image cancels in the multiset diff
    ch = table.changes(v0, v0 + 1)
    assert ch.filter("change_type = 'insert'").count() == 9
    assert ch.filter("change_type = 'delete'").count() == 9
    # schema unchanged (val stayed its original type)
    assert table.schema_at() == table.schema_at(v0)
    with pytest.raises(ValueError, match="unknown columns"):
        table.update_where("id = 0", {"nope": "1"})


def test_update_where_does_not_resurrect_dv_rows(spark, table):
    table.delete_where_dv("id BETWEEN 500 AND 509")
    assert table.read().count() == 990
    table.update_where("id >= 500", {"val": "val + 1000000"})
    assert table.read().count() == 990  # deleted rows stayed dead
    assert table.read().filter("id BETWEEN 500 AND 509").count() == 0
    assert (
        table.read().filter("id = 510").collect()[0]["val"] == 510 * 2 + 1000000
    )


def test_compact_small_binpacks_only_the_tail(spark, table):
    # Partial OPTIMIZE: only sub-threshold files rewrite; right-sized
    # files carry over BY REFERENCE; DVs on untouched files keep
    # applying (no dv_base reset); data unchanged; idempotent when
    # nothing qualifies.
    from pkg2_spark.tableformat import _live_entries, dv_state

    # 8 files of 125 rows from create; add small appends
    table.num_files = 1
    table.append(_mk(spark, 2000, 2010, tag="s1"))
    table.append(_mk(spark, 2010, 2025, tag="s2"))
    table.append(_mk(spark, 2025, 2030, tag="s3"))
    table.num_files = None
    table.delete_where_dv("id = 5")  # DV on a BIG (create-commit) file
    v = latest_version(table.path)
    entries = _live_entries(table.path, v)
    big = {rel for rel, e in entries.items() if e["rows"] >= 100}
    assert len(big) == 8 and len(entries) == 11
    want = sorted(map(tuple, table.read().collect()))

    v2 = table.compact_small(target_rows=100, max_files=1)
    assert v2 == v + 1
    after = _live_entries(table.path, v2)
    assert big <= set(after)  # big files carried by reference
    assert len(after) == len(big) + 1  # 3 small files -> 1
    assert table.history()[-1]["meta"]["partial"] is True
    assert dv_state(table.path) != []  # NOT reset: big-file DV still needed
    assert sorted(map(tuple, table.read().collect())) == want
    assert table.read().filter("id = 5").count() == 0  # DV still applies
    # nothing small remains: idempotent no-op, no commit written
    assert table.compact_small(target_rows=100) == v2
    assert latest_version(table.path) == v2
