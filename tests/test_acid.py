"""Transaction-log table backend (plans/acid.py): commit atomicity,
snapshot isolation, optimistic concurrency, time travel, checkpoints,
and the ImportJob integration."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from simpletasks_data_spark.plans.acid import CommitConflict, TxnTable, TxnTargetTable


@pytest.fixture()
def tdir():
    d = tempfile.mkdtemp(prefix="txntab_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 10).alias("val")
    )


def test_append_and_snapshot_read(spark, tdir):
    t = TxnTable(spark, tdir)
    v0 = t.append(_df(spark, 0, 5))
    v1 = t.append(_df(spark, 5, 8))
    assert (v0, v1) == (0, 1)
    assert t.read().count() == 8
    assert t.read(version=0).count() == 5
    assert sorted(r["id"] for r in t.read().collect()) == list(range(8))


def test_overwrite_time_travel_and_history(spark, tdir):
    t = TxnTable(spark, tdir)
    t.append(_df(spark, 0, 5))
    t.overwrite(_df(spark, 100, 102))
    assert t.read().count() == 2
    assert t.read(version=0).count() == 5  # old files tombstoned, not deleted
    hist = t.history()
    assert [h["op"] for h in hist] == ["append", "overwrite"]
    assert hist[1]["n_removed"] >= 1
    with pytest.raises(ValueError):
        t.read(version=7)


def test_stale_overwrite_conflicts(spark, tdir):
    t = TxnTable(spark, tdir)
    t.append(_df(spark, 0, 5))
    stale = t.latest_version()
    t.append(_df(spark, 5, 6))  # someone else commits
    with pytest.raises(CommitConflict):
        t.overwrite(_df(spark, 100, 101), read_version=stale)
    # table unchanged by the failed commit
    assert t.read().count() == 6


def test_append_commutes_past_collisions(spark, tdir):
    t = TxnTable(spark, tdir)
    t.append(_df(spark, 0, 3))
    # occupy the next log slot out from under the writer: _try_commit must
    # refuse it, and a fresh append lands beyond it
    nxt = os.path.join(tdir, "_txn_log", f"{1:010d}.json")
    with open(nxt, "w") as f:
        f.write('{"version": 1, "op": "append", "ts": 0, "actions": []}')
    assert not t._try_commit(1, {"version": 1, "op": "x", "ts": 0, "actions": []})
    v = t.append(_df(spark, 3, 4))
    assert v == 2
    assert t.read().count() == 4


def test_reader_snapshot_is_isolated_from_later_commits(spark, tdir):
    t = TxnTable(spark, tdir)
    t.append(_df(spark, 0, 5))
    snap = t.read()  # resolves the file list at v0
    t.append(_df(spark, 5, 50))
    t.overwrite(_df(spark, 100, 101))
    assert snap.count() == 5  # unaffected: tombstones never delete bytes


def test_staged_but_uncommitted_files_are_invisible(spark, tdir):
    t = TxnTable(spark, tdir)
    t.append(_df(spark, 0, 5))
    t._stage(_df(spark, 1000, 2000))  # a writer that died before commit
    assert t.read().count() == 5


def test_checkpoint_replaces_log_prefix(spark, tdir):
    t = TxnTable(spark, tdir, checkpoint_every=2)
    for i in range(5):
        t.append(_df(spark, i * 10, i * 10 + 3))
    log = os.path.join(tdir, "_txn_log")
    assert f"{4:010d}.checkpoint.json" in os.listdir(log)
    # state resolution must not need commits covered by the checkpoint:
    # delete them and the snapshot still reads every row
    for v in range(4):
        os.unlink(os.path.join(log, f"{v:010d}.json"))
    t2 = TxnTable(spark, tdir, checkpoint_every=2)
    assert t2._files_at(4) == t._files_at(4)
    assert t2.read(version=4).count() == 15


def test_importjob_commits_one_version_and_dryrun_none(spark, tdir):
    from simpletasks_data_spark.mapping import Field, Mapping
    from simpletasks_data_spark.plans.task import ImportJob
    from simpletasks_data_spark.sources.table import TableSource

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("val", T.LongType(), True),
        ]
    )

    class _M(Mapping):
        def __init__(self):
            super().__init__()
            self.id = Field("id")
            self.val = Field("val")

    def make_target():
        tt = TxnTargetTable(spark, schema=schema, path=tdir, primary_keys=("id",))
        return tt

    src_df = spark.createDataFrame([(1, 10), (2, 20)], ["id", "val"])
    tgt = make_target()
    job = ImportJob(spark, tgt, sources=[TableSource(src_df, _M())])
    job.run()
    assert tgt.txn.latest_version() == 0
    assert sorted(r["id"] for r in tgt.txn.read().collect()) == [1, 2]

    # second run: update one row, create one — exactly one more version
    src2 = spark.createDataFrame([(2, 99), (3, 30)], ["id", "val"])
    tgt2 = make_target()
    job2 = ImportJob(spark, tgt2, sources=[TableSource(src2, _M())])
    res = job2.run()
    assert tgt2.txn.latest_version() == 1
    got = {r["id"]: r["val"] for r in tgt2.txn.read().collect()}
    assert got == {1: 10, 2: 99, 3: 30}
    # time travel still shows the first import's state
    got0 = {r["id"]: r["val"] for r in tgt2.txn.read(version=0).collect()}
    assert got0 == {1: 10, 2: 20}

    # dry-run: full plan, no commit
    tgt3 = make_target()
    job3 = ImportJob(
        spark,
        tgt3,
        sources=[TableSource(spark.createDataFrame([(9, 90)], ["id", "val"]), _M())],
        dryrun=True,
    )
    job3.run()
    assert tgt3.txn.latest_version() == 1


def test_compact_preserves_contents_and_shrinks_files(spark, tdir):
    t = TxnTable(spark, tdir)
    for i in range(4):
        t.append(_df(spark, i * 10, i * 10 + 5).repartition(4))
    before = sorted(r["id"] for r in t.read().collect())
    n_files_before = len(t._files_at(t.latest_version()))
    v = t.compact(target_files=1)
    assert t.history()[v]["op"] == "compact"
    assert len(t._files_at(v)) < n_files_before
    assert sorted(r["id"] for r in t.read().collect()) == before
    # pre-compaction versions still time-travel (files not deleted)
    assert t.read(version=1).count() == 10


def test_vacuum_deletes_only_unretained_files(spark, tdir):
    t = TxnTable(spark, tdir)
    t.append(_df(spark, 0, 5))
    t.overwrite(_df(spark, 10, 12))      # v1: v0's files now unreferenced
    staged = t._stage(_df(spark, 99, 100))  # in-flight writer: must survive
    deleted = t.vacuum(retain_versions=0)
    assert deleted, "v0's files should be vacuumed"
    assert t.read().count() == 2          # current snapshot intact
    with pytest.raises(Exception):
        t.read(version=0).count()         # time travel below horizon now broken
    staged_path = os.path.join(tdir, staged[0]["add"]["path"])
    assert os.path.exists(staged_path)    # uncommitted stage untouched


def test_vacuum_retains_window(spark, tdir):
    t = TxnTable(spark, tdir)
    t.append(_df(spark, 0, 3))
    t.overwrite(_df(spark, 10, 13))
    t.overwrite(_df(spark, 20, 23))
    deleted = t.vacuum(retain_versions=1)  # keep v1 and v2
    assert deleted
    assert t.read(version=1).count() == 3
    assert t.read(version=2).count() == 3


def test_log_stats_file_skipping(spark, tdir):
    t = TxnTable(spark, tdir)
    for lo in (0, 100, 200):
        t.append(_df(spark, lo, lo + 100).coalesce(1))
    full = t.read()
    pruned = t.read(prune={"id": (150, 160)})
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    assert len(pruned.inputFiles()) == 1
    # pruning is planning-only: filtered results identical either way
    import pyspark.sql.functions as F

    want = sorted(r["id"] for r in full.where(F.col("id").between(150, 160)).collect())
    got = sorted(r["id"] for r in pruned.where(F.col("id").between(150, 160)).collect())
    assert got == want and len(got) == 11
    # a column with no recorded stats never skips
    assert len(t.read(prune={"no_such_col": (0, 1)}).inputFiles()) == 3


def test_additive_schema_evolution(spark, tdir):
    import pyspark.sql.functions as F
    import pytest as _pytest

    from simpletasks_data_spark.plans.acid import SchemaEvolutionError

    t = TxnTable(spark, tdir)
    t.append(_df(spark, 0, 3))
    t.append(_df(spark, 3, 5).withColumn("extra", F.col("id") + 100))
    cur = t.read()
    assert set(cur.columns) == {"id", "val", "extra"}
    rows = {r["id"]: r["extra"] for r in cur.collect()}
    assert rows[0] is None and rows[4] == 104  # old files read NULL
    assert set(t.read(version=0).columns) == {"id", "val"}  # time travel keeps old shape
    with _pytest.raises(SchemaEvolutionError):
        t.append(spark.range(1).select(F.col("id")))  # drops val/extra
    with _pytest.raises(SchemaEvolutionError):
        t.append(
            _df(spark, 9, 10)
            .withColumn("extra", F.lit("s"))  # retype long -> string
        )


def test_zorder_compaction_enables_multidim_skipping(spark, tdir):
    """OPTIMIZE ZORDER analogue: after a z-ordered compaction, range
    predicates on EITHER clustered column skip files from log stats."""
    from pyspark.sql import functions as F

    t = TxnTable(spark, tdir)
    # 64x64 grid in random-ish insertion order: no natural clustering
    grid = (
        spark.range(4096)
        .select(
            (F.col("id") % 64).alias("x"),
            (F.col("id") / 64).cast("long").alias("y"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        .orderBy("payload")  # destroy any x/y ordering
    )
    t.append(grid.repartition(4))
    before = sorted(map(tuple, t.read().collect()))
    v = t.compact(target_files=16, zorder=["x", "y"])
    assert t.history()[v]["op"] == "compact"
    assert sorted(map(tuple, t.read().collect())) == before  # layout-only

    total = len(t.read().inputFiles())
    px = len(t.read(prune={"x": (0, 7)}).inputFiles())
    py = len(t.read(prune={"y": (0, 7)}).inputFiles())
    assert px < total and py < total, (px, py, total)
    # and pruned reads still return exactly the right rows
    got = t.read(prune={"x": (0, 7)}).where(F.col("x") <= 7).count()
    assert got == 8 * 64


def test_delete_rewrites_only_matching_files(spark, tdir):
    from pyspark.sql import functions as F

    t = TxnTable(spark, tdir)
    for lo in (0, 100, 200):
        t.append(_df(spark, lo, lo + 100).coalesce(1))
    files_before = set(t._files_at(t.latest_version()))
    v = t.delete(F.col("id").between(150, 160), prune={"id": (150, 160)})
    assert t.history()[v]["op"] == "delete"
    files_after = set(t._files_at(v))
    # the two non-matching files carry over untouched
    assert len(files_before & files_after) == 2
    ids = sorted(r["id"] for r in t.read().collect())
    assert len(ids) == 300 - 11 and 155 not in ids and 100 in ids
    # pre-delete snapshot still time-travels
    assert t.read(version=2).count() == 300


def test_change_feed_append_only(spark, tdir):
    from pyspark.sql import functions as F

    t = TxnTable(spark, tdir)
    t.append(_df(spark, 0, 5))
    t.append(_df(spark, 5, 8))
    t.append(_df(spark, 8, 10))
    ch = t.read_changes(0)  # changes after v0: commits 1 and 2
    got = {r["id"]: r["_commit_version"] for r in ch.collect()}
    assert set(got) == set(range(5, 10))
    assert all(v == 1 for i, v in got.items() if i < 8)
    assert all(v == 2 for i, v in got.items() if i >= 8)
    t.overwrite(_df(spark, 100, 101))
    with pytest.raises(ValueError):
        t.read_changes(0)  # range now spans a non-append commit
    # empty range yields an empty, correctly-shaped frame
    assert t.read_changes(3, 3).count() == 0


def test_idempotent_writer_token_absorbs_redelivery(spark, tdir):
    t = TxnTable(spark, tdir)
    v0 = t.append(_df(spark, 0, 5), txn_app="q1", txn_version=0)
    v_dup = t.append(_df(spark, 0, 5), txn_app="q1", txn_version=0)  # replay
    assert v_dup == v0 and t.read().count() == 5
    t.append(_df(spark, 5, 8), txn_app="q1", txn_version=1)
    assert t.read().count() == 8
    # same epoch under a DIFFERENT app id is a distinct transaction
    t.append(_df(spark, 8, 9), txn_app="q2", txn_version=0)
    assert t.read().count() == 9
    with pytest.raises(ValueError):
        t.append(_df(spark, 0, 1), txn_app="q1")


def test_streaming_sink_exactly_once(spark, tdir):
    """Drive the foreachBatch handler directly: epoch replay after a
    'crash' must not duplicate rows."""
    t = TxnTable(spark, tdir)
    sink = t.streaming_sink("ingestq")
    sink(_df(spark, 0, 10), 0)
    sink(_df(spark, 10, 15), 1)
    sink(_df(spark, 10, 15), 1)  # re-delivered epoch
    assert t.read().count() == 15
    assert sorted(r["id"] for r in t.read().collect()) == list(range(15))


def test_partitioned_append_prunes_from_path_stats(spark, tdir):
    from pyspark.sql import functions as F

    t = TxnTable(spark, tdir)
    d = spark.range(300).select(
        F.col("id"), (F.col("id") % 3).alias("bucket"), (F.col("id") * 2).alias("val")
    )
    t.append(d, partition_by=["bucket"])
    full = t.read()
    assert set(full.columns) == {"id", "bucket", "val"}  # partition col reconstructed
    assert full.count() == 300
    one = t.read(prune={"bucket": (1, 1)})
    assert len(one.inputFiles()) < len(full.inputFiles())
    got = one.where(F.col("bucket") == 1)
    assert got.count() == 100
    assert all(r["id"] % 3 == 1 for r in got.collect())
    # partition pruning composes with footer stats on data columns
    both = t.read(prune={"bucket": (1, 1), "id": (0, 50)})
    assert len(both.inputFiles()) <= len(one.inputFiles())


def test_streaming_sink_checkpoint_restart_no_duplicates(spark, tdir):
    """Durability: a foreachBatch ACID sink stopped and RESTARTED from its
    checkpoint neither loses nor duplicates rows — offsets come from the
    stream checkpoint, epoch replay is absorbed by the writer token."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    src_dir = tempfile.mkdtemp(prefix="sink_src_")
    ckpt = tempfile.mkdtemp(prefix="sink_ckpt_")
    t = TxnTable(spark, tdir)

    def write_batch(lo, hi, name):
        _df(spark, lo, hi).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src_dir, name)
        )

    write_batch(0, 10, "b0")
    stream = (
        spark.readStream.schema("id long, val long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(t.streaming_sink("restartq"))
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert t.read().count() == 10

    write_batch(10, 25, "b1")  # arrives while the query is DOWN
    q2 = (
        spark.readStream.schema("id long, val long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir + "/*")
        .writeStream.foreachBatch(t.streaming_sink("restartq"))
        .option("checkpointLocation", ckpt)
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    assert sorted(r["id"] for r in t.read().collect()) == list(range(25))
    shutil.rmtree(src_dir, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)


def test_deletion_vectors_merge_on_read(spark, tmp_path):
    """delete_dv marks rows without rewriting files; readers subtract
    them; vectors accumulate across commits, survive time travel
    boundaries, and compact() materializes + clears them."""
    from pyspark.sql import functions as F

    from simpletasks_data_spark.plans.acid import TxnTable

    df = spark.range(0, 100).withColumn("grp", F.col("id") % 4)
    t = TxnTable(spark, str(tmp_path / "dvtab"), schema=df.schema)
    t.append(df.repartition(4))
    files_before = set(t._files_at(t.latest_version()))

    v1 = t.delete_dv(F.col("id") < 10)
    assert t.read().count() == 90
    assert set(t._files_at(v1)) == files_before  # NO file was rewritten
    assert t.read(version=0).count() == 100      # time travel unaffected

    v2 = t.delete_dv(F.col("grp") == 3)          # accumulates on same files
    remaining = {r["id"] for r in t.read().collect()}
    assert remaining == {i for i in range(10, 100) if i % 4 != 3}

    v3 = t.compact(target_files=1)
    assert {r["id"] for r in t.read().collect()} == remaining
    assert all(not a.get("dv") for a in t._files_at(v3).values())  # cleared

    # copy-on-write delete after DVs must not resurrect DV'd rows
    t.delete_dv(F.col("id") == 50)
    t.delete(F.col("id") >= 90)
    assert {r["id"] for r in t.read().collect()} == {
        i for i in range(10, 90) if i % 4 != 3 and i != 50
    }


def test_replace_where_backfill_idempotent(spark, tmp_path):
    """replace_where swaps one partition's rows atomically; rerunning the
    same backfill converges; pruned files carry over unrewritten."""
    from pyspark.sql import functions as F

    from simpletasks_data_spark.plans.acid import TxnTable

    df = spark.range(0, 100).withColumn("day", (F.col("id") % 5).cast("int"))
    t = TxnTable(spark, str(tmp_path / "rw"), schema=df.schema)
    t.append(df, partition_by=["day"])
    files0 = t._files_at(t.latest_version())

    fixed = spark.range(1000, 1010).withColumn("day", F.lit(3).cast("int"))
    t.replace_where(fixed, F.col("day") == 3, prune={"day": (3, 3)}, partition_by=["day"])
    got = {r["id"] for r in t.read().where(F.col("day") == 3).collect()}
    assert got == set(range(1000, 1010))
    assert t.read().where(F.col("day") != 3).count() == 80  # untouched
    # files outside day=3 carried over without rewrite
    survivors = set(t._files_at(t.latest_version()))
    assert {p for p in files0 if "day=3" not in p} <= survivors

    # idempotent rerun: same backfill -> same table contents
    t.replace_where(fixed, F.col("day") == 3, prune={"day": (3, 3)}, partition_by=["day"])
    assert {r["id"] for r in t.read().where(F.col("day") == 3).collect()} == got
    assert t.read().count() == 90


def test_timestamp_time_travel(spark, tdir):
    """read(timestamp=) resolves to the latest commit at or before the
    instant — Delta's rule; before-everything yields the empty table."""
    import time as _time

    t = TxnTable(spark, tdir, schema=_df(spark, 0, 1).schema)
    t0 = _time.time()
    _time.sleep(0.02)
    t.append(_df(spark, 0, 5))
    _time.sleep(0.02)
    t1 = _time.time()
    _time.sleep(0.02)
    t.append(_df(spark, 5, 8))
    _time.sleep(0.02)
    t2 = _time.time()

    assert t.version_at_timestamp(t0) == -1
    assert t.read(timestamp=t0).count() == 0
    assert t.version_at_timestamp(t1) == 0
    assert t.read(timestamp=t1).count() == 5
    assert t.version_at_timestamp(t2) == 1
    assert t.read(timestamp=t2).count() == 8
    assert t.history()[0]["ts"] is not None
    with pytest.raises(ValueError):
        t.read(version=0, timestamp=t1)
