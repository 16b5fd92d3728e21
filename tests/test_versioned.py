"""Snapshot-versioned tables (trike_spark/versioned.py): atomic manifest
commits, snapshot isolation, time travel, and logical overwrite."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trike_spark import versioned
from trike_spark.io import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_append_time_travel_and_isolation(spark, tmp_path):
    path = str(tmp_path / "tbl")
    nation = load_table(spark, SF_DIR, "nation")

    v1 = versioned.commit(nation.filter(F.col("n_regionkey") == 0), path)
    assert v1 == 1
    n1 = versioned.read_version(spark, path).count()

    # a reader pinned BEFORE the second commit...
    pinned = versioned.read_version(spark, path, 1)

    v2 = versioned.commit(nation.filter(F.col("n_regionkey") == 1), path)
    assert v2 == 2

    # ...sees the old state (snapshot isolation), while latest sees both
    assert pinned.count() == n1
    assert versioned.read_version(spark, path, 1).count() == n1
    assert versioned.read_version(spark, path).count() > n1

    # appends compose exactly
    want = nation.filter(F.col("n_regionkey").isin(0, 1)).count()
    assert versioned.read_version(spark, path, 2).count() == want


def test_overwrite_is_logical_replace_with_history(spark, tmp_path):
    path = str(tmp_path / "tbl")
    region = load_table(spark, SF_DIR, "region")

    versioned.commit(region, path)
    versioned.commit(region.limit(2), path, mode="overwrite")

    assert versioned.read_version(spark, path).count() == 2
    # time travel still reproduces the pre-overwrite state
    assert versioned.read_version(spark, path, 1).count() == region.count()

    h = versioned.history(path)
    assert [m["version"] for m in h] == [1, 2]
    assert h[1]["mode"] == "overwrite" and h[1]["parent"] == 1


def test_reading_empty_table_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        versioned.read_version(spark, str(tmp_path / "nope"))


def test_incremental_read_returns_only_new_rows(spark, tmp_path):
    path = str(tmp_path / "tbl")
    nation = load_table(spark, SF_DIR, "nation")

    versioned.commit(nation.filter(F.col("n_regionkey") == 0), path)
    df, hw = versioned.read_incremental(spark, path, 0)
    assert hw == 1 and df.count() == versioned.read_version(spark, path, 1).count()

    # nothing new → None, checkpoint unchanged
    df2, hw2 = versioned.read_incremental(spark, path, hw)
    assert df2 is None and hw2 == hw

    versioned.commit(nation.filter(F.col("n_regionkey") == 1), path)
    delta, hw3 = versioned.read_incremental(spark, path, hw)
    assert hw3 == 2
    want = nation.filter(F.col("n_regionkey") == 1).count()
    assert delta.count() == want  # ONLY the new rows, not a re-read

    # an overwrite breaks the delta chain loudly, not silently
    versioned.commit(nation.limit(1), path, mode="overwrite")
    with pytest.raises(ValueError):
        versioned.read_incremental(spark, path, hw3 - 1)


def test_foreach_batch_committer_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "tbl")
    region = load_table(spark, SF_DIR, "region")
    sink = versioned.foreach_batch_committer(path)

    sink(region.limit(2), 0)
    n_after_first = versioned.read_version(spark, path).count()
    sink(region.limit(2), 0)  # at-least-once replay of the same batch
    assert versioned.read_version(spark, path).count() == n_after_first

    sink(region.limit(3), 1)  # a genuinely new batch lands
    assert versioned.read_version(spark, path).count() == n_after_first + 3
    assert [m.get("batch_id") for m in versioned.history(path)] == [0, 1]


def test_expire_snapshots_removes_unreferenced_data(spark, tmp_path):
    """Retention: after overwrites create unreferenced generations,
    expire_snapshots(keep_last_n) deletes exactly those directories, kept
    versions stay byte-identical, expired versions stop being readable."""
    import os

    from trike_spark.versioned import (
        commit,
        current_version,
        expire_snapshots,
        read_version,
    )

    path = str(tmp_path / "vt_expire")
    commit(spark.range(0, 5).toDF("id"), path)                      # v1
    commit(spark.range(5, 8).toDF("id"), path)                      # v2 append
    commit(spark.range(100, 103).toDF("id"), path, mode="overwrite")  # v3
    commit(spark.range(200, 204).toDF("id"), path)                  # v4 append

    before = sorted(r.id for r in read_version(spark, path, 4).collect())
    summary = expire_snapshots(path, keep_last_n=2)
    assert summary["kept_versions"] == [3, 4]
    assert summary["expired_versions"] == [1, 2]
    # v1/v2's generations are unreferenced by v3/v4 (overwrite cut them)
    assert "data-v000001" in summary["deleted_dirs"]
    assert "data-v000002" in summary["deleted_dirs"]
    assert not os.path.exists(os.path.join(path, "data-v000001"))

    # kept snapshots unchanged and still readable
    assert sorted(r.id for r in read_version(spark, path, 4).collect()) == before
    assert sorted(r.id for r in read_version(spark, path, 3).collect()) == [100, 101, 102]
    # expired history is gone
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        read_version(spark, path, 2).collect()
    # version counter unaffected; a new commit continues the lineage
    assert current_version(path) == 4
    commit(spark.range(300, 301).toDF("id"), path)
    assert current_version(path) == 5


def test_expire_snapshots_never_touches_current(spark, tmp_path):
    from trike_spark.versioned import commit, expire_snapshots, read_version

    path = str(tmp_path / "vt_expire_min")
    commit(spark.range(0, 3).toDF("id"), path)
    summary = expire_snapshots(path, keep_last_n=0)  # clamped to 1
    assert summary["kept_versions"] == [1]
    assert sorted(r.id for r in read_version(spark, path).collect()) == [0, 1, 2]


def test_delete_where_with_retention_is_full_erasure(spark, tmp_path):
    """GDPR workflow: delete_where removes rows from the new version,
    time travel still sees them (audit window), expire_snapshots then
    erases the history — the two-step compliance story."""
    from pyspark.sql import functions as F

    from trike_spark.versioned import (
        commit,
        delete_where,
        expire_snapshots,
        read_version,
    )

    path = str(tmp_path / "vt_gdpr")
    df = spark.createDataFrame(
        [(1, "alice"), (2, "bob"), (3, "carol")], "user_id int, name string"
    )
    commit(df, path)  # v1
    v2 = delete_where(spark, path, F.col("user_id") == 2)
    assert v2 == 2
    assert sorted(r.user_id for r in read_version(spark, path).collect()) == [1, 3]
    # audit window: pre-delete snapshot still has bob
    assert sorted(r.user_id for r in read_version(spark, path, 1).collect()) == [1, 2, 3]
    # retention expiry: history gone, bob's bytes deleted from disk
    summary = expire_snapshots(path, keep_last_n=1)
    assert summary["expired_versions"] == [1]
    assert "data-v000001" in summary["deleted_dirs"]
    assert sorted(r.user_id for r in read_version(spark, path).collect()) == [1, 3]


def test_append_schema_contract(spark, tmp_path):
    import pytest as _pytest

    from trike_spark.versioned import commit, read_version

    path = str(tmp_path / "vt_schema")
    commit(spark.createDataFrame([(1, "a")], "id int, v string"), path)
    # matching append is fine
    commit(spark.createDataFrame([(2, "b")], "id int, v string"), path)
    # divergent append is refused (would corrupt the parquet union)
    with _pytest.raises(ValueError, match="append schema"):
        commit(spark.createDataFrame([(3,)], "id int"), path)
    # evolution routes through overwrite and updates the contract
    commit(spark.createDataFrame([(4, "c", 1.5)], "id int, v string, w double"),
           path, mode="overwrite")
    commit(spark.createDataFrame([(5, "d", 2.5)], "id int, v string, w double"), path)
    assert {r.id for r in read_version(spark, path).collect()} == {4, 5}


def test_manifest_stats_prune_directories(spark, tmp_path):
    """Three disjoint-range generations; a pruned read for one range must
    plan only that generation's files (asserted via inputFiles) and still
    return exactly the predicate's rows."""
    from trike_spark.versioned import commit_with_stats, read_version_pruned

    path = str(tmp_path / "vt_stats")
    commit_with_stats(spark.range(0, 100).toDF("id"), path, ["id"])       # v1
    commit_with_stats(spark.range(1000, 1100).toDF("id"), path, ["id"])   # v2
    commit_with_stats(spark.range(2000, 2100).toDF("id"), path, ["id"])   # v3

    pruned = read_version_pruned(spark, path, "id", 1010, 1020)
    files = pruned.inputFiles()
    assert files and all("data-v000002" in f for f in files), files
    assert sorted(r.id for r in pruned.collect()) == list(range(1010, 1021))

    # out-of-range predicate: zero directories, empty result, schema kept
    none = read_version_pruned(spark, path, "id", 5000, 6000)
    assert none.columns == ["id"] and none.count() == 0

    # stats are an optimization, not a filter: overlapping range reads both
    both = read_version_pruned(spark, path, "id", 50, 1050)
    assert {d.split("data-v")[1][:6] for d in both.inputFiles()} == {"000001", "000002"}
    assert both.count() == 50 + 51
