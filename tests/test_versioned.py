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
