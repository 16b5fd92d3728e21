"""Merge-on-read delete vectors: scoping, stacking, re-insert semantics,
compaction, pruned reads, and retention."""

from __future__ import annotations

import os

from trike_spark import versioned as V


def _ids(df):
    return sorted(r.id for r in df.collect())


def _table(spark, rows):
    return spark.createDataFrame(rows, "id long, grp string, val long")


def test_mor_delete_hides_rows_without_rewriting_data(spark, tmp_path):
    path = str(tmp_path / "t")
    V.commit(_table(spark, [(i, "a", i * 10) for i in range(6)]), path)
    v2 = V.delete_where_mor(spark, path, "id >= 4", key_cols=["id"])
    assert v2 == 2
    assert _ids(V.read_version(spark, path)) == [0, 1, 2, 3]
    # time travel still sees the pre-delete snapshot
    assert _ids(V.read_version(spark, path, version=1)) == [0, 1, 2, 3, 4, 5]
    # the data directory was NOT rewritten — only a vector landed
    entries = sorted(os.listdir(path))
    assert "data-v000001" in entries and "delete-v000002" in entries
    assert not any(e.startswith("data-v000002") for e in entries)


def test_mor_scope_allows_reinserting_a_deleted_key(spark, tmp_path):
    path = str(tmp_path / "t")
    V.commit(_table(spark, [(1, "a", 10), (2, "a", 20)]), path)
    V.delete_where_mor(spark, path, "id = 2", key_cols=["id"])
    # re-insert key 2 AFTER the delete: the vector is scoped to the old
    # data dirs, so the new row must survive
    V.commit(_table(spark, [(2, "b", 99)]), path, mode="append")
    rows = {(r.id, r.grp) for r in V.read_version(spark, path).collect()}
    assert rows == {(1, "a"), (2, "b")}


def test_mor_vectors_stack_and_compact(spark, tmp_path):
    path = str(tmp_path / "t")
    V.commit(_table(spark, [(i, "a", i) for i in range(8)]), path)
    V.delete_where_mor(spark, path, "id IN (0, 1)", key_cols=["id"])
    V.delete_where_mor(spark, path, "id IN (2, 3)", key_cols=["id"])
    assert _ids(V.read_version(spark, path)) == [4, 5, 6, 7]
    v = V.compact_deletes(spark, path)
    with open(V._manifest_path(path, v)) as f:
        import json

        manifest = json.load(f)
    assert manifest["deletes"] == []  # folded away
    assert _ids(V.read_version(spark, path)) == [4, 5, 6, 7]


def test_mor_pruned_read_applies_scoped_vectors(spark, tmp_path):
    path = str(tmp_path / "t")
    V.commit_with_stats(
        _table(spark, [(i, "a", i) for i in range(4)]), path, stats_cols=["id"]
    )
    V.delete_where_mor(spark, path, "id = 1", key_cols=["id"])
    # re-insert id=1 in a later generation; pruned read must keep it
    V.commit_with_stats(
        _table(spark, [(1, "b", 100), (9, "b", 9)]), path, stats_cols=["id"]
    )
    got = {
        (r.id, r.grp)
        for r in V.read_version_pruned(spark, path, "id", 0, 10).collect()
    }
    assert got == {(0, "a"), (2, "a"), (3, "a"), (1, "b"), (9, "b")}


def test_mor_incremental_read_refuses_to_cross_a_delete(spark, tmp_path):
    path = str(tmp_path / "t")
    V.commit(_table(spark, [(1, "a", 1)]), path)
    V.delete_where_mor(spark, path, "id = 1", key_cols=["id"])
    import pytest

    with pytest.raises(ValueError, match="mode='delete'"):
        V.read_incremental(spark, path, since_version=1)


def test_expire_snapshots_keeps_referenced_vectors(spark, tmp_path):
    path = str(tmp_path / "t")
    V.commit(_table(spark, [(i, "a", i) for i in range(4)]), path)  # v1
    V.delete_where_mor(spark, path, "id = 0", key_cols=["id"])  # v2
    V.commit(_table(spark, [(10, "b", 10)]), path, mode="append")  # v3
    summary = V.expire_snapshots(path, keep_last_n=2)  # keeps v2, v3
    # the vector is still referenced by kept manifests → must survive
    assert "delete-v000002" not in summary["deleted_dirs"]
    assert _ids(V.read_version(spark, path)) == [1, 2, 3, 10]
    # after compaction + expiry the vector becomes unreferenced and dies
    V.compact_deletes(spark, path)  # v4
    summary2 = V.expire_snapshots(path, keep_last_n=1)
    assert "delete-v000002" in summary2["deleted_dirs"]
    assert _ids(V.read_version(spark, path)) == [1, 2, 3, 10]


def test_foreach_batch_cdc_mor_applies_changes_without_rewrites(spark, tmp_path):
    path = str(tmp_path / "cdc")
    V.commit(_table(spark, [(1, "a", 1), (2, "a", 2), (3, "a", 3)]), path)
    sink = V.foreach_batch_cdc_mor(path, key_cols=["id"])

    def _chg(rows):
        return spark.createDataFrame(rows, "op string, id long, grp string, val long")

    # batch 0: delete id=2, insert id=4
    sink(_chg([("delete", 2, None, None), ("insert", 4, "b", 4)]), 0)
    assert _ids(V.read_version(spark, path)) == [1, 3, 4]
    # batch 1: delete id=1 AND re-insert id=1 in the same batch — the
    # delete is scoped before the append lands, so the new row survives
    sink(_chg([("delete", 1, None, None), ("insert", 1, "b", 100)]), 1)
    rows = {(r.id, r.grp) for r in V.read_version(spark, path).collect()}
    assert rows == {(1, "b"), (3, "a"), (4, "b")}
    # replay of batch 1 must be a no-op (batch_id ledger)
    v_before = V.current_version(path)
    sink(_chg([("delete", 1, None, None), ("insert", 1, "b", 100)]), 1)
    assert V.current_version(path) == v_before
    assert {(r.id, r.grp) for r in V.read_version(spark, path).collect()} == rows
    # no data directory was ever rewritten: v1's file set is still intact
    assert _ids(V.read_version(spark, path, version=1)) == [1, 2, 3]
