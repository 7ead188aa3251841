"""VersionedStore: snapshot isolation, time travel, copy-on-write
delete, optimistic concurrency, vacuum retention."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from event_streaming_spark.sources.versioned import CommitConflict, VersionedStore


@pytest.fixture()
def store(spark, tmp_path):
    return VersionedStore(spark, str(tmp_path / "vstore"))


def test_append_and_time_travel(spark, store):
    v0 = store.append(spark.range(100).select(F.col("id")))
    v1 = store.append(spark.range(100, 150).select(F.col("id")))
    assert (v0, v1) == (0, 1)
    assert store.read(v0).count() == 100
    assert store.read(v1).count() == 150
    assert store.read().count() == 150  # latest


def test_delete_is_copy_on_write_and_auditable(spark, store):
    store.append(spark.range(1000).select(F.col("id"), (F.col("id") % 10).alias("k")))
    store.append(spark.range(1000, 2000).select(F.col("id"), (F.col("id") % 10).alias("k")))
    before_files = set(os.listdir(store.data_dir))
    v = store.delete_where(F.col("k") == 3)
    assert store.read(v).filter(F.col("k") == 3).count() == 0
    assert store.read(v).count() == 1800
    # history intact: the pre-delete snapshot still shows the rows
    assert store.read(v - 1).filter(F.col("k") == 3).count() == 200
    # copy-on-write: no pre-existing data file was modified or removed
    assert before_files <= set(os.listdir(store.data_dir))


def test_delete_untouched_files_carry_by_reference(spark, store):
    # two appends → distinct file sets; delete hits only the second
    store.append(spark.range(500).select(F.col("id")))
    store.append(spark.range(10_000, 10_500).select(F.col("id")))
    m_before = set(store.files())
    v = store.delete_where("id >= 10450")
    m_after = set(store.files(v))
    untouched = {f for f in m_before if "append" in os.path.basename(f)}
    # at least the first append's files survive by reference
    assert any(f in m_after for f in untouched)
    assert store.read(v).count() == 950


def test_compact_preserves_rows_and_history(spark, store):
    for i in range(4):
        store.append(spark.range(i * 100, (i + 1) * 100).select(F.col("id")))
    pre = store.latest_version()
    v = store.compact(target_files=1)
    assert store.read(v).count() == 400
    assert len(store.files(v)) == 1
    assert store.read(pre).count() == 400  # old snapshot still readable


def test_commit_conflict_retries_on_append(spark, store):
    store.append(spark.range(10).select(F.col("id")))
    # simulate a racing committer landing v1 first
    head = store.latest_version()
    import json

    with open(os.path.join(store.manifest_dir, f"v{head + 1}.json"), "w") as fh:
        json.dump(
            {"version": head + 1, "parent": head, "op": "append",
             "files": store._manifest(head)["files"]},
            fh,
        )
    v = store.append(spark.range(10, 20).select(F.col("id")))
    assert v == head + 2  # retried on top of the interloper
    assert store.read(v).count() == 20


def test_compact_conflict_raises_instead_of_clobbering(spark, store):
    store.append(spark.range(100).select(F.col("id")))
    # interloper appends between compact's read and its commit: patch
    # _stage_files to sneak a commit in after compact computed its input
    real_stage = store._stage_files

    def stage_and_race(df, tag):
        out = real_stage(df, tag)
        if tag == "compact":
            VersionedStore(store.spark, store.path).append(
                store.spark.range(100, 130).select(F.col("id"))
            )
        return out

    store._stage_files = stage_and_race
    with pytest.raises(CommitConflict):
        store.compact()
    store._stage_files = real_stage
    assert store.read().count() == 130  # interloper's rows intact


def test_vacuum_retention_window(spark, store):
    store.append(spark.range(100).select(F.col("id")))          # v0
    store.append(spark.range(100, 200).select(F.col("id")))     # v1
    store.compact()                                             # v2
    removed = store.vacuum(keep_last=1)
    assert removed  # pre-compaction files gone
    assert store.read().count() == 200
    with pytest.raises(Exception):
        store.read(0)
