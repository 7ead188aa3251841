"""Bloom-filter file-skipping index (operators/bloomindex.py).

The catalog query (events_bloom_pruned_lookup) is differentially gated
by tests/test_catalog.py; these tests pin the operator contracts: zero
false negatives for every present key, actual file skipping on a layout
zone maps cannot prune, and residual-filter safety for absent keys.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from event_streaming_spark.operators.bloomindex import (
    BLOOM_HASHES,
    bloom_index,
    probe_positions,
    pruned_read_eq,
)


@pytest.fixture(scope="module")
def indexed(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bloomidx"))
    # 2000 unique keys spread hash-random across 8 files by a DIFFERENT
    # column: every file's key min/max spans ~the full domain, so range
    # zones prune nothing — the exact case bloom filters exist for.
    df = spark.range(2000).select(
        F.col("id").alias("k"),
        (F.col("id") % 37).alias("grp"),
        (F.col("id") * 3).alias("payload"),
    )
    df.repartition(8, "grp").write.mode("overwrite").parquet(root)
    manifest = bloom_index(spark, root, "k").cache()
    manifest.count()
    return root, manifest


def test_no_false_negatives_and_it_actually_skips(spark, indexed):
    root, manifest = indexed
    skipped_any = False
    for key in (0, 1, 777, 1337, 1999):
        df, read, total = pruned_read_eq(spark, root, manifest, "k", key)
        rows = df.collect()
        assert [r["k"] for r in rows] == [key]
        assert rows[0]["payload"] == key * 3
        assert total == 8 and 1 <= read <= total
        skipped_any = skipped_any or read < total
    # at 250 keys/file vs 2^17 bits the fp rate is ~0: pruning must engage
    assert skipped_any


def test_absent_key_returns_empty_even_on_false_positive(spark, indexed):
    root, manifest = indexed
    for key in (2001, 50_000, -5):
        df, read, total = pruned_read_eq(spark, root, manifest, "k", key)
        assert df.count() == 0  # residual equality makes fp harmless
        assert read <= total


def test_probe_positions_deterministic_and_k_sized(spark):
    p1 = probe_positions(spark, 12345, "long")
    p2 = probe_positions(spark, 12345, "long")
    assert p1 == p2 and len(p1) == BLOOM_HASHES
    assert p1 != probe_positions(spark, 12346, "long")


def test_saturated_bitmap_degrades_to_full_scan_not_wrong_answer(spark, tmp_path):
    root = str(tmp_path / "sat")
    # one file, keys >> bits/9: bitmap saturates, every probe survives
    spark.range(300_000).select(F.col("id").alias("k")).coalesce(1).write.parquet(root)
    manifest = bloom_index(spark, root, "k")
    df, read, total = pruned_read_eq(spark, root, manifest, "k", 299_999)
    assert (read, total) == (1, 1)
    assert df.collect()[0]["k"] == 299_999


def test_bloom_probe_type_derived_from_table_schema(spark, tmp_path):
    """r6 review: xxhash64 is type-sensitive, so a caller-guessed probe
    type (e.g. 'long' against an int32 column) made every probe hash
    differ from the build hashes — a silent Bloom FALSE NEGATIVE.  The
    probe type now comes from the table's own schema."""
    from pyspark.sql import functions as F

    from event_streaming_spark.operators.bloomindex import bloom_index, pruned_read_eq

    path = str(tmp_path / "t32")
    spark.range(1000).select(F.col("id").cast("int").alias("k")).repartition(4).write.parquet(path)
    manifest = bloom_index(spark, path, "k")
    df, read, total = pruned_read_eq(spark, path, manifest, "k", 42)
    assert df.count() == 1, "int32-keyed probe must find its row"
    assert 0 < read <= total
