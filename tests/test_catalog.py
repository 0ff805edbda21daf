"""Snapshot catalog: atomic commits, append as copy-on-write, rollback."""

from __future__ import annotations

import pytest

from entity_resolution_engine_spark.sources.catalog import ParquetSnapshotCatalog


@pytest.fixture()
def cat(spark, tmp_path):
    return ParquetSnapshotCatalog(spark, str(tmp_path / "cat"))


def test_write_read_roundtrip(spark, cat):
    df = spark.range(10).withColumnRenamed("id", "x")
    cat.write("t", df)
    assert cat.exists("t")
    assert cat.read("t").count() == 10


def test_missing_table_raises(cat):
    assert not cat.exists("nope")
    with pytest.raises(FileNotFoundError):
        cat.read("nope")


def test_append_is_copy_on_write_snapshot(spark, cat):
    cat.write("t", spark.range(5))
    cat.write("t", spark.range(3), mode="append")
    assert cat.read("t").count() == 8
    snaps = cat.snapshots("t")
    assert len(snaps) == 2
    # previous snapshot still readable (immutability)
    assert cat.read_snapshot("t", snaps[0]["id"]).count() == 5


def test_rollback(spark, cat):
    cat.write("t", spark.range(5))
    first = cat.snapshots("t")[0]["id"]
    cat.write("t", spark.range(100))
    assert cat.read("t").count() == 100
    cat.rollback("t", first)
    assert cat.read("t").count() == 5
    with pytest.raises(KeyError):
        cat.rollback("t", "bogus")


def test_drop(spark, cat):
    cat.write("t", spark.range(1))
    cat.drop("t")
    assert not cat.exists("t")
