"""Checkpoint/resume semantics (north_rule): kill after stage N,
re-run, identical final table, no duplicate work."""

import os

import pytest
from pyspark.sql import functions as F

from ctinexus_spark.checkpoint import StageStore, with_lineage
from ctinexus_spark.metrics import measure_partitions


@pytest.fixture
def docs(spark):
    return spark.createDataFrame(
        [(f"u{i}", f"text {i}") for i in range(10)], "url string, text string"
    )


def test_commit_and_load(spark, docs, tmp_path):
    store = StageStore(str(tmp_path))
    store.commit(docs, "stage1")
    assert store.is_committed("stage1")
    got = store.load(spark, "stage1")
    assert got.count() == 10


def test_uncommitted_returns_none(spark, tmp_path):
    store = StageStore(str(tmp_path))
    assert store.load(spark, "nope") is None


def test_torn_write_not_committed(spark, docs, tmp_path):
    store = StageStore(str(tmp_path))
    # simulate a crash: a version dir exists, but no manifest names it
    os.makedirs(tmp_path / "stage1" / "v_0", exist_ok=True)
    assert not store.is_committed("stage1")
    assert store.remaining(spark, docs, "stage1").count() == 10


def test_resume_append_is_crash_safe(spark, docs, tmp_path):
    """The commit protocol must never have a window where the prior
    committed snapshot is unreadable: version dirs are immutable and
    the manifest swap is atomic, so a crash mid-resume (new version
    written, manifest not yet swapped) leaves the old snapshot live."""
    import pyspark.sql.functions as SF

    store = StageStore(str(tmp_path))
    first = docs.filter(SF.col("url").isin(*[f"u{i}" for i in range(5)]))
    store.commit(first.withColumn("out", SF.upper("text")), "s")
    manifest_before = open(tmp_path / "s" / "_MANIFEST.json").read()

    # simulate the crash window: a fresh version dir appears (as if
    # written by a resume that died before the manifest swap)
    second = docs.filter(SF.col("url") == "u7").withColumn("out", SF.upper("text"))
    second.write.parquet(str(tmp_path / "s" / "v_1"))
    assert open(tmp_path / "s" / "_MANIFEST.json").read() == manifest_before
    assert store.load(spark, "s").count() == 5  # old snapshot intact

    # the next resume garbage-collects the orphan and re-runs u5..u9
    processed = []

    def transform(df):
        processed.extend(r.url for r in df.select("url").collect())
        return df.withColumn("out", SF.upper("text"))

    final = store.run_stage(spark, "s", docs, transform)
    assert sorted(processed) == [f"u{i}" for i in range(5, 10)]
    assert final.count() == 10


def test_resume_processes_only_missing(spark, docs, tmp_path):
    store = StageStore(str(tmp_path))
    first_half = docs.filter(F.col("url").isin(*[f"u{i}" for i in range(5)]))
    store.commit(first_half.withColumn("out", F.upper("text")), "s")

    processed_urls = []

    def transform(df):
        processed_urls.extend(r.url for r in df.select("url").collect())
        return df.withColumn("out", F.upper("text"))

    final = store.run_stage(spark, "s", docs, transform)
    # only the 5 missing urls were re-processed
    assert sorted(processed_urls) == [f"u{i}" for i in range(5, 10)]
    assert final.count() == 10
    # idempotent: second resume does nothing new
    processed_urls.clear()
    final2 = store.run_stage(spark, "s", docs, transform)
    assert processed_urls == []
    assert final2.count() == 10
    rows = {(r.url, r.out) for r in final2.collect()}
    assert rows == {(f"u{i}", f"TEXT {i}") for i in range(10)}


def test_compact_merges_versions_and_preserves_rows(spark, docs, tmp_path):
    import json as _json

    import pyspark.sql.functions as SF

    store = StageStore(str(tmp_path))

    def transform(df):
        return df.withColumn("out", SF.upper("text"))

    for hi in (4, 7, 10):  # three resumes → three version dirs
        subset = docs.filter(SF.col("url").isin(*[f"u{i}" for i in range(hi)]))
        store.run_stage(spark, "s", subset, transform)
    manifest = _json.load(open(tmp_path / "s" / "_MANIFEST.json"))
    assert len(manifest["versions"]) == 3

    store.compact(spark, "s")
    manifest = _json.load(open(tmp_path / "s" / "_MANIFEST.json"))
    assert len(manifest["versions"]) == 1
    assert store.load(spark, "s").count() == 10
    # resume still works after compaction (and GCs superseded dirs)
    final = store.run_stage(spark, "s", docs, transform)
    assert {(r.url, r.out) for r in final.collect()} == {
        (f"u{i}", f"TEXT {i}") for i in range(10)
    }


def test_recommit_crash_preserves_previous_snapshot(spark, docs, tmp_path):
    """Re-committing an already-committed stage must not garbage-
    collect the live snapshot before the manifest swap: a crash between
    the new version write and the swap leaves is_committed() true with
    the OLD data still readable (ADVICE round-2 medium finding)."""
    store = StageStore(str(tmp_path))
    first = docs.filter(F.col("url") == "u0")
    store.commit(first, "s")

    def boom(*a, **k):
        raise RuntimeError("crash before manifest swap")

    orig = store._write_manifest
    store._write_manifest = boom
    second = docs.filter(F.col("url") == "u1")
    with pytest.raises(RuntimeError):
        store.commit(second, "s")
    store._write_manifest = orig

    assert store.is_committed("s")
    assert [r.url for r in store.load(spark, "s").collect()] == ["u0"]

    # a successful re-commit supersedes cleanly, and the next append
    # garbage-collects the superseded dirs
    store.commit(second, "s")
    assert [r.url for r in store.load(spark, "s").collect()] == ["u1"]
    final = store.run_stage(spark, "s", docs, lambda d: d)
    assert final.count() == 10


class FakeCatalogStore:
    """IcebergStageStore over an in-memory catalog: the five
    DataFrameWriterV2 primitives record snapshot history per table so
    the contract (append-only snapshots, atomic row-replace on
    re-commit, O(delta) resume appends) is assertable without the
    Iceberg runtime jar."""

    def __init__(self, spark):
        from ctinexus_spark.checkpoint import IcebergStageStore

        self.tables: dict[str, list] = {}  # table -> snapshot list (DataFrames)
        self.ops: list[tuple[str, str]] = []

        outer = self

        class _Store(IcebergStageStore):
            def _exists(self, table):
                return table in outer.tables

            def _create(self, df, table, partition_by):
                outer.ops.append(("create", table))
                outer.tables[table] = [df.localCheckpoint(eager=True)]

            def _append(self, df, table):
                outer.ops.append(("append", table))
                outer.tables[table].append(df.localCheckpoint(eager=True))

            def _replace_rows(self, df, table):
                outer.ops.append(("replace_rows", table))
                # one new snapshot whose visible rows replace all prior
                # ones — history list keeps growing (Iceberg semantics)
                outer.tables[table].append(df.localCheckpoint(eager=True))
                outer.tables[table] = [outer.tables[table][-1]]

            def _read(self, table):
                from functools import reduce

                return reduce(lambda a, b: a.unionByName(b), outer.tables[table])

        self.store = _Store(spark, "fake")


def test_iceberg_contract_resume_appends_delta(spark, docs):
    fake = FakeCatalogStore(spark)
    store = fake.store
    first = docs.filter(F.col("url").isin(*[f"u{i}" for i in range(5)]))

    processed = []

    def transform(df):
        processed.extend(r.url for r in df.select("url").collect())
        return df.withColumn("out", F.upper("text"))

    store.run_stage(spark, "s", first, transform)
    assert [op for op, _ in fake.ops] == ["create"]

    final = store.run_stage(spark, "s", docs, transform)
    # only the 5 missing urls re-ran, shipped as ONE append snapshot
    assert sorted(processed)[5:] == [f"u{i}" for i in range(5, 10)]
    assert [op for op, _ in fake.ops] == ["create", "append"]
    assert final.count() == 10

    # idempotent: nothing left → no new snapshot
    processed.clear()
    store.run_stage(spark, "s", docs, transform)
    assert processed == []
    assert [op for op, _ in fake.ops] == ["create", "append"]


def test_iceberg_contract_recommit_replaces_rows_not_table(spark, docs):
    """commit() on an existing table must produce a row-replacing
    snapshot (overwrite(lit(True))), never a createOrReplace that
    rewrites table metadata (round-2 verdict finding #3)."""
    fake = FakeCatalogStore(spark)
    store = fake.store
    store.commit(docs.filter(F.col("url") == "u0"), "s")
    store.commit(docs.filter(F.col("url") == "u1"), "s")
    assert [op for op, _ in fake.ops] == ["create", "replace_rows"]
    assert [r.url for r in store.load(spark, "s").collect()] == ["u1"]


def test_iceberg_store_gated_on_catalog(spark):
    """The real-catalog gate must report unavailable in this sandbox
    (a cluster build flips it by configuring spark.sql.catalog.<name>
    with the Iceberg runtime jar)."""
    from ctinexus_spark.checkpoint import IcebergStageStore

    assert not IcebergStageStore.is_available(spark, "iceberg")


def test_lineage_columns(spark, docs):
    got = with_lineage(docs, "ie")
    rows = got.collect()
    assert all(r._stage == "ie" for r in rows)
    assert all(r._partition_id >= 0 for r in rows)


def test_metrics_rows(spark, docs):
    m = measure_partitions(docs.repartition(4), "ie").collect()
    assert sum(r.rows for r in m) == 10
    assert all(r.stage == "ie" for r in m)
    assert len({r.partition_id for r in m}) >= 1
    assert all(r.tokens_in >= r.rows for r in m if r.rows)
