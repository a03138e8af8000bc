"""The manifest-committed snapshot layer: atomic visibility, time
travel, orphan invisibility, optimistic concurrency, and crash-safe
compaction."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from connapse_spark.sources import snapshots


def _orders(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))


def test_commit_read_roundtrip_and_versioning(spark, sf_dir, tmp_path):
    t = str(tmp_path / "tbl")
    orders = _orders(spark, sf_dir)
    v0 = snapshots.commit_snapshot(orders.filter(F.col("o_orderkey") % 2 == 0), t)
    v1 = snapshots.commit_snapshot(
        orders.filter(F.col("o_orderkey") % 2 == 1), t, mode="append"
    )
    assert (v0, v1) == (0, 1)
    assert snapshots.read_snapshot(spark, t).count() == orders.count()
    # time travel: version 0 still sees only the even half
    assert (
        snapshots.read_snapshot(spark, t, version=0).count()
        == orders.filter(F.col("o_orderkey") % 2 == 0).count()
    )


def test_overwrite_replaces_visible_files(spark, sf_dir, tmp_path):
    t = str(tmp_path / "tbl")
    orders = _orders(spark, sf_dir)
    snapshots.commit_snapshot(orders, t)
    snapshots.commit_snapshot(orders.limit(10), t, mode="overwrite")
    assert snapshots.read_snapshot(spark, t).count() == 10
    assert snapshots.read_snapshot(spark, t, version=0).count() == orders.count()


def test_orphan_files_are_invisible(spark, sf_dir, tmp_path):
    """A crashed writer's leftover parquet in data/ must not leak into
    reads — visibility comes from the manifest, not the listing."""
    t = str(tmp_path / "tbl")
    orders = _orders(spark, sf_dir)
    snapshots.commit_snapshot(orders.limit(50), t)
    # simulate a crashed commit: data files staged, no manifest link
    orphan_dir = os.path.join(t, "data", "c000042-deadbeef")
    orders.limit(7).write.parquet(orphan_dir)
    assert snapshots.read_snapshot(spark, t).count() == 50


def test_concurrent_commit_conflict_detected(spark, sf_dir, tmp_path):
    t = str(tmp_path / "tbl")
    orders = _orders(spark, sf_dir)
    snapshots.commit_snapshot(orders.limit(5), t)
    # two writers both build on version 0; the second to publish loses
    snapshots.commit_snapshot(orders.limit(3), t, mode="append", base_version=0)
    with pytest.raises(snapshots.ConcurrentCommitError):
        snapshots.commit_snapshot(orders.limit(4), t, mode="append", base_version=0)
    # the loser retries against the new latest and succeeds
    v = snapshots.commit_snapshot(orders.limit(4), t, mode="append", base_version=1)
    assert v == 2
    assert snapshots.read_snapshot(spark, t).count() == 5 + 3 + 4


def test_compact_snapshot_reduces_files_and_keeps_history(spark, sf_dir, tmp_path):
    t = str(tmp_path / "tbl")
    orders = _orders(spark, sf_dir)
    # fragment deliberately: 12 small files
    snapshots.commit_snapshot(orders.repartition(12), t)
    n_before = len(snapshots.load_manifest(t)["files"])
    assert n_before >= 12
    total = sum(e["size_bytes"] for e in snapshots.load_manifest(t)["files"])
    v = snapshots.compact_snapshot(spark, t, target_bytes=total // 3 + 1)
    m = snapshots.load_manifest(t)
    assert m["version"] == v and m["mode"] == "compact"
    assert len(m["files"]) < n_before
    # same rows, and the pre-compaction version is untouched
    assert snapshots.read_snapshot(spark, t).count() == orders.count()
    assert snapshots.read_snapshot(spark, t, version=v - 1).count() == orders.count()
    assert len(snapshots.load_manifest(t, version=v - 1)["files"]) == n_before


def test_snapshot_listing_matches_manifest(spark, sf_dir, tmp_path):
    t = str(tmp_path / "tbl")
    snapshots.commit_snapshot(_orders(spark, sf_dir).repartition(4), t)
    listing = snapshots.snapshot_listing(spark, t).collect()
    m = snapshots.load_manifest(t)
    assert {(r["dir"], r["file"], r["size_bytes"]) for r in listing} == {
        (os.path.dirname(e["path"]), os.path.basename(e["path"]), e["size_bytes"])
        for e in m["files"]
    }


def test_vacuum_keeps_shared_files_and_retained_versions(spark, sf_dir, tmp_path):
    """Append lineage shares files across versions: vacuum must keep any
    file a RETAINED manifest references, drop everything else, and leave
    reads of retained versions bit-identical."""
    t = str(tmp_path / "tbl")
    orders = _orders(spark, sf_dir)
    snapshots.commit_snapshot(orders.limit(20), t)                     # v0
    snapshots.commit_snapshot(orders.limit(5), t, mode="append")       # v1 (shares v0 files)
    snapshots.commit_snapshot(orders.limit(7), t, mode="overwrite")    # v2
    snapshots.commit_snapshot(orders.limit(3), t, mode="append")       # v3 (shares v2 files)
    before_v3 = snapshots.read_snapshot(spark, t, version=3).count()
    report = snapshots.vacuum_snapshot(t, keep_last=2, min_age_seconds=0)
    assert report["kept_versions"] == [2, 3]
    assert report["removed_versions"] == [0, 1]
    assert report["removed_files"] > 0  # v0's unshared files went away
    # retained reads unchanged; dropped versions now fail loudly
    assert snapshots.read_snapshot(spark, t, version=3).count() == before_v3 == 10
    assert snapshots.read_snapshot(spark, t, version=2).count() == 7
    with pytest.raises(FileNotFoundError):
        snapshots.load_manifest(t, version=0)


def test_partitioned_commit_preserves_pruning(spark, sf_dir, tmp_path):
    """A list_id-partitioned index committed through the snapshot layer
    keeps the layout-as-index property: partition columns come back on
    read and a partition filter scans ONLY that partition's files."""
    t = str(tmp_path / "ivf_tbl")
    from connapse_spark.plans.ivf import build_ivf_index_seeded

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    index, _ = build_ivf_index_seeded(emb, n_lists=4)
    snapshots.commit_snapshot(index, t, partition_by=["list_id"])
    back = snapshots.read_snapshot(spark, t)
    assert "list_id" in back.columns
    assert back.count() == index.count()
    probe = back.filter(F.col("list_id") == 0)
    files = {r[0] for r in probe.select(F.col("_metadata.file_path")).distinct().collect()}
    assert files and all("list_id=0" in f for f in files)
    # append keeps per-commit basePaths working
    extra = index.limit(5).withColumn("id", F.col("id") + 100000)
    snapshots.commit_snapshot(extra, t, mode="append", partition_by=["list_id"])
    assert snapshots.read_snapshot(spark, t).count() == index.count() + 5


def test_compact_partitioned_lineage_merges_across_commits(spark, sf_dir, tmp_path):
    """Compacting an appended partitioned lineage must merge files ACROSS
    commits within each partition, keep the hive layout (pruning), and
    carry partition_by into the new manifest."""
    t = str(tmp_path / "ptbl")
    orders = _orders(spark, sf_dir).withColumn(
        "bucket", (F.col("o_orderkey") % 2).cast("int")
    )
    snapshots.commit_snapshot(orders.limit(40), t, partition_by=["bucket"])
    snapshots.commit_snapshot(
        orders.filter(F.col("o_orderkey") % 7 == 0).limit(30),
        t, mode="append", partition_by=["bucket"],
    )
    total_rows = snapshots.read_snapshot(spark, t).count()
    n_files_before = len(snapshots.load_manifest(t)["files"])
    v = snapshots.compact_snapshot(spark, t, target_bytes=1 << 30)  # one bin per partition
    m = snapshots.load_manifest(t)
    assert m["partition_by"] == ["bucket"]
    assert len(m["files"]) == 2  # one compacted file per bucket
    assert len(m["files"]) < n_files_before
    back = snapshots.read_snapshot(spark, t)
    assert back.count() == total_rows
    assert "bucket" in back.columns
    pruned = back.filter(F.col("bucket") == 1)
    files = {r[0] for r in pruned.select(F.col("_metadata.file_path")).distinct().collect()}
    assert files and all("bucket=1" in f for f in files)
    # history intact
    assert snapshots.read_snapshot(spark, t, version=v - 1).count() == total_rows


def test_vacuum_partitioned_lineage(spark, sf_dir, tmp_path):
    """Vacuum must handle nested hive dirs inside staging roots (a flat
    listdir would try to unlink directories) and keep the retained
    partitioned version readable with pruning intact."""
    t = str(tmp_path / "pvtbl")
    orders = _orders(spark, sf_dir).withColumn(
        "bucket", (F.col("o_orderkey") % 2).cast("int")
    )
    snapshots.commit_snapshot(orders.limit(30), t, partition_by=["bucket"])
    snapshots.commit_snapshot(orders.limit(10), t, partition_by=["bucket"])  # overwrite
    report = snapshots.vacuum_snapshot(t, keep_last=1, min_age_seconds=0)
    assert report["removed_versions"] == [0] and report["removed_files"] > 0
    back = snapshots.read_snapshot(spark, t)
    assert back.count() == 10 and "bucket" in back.columns


def test_vacuum_spares_inflight_staged_files(spark, sf_dir, tmp_path):
    """A concurrent writer stages data files BEFORE publishing its
    manifest; default vacuum must not delete fresh unreferenced files
    (they may belong to a commit about to happen). min_age_seconds=0
    opts into deleting them."""
    t = str(tmp_path / "tbl")
    orders = _orders(spark, sf_dir)
    snapshots.commit_snapshot(orders.limit(10), t)  # v0
    # simulate an in-flight commit: staged files, manifest not yet linked
    rel_dir, files = snapshots._stage_files(orders.limit(5), t, version=1)
    assert files
    report = snapshots.vacuum_snapshot(t, keep_last=1)  # default age guard
    assert report["removed_files"] == 0
    for e in files:
        assert os.path.exists(os.path.join(t, e["path"]))
    # with the guard off, the same pass reclaims them
    report = snapshots.vacuum_snapshot(t, keep_last=1, min_age_seconds=0)
    assert report["removed_files"] >= len(files)  # + _SUCCESS/.crc sidecars
    for e in files:
        assert not os.path.exists(os.path.join(t, e["path"]))


def test_append_inherits_and_validates_partition_by(spark, sf_dir, tmp_path):
    """Append onto a partitioned lineage without partition_by must inherit
    the base layout (a flat append would silently drop the hive-encoded
    columns at read time); a conflicting layout must be refused."""
    t = str(tmp_path / "ptbl")
    orders = _orders(spark, sf_dir).withColumn(
        "bucket", (F.col("o_orderkey") % 2).cast("int")
    )
    snapshots.commit_snapshot(orders.limit(20), t, partition_by=["bucket"])
    snapshots.commit_snapshot(orders.limit(6), t, mode="append")  # inherits
    m = snapshots.load_manifest(t)
    assert m["partition_by"] == ["bucket"]
    back = snapshots.read_snapshot(spark, t)
    assert back.count() == 26 and "bucket" in back.columns
    assert back.filter(F.col("bucket").isNull()).count() == 0
    with pytest.raises(ValueError, match="conflicts"):
        snapshots.commit_snapshot(
            orders.limit(3), t, mode="append", partition_by=["o_custkey"]
        )


def test_streaming_index_maintenance_commits_versions(spark, sf_dir, tmp_path):
    """Two activation waves of new embeddings -> two snapshot versions of
    the list_id-partitioned index; the final version answers a pruned
    ANN probe, and the first version is still readable (maintenance never
    breaks pinned readers)."""
    from connapse_spark.plans.ivf import ann_ivf_topk, build_ivf_index_seeded
    from connapse_spark.streaming.pipeline import streaming_index_maintenance

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    _, centroids = build_ivf_index_seeded(emb, n_lists=4)
    centroids = spark.createDataFrame(centroids.collect(), centroids.schema)

    watch = str(tmp_path / "incoming")
    table = str(tmp_path / "index_tbl")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(watch)

    # waves land as flat files in the watched dir (the parquet streaming
    # source lists the dir itself)
    emb.filter(F.col("vec_id") < 100).coalesce(1).write.mode("append").parquet(watch)
    streaming_index_maintenance(spark, watch, table, centroids, ckpt)
    from connapse_spark.sources import snapshots as snaps

    v1 = snaps.latest_version(table)
    n1 = snaps.read_snapshot(spark, table).count()
    assert n1 == 100

    emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 160)).coalesce(
        1
    ).write.mode("append").parquet(watch)
    streaming_index_maintenance(spark, watch, table, centroids, ckpt)
    assert snaps.latest_version(table) > v1
    index = snaps.read_snapshot(spark, table)
    assert index.count() == 160
    assert set(index.columns) >= {"id", "list_id", "vec", "norm"}

    # pinned reader: version v1 still sees exactly the first wave
    assert snaps.read_snapshot(spark, table, version=v1).count() == 100

    # the committed snapshot serves a pruned probe
    from connapse_spark.functions.embed import embed_py

    hits = ann_ivf_topk(index, centroids, embed_py("probe text", 64), k=5, nprobe=2)
    assert hits.count() == 5
