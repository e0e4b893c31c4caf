"""Checkpoint manifests (resume semantics) + tiling/salting."""

import os

import pytest
from pyspark.sql import functions as F

from rsgislib_spark.cells import quadcell
from rsgislib_spark.data import pages
from rsgislib_spark.functions.geoparse import geoparse
from rsgislib_spark.operators import tiling
from rsgislib_spark.plans import checkpoint


@pytest.fixture(scope="module")
def assigned(spark):
    df = tiling.assign_tiles(
        geoparse(pages.pages_df(spark, 2000)).where("lon IS NOT NULL"))
    df.persist(); df.count()
    return df


def test_assign_tiles_columns(assigned):
    for r in (5, 6, 7, 8, 9):
        assert f"cell_r{r}" in assigned.columns
    assert "s2_cell" in assigned.columns


def test_tile_name_roundtrip(spark):
    df = spark.createDataFrame(
        [(quadcell.pack(5, 3, 7),)], "cell BIGINT"
    ).select(tiling.tile_name("cell").alias("name"))
    assert df.collect()[0].name == "r5x3y7"


def test_salt_splits_hot_cells(assigned):
    salted = tiling.salt_hot_cells(assigned, "cell_r5", threshold_rows=100,
                                   salt_buckets=8)
    per_key = salted.groupBy("cell_salted").count()
    hot = tiling.hot_cells(assigned, "cell_r5", 100).collect()
    assert len(hot) >= 1  # skew fixture guarantees hot cells
    # hot cells spread across >1 salted key; max salted-key size shrinks
    max_before = max(r.n_rows for r in hot)
    max_after = per_key.agg(F.max("count")).collect()[0][0]
    assert max_after < max_before


def test_salt_precomputed_hot_list_matches_inline(assigned):
    """hot= (catalog-stat path, avoids re-executing the upstream
    pipeline for detection) produces the identical salted keys as
    inline detection at the same threshold."""
    inline = tiling.salt_hot_cells(assigned, "cell_r5", threshold_rows=100)
    hot = tiling.hot_cells(assigned, "cell_r5", 100).localCheckpoint()
    pre = tiling.salt_hot_cells(assigned, "cell_r5", hot=hot)
    a = sorted((r.url, r.cell_salted) for r in
               inline.select("url", "cell_salted").collect())
    b = sorted((r.url, r.cell_salted) for r in
               pre.select("url", "cell_salted").collect())
    assert a == b


def test_halo_explode_contains_neighbours(spark):
    df = spark.createDataFrame([(quadcell.pack(5, 10, 10),)], "cell BIGINT")
    out = tiling.halo_explode(df, "cell", res=5, k=1).collect()
    tiles = {r.tile_cell for r in out}
    assert quadcell.pack(5, 10, 10) in tiles
    assert quadcell.pack(5, 9, 10) in tiles and quadcell.pack(5, 11, 11) in tiles
    assert len(tiles) == 9
    assert all(r.home_cell == quadcell.pack(5, 10, 10) for r in out)


def test_checkpointed_write_resume(spark, assigned, tmp_path):
    path = str(tmp_path / "tiles")
    df = assigned.select("url", "lon", "lat", "cell_r5")
    r1 = checkpoint.checkpointed_write(df, path, "cell_r5")
    assert r1["written"] > 0 and r1["skipped"] == 0

    # identical rerun: everything skipped, nothing recomputed
    r2 = checkpoint.checkpointed_write(df, path, "cell_r5")
    assert r2["written"] == 0
    assert r2["skipped"] == r1["written"]

    # the data on disk is complete and readable
    back = spark.read.parquet(path)
    assert back.count() == df.count()

    # changed lineage (different plan) -> full recompute
    df2 = df.withColumn("lon", F.col("lon") + 0.0)
    r3 = checkpoint.checkpointed_write(df2, path, "cell_r5")
    assert r3["written"] == r1["written"]
    assert r3["lineage"] != r1["lineage"]
    assert spark.read.parquet(path).count() == df.count()  # idempotent overwrite


def test_manifest_contents(spark, assigned, tmp_path):
    path = str(tmp_path / "tiles2")
    df = assigned.select("url", "cell_r5")
    r = checkpoint.checkpointed_write(df, path, "cell_r5")
    mf = checkpoint.read_manifest(path)
    assert len(mf) == r["written"]
    assert sum(e["rows"] for e in mf.values()) == df.count()
    assert os.path.exists(os.path.join(path, checkpoint.MANIFEST_NAME))


def test_checkpointed_write_prunes_stale_partitions(spark, assigned, tmp_path):
    """A plan change that no longer produces some tiles must remove
    those partitions AND their manifest entries — reads of the output
    path never mix tiles from a superseded lineage."""
    path = str(tmp_path / "tiles3")
    df = assigned.select("url", "lon", "lat", "cell_r5")
    checkpoint.checkpointed_write(df, path, "cell_r5")
    all_tiles = set(checkpoint.read_manifest(path))

    keep = sorted(all_tiles)[: len(all_tiles) // 2]
    df2 = df.where(F.col("cell_r5").isin([int(t) for t in keep]))
    r = checkpoint.checkpointed_write(df2, path, "cell_r5",
                                      prune_stale=True)
    assert r["pruned"] == len(all_tiles) - len(keep)
    mf = checkpoint.read_manifest(path)
    assert set(mf) == set(keep)
    back = spark.read.parquet(path)
    assert back.count() == df2.count()
    assert {r[0] for r in back.select("cell_r5").distinct().collect()} \
        == set(keep)
    # manifest counts equal the written data per tile
    per_tile = {r[0]: r[1] for r in
                back.groupBy("cell_r5").count().collect()}
    assert {t: e["rows"] for t, e in mf.items()} == per_tile


def test_prune_default_off_keeps_old_subsets(spark, assigned, tmp_path):
    """Default (prune_stale=False): an append-style run writing a
    different tile subset must NOT delete previously written tiles —
    a benign lineage change cannot destroy data."""
    path = str(tmp_path / "tiles4")
    df = assigned.select("url", "lon", "lat", "cell_r5")
    checkpoint.checkpointed_write(df, path, "cell_r5")
    all_tiles = set(checkpoint.read_manifest(path))

    keep = sorted(all_tiles)[: len(all_tiles) // 2]
    df2 = df.where(F.col("cell_r5").isin([int(t) for t in keep]))
    r = checkpoint.checkpointed_write(df2, path, "cell_r5")
    assert r["pruned"] == 0
    # every original tile still on disk AND in the manifest
    assert set(checkpoint.read_manifest(path)) == all_tiles
    back_tiles = {r[0] for r in spark.read.parquet(path)
                  .select("cell_r5").distinct().collect()}
    assert back_tiles == {int(t) for t in all_tiles}


def test_prune_never_touches_unrecorded_partitions(spark, assigned, tmp_path):
    """prune_stale=True deletes only MANIFEST-KNOWN stale tiles;
    partitions this writer never recorded (foreign data) survive."""
    path = str(tmp_path / "tiles5")
    df = assigned.select("url", "lon", "lat", "cell_r5")
    checkpoint.checkpointed_write(df, path, "cell_r5")
    all_tiles = set(checkpoint.read_manifest(path))
    foreign = os.path.join(path, "cell_r5=987654321")
    os.makedirs(foreign)
    with open(os.path.join(foreign, "marker"), "w") as f:
        f.write("foreign")

    keep = sorted(all_tiles)[: len(all_tiles) // 2]
    df2 = df.where(F.col("cell_r5").isin([int(t) for t in keep]))
    r = checkpoint.checkpointed_write(df2, path, "cell_r5",
                                      prune_stale=True)
    assert r["pruned"] == len(all_tiles) - len(keep)
    assert os.path.exists(os.path.join(foreign, "marker"))


# ------------------------------------------------------ catalog backend

def test_catalog_dispatch_parquet_roundtrip(spark, assigned, tmp_path):
    """Path target → parquet backend; dynamic overwrite keeps re-runs
    idempotent per tile (same rows back)."""
    from rsgislib_spark.sources import catalog

    path = str(tmp_path / "cat_tiles")
    df = assigned.select("url", "lon", "lat", "cell_r5")
    assert catalog.write_partitioned(df, path, "cell_r5") == "parquet"
    # idempotent re-run
    assert catalog.write_partitioned(df, path, "cell_r5") == "parquet"
    back = catalog.read_partitioned(spark, path)
    assert back.count() == df.count()
    assert set(back.columns) == set(df.columns)


def test_catalog_identifier_requires_iceberg(spark, assigned):
    """Catalog identifiers demand the Iceberg runtime; without the
    jar (this container) the dispatch fails loudly with guidance, it
    never silently writes a path named 'db.table'."""
    from rsgislib_spark.sources import catalog

    assert catalog.is_table_identifier("local.db.tiles")
    assert not catalog.is_table_identifier("/tmp/db.table/x")
    if catalog.iceberg_available(spark):
        pytest.skip("iceberg present — dispatch would succeed")
    df = assigned.select("url", "cell_r5")
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        catalog.write_partitioned(df, "local.db.tiles", "cell_r5")


def test_catalog_path_vs_identifier_classification():
    """Filenames and paths must never route to the catalog branch."""
    from rsgislib_spark.sources import catalog

    assert catalog.is_table_identifier("local.db.tiles")
    assert catalog.is_table_identifier("prod.tiles")
    for path in ["/tmp/db.table/x", "out.parquet", "data.ORC",
                 "./rel.dir", "s3://bucket/x", "C:\\data\\t",
                 "plain_name", "warehouse.db"]:
        assert not catalog.is_table_identifier(path), path


def test_catalog_overwrite_static_vs_partitions(spark, tmp_path):
    """mode='overwrite' is a FULL-table replace (stale partitions
    gone — matches the Iceberg branch's createOrReplace), while
    'overwrite-partitions' replaces only partitions present in df."""
    from rsgislib_spark.sources import catalog

    path = str(tmp_path / "ow")
    full = spark.range(8).selectExpr("id", "id % 4 AS cell")
    catalog.write_partitioned(full, path, "cell")
    two = spark.range(4).selectExpr("id", "id % 2 AS cell")
    # dynamic: cells 2,3 survive
    catalog.write_partitioned(two, path, "cell", mode="overwrite-partitions")
    back = catalog.read_partitioned(spark, path)
    assert set(r["cell"] for r in back.select("cell").distinct().collect()) \
        == {0, 1, 2, 3}
    # static: cells 2,3 are gone
    catalog.write_partitioned(two, path, "cell", mode="overwrite")
    back = catalog.read_partitioned(spark, path)
    assert set(r["cell"] for r in back.select("cell").distinct().collect()) \
        == {0, 1}


def test_catalog_write_mode_error_is_not_coerced(spark, tmp_path):
    """mode='error' must raise on an existing target, never silently
    overwrite it."""
    import pytest as _pytest
    from rsgislib_spark.sources import catalog

    df = spark.range(4).selectExpr("id", "id % 2 AS cell")
    path = str(tmp_path / "modes.parquet")
    catalog.write_partitioned(df, path, "cell")
    with _pytest.raises(Exception):
        catalog.write_partitioned(df, path, "cell", mode="error")
    # and the original data survived
    assert catalog.read_partitioned(spark, path).count() == 4
