"""End-to-end catalog pipeline tests: golden parity with the reference's
checked-in output trees (tests/data/reference/{basic,grouped,unlinked}),
mirroring the reference's own normalization (test_commandapi.py:20-57):
``created`` blanked, asset hrefs relativized to their basename, links sorted.

One extra normalization is engine-specific and documented: ``file:size``
(our payloads are our own containers, not the mock 346140-byte GeoTIFFs).
Everything else — ids, geometry, bbox, proj fields, datetimes, links, asset
titles/descriptions/eo:bands, ``raster:bands`` (incl. the real extracted
``data_type: float64``), file counts, extents — must match byte-for-byte.
"""

import glob
import json
import os

import numpy as np
import pytest

REF_ROOT = "/root/reference/tests/data/reference"


def _norm_item(d: dict) -> dict:
    d = json.loads(json.dumps(d))
    d["properties"]["created"] = ""
    for a in d["assets"].values():
        a["href"] = os.path.basename(a["href"])
        a.pop("file:size", None)
    d["links"] = sorted(d["links"], key=repr)
    return d


def _compare_tree(ref_dir: str, out_dir: str):
    ref_files = sorted(glob.glob(f"{ref_dir}/**/*.json", recursive=True))
    got_files = sorted(glob.glob(f"{out_dir}/**/*.json", recursive=True))
    rel_r = [os.path.relpath(p, ref_dir) for p in ref_files]
    rel_g = [os.path.relpath(p, out_dir) for p in got_files]
    assert rel_r == rel_g, f"file sets differ: missing={set(rel_r)-set(rel_g)} extra={set(rel_g)-set(rel_r)}"
    for rel in rel_r:
        a = json.load(open(os.path.join(ref_dir, rel)))
        b = json.load(open(os.path.join(out_dir, rel)))
        if a.get("type") == "Feature":
            a, b = _norm_item(a), _norm_item(b)
        assert a == b, f"{rel} differs"


@pytest.fixture(scope="module")
def built_catalogs(ray_session, smoke_images_dir, tmp_path_factory):
    from stac_catalog_builder_ray.pipelines.catalog import (
        build_collection,
        build_grouped_collections,
    )

    root = tmp_path_factory.mktemp("catalogs")
    basic = str(root / "basic")
    grouped = str(root / "grouped")
    unlinked = str(root / "unlinked")
    r1 = build_collection(smoke_images_dir, basic, mode="linked")
    r2 = build_grouped_collections(smoke_images_dir, grouped)
    r3 = build_collection(smoke_images_dir, unlinked, mode="unlinked")
    return {"basic": (basic, r1), "grouped": (grouped, r2), "unlinked": (unlinked, r3)}


class TestGoldenParity:
    def test_basic_tree(self, built_catalogs):
        out, stats = built_catalogs["basic"]
        assert stats["n_items"] == 6  # 12 assets -> 6 items (test_builder.py:242-244)
        _compare_tree(f"{REF_ROOT}/basic", out)

    def test_grouped_tree(self, built_catalogs):
        out, stats = built_catalogs["grouped"]
        assert stats["n_groups"] == 2 and stats["children"] == ["foo-2023-v01_2000", "foo-2023-v01_2001"]
        _compare_tree(f"{REF_ROOT}/grouped", out)

    def test_unlinked_tree(self, built_catalogs):
        out, _ = built_catalogs["unlinked"]
        _compare_tree(f"{REF_ROOT}/unlinked", out)

    def test_extent(self, built_catalogs):
        _, stats = built_catalogs["basic"]
        assert stats["extent_bbox"] == [0.0, 0.0, 240.0, 180.0]
        assert stats["interval"] == ["2000-01-01T00:00:00Z", "2001-03-31T23:59:59Z"]


class TestExtractStage:
    def test_metadata_columns(self, ray_session, smoke_images_dir):
        from stac_catalog_builder_ray.pipelines.catalog import asset_metadata_dataset

        md = asset_metadata_dataset(smoke_images_dir).to_pandas()
        assert len(md) == 12
        assert md["item_id"].nunique() == 6
        assert (md["proj_epsg"] == 4326).all()
        assert md["decode_ok"].all()
        row = md.iloc[0]
        assert list(row["bbox_projected"]) == [0.0, 180.0, 240.0, 0.0]  # identity-transform quirk
        assert list(row["bbox_lat_lon"]) == [0.0, 0.0, 240.0, 180.0]
        assert list(row["transform"]) == [1.0, 0.0, 0.0, 0.0, 1.0, 0.0]
        assert list(row["shape"]) == [180, 240]

    def test_scale_set_crs_and_skew(self, ray_session, scale_images_dir):
        from stac_catalog_builder_ray.config import tiled_collection_config
        from stac_catalog_builder_ray.pipelines.catalog import asset_metadata_dataset

        md = asset_metadata_dataset(scale_images_dir, tiled_collection_config()).to_pandas()
        assert len(md) == 300
        assert md["decode_ok"].all()
        epsgs = set(md["proj_epsg"].unique())
        assert 4326 in epsgs and any(32600 < e <= 32660 for e in epsgs)
        # 30% of rows on the hot tile (skew injection)
        assert abs((md["tile_id"] == "E07N12").mean() - 0.3) < 0.01
        # cell centroids of UTM rows round-trip into their tile bbox
        from stac_catalog_builder_ray.datagen import tile_geo

        utm = md[md["proj_epsg"] != 4326].iloc[0]
        g = tile_geo(utm["tile_id"])
        assert g["west"] - 0.01 <= utm["lon"] <= g["east"] + 0.01
        assert g["south"] - 0.01 <= utm["lat"] <= g["north"] + 0.01

    def test_per_row_invariant(self, ray_session, smoke_images_dir, scale_images_dir):
        import ray.data

        from stac_catalog_builder_ray.stages.extract import InvariantCheck

        for d in (smoke_images_dir, scale_images_dir):
            res = (
                ray.data.read_parquet(d)
                .map_batches(InvariantCheck, batch_format="pyarrow", concurrency=2)
                .to_pandas()
            )
            assert res["pixels_ok"].all()
            assert res["caption_ok"].all()

    def test_unknown_asset_types_dropped(self, ray_session, smoke_images_dir):
        """M19/M20: assets whose type is not configured produce no item."""
        from stac_catalog_builder_ray.config import test_collection_config
        from stac_catalog_builder_ray.pipelines.catalog import (
            asset_metadata_dataset,
            items_dataset,
        )

        cfg = test_collection_config()
        cfg.item_assets = {"2m-temp-monthly": cfg.item_assets["2m-temp-monthly"]}
        items = items_dataset(asset_metadata_dataset(smoke_images_dir, cfg), cfg).to_pandas()
        assert len(items) == 6
        assert (items["n_assets"] == 1).all()  # precip assets filtered out


class TestFusedFlagship:
    def test_fused_matches_unfused(self, ray_session, scale_images_dir):
        """The fused single-pass headline must produce identical counts to
        the materializing variant."""
        from stac_catalog_builder_ray.pipelines.spatial_catalog import (
            index_and_join,
            index_and_join_fused,
        )

        a = index_and_join(scale_images_dir, out_root=None, checkpoint=False,
                           extract_concurrency=2)
        b = index_and_join_fused(scale_images_dir)
        assert b["n_items"] == a["n_items"]
        assert b["n_pip_matches"] == a["n_pip_matches"]
        assert b["n_tile_pairs"] == a["n_tile_pairs"]

    def test_checkpointed_flagship_resume(self, ray_session, scale_images_dir, tmp_path):
        """Killed-run semantics: second run writes zero new partitions."""
        from stac_catalog_builder_ray.pipelines.spatial_catalog import index_and_join

        root = str(tmp_path / "ckpt")
        r1 = index_and_join(scale_images_dir, out_root=root, checkpoint=True,
                            extract_concurrency=2)
        assert r1["partitions_written"] > 0
        r2 = index_and_join(scale_images_dir, out_root=root, checkpoint=True,
                            extract_concurrency=2)
        assert r2["partitions_written"] == 0
        from stac_catalog_builder_ray.state.checkpoint import CheckpointStore
        import os

        store = CheckpointStore(os.path.join(root, "items_by_cell"))
        mf = store.metrics_frame()
        assert mf["rows"].sum() == r1["n_items"]  # lineage row counts add up

    def test_salted_flagship_counts_unchanged(self, ray_session,
                                              scale_images_dir, tmp_path):
        """SURVEY §4 hot-cell salting wired into the flagship sink: the
        scale set's 30% hot tile splits into cell#salt sub-partitions with
        bounded rows, and every headline count is identical to the unsalted
        run."""
        import os

        from stac_catalog_builder_ray.pipelines.spatial_catalog import index_and_join
        from stac_catalog_builder_ray.state.checkpoint import CheckpointStore

        plain = index_and_join(scale_images_dir, out_root=None, checkpoint=False,
                               extract_concurrency=2)
        threshold = max(2, plain["n_items"] // 20)
        root = str(tmp_path / "salted-flagship")
        salted = index_and_join(scale_images_dir, out_root=root, checkpoint=True,
                                extract_concurrency=2,
                                salt_hot_threshold=threshold)
        for k in ("n_items", "n_pip_matches", "n_tile_pairs"):
            assert salted[k] == plain[k], k

        mf = CheckpointStore(os.path.join(root, "items_by_cell")).metrics_frame()
        assert mf["rows"].sum() == plain["n_items"]
        assert mf["partition"].str.contains("#").all()  # salted id scheme
        # the hot tile's cell must actually have split
        base = mf["partition"].str.rsplit("#", n=1).str[0]
        assert (base.value_counts() > 1).any()
        assert mf["rows"].max() <= 3 * threshold  # bounded sub-partitions


class TestAssemblyEquivalence:
    def test_bucketed_equals_per_item_reference_impl(self, ray_session, scale_images_dir):
        """assemble_bucket (fast path) must reproduce assemble_items (the
        direct transcription of the reference semantics) row for row."""
        import pandas as pd

        from stac_catalog_builder_ray.config import tiled_collection_config
        from stac_catalog_builder_ray.pipelines.catalog import asset_metadata_dataset
        from stac_catalog_builder_ray.stages.assemble import assemble_bucket, assemble_items

        cfg = tiled_collection_config()
        known = frozenset(cfg.item_assets)
        md = asset_metadata_dataset(scale_images_dir, cfg).to_pandas()

        fast = assemble_bucket(md, known).sort_values("item_id").reset_index(drop=True)
        slow = pd.concat(
            [assemble_items(g, known) for _, g in md.groupby("item_id", sort=True)],
            ignore_index=True,
        ).sort_values("item_id").reset_index(drop=True)

        assert len(fast) == len(slow)
        for col in ("item_id", "west", "south", "east", "north", "proj_epsg",
                    "year", "cell", "n_assets", "assets_json", "tile_id"):
            assert list(fast[col]) == list(slow[col]), f"column {col} differs"


class TestCaptionConsistency:
    def test_healthy_table_and_planted_corruption(self, ray_session, scale_images_dir):
        import pyarrow.parquet as pq
        import ray.data

        from stac_catalog_builder_ray.stages.extract import validate_captions

        t = pq.read_table(scale_images_dir)
        sums = validate_captions(ray.data.read_parquet(scale_images_dir))
        assert sums["sum(n_rows)"] == t.num_rows
        assert sums["sum(n_missing_parse)"] == 0
        assert sums["sum(n_mismatch)"] == 0

        # corrupt 3 captions + 2 unparseable ids -> exact counts
        import pyarrow as pa
        cap = t["caption"].to_pylist()
        ids = t["image_id"].to_pylist()
        cap[5] = "wrong"; cap[17] = ""; cap[40] = cap[40] + "!"
        ids[3] = "garbage-path"; ids[9] = "also/bad"
        t2 = t.set_column(t.schema.get_field_index("caption"), "caption", pa.array(cap))
        t2 = t2.set_column(t2.schema.get_field_index("image_id"), "image_id", pa.array(ids))
        sums2 = validate_captions(ray.data.from_arrow(t2))
        assert sums2["sum(n_missing_parse)"] == 2
        assert sums2["sum(n_mismatch)"] == 3
