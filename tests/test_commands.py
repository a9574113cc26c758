"""Command/introspection API tests (engine twin of commandapi.py:150-286)."""

import json
import os

import pytest


class TestListCommands:
    def test_list_input_files(self, smoke_images_dir):
        from stac_catalog_builder_ray.commands import list_input_files

        files = list_input_files(smoke_images_dir)
        assert len(files) == 1 and files[0].endswith(".parquet")
        assert list_input_files(smoke_images_dir, max_files=0) == []

    def test_list_asset_metadata(self, ray_session, smoke_images_dir):
        from stac_catalog_builder_ray.commands import list_asset_metadata

        df = list_asset_metadata(smoke_images_dir, limit=5)
        assert len(df) == 5
        assert {"asset_id", "item_id", "bbox_lat_lon", "proj_epsg"} <= set(df.columns)

    def test_list_stac_items_and_failed_files(self, ray_session, smoke_images_dir):
        from stac_catalog_builder_ray.commands import list_stac_items
        from stac_catalog_builder_ray.config import test_collection_config

        docs, failed = list_stac_items(smoke_images_dir)
        assert len(docs) == 6 and failed == []
        assert all(d["type"] == "Feature" for d in docs)
        # drop one asset type from the config -> its files become "failed"
        cfg = test_collection_config()
        cfg.item_assets = {"2m-temp-monthly": cfg.item_assets["2m-temp-monthly"]}
        docs2, failed2 = list_stac_items(smoke_images_dir, config=cfg)
        assert len(docs2) == 6  # items still form from the known asset
        assert len(failed2) == 0  # item_ids still produced -> no failures
        # the true M20 case: configured assets match NO input file
        cfg.item_assets = {"nonexistent-type": cfg.item_assets["2m-temp-monthly"]}
        docs3, failed3 = list_stac_items(smoke_images_dir, config=cfg)
        assert docs3 == [] and len(failed3) == 12


class TestValidateCollection:
    def test_valid_tree_passes(self, ray_session, smoke_images_dir, tmp_path):
        from stac_catalog_builder_ray.commands import validate_collection
        from stac_catalog_builder_ray.pipelines.catalog import build_collection

        out = str(tmp_path / "c")
        build_collection(smoke_images_dir, out, mode="linked")
        res = validate_collection(os.path.join(out, "collection.json"))
        assert res["valid"] and res["n_item_links"] == 6

    def test_dangling_link_and_bad_item_detected(self, ray_session, smoke_images_dir, tmp_path):
        from stac_catalog_builder_ray.commands import validate_collection
        from stac_catalog_builder_ray.pipelines.catalog import build_collection

        out = str(tmp_path / "c2")
        build_collection(smoke_images_dir, out, mode="linked")
        coll = os.path.join(out, "collection.json")
        # break an item: remove its datetime
        doc = json.load(open(coll))
        item_href = next(l["href"] for l in doc["links"] if l["rel"] == "item")
        item_path = os.path.normpath(os.path.join(out, item_href))
        item = json.load(open(item_path))
        del item["properties"]["datetime"]
        json.dump(item, open(item_path, "w"))
        os.remove(os.path.normpath(os.path.join(
            out, [l["href"] for l in doc["links"] if l["rel"] == "item"][1])))
        from stac_catalog_builder_ray.exceptions import DataValidationError

        with pytest.raises(DataValidationError) as e:
            validate_collection(coll)
        msg = str(e.value)
        assert "dangling item link" in msg and "properties.datetime missing" in msg


class TestParserPresets:
    def test_landsat_year_range(self):
        import pyarrow as pa

        from stac_catalog_builder_ray.functions.pathparse import make_parser

        p = make_parser(
            "LandsatNDWIInputPathParser",
            pattern=r"NDWI_(?P<asset_type>[a-z]+)_(?P<year>\d{4})-(?P<month>\d{2})-(?P<day>\d{2})\.tif$",
        )
        out = p.parse_column(pa.array(["x/NDWI_ndwi_2019-07-15.tif"]))
        # start pinned to Jan 1 even though month/day were extracted
        # (pathparsers.py:284-291)
        assert str(out["start_datetime"][0]) == "2019-01-01 00:00:00"
        assert str(out["end_datetime"][0]) == "2019-12-31 23:59:59"

    def test_people_ea_fixed_pattern(self):
        import pyarrow as pa

        from stac_catalog_builder_ray.functions.pathparse import make_parser

        p = make_parser("PeopleEAIncaCFactorInputPathParser")
        out = p.parse_column(pa.array(["d/PEOPLE_INCA_c-factor_20200715_v2.tif"]))
        assert out["asset_type"][0].as_py() == "cfactor"
        assert str(out["start_datetime"][0]) == "2020-07-15 00:00:00"
        assert str(out["end_datetime"][0]) == "2020-12-31 23:59:59"  # YEAR end

    def test_era5_month_end(self):
        import pyarrow as pa

        from stac_catalog_builder_ray.functions.pathparse import make_parser

        p = make_parser("ERA5LandInputPathParser")
        out = p.parse_column(pa.array(["e/era5-land_2021-02-10.tif"]))
        assert str(out["start_datetime"][0]) == "2021-02-10 00:00:00"
        assert str(out["end_datetime"][0]) == "2021-02-28 23:59:59"  # monthrange


class TestMediaTypeClassification:
    def test_cog_vs_plain(self, ray_session, scale_images_dir):
        """M18: media type derives from the container (raw/mbnd-flagged =
        cloud-optimized; zlib/png = plain geotiff), not a constant."""
        from stac_catalog_builder_ray.config import tiled_collection_config
        from stac_catalog_builder_ray.pipelines.catalog import asset_metadata_dataset

        md = asset_metadata_dataset(scale_images_dir, tiled_collection_config()).to_pandas()
        got = set(md["media_type"].unique())
        assert got == {
            "image/tiff; application=geotiff; profile=cloud-optimized",
            "image/tiff; application=geotiff",
        }
        # fmt cycles raw/zlib/png -> exactly 1/3 of rows are cloud-optimized
        frac = (md["media_type"].str.contains("cloud-optimized")).mean()
        assert abs(frac - 1 / 3) < 0.01


class TestVppCli:
    def test_vpp_subcommands_smoke(self, ray_session, capsys):
        """CLI surface for the VPP introspection wrappers
        (commandapi_vpp.py:131-156 twins)."""
        import json as _json

        from stac_catalog_builder_ray.commands import _main

        assert _main(["vpp-count-products", "--start", "2020-01-01",
                      "--end", "2020-03-01"]) == 0
        out = capsys.readouterr().out.strip().splitlines()[-1]
        assert _json.loads(out) == {"default": 22}
        assert _main(["vpp-collection-config", "demo",
                      "--product-types", "ndvi,fapar"]) == 0
        out = capsys.readouterr().out.strip().splitlines()[-1]
        assert _json.loads(out) == {"collection_id": "demo",
                                    "item_assets": ["fapar", "ndvi"]}


class TestCorpusManifestCli:
    def test_writes_manifest_parquet(self, ray_session, tmp_path):
        import json
        import subprocess
        import sys

        import pyarrow.parquet as pq

        out = str(tmp_path / "manifest.parquet")
        r = subprocess.run(
            [sys.executable, "-m", "stac_catalog_builder_ray",
             "corpus-manifest", "/root/testdata/sf0.001", out],
            capture_output=True, text=True, cwd="/root/repo", timeout=240)
        assert r.returncode == 0, r.stderr[-800:]
        info = json.loads(r.stdout.strip().splitlines()[-1])
        t = pq.read_table(out)
        assert t.num_rows == info["rows"] == 500
        assert set(t.column_names) == {"doc_id", "reason", "keep"}
        assert info["by_reason"].get("kept", 0) > 0
