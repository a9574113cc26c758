"""Unit tests for the vectorized scalar-function layer (no Ray)."""

import numpy as np
import pyarrow as pa
import pytest

from stac_catalog_builder_ray.functions.datetimes import (
    iso_z,
    period_end,
    ymd_to_datetime64,
)
from stac_catalog_builder_ray.functions.pathparse import RegexPathParser, make_parser
from stac_catalog_builder_ray.functions.rounding import (
    resolution_precision,
    round_to_precision,
)


class TestDatetimes:
    def test_ymd(self):
        out = ymd_to_datetime64([2000, 2024], [1, 2], [1, 29])
        assert str(out[0]) == "2000-01-01T00:00:00.000000"
        assert str(out[1]) == "2024-02-29T00:00:00.000000"

    # period-end table mirrors the reference's parametrized tests
    # (tests/test_pathparser.py daily/monthly/yearly)
    @pytest.mark.parametrize(
        "period,start,end",
        [
            ("monthly", "2000-01-01", "2000-01-31T23:59:59"),
            ("monthly", "2000-02-15", "2000-02-29T23:59:59"),  # leap year monthrange
            ("monthly", "2001-02-01", "2001-02-28T23:59:59"),
            ("yearly", "2000-06-01", "2000-12-31T23:59:59"),
            ("daily", "2000-01-05", "2000-01-05T23:59:59"),
            ("secondly", "2000-01-05", "2000-01-05T00:00:01"),
        ],
    )
    def test_period_end(self, period, start, end):
        got = period_end(np.array([start], "M8[us]"), period)
        assert str(got[0]).startswith(end)

    def test_iso_z(self):
        assert iso_z(np.datetime64("2000-01-01T00:00:00", "us")) == "2000-01-01T00:00:00Z"


class TestPathParser:
    def test_smoke_parser(self):
        p = make_parser("SmokeObservationsParser")
        out = p.parse_column(
            pa.array(
                [
                    "2000/observations_2m-temp-monthly_2000-01-01.tif",
                    "not-a-match.txt",
                ]
            )
        )
        assert out["asset_type"].to_pylist() == ["2m-temp-monthly", None]
        assert out["item_id"].to_pylist() == ["observations_2000-01-01", None]
        assert out["end_datetime"].to_pylist()[0].isoformat() == "2000-01-31T23:59:59"

    def test_tiled_parser(self):
        p = make_parser("TiledObservationsParser")
        out = p.parse_column(
            pa.array(["tiles/E07N12/2003/observations_tot-precip-monthly_E07N12_2003-11-01.tif"])
        )
        assert out["tile"].to_pylist() == ["E07N12"]
        assert out["item_id"].to_pylist() == ["observations_E07N12_2003-11-01"]

    def test_fixed_value_templating(self):
        p = RegexPathParser(
            pattern=r"(?P<a>\w+)-(?P<b>\w+)\.dat$",
            fixed_values={"combo": "x_{a}_{b}", "const": "k"},
        )
        out = p.parse_column(pa.array(["foo-bar.dat"]))
        assert out["combo"].to_pylist() == ["x_foo_bar"]
        assert out["const"].to_pylist() == ["k"]

    def test_unknown_parser_raises(self):
        with pytest.raises(ValueError, match="Unknown parser"):
            make_parser("NoSuchParser")

    def test_no_named_groups_raises(self):
        with pytest.raises(ValueError, match="named groups"):
            RegexPathParser(pattern=r"\d+")

    def test_bad_period_raises(self):
        with pytest.raises(ValueError, match="period"):
            RegexPathParser(pattern=r"(?P<year>\d{4})", period="weekly")


class TestRounding:
    def test_reference_rule(self):
        # mapper.py:134: res 1.0 -> |log10(0.001)| = 3; res 10 -> 2; res 0.00625 -> 5
        np.testing.assert_array_equal(resolution_precision([1.0, 10.0, 0.00625]), [3, 2, 5])

    def test_fallback_six(self):
        np.testing.assert_array_equal(resolution_precision([0.0, np.nan]), [6, 6])

    def test_round_rows(self):
        got = round_to_precision(np.array([[1.23456, 9.87654], [1.23456, 9.87654]]), np.array([2, 4]))
        np.testing.assert_allclose(got, [[1.23, 9.88], [1.2346, 9.8765]])


class TestAntimeridianSplit:
    def test_zone1_wrapped_bbox_fixed(self):
        """The LCM-10 workflow's motivating case (workflow.py:124-145): a UTM
        zone-01 tile straddling the antimeridian gets a sane single-side
        bbox, not a world-spanning or out-of-range one."""
        import numpy as np
        import pandas as pd

        from stac_catalog_builder_ray.functions.registry import get_postprocessor
        from stac_catalog_builder_ray.geo.crs import project_points

        xs, ys = project_points(np.array([179.6, -179.6]), np.array([50.0, 51.0]), 4326, 32601)
        pw, pe = sorted(xs)
        ps, pn = sorted(ys)
        row = {
            "item_id": "x", "west": -180.47, "south": 50.0, "east": -179.5, "north": 51.0,
            "bbox_lat_lon": [-180.47, 50.0, -179.5, 51.0],
            "bbox_projected": [pw, ps, pe, pn], "proj_epsg": 32601,
            "lon": -179.98, "lat": 50.5, "cell": int((6 << 58) | 0),
        }
        out = get_postprocessor("antimeridian_split")(pd.DataFrame([row]))
        r = out.iloc[0]
        assert -180 <= r["west"] <= r["east"] <= 180
        assert r["east"] - r["west"] < 180
        assert r["west"] < 0 and r["east"] < 0  # zone 01 -> negative-lon side

    def test_normal_rows_untouched(self):
        import pandas as pd

        from stac_catalog_builder_ray.functions.registry import get_postprocessor

        row = {"item_id": "y", "west": 1.0, "south": 2.0, "east": 3.0, "north": 4.0,
               "bbox_lat_lon": [1.0, 2.0, 3.0, 4.0], "bbox_projected": [1.0, 2.0, 3.0, 4.0],
               "proj_epsg": 4326, "lon": 2.0, "lat": 3.0, "cell": 0}
        df = pd.DataFrame([row])
        out = get_postprocessor("antimeridian_split")(df)
        pd.testing.assert_frame_equal(out, df)


    def test_zone1_south_utm_wrapped_bbox_fixed(self):
        """Southern-hemisphere UTM (EPSG 327xx) zone 01/60 tiles wrap the
        antimeridian exactly like their northern twins; round-2 advice: the
        326xx-only gate silently skipped them."""
        import numpy as np
        import pandas as pd

        from stac_catalog_builder_ray.functions.registry import get_postprocessor
        from stac_catalog_builder_ray.geo.crs import project_points

        xs, ys = project_points(np.array([179.6, -179.6]), np.array([-51.0, -50.0]), 4326, 32701)
        pw, pe = sorted(xs)
        ps, pn = sorted(ys)
        row = {
            "item_id": "s", "west": -180.47, "south": -51.0, "east": -179.5, "north": -50.0,
            "bbox_lat_lon": [-180.47, -51.0, -179.5, -50.0],
            "bbox_projected": [pw, ps, pe, pn], "proj_epsg": 32701,
            "lon": -179.98, "lat": -50.5, "cell": int((6 << 58) | 0),
        }
        out = get_postprocessor("antimeridian_split")(pd.DataFrame([row]))
        r = out.iloc[0]
        assert -180 <= r["west"] <= r["east"] <= 180
        assert r["east"] - r["west"] < 180
        assert r["west"] < 0 and r["east"] < 0  # zone 01 -> negative-lon side

    def test_null_epsg_rows_skipped_not_crashed(self):
        import pandas as pd

        from stac_catalog_builder_ray.functions.registry import get_postprocessor

        rows = [
            {"item_id": "n", "west": 1.0, "south": 2.0, "east": 3.0, "north": 4.0,
             "bbox_lat_lon": [1.0, 2.0, 3.0, 4.0], "bbox_projected": [1.0, 2.0, 3.0, 4.0],
             "proj_epsg": None, "lon": 2.0, "lat": 3.0, "cell": 0},
            # wrapped-looking bbox + null epsg: must be skipped, not int(None)
            {"item_id": "m", "west": -180.47, "south": 2.0, "east": 179.5, "north": 4.0,
             "bbox_lat_lon": [-180.47, 2.0, 179.5, 4.0],
             "bbox_projected": [0.0, 0.0, 1.0, 1.0],
             "proj_epsg": None, "lon": 2.0, "lat": 3.0, "cell": 0},
        ]
        df = pd.DataFrame(rows)
        out = get_postprocessor("antimeridian_split")(df)
        pd.testing.assert_frame_equal(out, df)


class TestEpsgInference:
    """terracatalog.py:654-672 chain (M13, completed in round 3)."""

    def test_conforms_to_url_wins(self):
        from stac_catalog_builder_ray.functions.epsg import infer_epsg

        assert infer_epsg("http://www.opengis.net/def/crs/EPSG/0/3035", "E09N27") == 3035
        assert infer_epsg("https://x/EPSG/0/32631", None) == 32631

    def test_unparsable_url_falls_through_to_tile(self):
        from stac_catalog_builder_ray.functions.epsg import infer_epsg

        assert infer_epsg("http://x/EPSG/0/not-a-number", "31UFS") == 32631
        # URL without EPSG marker is ignored entirely
        assert infer_epsg("http://x/crs/whatever/99", "05VMG") == 32605

    def test_tile_digits_make_northern_utm(self):
        from stac_catalog_builder_ray.functions.epsg import infer_epsg

        assert infer_epsg(None, "20LLQ") == 32620
        assert infer_epsg(None, "E09N27") == 32609  # first digit run

    def test_default_4326(self):
        from stac_catalog_builder_ray.functions.epsg import infer_epsg

        assert infer_epsg(None, None) == 4326
        assert infer_epsg(None, "NODIGITS") == 4326
        assert infer_epsg("", "") == 4326

    def test_batch(self):
        import numpy as np

        from stac_catalog_builder_ray.functions.epsg import infer_epsg_batch

        got = infer_epsg_batch(
            ["http://x/EPSG/0/3035", None, None],
            ["E09N27", "20LLQ", None],
        )
        np.testing.assert_array_equal(got, [3035, 32620, 4326])
        assert got.dtype == np.int32
