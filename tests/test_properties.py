"""Property-based tests (hypothesis) for the pure kernels: CRS round-trips,
codec round-trips, cell-index containment, rounding.  These complement the
example-based suites with randomized coverage of the numeric domains the
reference's tests sample pointwise (tests/test_projections.py,
tests/test_boundingbox.py)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

# pure-numpy kernels: no Ray session needed


class TestCrsProperties:
    @settings(max_examples=60, deadline=None)
    @given(
        lon_off=st.floats(-2.9, 2.9),
        lat=st.floats(-79.0, 79.0),
        zone=st.integers(1, 60),
    )
    def test_utm_roundtrip_everywhere(self, lon_off, lat, zone):
        from stac_catalog_builder_ray.geo.crs import project_points

        epsg = (32600 if lat >= 0 else 32700) + zone
        lon = -183.0 + 6.0 * zone + lon_off  # within the zone
        x, y = project_points(np.array([lon]), np.array([lat]), 4326, epsg)
        lon2, lat2 = project_points(x, y, epsg, 4326)
        assert abs(lon2[0] - lon) < 1e-8
        assert abs(lat2[0] - lat) < 1e-8

    @settings(max_examples=40, deadline=None)
    @given(lon=st.floats(-10.0, 30.0), lat=st.floats(35.0, 70.0))
    def test_laea_and_lcc_roundtrip_europe(self, lon, lat):
        from stac_catalog_builder_ray.geo.crs import project_points

        for epsg in (3035, 3812):
            x, y = project_points(np.array([lon]), np.array([lat]), 4326, epsg)
            lon2, lat2 = project_points(x, y, epsg, 4326)
            assert abs(lon2[0] - lon) < 1e-8, epsg
            assert abs(lat2[0] - lat) < 1e-8, epsg

    @settings(max_examples=40, deadline=None)
    @given(lon=st.floats(3.3, 7.2), lat=st.floats(50.7, 53.6))
    def test_rd_new_roundtrip_netherlands(self, lon, lat):
        from stac_catalog_builder_ray.geo.crs import project_points

        x, y = project_points(np.array([lon]), np.array([lat]), 4326, 28992)
        lon2, lat2 = project_points(x, y, 28992, 4326)
        assert abs(lon2[0] - lon) < 1e-8
        assert abs(lat2[0] - lat) < 1e-8

    @settings(max_examples=30, deadline=None)
    @given(
        w=st.floats(-5.0, 9.0), s=st.floats(40.0, 55.0),
        dw=st.floats(0.01, 3.0), dh=st.floats(0.01, 3.0),
    )
    def test_bbox_reproject_contains_original(self, w, s, dw, dh):
        from stac_catalog_builder_ray.geo.crs import reproject_bbox

        e, n = w + dw, s + dh
        pw, ps, pe, pn = reproject_bbox(w, s, e, n, 4326, 3035)
        w2, s2, e2, n2 = reproject_bbox(pw, ps, pe, pn, 3035, 4326)
        assert w2 <= w + 1e-7 and s2 <= s + 1e-7
        assert e2 >= e - 1e-7 and n2 >= n - 1e-7


class TestCodecProperties:
    @settings(max_examples=25, deadline=None)
    @given(
        seed=st.integers(0, 2**31 - 1),
        w=st.integers(33, 80), h=st.integers(33, 64),
        fmt=st.sampled_from(["raw", "zlib", "png"]),
    )
    def test_uint16_roundtrip_exact(self, seed, w, h, fmt):
        from stac_catalog_builder_ray.codec.raster import decode_image, encode_image

        rng = np.random.default_rng(seed)
        px = rng.integers(0, 65535, size=(h, w)).astype(np.uint16)
        back = decode_image(encode_image(px, fmt), fmt)
        np.testing.assert_array_equal(back, px)

    @settings(max_examples=25, deadline=None)
    @given(seed=st.integers(0, 2**31 - 1), nb=st.integers(1, 4))
    def test_multiband_float_roundtrip_exact(self, seed, nb):
        from stac_catalog_builder_ray.codec.raster import (
            decode_multiband, encode_multiband)

        rng = np.random.default_rng(seed)
        dtypes = [np.float64, np.float32, np.uint16, np.int32]
        bands = []
        for i in range(nb):
            dt = dtypes[(seed + i) % len(dtypes)]
            a = rng.standard_normal((17, 23)) * 1000
            bands.append(a.astype(dt))
        buf = encode_multiband(bands)
        planes, metas = decode_multiband(buf)
        assert len(planes) == nb
        for a, b in zip(bands, planes):
            np.testing.assert_array_equal(a, b)


class TestCellProperties:
    @settings(max_examples=60, deadline=None)
    @given(
        lon=st.floats(-179.999, 179.999), lat=st.floats(-89.999, 89.999),
        res=st.integers(0, 12),
    )
    def test_cell_centroid_reencodes_to_same_cell(self, lon, lat, res):
        from stac_catalog_builder_ray.geo.cell import cell_decode, cell_encode, cell_res

        c = cell_encode(np.array([lon]), np.array([lat]), res)
        r, x, y = cell_decode(c)
        assert int(cell_res(c)[0]) == int(r[0]) == res
        # grid cell centroid from the decoded (x, y) indices
        n = 1 << res
        lon_c = -180.0 + (float(x[0]) + 0.5) * 360.0 / n
        lat_c = -90.0 + (float(y[0]) + 0.5) * 180.0 / n
        c2 = cell_encode(np.array([lon_c]), np.array([lat_c]), res)
        assert int(c2[0]) == int(c[0])

    @settings(max_examples=40, deadline=None)
    @given(
        lon=st.floats(-179.0, 179.0), lat=st.floats(-89.0, 89.0),
        res=st.integers(1, 12),
    )
    def test_parent_equals_coarser_encode(self, lon, lat, res):
        """Hierarchical containment: the quadtree parent of a point's
        res-r cell IS the point's res-(r-1) cell."""
        from stac_catalog_builder_ray.geo.cell import cell_encode, cell_parent

        c = cell_encode(np.array([lon]), np.array([lat]), res)
        p = cell_parent(c)
        coarse = cell_encode(np.array([lon]), np.array([lat]), res - 1)
        assert int(p[0]) == int(coarse[0])


class TestRoundingProperties:
    @settings(max_examples=60, deadline=None)
    @given(x=st.floats(-1e6, 1e6), d=st.integers(0, 6))
    def test_round_half_away_matches_decimal(self, x, d):
        import decimal

        from stac_catalog_builder_ray.functions.rounding import round_half_away

        got = float(round_half_away(np.array([x]), d)[0])
        want = float(decimal.Decimal(repr(x)).quantize(
            decimal.Decimal(1).scaleb(-d), rounding=decimal.ROUND_HALF_UP))
        assert got == pytest.approx(want, abs=10.0**-(d + 6))
