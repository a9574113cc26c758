"""Codec + phash + datagen unit tests (no Ray)."""

import numpy as np
import pytest

from stac_catalog_builder_ray.codec.phash import hamming64, phash64
from stac_catalog_builder_ray.codec.raster import FORMATS, decode_image, encode_image, psnr
from stac_catalog_builder_ray.datagen import (
    caption_for,
    generate_aois,
    gradient_pixels,
    parse_tile_id,
    smoke_row_ids,
    tile_geo,
    tile_name,
)


class TestRasterCodec:
    @pytest.mark.parametrize("fmt", FORMATS)
    def test_lossless_round_trip(self, fmt):
        px = gradient_pixels(64, 48)
        data = encode_image(px, fmt)
        back = decode_image(data, fmt)
        np.testing.assert_array_equal(back, px)
        assert psnr(back, px) == float("inf")

    def test_format_sniffing(self):
        px = gradient_pixels(32, 16)
        # wrong fmt hint must not matter — container is sniffed
        back = decode_image(encode_image(px, "png"), "raw")
        np.testing.assert_array_equal(back, px)

    def test_png_is_real_png(self):
        data = encode_image(gradient_pixels(16, 8), "png")
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        assert b"IHDR" in data[:30] and data[-8:-4] == b"IEND"

    def test_psnr_sensitivity(self):
        px = gradient_pixels(64, 48)
        noisy = px.astype(np.int64) + 100
        assert 40 < psnr(np.clip(noisy, 0, 65535).astype(np.uint16), px) < 80


class TestPhash:
    def test_deterministic_and_distinct(self):
        a = phash64(gradient_pixels(64, 48, 0.5, 0.5, -0.5, -0.5))
        b = phash64(gradient_pixels(64, 48, 0.5, 0.5, -0.5, -0.5))
        c = phash64(gradient_pixels(64, 48, -0.9, 0.9, 0.1, 0.3))
        assert a == b
        assert hamming64(a, b) == 0
        assert hamming64(a, c) > 4  # visually different -> far in Hamming space

    def test_robust_to_small_noise(self):
        px = gradient_pixels(64, 48)
        noisy = np.clip(px.astype(np.int64) + 30, 0, 65535).astype(np.uint16)
        assert hamming64(phash64(px), phash64(noisy)) <= 4

    def test_int64_range(self):
        v = phash64(gradient_pixels(32, 32))
        assert -(2**63) <= v < 2**63

    def test_rejects_tiny_images(self):
        # < 32px in either dimension would produce zero-area blocks -> NaN
        # garbage; must fail loudly instead
        with pytest.raises(ValueError, match="min\\(h, w\\)"):
            phash64(gradient_pixels(31, 64))
        with pytest.raises(ValueError, match="min\\(h, w\\)"):
            phash64(gradient_pixels(64, 16))


class TestDatagen:
    def test_smoke_ids_match_reference_corpus(self):
        ids = smoke_row_ids()
        assert len(ids) == 12
        assert ids[0] == "2000/observations_2m-temp-monthly_2000-01-01.tif"
        assert "2001/observations_tot-precip-monthly_2001-03-01.tif" in ids

    def test_tile_round_trip(self):
        assert parse_tile_id(tile_name(9, 27)) == (9, 27)
        with pytest.raises(ValueError):
            parse_tile_id("X09N27")

    def test_tile_geo(self):
        g = tile_geo("E01N12")
        assert g["epsg"] == 4326
        assert g["east"] - g["west"] == pytest.approx(1.5)
        g_utm = tile_geo("E05N12")  # easting % 5 == 0 -> UTM
        assert 32601 <= g_utm["epsg"] <= 32660
        a, b, c, d, e, f = g_utm["transform"]
        assert e < 0  # north-up raster

    def test_caption_template(self):
        assert (
            caption_for("2m-temp-monthly", "E07N12", 2000, 1)
            == "2m temperature over tile E07N12 on 2000-01-01"
        )

    def test_aois(self):
        aois = generate_aois(8)
        assert aois[0]["west"] == -180.0 and aois[0]["east"] == 180.0
        assert len(aois) == 8
        assert len({a["aoi_id"] for a in aois}) == 8

    def test_payload_aware_part_default_and_footer_resume(self, tmp_path):
        """Round-4 directive #6, writer side: the default part size follows
        the measured <= ~40 MB rule (Ray 2.49 schedules ONE read task per
        part, so write-time granularity is the real control): wide 240x180
        rasters get ~40MB/86KB = 485-row parts, narrow 64x48 keeps the
        historical 2048 cap; and an EXISTING dir's footer row count always
        wins so a default change can never mis-index a resumed table."""
        import os

        import pyarrow.parquet as pq

        from stac_catalog_builder_ray.datagen import (
            _default_rows_per_file, generate_images_table)

        assert _default_rows_per_file(str(tmp_path), 240, 180) == \
            (40 * 1024 * 1024) // (240 * 180 * 2)
        assert _default_rows_per_file(str(tmp_path), 64, 48) == 2048

        # footer-derived resume: write with an explicit odd part size, then
        # extend with the default — layout must follow the existing parts
        d = os.path.join(str(tmp_path), "imgs")
        generate_images_table(d, n_rows=14, w=32, h=32, rows_per_file=7)
        generate_images_table(d, n_rows=21, w=32, h=32)
        t = pq.read_table(d)
        assert t.num_rows == 21
        assert len(set(t.column("image_id").to_pylist())) == 21
        assert pq.ParquetFile(os.path.join(d, "part-00001.parquet")).metadata.num_rows == 7

    def test_images_table(self, smoke_images_dir):
        import pyarrow.parquet as pq

        t = pq.read_table(smoke_images_dir)
        assert t.num_rows == 12
        assert t.column_names == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
        row = t.slice(0, 1).to_pylist()[0]
        px = decode_image(row["bytes"], row["fmt"])
        assert px.shape == (180, 240)
        assert row["fmt"] == "mbnd" and px.dtype == np.float64
        # per-row invariant: pixels regenerate exactly (the reference's
        # float64 mock-raster values verbatim), caption matches template
        from stac_catalog_builder_ray.datagen import gradient_field

        np.testing.assert_array_equal(px, gradient_field(240, 180))
        assert phash64(px) == row["phash"]


class TestMultiband:
    def test_round_trip_mixed_dtypes(self):
        from stac_catalog_builder_ray.codec.raster import (
            band_header,
            decode_multiband,
            encode_multiband,
            is_cloud_optimized,
        )

        b0 = np.linspace(-10, 10, 48 * 64).reshape(48, 64)  # float64
        b1 = (np.arange(48 * 64, dtype=np.uint16)).reshape(48, 64)
        b2 = np.full((48, 64), 7, dtype=np.float32)
        buf = encode_multiband([b0, b1, b2], nodata=[None, 0, None],
                               units=[None, "K", "mm"], cloud_optimized=True)
        planes, metas = decode_multiband(buf)
        np.testing.assert_array_equal(planes[0], b0)
        np.testing.assert_array_equal(planes[1], b1)
        np.testing.assert_array_equal(planes[2], b2)
        assert [m["data_type"] for m in metas] == ["float64", "uint16", "float32"]
        assert [m["nodata"] for m in metas] == [None, 0.0, None]
        assert [m["units"] for m in metas] == [None, "K", "mm"]
        assert band_header(buf) == metas  # header-only path agrees
        assert is_cloud_optimized(buf)

    def test_compressed_variant_not_cog(self):
        from stac_catalog_builder_ray.codec.raster import (
            decode_multiband,
            encode_multiband,
            is_cloud_optimized,
        )

        b0 = np.zeros((40, 40), dtype=np.float64)
        buf = encode_multiband([b0], cloud_optimized=False)
        assert not is_cloud_optimized(buf)
        planes, metas = decode_multiband(buf)
        np.testing.assert_array_equal(planes[0], b0)

    def test_legacy_containers_report_actual_dtype(self):
        from stac_catalog_builder_ray.codec.raster import (
            band_header,
            decode_multiband,
            encode_image,
            is_cloud_optimized,
        )

        px = gradient_pixels(64, 48)
        for fmt, cog in (("raw", True), ("zlib", False), ("png", False)):
            buf = encode_image(px, fmt)
            planes, metas = decode_multiband(buf, fmt)
            assert metas == [{"data_type": "uint16", "index": 0, "nodata": None, "units": None}]
            assert band_header(buf) == metas
            assert is_cloud_optimized(buf) is cog
            np.testing.assert_array_equal(planes[0], px)


class TestFloatPixelStats:
    def test_px_min_max_floor_ceil(self, ray_session):
        """Round-2 advice: int() truncates toward zero, recording a float
        band min of -9.99 as -9; the stats must floor the min / ceil the
        max."""
        import pyarrow as pa

        from stac_catalog_builder_ray.codec.phash import phash64
        from stac_catalog_builder_ray.codec.raster import encode_multiband
        from stac_catalog_builder_ray.stages.extract import DecodeExtract

        px = np.linspace(-9.99, 9.99, 48 * 64).reshape(48, 64)  # float64
        batch = pa.table({
            "image_id": pa.array(["2001/observations_2m-temp-monthly_2001-01-01.tif"]),
            "bytes": pa.array([encode_multiband([px], cloud_optimized=True)], pa.binary()),
            "w": pa.array([64], pa.int32()),
            "h": pa.array([48], pa.int32()),
            "fmt": pa.array(["mbnd"]),
            "caption": pa.array(["float stats probe"]),
            "phash": pa.array([phash64(px)], pa.int64()),
        })
        out = DecodeExtract()(batch).to_pylist()[0]
        assert out["decode_ok"]
        assert out["px_min"] == -10  # floor(-9.99), not trunc -> -9
        assert out["px_max"] == 10  # ceil(9.99)


class TestPhashStack:
    def test_bit_identical_to_per_image(self):
        """phash64_stack == per-image phash64 across shapes (incl. dims not
        divisible by 32) and value ranges — the batched kernel must never
        change a single bit or the flagship's phash_ok verification drifts."""
        import numpy as np

        from stac_catalog_builder_ray.codec.phash import phash64, phash64_stack

        rng = np.random.default_rng(17)
        for shape in [(48, 64), (32, 32), (37, 53), (180, 240), (100, 33)]:
            stack = rng.random((40, *shape)) * 65535
            want = np.array([phash64(im) for im in stack], dtype=np.int64)
            assert (phash64_stack(stack) == want).all(), shape
        # integer dtype path (decoded rasters are uint16)
        stack = rng.integers(0, 65535, (40, 48, 64)).astype(np.uint16)
        want = np.array([phash64(im) for im in stack], dtype=np.int64)
        assert (phash64_stack(stack) == want).all()

    def test_rejects_small_images(self):
        import numpy as np
        import pytest

        from stac_catalog_builder_ray.codec.phash import phash64_stack

        with pytest.raises(ValueError):
            phash64_stack(np.zeros((2, 16, 64)))

    def test_decode_extract_degrades_bad_phash_rows(self):
        """A null phash or a sub-32px image must degrade to phash_ok=False
        for THAT row (the old per-image semantics) — not raise out of the
        batched phash64_stack (ValueError on min(h,w)<32) or the int64
        expected-value cast (TypeError on None) and kill the whole batch
        task. Round-4 advice regression."""
        import pyarrow as pa

        from stac_catalog_builder_ray.codec.phash import phash64
        from stac_catalog_builder_ray.codec.raster import encode_multiband
        from stac_catalog_builder_ray.stages.extract import DecodeExtract

        good = np.linspace(0, 100, 48 * 64).reshape(48, 64)
        tiny = np.linspace(0, 100, 16 * 64).reshape(16, 64)  # min dim < 32
        batch = pa.table({
            "image_id": pa.array([
                "2001/observations_2m-temp-monthly_2001-01-01.tif",
                "2001/observations_2m-temp-monthly_2001-02-01.tif",
                "2001/observations_2m-temp-monthly_2001-03-01.tif",
            ]),
            "bytes": pa.array([
                encode_multiband([good]),
                encode_multiband([good]),
                encode_multiband([tiny]),
            ], pa.binary()),
            "w": pa.array([64, 64, 64], pa.int32()),
            "h": pa.array([48, 48, 16], pa.int32()),
            "fmt": pa.array(["mbnd"] * 3),
            "caption": pa.array(["ok", "null phash", "tiny"]),
            "phash": pa.array([phash64(good), None, 12345], pa.int64()),
        })
        out = DecodeExtract(verify_phash=True)(batch).to_pydict()
        assert out["decode_ok"] == [True, True, True]
        assert out["phash_ok"] == [True, False, False]
