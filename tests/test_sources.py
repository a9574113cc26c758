"""Slots source (S3 analog) + geometry closure (M8) tests."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


class TestSlotsSource:
    def test_slot_generation(self):
        from stac_catalog_builder_ray.sources.slots import generate_query_slots

        slots = generate_query_slots("2000-01-01", "2000-07-01", product_types=["a", "b"])
        assert len(slots) == 12  # 6 months x 2 types
        assert slots[0]["slot_id"] == "a_20000101"
        assert all({"slot_id", "t0", "t1", "product_type"} <= set(s) for s in slots)

    def test_fetch_and_dedup(self, ray_session):
        from stac_catalog_builder_ray.sources.slots import (
            generate_query_slots,
            read_slots,
        )

        slots = generate_query_slots("2000-01-01", "2000-04-01", product_types=["a"])
        got = read_slots(slots).to_pandas()
        # boundary products appear in two slots; dedup keeps exactly one row each
        assert got["product_id"].is_unique
        assert len(got) > 0
        # every kept row is the FIRST occurrence (min datetime/slot per id)
        assert (got["product_type"] == "a").all()

    def test_slot_resume(self, ray_session, tmp_path):
        from stac_catalog_builder_ray.sources.slots import (
            checkpoint_slots,
            generate_query_slots,
            read_slots,
        )

        root = str(tmp_path / "slots-ckpt")
        slots = generate_query_slots("2000-01-01", "2000-04-01", product_types=["a"])
        first = read_slots(slots, checkpoint_root=root).to_pandas()
        n_marked = checkpoint_slots(first, root)
        assert n_marked == len(slots)
        # resume: all slots finished -> empty dataset, no fetch tasks at all
        again = read_slots(slots, checkpoint_root=root)
        assert again.count() == 0


class TestGeometryClosure:
    def _closure(self, **cols):
        from stac_catalog_builder_ray.stages.geometry_closure import ensure_geoms_batch

        n = len(next(iter(cols.values())))
        table = {"proj_epsg": pa.array(cols.pop("proj_epsg", [4326] * n), pa.int32())}
        for k, v in cols.items():
            if k.endswith("_wkb"):
                table[k] = pa.array(v, pa.binary())
            else:
                table[k] = pa.array(v, pa.list_(pa.float64()))
        return ensure_geoms_batch(pa.table(table))

    def test_from_bbox_projected(self):
        out = self._closure(proj_epsg=[32631], bbox_projected=[[500000.0, 5600000.0, 510000.0, 5610000.0]])
        bl = out["bbox_lat_lon"][0].as_py()
        assert 2.0 < bl[0] < 4.0 and 50.0 < bl[1] < 52.0  # plausible lon/lat
        assert out["geometry_proj_wkb"][0].as_py() is not None

    def test_from_bbox_lat_lon(self):
        out = self._closure(proj_epsg=[32631], bbox_lat_lon=[[4.0, 51.0, 5.0, 52.0]])
        bp = out["bbox_projected"][0].as_py()
        assert 5.6e6 < bp[1] < 5.8e6  # projected meters

    def test_from_geometry_wkb(self):
        from stac_catalog_builder_ray.geo.bbox import box_ring
        from stac_catalog_builder_ray.geo.geometry import ring_to_wkb

        wkb = ring_to_wkb(np.asarray(box_ring(4.0, 51.0, 5.0, 52.0)))
        out = self._closure(proj_epsg=[4326], geometry_lat_lon_wkb=[wkb])
        assert out["bbox_lat_lon"][0].as_py() == [4.0, 51.0, 5.0, 52.0]
        assert out["bbox_projected"][0].as_py() == [4.0, 51.0, 5.0, 52.0]

    def test_round_trip_containment(self):
        """Round-tripping a bbox through the projection can only GROW the
        envelope (bounds of a projected ring ⊇ original) — the derived
        lat-lon bbox must contain the original, within a small margin."""
        out1 = self._closure(proj_epsg=[32631], bbox_lat_lon=[[4.0, 51.0, 5.0, 52.0]])
        bp = out1["bbox_projected"][0].as_py()
        out2 = self._closure(proj_epsg=[32631], bbox_projected=[bp])
        bl2 = out2["bbox_lat_lon"][0].as_py()
        assert bl2[0] <= 4.0 + 1e-9 and bl2[1] <= 51.0 + 1e-9
        assert bl2[2] >= 5.0 - 1e-9 and bl2[3] >= 52.0 - 1e-9
        # and not by much (sanity: < 0.05 deg growth for a 1-deg box)
        assert 4.0 - bl2[0] < 0.05 and bl2[2] - 5.0 < 0.05

    def test_nothing_set_raises(self):
        from stac_catalog_builder_ray.stages.geometry_closure import ensure_geoms_batch

        with pytest.raises(ValueError, match="At least one"):
            ensure_geoms_batch(
                pa.table({"proj_epsg": pa.array([4326], pa.int32()),
                          "bbox_projected": pa.array([None], pa.list_(pa.float64()))})
            )


class TestStacApiClient:
    """Thin-client CRUD semantics vs the in-memory API fake (engine twin of
    tests/stacapi/test_endpoints.py's requests-mock suite)."""

    def _client(self):
        from stac_catalog_builder_ray.sources.stacapi import (
            CollectionsEndpoint,
            ItemsEndpoint,
            MemoryTransport,
        )

        api = MemoryTransport()
        return api, CollectionsEndpoint(api.request), ItemsEndpoint(api.request)

    def test_collection_crud_and_exists(self):
        import pytest

        from stac_catalog_builder_ray.sources.stacapi import StacApiError

        api, colls, _ = self._client()
        assert colls.exists("c1") is False
        colls.create({"id": "c1", "description": "d"})
        assert colls.exists("c1") is True
        assert colls.get("c1")["description"] == "d"
        colls.create_or_update({"id": "c1", "description": "d2"})  # -> update
        assert colls.get("c1")["description"] == "d2"
        colls.create_or_update({"id": "c2", "description": "x"})  # -> create
        assert {c["id"] for c in colls.get_all()} == {"c1", "c2"}
        colls.delete_by_id("c2")
        assert colls.exists("c2") is False
        with pytest.raises(StacApiError):
            colls.get("c2")
        with pytest.raises(TypeError):
            colls.exists(123)
        with pytest.raises(ValueError):
            colls.get("")

    def test_collection_auth_info_merged(self):
        from stac_catalog_builder_ray.sources.stacapi import (
            CollectionsEndpoint,
            MemoryTransport,
        )

        api = MemoryTransport()
        colls = CollectionsEndpoint(api.request, collection_auth_info={"_auth": {"read": ["anonymous"]}})
        colls.create({"id": "c", "description": "d"})
        assert api.collections["c"]["_auth"] == {"read": ["anonymous"]}

    def test_item_crud_and_bulk(self):
        import pytest

        api, colls, items = self._client()
        colls.create({"id": "c1", "description": "d"})
        assert items.exists("c1", "i1") is False
        items.create_or_update("c1", {"id": "i1", "collection": "c1"})
        assert items.get("c1", "i1")["id"] == "i1"
        res = items.ingest_bulk("c1", [{"id": f"i{k}", "collection": "c1"} for k in range(2, 7)])
        assert res["upserted"] == 5
        assert len(api.items["c1"]) == 6
        items.delete_by_id("c1", "i1")
        assert items.exists("c1", "i1") is False
        from stac_catalog_builder_ray.exceptions import EngineException, InvalidOperation

        with pytest.raises(InvalidOperation, match="expected 'c1'"):
            items.ingest_bulk("c1", [{"id": "z", "collection": "other"}])
        # typed hierarchy: engine failures are distinguishable as a family
        with pytest.raises(EngineException):
            items.ingest_bulk("c1", [{"id": "z", "collection": "other"}])

    def test_upload_collection_tree(self, ray_session, smoke_images_dir, tmp_path):
        from stac_catalog_builder_ray.pipelines.catalog import build_collection
        from stac_catalog_builder_ray.sources.stacapi import (
            MemoryTransport,
            upload_collection_tree,
        )
        import os

        out = str(tmp_path / "up")
        build_collection(smoke_images_dir, out, mode="linked")
        api = MemoryTransport()
        res = upload_collection_tree(os.path.join(out, "collection.json"), api.request, bulk_size=4)
        assert res["n_items_upserted"] == 6
        assert len(api.items[res["collection_id"]]) == 6
        assert res["collection_id"] in api.collections


class TestAuthFlows:
    """auth.py:14-38 decision tree on the injected-transport seam."""

    @staticmethod
    def _token_transport(log):
        def request(method, path, json=None, headers=None):
            log.append((method, path, json))
            if path == "https://auth/authorize":
                return 200, {"code": "grant-123"}
            if path == "https://auth/token":
                if json.get("grant_type") == "authorization_code":
                    assert json["code"] == "grant-123"
                    return 200, {"access_token": "tok-pkce"}
                if json.get("grant_type") == "password":
                    if json["password"] != "s3cret":
                        return 401, {}
                    return 200, {"access_token": "tok-pwd"}
            return 404, {}
        return request

    def test_disabled_returns_none(self):
        from stac_catalog_builder_ray.sources.stacapi import AuthSettings, get_auth

        assert get_auth(AuthSettings(enabled=False)) is None
        assert get_auth(None) is None

    def test_misconfigured_raises_typed(self):
        from stac_catalog_builder_ray.exceptions import SettingsInvalid
        from stac_catalog_builder_ray.sources.stacapi import AuthSettings, get_auth

        with pytest.raises(SettingsInvalid, match="not properly configured"):
            get_auth(AuthSettings(enabled=True, interactive=False),
                     token_transport=lambda *a, **k: (200, {}))

    def test_password_flow_headers(self):
        from stac_catalog_builder_ray.sources.stacapi import (
            AuthSettings, OAuthResourceOwnerPassword, get_auth)

        log = []
        auth = get_auth(
            AuthSettings(enabled=True, interactive=False,
                         token_url="https://auth/token",
                         username="u", password="s3cret", client_id="cid"),
            token_transport=self._token_transport(log),
        )
        assert isinstance(auth, OAuthResourceOwnerPassword)
        assert auth.headers() == {"Authorization": "Bearer tok-pwd"}
        auth.headers()
        assert len(log) == 1  # token cached, not re-fetched

    def test_pkce_flow_headers(self):
        from stac_catalog_builder_ray.sources.stacapi import (
            AuthSettings, OAuthAuthorizationCodePKCE, get_auth)

        log = []
        auth = get_auth(
            AuthSettings(enabled=True, interactive=True,
                         authorization_url="https://auth/authorize",
                         token_url="https://auth/token", client_id="cid"),
            token_transport=self._token_transport(log),
        )
        assert isinstance(auth, OAuthAuthorizationCodePKCE)
        assert auth.headers() == {"Authorization": "Bearer tok-pkce"}
        assert [p for _, p, _ in log] == ["https://auth/authorize", "https://auth/token"]

    def test_authenticated_transport_injects_and_retries(self):
        from stac_catalog_builder_ray.sources.stacapi import (
            AuthSettings, authenticated_transport, get_auth)

        log = []
        auth = get_auth(
            AuthSettings(enabled=True, interactive=False,
                         token_url="https://auth/token",
                         username="u", password="s3cret"),
            token_transport=self._token_transport(log),
        )
        seen = []
        flaky = {"n": 0}

        def backend(method, path, json=None, headers=None):
            seen.append(headers)
            # first call rejects the token (expired), second accepts
            flaky["n"] += 1
            if flaky["n"] == 1:
                return 401, {}
            return 200, {"ok": True}

        t = authenticated_transport(backend, auth)
        status, body = t("GET", "collections")
        assert status == 200 and body == {"ok": True}
        assert all(h["Authorization"] == "Bearer tok-pwd" for h in seen)
        assert len(seen) == 2  # retried once after 401
        assert len(log) == 2  # token re-fetched after invalidate

    def test_header_unaware_transport_still_works(self):
        from stac_catalog_builder_ray.sources.stacapi import (
            AuthSettings, CollectionsEndpoint, MemoryTransport,
            authenticated_transport, get_auth)

        log = []
        auth = get_auth(
            AuthSettings(enabled=True, interactive=False,
                         token_url="https://auth/token",
                         username="u", password="s3cret"),
            token_transport=self._token_transport(log),
        )
        api = MemoryTransport()
        coll = CollectionsEndpoint(authenticated_transport(api.request, auth))
        coll.create({"id": "c9"})
        assert coll.exists("c9")


class TestTypedExceptions:
    def test_config_missing_id_raises_invalid_configuration(self):
        from stac_catalog_builder_ray.config import CollectionConfig
        from stac_catalog_builder_ray.exceptions import (
            EngineException, InvalidConfiguration)

        with pytest.raises(InvalidConfiguration):
            CollectionConfig.from_dict({"title": "no id"})
        with pytest.raises(EngineException):
            CollectionConfig.from_dict({})
        # back-compat: pre-round-3 call sites caught ValueError
        with pytest.raises(ValueError):
            CollectionConfig.from_dict({})


class TestVppIntrospection:
    """Engine twins of commandapi_vpp.py:131-156 over the slot source."""

    def test_count_products(self, ray_session):
        from stac_catalog_builder_ray.sources.slots import (
            count_products, generate_query_slots)

        slots = generate_query_slots("2020-01-01", "2020-04-01",
                                     product_types=["ndvi", "fapar"])
        counts = count_products(slots)
        assert set(counts) == {"ndvi", "fapar"}
        # deduped: boundary products shared by adjacent slots count once
        assert counts["ndvi"] == counts["fapar"] > 0

    def test_count_per_slot_shows_overlap(self, ray_session):
        from stac_catalog_builder_ray.sources.slots import (
            count_products, count_products_per_query_slot, generate_query_slots)

        slots = generate_query_slots("2020-01-01", "2020-04-01",
                                     product_types=["ndvi"])
        per_slot = count_products_per_query_slot(slots)
        assert list(per_slot.columns) == ["slot_id", "n_products"]
        assert len(per_slot) == len(slots)
        # raw per-slot totals exceed the deduped count (window overlap)
        assert per_slot["n_products"].sum() > count_products(slots)["ndvi"]

    def test_collection_config_from_products(self, ray_session):
        from stac_catalog_builder_ray.sources.slots import (
            collection_config_from_products, generate_query_slots)

        slots = generate_query_slots("2020-01-01", "2020-03-01",
                                     product_types=["ndvi", "fapar"])
        cfg = collection_config_from_products("vpp-test", slots)
        assert cfg.collection_id == "vpp-test"
        assert sorted(cfg.item_assets) == ["fapar", "ndvi"]


class TestTabularSource:
    def test_parquet_jsonl_csv_same_rows(self, ray_session, tmp_path):
        """One corpus written in all three formats reads back identically
        (column-pruned), and format errors are loud."""
        import pandas as pd
        import pytest

        from stac_catalog_builder_ray.sources.tabular import read_table_auto

        df = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["a b", "c", "d e f"],
                           "extra": [9, 8, 7]})
        pq_path = str(tmp_path / "docs.parquet")
        jl_path = str(tmp_path / "docs.jsonl")
        csv_path = str(tmp_path / "docs.csv")
        df.to_parquet(pq_path, index=False)
        df.to_json(jl_path, orient="records", lines=True)
        df.to_csv(csv_path, index=False)

        want = df[["doc_id", "text"]]
        for p in (pq_path, jl_path, csv_path):
            got = (read_table_auto(p, columns=["doc_id", "text"]).to_pandas()
                   .sort_values("doc_id").reset_index(drop=True))
            assert got.astype({"doc_id": "int64"}).equals(want), p

        # directory of parts
        d = tmp_path / "parts"
        d.mkdir()
        df.iloc[:2].to_json(str(d / "a.jsonl"), orient="records", lines=True)
        df.iloc[2:].to_json(str(d / "b.jsonl"), orient="records", lines=True)
        got = (read_table_auto(str(d), columns=["doc_id", "text"]).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert got.astype({"doc_id": "int64"}).equals(want)

        (tmp_path / "bad.xml").write_text("<x/>")
        with pytest.raises(ValueError, match="unsupported"):
            read_table_auto(str(tmp_path / "bad.xml"))
        df.to_parquet(str(d / "c.parquet"), index=False)
        with pytest.raises(ValueError, match="mixed"):
            read_table_auto(str(d))


class TestWidePayloadSplit:
    """Round-4 directive #6: the measured <=~40 MB-part rule for >=50 KB/row
    payloads (BASELINE.md wide-payload regime) is applied automatically from
    parquet FOOTERS by read_images / read_table_auto."""

    @staticmethod
    def _write_wide(tmpdir, n_files=2, rows=30, row_kb=120):
        import os

        import pyarrow.parquet as pq

        rng = np.random.RandomState(7)
        paths = []
        for f in range(n_files):
            payload = [rng.bytes(row_kb * 1024) for _ in range(rows)]
            t = pa.table({
                "image_id": pa.array(np.arange(rows) + f * rows),
                "bytes": pa.array(payload, pa.binary()),
            })
            p = os.path.join(str(tmpdir), f"part-{f:05d}.parquet")
            # small row groups so override_num_blocks can actually split
            pq.write_table(t, p, row_group_size=5, compression="zstd")
            paths.append(p)
        return paths

    def test_narrow_and_pruned_reads_keep_default_layout(self, tmp_path):
        import os

        import pyarrow.parquet as pq

        from stac_catalog_builder_ray.sources.partsize import (
            wide_payload_num_blocks)

        # narrow rows: never overridden, whatever the part size
        p = os.path.join(str(tmp_path), "narrow.parquet")
        pq.write_table(pa.table({"a": pa.array(np.arange(10_000))}), p)
        assert wide_payload_num_blocks([p]) is None

        # wide table read METADATA-ONLY: the selected columns are narrow,
        # so the footer rule must classify it narrow too
        wide = self._write_wide(tmp_path)
        assert wide_payload_num_blocks(wide, columns=["image_id"]) is None

    def test_wide_coarse_parts_pin_task_count(self, tmp_path, monkeypatch):
        import os

        from stac_catalog_builder_ray.sources import partsize

        wide = self._write_wide(tmp_path)  # 2 parts x ~3.6 MB, ~120 KB/row
        # real constants: 7.2 MB total <= 40 MB x 2 parts -> default layout
        assert partsize.wide_payload_num_blocks(wide) is None
        # shrink the target so the same layout is "coarse": the pinned
        # count is ceil(total_selected_bytes / target)
        monkeypatch.setattr(partsize, "TARGET_TASK_BYTES", 1024 * 1024)
        n = partsize.wide_payload_num_blocks(wide)
        sel = sum(os.path.getsize(p) for p in wide)
        import math
        assert n == math.ceil(sel / (1024 * 1024)) and n > len(wide)

    def test_read_images_applies_override_end_to_end(self, ray_session,
                                                     tmp_path, monkeypatch):
        from stac_catalog_builder_ray.sources import partsize
        from stac_catalog_builder_ray.sources.images import read_images

        self._write_wide(tmp_path)
        monkeypatch.setattr(partsize, "TARGET_TASK_BYTES", 1024 * 1024)
        ds = read_images(str(tmp_path))
        assert ds.count() == 60  # override path reads every row exactly once
        assert set(ds.schema().names) == {"image_id", "bytes"}
