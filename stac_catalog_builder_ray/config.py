"""Collection configuration (engine twin of stacbuilder/config.py:29-328).

Plain dataclasses instead of pydantic (not installed here); loadable from the
same JSON shape the reference uses (``CollectionConfig.from_json_file``,
config.py:304-312).  The config object is small — it is broadcast into actor
constructors (SURVEY.md T4/J1), never shuffled.
"""

from __future__ import annotations

import dataclasses as dc
import json
from typing import Dict, List, Optional


@dc.dataclass
class EOBand:
    name: str
    description: str = ""
    data_type: Optional[str] = None


@dc.dataclass
class AssetConfig:
    """Per-asset-type definition joined onto items (builder.py:248-251)."""

    title: str
    description: str
    eo_bands: List[EOBand] = dc.field(default_factory=list)
    media_type: str = "image/tiff; application=geotiff"
    roles: List[str] = dc.field(default_factory=lambda: ["data"])


@dc.dataclass
class CollectionConfig:
    collection_id: str
    title: str
    description: str
    item_assets: Dict[str, AssetConfig] = dc.field(default_factory=dict)
    keywords: List[str] = dc.field(default_factory=list)
    providers: List[dict] = dc.field(default_factory=list)
    license: str = "proprietary"
    input_path_parser: str = "SmokeObservationsParser"
    # layout template "${collection}/${year}" (config.py:291, S7)
    layout_template: str = "${collection}/${year}"

    @staticmethod
    def from_dict(data: dict) -> "CollectionConfig":
        if "collection_id" not in data or not data["collection_id"]:
            from .exceptions import InvalidConfiguration

            raise InvalidConfiguration(
                "collection config requires a non-empty 'collection_id'"
            )
        assets = {
            k: AssetConfig(
                title=v.get("title", k),
                description=v.get("description", ""),
                eo_bands=[EOBand(**b) for b in v.get("eo_bands", [])],
                media_type=v.get("media_type", "image/tiff; application=geotiff"),
                roles=v.get("roles", ["data"]),
            )
            for k, v in data.get("item_assets", {}).items()
        }
        return CollectionConfig(
            collection_id=data["collection_id"],
            title=data.get("title", data["collection_id"]),
            description=data.get("description", ""),
            item_assets=assets,
            keywords=data.get("keywords", []),
            providers=data.get("providers", []),
            license=data.get("license", "proprietary"),
            input_path_parser=data.get("input_path_parser", "SmokeObservationsParser"),
            layout_template=data.get("layout_template", "${collection}/${year}"),
        )

    @staticmethod
    def from_json_file(path: str) -> "CollectionConfig":
        with open(path) as f:
            return CollectionConfig.from_dict(json.load(f))


def test_collection_config() -> CollectionConfig:
    """The engine twin of the reference test config
    (tests/data/config/config-test-collection.json — collection foo-2023-v01,
    two monthly observation asset types)."""
    return CollectionConfig.from_dict(
        {
            "collection_id": "foo-2023-v01",
            "title": "Foo collection",
            "description": "Description of Foo",
            "keywords": ["foo", "bar", "oof"],
            "providers": [
                {
                    "name": "Test EO Org",
                    "roles": ["licensor", "processor", "producer"],
                    "url": "https://www.test-eo-org.nowhere.to.be.found.xyz/",
                }
            ],
            "item_assets": {
                "2m-temp-monthly": {
                    "title": "2m temperature",
                    "description": "temperature 2m above ground (Kelvin)",
                    "eo_bands": [
                        {"name": "2m_temp", "description": "temperature 2m above ground (Kelvin)"}
                    ],
                },
                "tot-precip-monthly": {
                    "title": "total precipitation",
                    "description": "total precipitation per month (m)",
                    "eo_bands": [
                        {"name": "tot_precip", "description": "total precipitation per month (m)"}
                    ],
                },
            },
            "input_path_parser": "SmokeObservationsParser",
        }
    )


def tiled_collection_config() -> CollectionConfig:
    """Config for the tiled scale sets (same asset types, tiled parser)."""
    cfg = test_collection_config()
    cfg.input_path_parser = "TiledObservationsParser"
    return cfg
