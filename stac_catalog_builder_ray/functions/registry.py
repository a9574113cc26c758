"""User-extension registries (SURVEY.md §2.8): item postprocessors and
group-key functions, registered by string name so configs stay declarative.

Reference extension points mirrored:
- ``item_postprocessor: Callable[[Item], Item]`` (builder.py:646,753-754) —
  engine form: a batch function over item ROWS (pandas in/out), applied after
  assembly; the real-world example (LCM-10 antimeridian split / property
  rename, configs-datasets/lcfm/LCM-10_utm/workflow.py:124-157) maps to a
  row-wise transform of the same power.
- ``_func_find_item_group`` (builder.py:671,843-863) — pluggable group key,
  default year.
"""

from __future__ import annotations

from typing import Callable, Dict

import pandas as pd

ItemPostprocessor = Callable[[pd.DataFrame], pd.DataFrame]
GroupKeyFn = Callable[[pd.DataFrame], pd.Series]

POSTPROCESSORS: Dict[str, ItemPostprocessor] = {}
GROUP_KEYS: Dict[str, GroupKeyFn] = {}


def register_postprocessor(name: str):
    def deco(fn: ItemPostprocessor):
        POSTPROCESSORS[name] = fn
        return fn

    return deco


def register_group_key(name: str):
    def deco(fn: GroupKeyFn):
        GROUP_KEYS[name] = fn
        return fn

    return deco


def get_postprocessor(name: str) -> ItemPostprocessor:
    if name not in POSTPROCESSORS:
        raise ValueError(f"Unknown postprocessor {name!r}; registered: {sorted(POSTPROCESSORS)}")
    return POSTPROCESSORS[name]


def get_group_key(name: str) -> GroupKeyFn:
    if name not in GROUP_KEYS:
        raise ValueError(f"Unknown group key {name!r}; registered: {sorted(GROUP_KEYS)}")
    return GROUP_KEYS[name]


@register_group_key("year")
def _group_by_year(items: pd.DataFrame) -> pd.Series:
    """The reference default: item.datetime.year (builder.py:863)."""
    return pd.to_datetime(items["datetime"]).dt.year


@register_group_key("tile")
def _group_by_tile(items: pd.DataFrame) -> pd.Series:
    return items["tile_id"]


@register_postprocessor("identity")
def _identity(items: pd.DataFrame) -> pd.DataFrame:
    return items


@register_postprocessor("title_prefix")
def _title_prefix(items: pd.DataFrame) -> pd.DataFrame:
    """Example postprocessor in the spirit of the LCM-10 property rewrite:
    prefixes item ids — demonstrates arbitrary row rewriting after assembly."""
    items = items.copy()
    items["item_id"] = "pp_" + items["item_id"].astype(str)
    return items
