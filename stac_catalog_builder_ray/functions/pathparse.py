"""Vectorized regex path parsing with period semantics + parser registry.

Reference semantics (stacbuilder/pathparsers.py):

- ``RegexInputPathParser.parse`` (pathparsers.py:133-163): named-group regex
  over the posix path -> dict; ``fixed_values`` may contain ``{field}``
  templates formatted from the extracted groups; per-key type converters.
- ``DefaultInputPathParser`` (pathparsers.py:194-265): fills missing
  month/day by period, sets ``datetime = start_datetime`` and the period
  end-datetime.
- registry via ``__init_subclass__`` (pathparsers.py:26-89): configs name a
  parser class + params; engine keeps the same declarative surface with a
  plain dict registry of factory functions.

Engine execution model: ONE compiled parse over a whole Arrow string column
(``pyarrow.compute.extract_regex``) per batch — not a Python call per row.
The compiled pattern + template plan live in the actor's ``__init__``
(SURVEY.md T2; sidesteps the thread-safety fix noted in the reference's
CHANGELOG.md:23).
"""

from __future__ import annotations

import re
from typing import Callable, Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .datetimes import PERIODS, period_end, ymd_to_datetime64

_TEMPLATE_RE = re.compile(r"\{(\w+)\}")


class RegexPathParser:
    """Vectorized equivalent of Default/RegexInputPathParser.

    Parameters mirror the reference's config surface
    (config.py InputPathParserConfig -> classname + params):

    - ``pattern``: regex with named groups, RE2-compatible (pyarrow uses RE2:
      no backreferences/lookaround).
    - ``fixed_values``: constants or ``{group}`` templates evaluated
      vectorized against the extracted groups.
    - ``period``: yearly | monthly | daily | secondly | None. When set and the
      groups include ``year`` (+month/day as available), emits
      ``datetime``/``start_datetime``/``end_datetime`` columns.
    """

    def __init__(
        self,
        pattern: str,
        fixed_values: Optional[Dict[str, str]] = None,
        period: Optional[str] = None,
        start_truncate: Optional[str] = None,
    ):
        self.pattern = pattern
        self._re = re.compile(pattern)  # validate eagerly; RE2 check happens on first batch
        self.group_names = list(self._re.groupindex.keys())
        if not self.group_names:
            raise ValueError(f"pattern has no named groups: {pattern!r}")
        self.fixed_values = dict(fixed_values or {})
        if period is not None and period not in PERIODS:
            raise ValueError(f"period must be one of {PERIODS}, got {period!r}")
        self.period = period
        # start_truncate: some dataset presets pin start_datetime to the
        # period start even when finer groups were extracted (LandsatNDWI:
        # start = Jan 1 of the extracted year regardless of month/day,
        # pathparsers.py:284-291)
        if start_truncate not in (None, "year", "month"):
            raise ValueError(f"start_truncate must be None|'year'|'month', got {start_truncate!r}")
        self.start_truncate = start_truncate

    def parse_column(self, paths: pa.Array) -> Dict[str, pa.Array]:
        """String array of hrefs/paths -> dict of extracted/derived columns.

        Non-matching rows get null groups (the reference logs a warning and
        yields an empty dict per row, pathparsers.py:143-146; downstream
        filters drop them — M19/M20 semantics).
        """
        if isinstance(paths, pa.ChunkedArray):
            paths = paths.combine_chunks()
        struct = pc.extract_regex(paths, self.pattern)
        out: Dict[str, pa.Array] = {}
        for name in self.group_names:
            out[name] = pc.struct_field(struct, name)

        for key, value in self.fixed_values.items():
            if isinstance(value, str) and "{" in value:
                out[key] = self._format_template(value, out, len(paths))
            else:
                # explicit type so 0-row batches stay typed (pa.array([])
                # infers null, which breaks downstream string kernels)
                out[key] = pa.array([value] * len(paths), pa.scalar(value).type)

        if self.period is not None:
            self._add_period_datetimes(out, len(paths))
        return out

    def _format_template(self, template: str, cols: Dict[str, pa.Array], n: int) -> pa.Array:
        """Vectorized str.format over extracted group columns: split the
        template into literal / field parts and binary-join element-wise."""
        parts: List[pa.Array] = []
        pos = 0
        for m in _TEMPLATE_RE.finditer(template):
            if m.start() > pos:
                parts.append(pa.array([template[pos : m.start()]] * n, pa.string()))
            field = m.group(1)
            if field not in cols:
                raise KeyError(f"template field {{{field}}} not among extracted groups {list(cols)}")
            parts.append(pc.cast(cols[field], pa.string()))
            pos = m.end()
        if pos < len(template):
            parts.append(pa.array([template[pos:]] * n, pa.string()))
        sep = pa.array([""] * n, pa.string())
        return pc.binary_join_element_wise(*parts, sep)

    def _add_period_datetimes(self, out: Dict[str, pa.Array], n: int) -> None:
        if "year" not in out:
            raise ValueError("period semantics require a 'year' named group")
        year = pc.cast(out["year"], pa.int64())
        # _fill_missing_data (pathparsers.py:226-230): yearly -> month=1;
        # yearly/monthly -> day=1
        if "month" in out:
            month = pc.cast(out["month"], pa.int64())
        else:
            month = pa.array([1] * n, pa.int64())
        if "day" in out:
            day = pc.cast(out["day"], pa.int64())
        else:
            day = pa.array([1] * n, pa.int64())
        valid = pc.is_valid(year)
        y = np.asarray(pc.fill_null(year, 1970))
        m = np.asarray(pc.fill_null(month, 1))
        d = np.asarray(pc.fill_null(day, 1))
        if self.start_truncate == "year":
            m = np.ones_like(m)
            d = np.ones_like(d)
        elif self.start_truncate == "month":
            d = np.ones_like(d)
        start = ymd_to_datetime64(y, m, d)
        end = period_end(start, self.period)
        mask = ~np.asarray(valid)
        start_arr = pa.array(start, pa.timestamp("us"), mask=mask)
        end_arr = pa.array(end, pa.timestamp("us"), mask=mask)
        out["datetime"] = start_arr
        out["start_datetime"] = start_arr
        out["end_datetime"] = end_arr


# --- registry (pathparsers.py:26-89 analog) ---------------------------------

PARSER_REGISTRY: Dict[str, Callable[..., RegexPathParser]] = {}


def register_parser(name: str):
    def deco(factory: Callable[..., RegexPathParser]):
        PARSER_REGISTRY[name] = factory
        return factory

    return deco


def make_parser(classname: str, **params) -> RegexPathParser:
    """Instantiate a registered parser by name (config-driven, mirroring
    InputPathParserFactory semantics incl. unknown-name error)."""
    if classname not in PARSER_REGISTRY:
        raise ValueError(
            f"Unknown parser {classname!r}; registered: {sorted(PARSER_REGISTRY)}"
        )
    return PARSER_REGISTRY[classname](**params)


@register_parser("RegexPathParser")
def _make_regex(**params) -> RegexPathParser:
    return RegexPathParser(**params)


@register_parser("SmokeObservationsParser")
def _make_smoke(**params) -> RegexPathParser:
    """Parser for the reference-corpus layout
    ``2000/observations_2m-temp-monthly_2000-01-01.tif`` — the engine twin of
    the reference's test config (tests/data/config/config-test-collection.json:
    DefaultInputPathParser, period=monthly, item_id fixed-value template)."""
    return RegexPathParser(
        pattern=r"(?P<asset_type>[a-z0-9-]+)_(?P<year>\d{4})-(?P<month>\d{2})-(?P<day>\d{2})\.tif$",
        fixed_values={"item_id": "observations_{year}-{month}-{day}", "tile": "global"},
        period="monthly",
        **params,
    )


@register_parser("TiledObservationsParser")
def _make_tiled(**params) -> RegexPathParser:
    """Parser for the scale-set layout
    ``tiles/E07N12/2000/observations_2m-temp-monthly_E07N12_2000-01-01.tif``."""
    return RegexPathParser(
        pattern=(
            r"tiles/(?P<tile>E\d{2}N\d{2})/\d{4}/"
            r"observations_(?P<asset_type>[a-z0-9-]+)_E\d{2}N\d{2}_"
            r"(?P<year>\d{4})-(?P<month>\d{2})-(?P<day>\d{2})\.tif$"
        ),
        fixed_values={"item_id": "observations_{tile}_{year}-{month}-{day}"},
        period="monthly",
        **params,
    )


# --- dataset presets (pathparsers.py:268-372) --------------------------------
#
# The reference ships three concrete dataset parsers whose names appear in
# users' collection configs; the engine registers presets with the SAME
# period semantics so those configs keep working.  Each takes an optional
# ``pattern`` override (the reference's Landsat/ERA5 classes take the
# pattern from config too; PeopleEA hardcodes its own).


@register_parser("LandsatNDWIInputPathParser")
def _make_landsat_ndwi(pattern: Optional[str] = None, **params) -> RegexPathParser:
    """LandsatNDWI (pathparsers.py:268-291): whatever date groups the
    pattern extracts, start = Jan 1 of the year and end = Dec 31 23:59:59
    (year-range items)."""
    return RegexPathParser(
        pattern=pattern or r"(?P<asset_type>[A-Za-z0-9-]+)_(?P<year>\d{4})\.tif$",
        period="yearly",
        start_truncate="year",
        **params,
    )


@register_parser("PeopleEAIncaCFactorInputPathParser")
def _make_people_ea(**params) -> RegexPathParser:
    """PeopleEA INCA c-factor (pathparsers.py:293-338): hardcoded pattern
    ``PEOPLE_INCA_c-factor_YYYYMMDD``, fixed ``asset_type=cfactor``;
    start = the extracted Y-M-D, end = Dec 31 23:59:59 of that year."""
    return RegexPathParser(
        pattern=r"PEOPLE_INCA_c-factor_(?P<year>\d{4})(?P<month>\d{2})(?P<day>\d{2}).*\.tif$",
        fixed_values={"asset_type": "cfactor"},
        period="yearly",
        **params,
    )


@register_parser("ERA5LandInputPathParser")
def _make_era5_land(pattern: Optional[str] = None, **params) -> RegexPathParser:
    """ERA5-Land (pathparsers.py:339-372): start = the extracted Y-M-D,
    end = last day of that month 23:59:59 (calendar.monthrange semantics)."""
    return RegexPathParser(
        pattern=pattern or (
            r"(?P<asset_type>[A-Za-z0-9_-]+)_(?P<year>\d{4})-?(?P<month>\d{2})-?(?P<day>\d{2})\.tif$"
        ),
        period="monthly",
        **params,
    )
