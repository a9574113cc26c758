"""Vectorized scalar-function layer (SURVEY.md §2.2, §2.7).

Everything here is a pure function over Arrow arrays / numpy — applied inside
``map_batches``, never per row on the driver.
"""

from .pathparse import RegexPathParser, PARSER_REGISTRY, register_parser, make_parser
from .datetimes import normalize_timestamps, period_end
from .rounding import resolution_precision, round_to_precision

__all__ = [
    "RegexPathParser",
    "PARSER_REGISTRY",
    "register_parser",
    "make_parser",
    "normalize_timestamps",
    "period_end",
    "resolution_precision",
    "round_to_precision",
]
