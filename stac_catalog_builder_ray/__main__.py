"""CLI entry: ``python -m stac_catalog_builder_ray <command> ...``
(the reference exposes the same surface via its click CLI -> commandapi)."""

import sys

from .commands import _main

sys.exit(_main(sys.argv[1:]))
