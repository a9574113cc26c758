"""Raster codec + perceptual hash (pure numpy + stdlib zlib/struct).

The engine's input table carries encoded image payloads
(``bytes: binary, fmt: string`` per BASELINE.json input_hint); this package
decodes them inside actor-pool ``map_batches`` stages and provides the
PSNR/phash primitives for the per-row invariant and near-dedup operators.
"""

from .raster import decode_image, encode_image, psnr
from .phash import phash64, hamming64

__all__ = ["decode_image", "encode_image", "psnr", "phash64", "hamming64"]
