"""64-bit DCT perceptual hash + Hamming distance (near-dedup primitive).

Classic pHash recipe (public): downsample to 32x32 by block mean, 2-D DCT-II,
keep the top-left 8x8 low-frequency block minus the DC term, threshold at the
median -> 64 bits.  Deterministic; used by the image near-dedup operator and
by the synthetic-table generator (FIXTURES.md §1 ``phash`` column).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np


@lru_cache(maxsize=8)
def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2.0 * n))
    m[0] /= np.sqrt(2.0)
    return m


def _downsample(img: np.ndarray, size: int = 32) -> np.ndarray:
    h, w = img.shape
    if min(h, w) < size:
        # boundary indices would repeat -> zero-area blocks -> NaN-derived
        # garbage hash; fail loudly instead (callers must supply >= 32px)
        raise ValueError(f"phash requires min(h, w) >= {size}, got {h}x{w}")
    ys = (np.arange(size + 1) * h) // size
    xs = (np.arange(size + 1) * w) // size
    # block means via 2-D cumulative sums (vectorized, any h/w >= size)
    cs = np.zeros((h + 1, w + 1), dtype=np.float64)
    cs[1:, 1:] = np.cumsum(np.cumsum(img.astype(np.float64), axis=0), axis=1)
    s = cs[ys[1:, None], xs[None, 1:]] - cs[ys[:-1, None], xs[None, 1:]] - cs[ys[1:, None], xs[None, :-1]] + cs[ys[:-1, None], xs[None, :-1]]
    area = (ys[1:, None] - ys[:-1, None]) * (xs[None, 1:] - xs[None, :-1])
    return s / area


def phash64(pixels: np.ndarray) -> int:
    """(h, w) numeric array -> signed 64-bit perceptual hash."""
    small = _downsample(pixels, 32)
    d = _dct_matrix(32)
    coef = d @ small @ d.T
    block = coef[:8, :8].flatten()[1:]  # drop DC
    med = np.median(block)
    bits = block > med
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    val <<= 1  # pad to 64 bits
    return val - (1 << 64) if val >= (1 << 63) else val


def phash64_batch(images) -> np.ndarray:
    """List of (h, w) arrays -> int64 hashes."""
    return np.array([phash64(im) for im in images], dtype=np.int64)


def hamming64(a, b) -> np.ndarray:
    """Vectorized Hamming distance between int64 hash arrays."""
    x = (np.asarray(a, dtype=np.int64) ^ np.asarray(b, dtype=np.int64)).astype(np.uint64)
    cnt = np.zeros(np.shape(x), dtype=np.int64)
    for _ in range(8):
        cnt += _POPCOUNT8[np.bitwise_and(x, np.uint64(0xFF)).astype(np.int64)]
        x = np.right_shift(x, np.uint64(8))
    return cnt


_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def phash64_stack(stack: np.ndarray) -> np.ndarray:
    """(n, h, w) same-shape stack -> int64 hashes, BIT-IDENTICAL to
    per-image :func:`phash64` (equality-tested in tests/test_codec.py on
    random shapes and on the bench table): cumsum scans, block-sum
    subtractions, divisions, median and the bit pack are all the same
    scalar operations applied per image — only the Python/numpy call
    overhead (the dominant cost at 64x48: ~57% of the decode stage) is
    amortized across the stack.  The 32x32 DCT is np.matmul-batched,
    which our equality test pins to the per-image `d @ s @ d.T` result."""
    n, h, w = stack.shape
    if min(h, w) < 32:
        raise ValueError(f"phash requires min(h, w) >= 32, got {h}x{w}")
    size = 32
    ys = (np.arange(size + 1) * h) // size
    xs = (np.arange(size + 1) * w) // size
    cs = np.zeros((n, h + 1, w + 1), dtype=np.float64)
    cs[:, 1:, 1:] = np.cumsum(np.cumsum(stack.astype(np.float64), axis=1), axis=2)
    s = (cs[:, ys[1:, None], xs[None, 1:]] - cs[:, ys[:-1, None], xs[None, 1:]]
         - cs[:, ys[1:, None], xs[None, :-1]] + cs[:, ys[:-1, None], xs[None, :-1]])
    area = (ys[1:, None] - ys[:-1, None]) * (xs[None, 1:] - xs[None, :-1])
    small = s / area
    d = _dct_matrix(size)
    coef = np.matmul(np.matmul(d, small), d.T)
    block = coef[:, :8, :8].reshape(n, 64)[:, 1:]
    med = np.median(block, axis=1)
    bits = block > med[:, None]
    shifts = np.arange(62, -1, -1, dtype=np.uint64)
    val = (bits.astype(np.uint64) << shifts).sum(axis=1, dtype=np.uint64)
    return (val << np.uint64(1)).view(np.int64)
