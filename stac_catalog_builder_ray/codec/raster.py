"""Encode/decode single-band uint16 rasters in three container formats.

The reference reads GeoTIFF headers via rasterio (mapper.py:116-151); this
sandbox has no rasterio/Pillow, so the engine defines its own containers
(SURVEY.md §7.1 "imagecodec"):

- ``raw``  — magic ``RW16`` + ``<HH`` (w, h) + little-endian uint16 pixels
- ``zlib`` — magic ``ZL16`` + ``<HH`` (w, h) + zlib-compressed pixel bytes
- ``png``  — a real, spec-conformant 16-bit grayscale PNG (stdlib zlib +
             struct + crc32); readable by any PNG viewer

All are lossless, so the per-row invariant (decoded-pixel PSNR >= 40 dB,
BASELINE.json) holds exactly; ``psnr`` is still computed for the gate so a
lossy format can be added later without touching the checks.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_RAW_MAGIC = b"RW16"
_ZLIB_MAGIC = b"ZL16"
_PNG_SIG = b"\x89PNG\r\n\x1a\n"

FORMATS = ("raw", "zlib", "png")


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """(h, w) uint16 array -> encoded bytes in ``fmt``."""
    if pixels.dtype != np.uint16:
        raise TypeError(f"pixels must be uint16, got {pixels.dtype}")
    h, w = pixels.shape
    if fmt == "raw":
        return _RAW_MAGIC + struct.pack("<HH", w, h) + pixels.astype("<u2").tobytes()
    if fmt == "zlib":
        return _ZLIB_MAGIC + struct.pack("<HH", w, h) + zlib.compress(pixels.astype("<u2").tobytes(), 6)
    if fmt == "png":
        return _encode_png16(pixels)
    raise ValueError(f"unknown fmt {fmt!r}; expected one of {FORMATS}")


def decode_image(data: bytes, fmt: str | None = None) -> np.ndarray:
    """Encoded bytes -> (h, w) uint16 array.  ``fmt`` is advisory — the
    container is sniffed from the magic, so a wrong ``fmt`` column can't
    corrupt a decode."""
    if data[:4] == _RAW_MAGIC:
        w, h = struct.unpack_from("<HH", data, 4)
        return np.frombuffer(data, dtype="<u2", count=w * h, offset=8).reshape(h, w).copy()
    if data[:4] == _ZLIB_MAGIC:
        w, h = struct.unpack_from("<HH", data, 4)
        raw = zlib.decompress(data[8:])
        return np.frombuffer(raw, dtype="<u2", count=w * h).reshape(h, w).copy()
    if data[:8] == _PNG_SIG:
        return _decode_png16(data)
    raise ValueError(f"unrecognised image container (fmt hint={fmt!r})")


def psnr(a: np.ndarray, b: np.ndarray, max_val: float = 65535.0) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(max_val * max_val / mse))


# --- minimal spec-conformant 16-bit grayscale PNG ---------------------------


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _encode_png16(pixels: np.ndarray) -> bytes:
    h, w = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)  # bit depth 16, grayscale
    rows = pixels.astype(">u2").tobytes()
    # filter byte 0 (None) prepended to each scanline
    stride = w * 2
    scan = bytearray()
    for r in range(h):
        scan += b"\x00" + rows[r * stride : (r + 1) * stride]
    idat = zlib.compress(bytes(scan), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _decode_png16(data: bytes) -> np.ndarray:
    pos = 8
    w = h = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color, *_ = struct.unpack(">IIBBBBB", payload)
            if depth != 16 or color != 0:
                raise ValueError("only 16-bit grayscale PNG supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = w * 2
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = arr[:, 0]
    if np.all(ftypes == 0):  # fast path: our encoder always writes filter 0
        return arr[:, 1:].copy().view(">u2").reshape(h, w).astype(np.uint16)
    out = np.empty((h, w), dtype=np.uint16)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        ftype = ftypes[r]
        line = arr[r, 1:].copy()
        if ftype == 0:
            pass
        elif ftype == 2:  # Up
            line = (line + prev).astype(np.uint8)
        else:
            raise ValueError(f"unsupported PNG filter type {ftype}")
        prev = line
        out[r] = line.view(">u2").astype(np.uint16)
    return out
