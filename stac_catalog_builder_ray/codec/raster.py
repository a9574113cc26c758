"""Encode/decode rasters in four container formats.

The reference reads GeoTIFF headers via rasterio (mapper.py:116-155: per-band
dtype/nodata/units + COG validation); this sandbox has no rasterio/Pillow, so
the engine defines its own containers (SURVEY.md §7.1 "imagecodec"):

- ``raw``  — magic ``RW16`` + ``<HH`` (w, h) + little-endian uint16 pixels
- ``zlib`` — magic ``ZL16`` + ``<HH`` (w, h) + zlib-compressed pixel bytes
- ``png``  — a real, spec-conformant 16-bit grayscale PNG (stdlib zlib +
             struct + crc32); readable by any PNG viewer
- ``mbnd`` — multi-band container with a REAL per-band header (dtype code,
             nodata, units — the fields rasterio exposes per band,
             mapper.py:146-152) + a cloud-optimized flag; any numeric dtype
             incl. float64, so the smoke corpus can carry the reference's
             float64 mock-raster values verbatim

All are lossless, so the per-row invariant (decoded-pixel PSNR >= 40 dB,
BASELINE.json) holds exactly; ``psnr`` is still computed for the gate so a
lossy format can be added later without touching the checks.

``is_cloud_optimized`` is the engine's ``cog_validate`` analog
(mapper.py:157-164): a container classifies as cloud-optimized iff its pixel
data is randomly accessible without a full-stream decompress — ``raw`` and
flagged ``mbnd`` qualify; ``zlib``/``png`` (whole-stream deflate) do not.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_RAW_MAGIC = b"RW16"
_ZLIB_MAGIC = b"ZL16"
_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_MBND_MAGIC = b"MBND"

FORMATS = ("raw", "zlib", "png")

DTYPE_CODES = {0: "uint8", 1: "uint16", 2: "int16", 3: "int32", 4: "float32", 5: "float64"}
DTYPE_TO_CODE = {v: k for k, v in DTYPE_CODES.items()}
UNIT_CODES = {0: None, 1: "K", 2: "mm", 3: "m", 4: "1"}
UNIT_TO_CODE = {v: k for k, v in UNIT_CODES.items()}


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
    if data[:4] == _MBND_MAGIC:
        return decode_multiband(data)[0][0]  # band 0, native dtype
    raise ValueError(f"unrecognised image container (fmt hint={fmt!r})")


def encode_multiband(planes, nodata=None, units=None, cloud_optimized: bool = True) -> bytes:
    """List of (h, w) arrays (per-band dtypes may differ) -> ``mbnd`` bytes.

    Header: magic + ``<HHBB`` (w, h, n_bands, flags[bit0=cloud_optimized]),
    then per band ``<BdB`` (dtype code, nodata as float64 — NaN encodes
    None, unit code).  Cloud-optimized body = uncompressed concatenated
    planes (randomly accessible); otherwise one zlib stream."""
    if isinstance(planes, np.ndarray) and planes.ndim == 2:
        planes = [planes]
    n = len(planes)
    h, w = planes[0].shape
    nodata = nodata or [None] * n
    units = units or [None] * n
    out = bytearray(_MBND_MAGIC)
    out += struct.pack("<HHBB", w, h, n, 1 if cloud_optimized else 0)
    for i, p in enumerate(planes):
        if p.shape != (h, w):
            raise ValueError("all bands must share one (h, w)")
        out += struct.pack(
            "<BdB",
            DTYPE_TO_CODE[p.dtype.name],
            float("nan") if nodata[i] is None else float(nodata[i]),
            UNIT_TO_CODE[units[i]],
        )
    body = b"".join(np.ascontiguousarray(p).astype(p.dtype.newbyteorder("<")).tobytes() for p in planes)
    out += body if cloud_optimized else zlib.compress(body, 6)
    return bytes(out)


def decode_multiband(data: bytes, fmt: str | None = None):
    """Any container -> ``(planes, band_meta)`` where ``planes`` is a list of
    (h, w) arrays and ``band_meta`` mirrors the reference's per-band record
    (``BandMetadata``, metadata.py:32-63 / mapper.py:146-152):
    ``{"data_type", "index", "nodata", "units"}``.  Single-band legacy
    containers report their ACTUAL decoded dtype — never a constant."""
    if data[:4] != _MBND_MAGIC:
        px = decode_image(data, fmt)
        return [px], [
            {"data_type": px.dtype.name, "index": 0, "nodata": None, "units": None}
        ]
    w, h, n, flags = struct.unpack_from("<HHBB", data, 4)
    pos = 10  # 4 magic + 6 header bytes
    metas, dtypes = [], []
    for i in range(n):
        code, nd, uc = struct.unpack_from("<BdB", data, pos)
        pos += 10
        metas.append(
            {
                "data_type": DTYPE_CODES[code],
                "index": i,
                "nodata": None if np.isnan(nd) else nd,
                "units": UNIT_CODES[uc],
            }
        )
        dtypes.append(np.dtype(DTYPE_CODES[code]).newbyteorder("<"))
    body = data[pos:] if (flags & 1) else zlib.decompress(data[pos:])
    planes, off = [], 0
    for dt in dtypes:
        nbytes = w * h * dt.itemsize
        planes.append(
            np.frombuffer(body, dtype=dt, count=w * h, offset=off)
            .reshape(h, w)
            .astype(dt.newbyteorder("="))
        )
        off += nbytes
    return planes, metas


def band_header(data: bytes, fmt: str | None = None):
    """HEADER-ONLY per-band metadata — no pixel decode (the hot-path band
    extraction of DecodeExtract; rasterio likewise reads band dtype/nodata
    from the header, mapper.py:146-152)."""
    if data[:4] == _MBND_MAGIC:
        w, h, n, _flags = struct.unpack_from("<HHBB", data, 4)
        pos = 10  # 4 magic + 6 header bytes
        metas = []
        for i in range(n):
            code, nd, uc = struct.unpack_from("<BdB", data, pos)
            pos += 10
            metas.append(
                {
                    "data_type": DTYPE_CODES[code],
                    "index": i,
                    "nodata": None if np.isnan(nd) else nd,
                    "units": UNIT_CODES[uc],
                }
            )
        return metas
    if data[:4] in (_RAW_MAGIC, _ZLIB_MAGIC) or data[:8] == _PNG_SIG:
        # all three legacy containers are single-band uint16 by definition
        return [{"data_type": "uint16", "index": 0, "nodata": None, "units": None}]
    raise ValueError(f"unrecognised image container (fmt hint={fmt!r})")


def is_cloud_optimized(data: bytes) -> bool:
    """Engine analog of ``cog_validate`` (mapper.py:157-164): True iff pixel
    data is randomly accessible without a full-stream decompress."""
    if data[:4] == _RAW_MAGIC:
        return True
    if data[:4] == _MBND_MAGIC:
        flags = data[9]  # 4 magic + w(2) + h(2) + n_bands(1) -> flags byte
        return bool(flags & 1)
    return False  # zlib / png: one deflate stream


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
