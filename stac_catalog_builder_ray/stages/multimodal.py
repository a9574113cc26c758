"""Multimodal column stages: decode / resize / feature-extract / frame-sample
over opaque ``binary`` payload columns with typed metadata.

The Ray-side plumbing (schemas, actor-pool signatures, batch sizing, output
layout) is real and tested; payload codecs split into:

- **native formats** (raw/zlib/png uint16 rasters — codec/raster.py): fully
  implemented, used by the flagship pipeline;
- **external formats** (JPEG images, audio, video): libs aren't in this
  container, so the decode step is STUBBED — ``strict=True`` raises
  ``NotImplementedError`` naming the missing capability; ``strict=False``
  produces a deterministic fake (seeded from the payload bytes) so
  downstream plumbing can be exercised end-to-end.

Batch-size guidance (wide binary rows, SURVEY.md §7): callers should pass a
small ``batch_size`` (32-256) so batch x concurrency stays inside worker
heaps, and drop the payload column as early as possible.
"""

from __future__ import annotations

import zlib
from typing import Optional, Tuple

import numpy as np
import pyarrow as pa

from ..codec.raster import decode_image

NATIVE_MAGIC = (b"RW16", b"ZL16", b"\x89PNG", b"MBND")


def _is_native(buf: bytes) -> bool:
    return any(buf[: len(m)] == m for m in NATIVE_MAGIC)


def _fake_pixels_from_bytes(buf: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic stand-in decode for external formats: pixels seeded from
    a payload checksum — stable across runs/processes."""
    seed = zlib.crc32(buf) & 0xFFFFFFFF
    rng = np.random.default_rng(seed)
    return rng.integers(0, 65536, size=(h, w), dtype=np.uint16)


class DecodeStage:
    """(bytes, fmt, w, h) -> decoded pixel stats + optional downsampled
    thumbnail column.  Actor pool: one codec table per actor."""

    def __init__(self, strict: bool = False, thumbnail: Optional[Tuple[int, int]] = None):
        self.strict = strict
        self.thumbnail = thumbnail

    def _decode(self, buf: bytes, fmt: str, w: int, h: int) -> np.ndarray:
        if _is_native(buf):
            return decode_image(buf, fmt)
        if self.strict:
            raise NotImplementedError(
                f"decode of external format {fmt!r} requires an image library "
                "not present in this environment (Pillow/libjpeg); "
                "run with strict=False for a deterministic fake"
            )
        return _fake_pixels_from_bytes(buf, h, w)

    def __call__(self, batch: pa.Table) -> pa.Table:
        bts = batch["bytes"]
        fmts = batch["fmt"].to_pylist()
        ws = batch["w"].to_pylist()
        hs = batch["h"].to_pylist()
        n = batch.num_rows
        mean = np.empty(n)
        std = np.empty(n)
        thumbs = [] if self.thumbnail else None
        for i in range(n):
            px = self._decode(bts[i].as_py(), fmts[i], ws[i], hs[i])
            mean[i] = px.mean()
            std[i] = px.std()
            if thumbs is not None:
                th = resize_nn(px, *self.thumbnail)
                if th.dtype != np.uint16:  # float bands quantize for the thumbnail
                    th = np.clip(np.round(th), 0, 65535).astype(np.uint16)
                thumbs.append(th.ravel().tolist())
        cols = {
            "image_id": batch["image_id"],
            "px_mean": pa.array(mean),
            "px_std": pa.array(std),
        }
        if thumbs is not None:
            cols["thumbnail"] = pa.array(thumbs, pa.list_(pa.uint16()))
        return pa.table(cols)


def resize_nn(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbour resize (pure numpy index map)."""
    h, w = px.shape
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return px[ys[:, None], xs[None, :]]


class FeatureExtractStage:
    """Decoded-payload -> fixed-length feature vector (histogram + moments);
    the engine-native stand-in for batched model inference.  A real model
    would load in ``__init__`` (once per actor) exactly like this codec
    table does."""

    def __init__(self, bins: int = 16, strict: bool = False):
        self.bins = bins
        self.edges = np.linspace(0, 65536, bins + 1)
        self.decoder = DecodeStage(strict=strict)

    def __call__(self, batch: pa.Table) -> pa.Table:
        bts = batch["bytes"]
        fmts = batch["fmt"].to_pylist()
        ws = batch["w"].to_pylist()
        hs = batch["h"].to_pylist()
        feats = []
        for i in range(batch.num_rows):
            px = self.decoder._decode(bts[i].as_py(), fmts[i], ws[i], hs[i])
            hist, _ = np.histogram(px, bins=self.edges)
            hist = hist / max(1, px.size)
            moments = [px.mean() / 65535.0, px.std() / 65535.0]
            feats.append(np.concatenate([hist, moments]).astype(np.float32).tolist())
        return pa.table(
            {"image_id": batch["image_id"], "features": pa.array(feats, pa.list_(pa.float32()))}
        )


class FrameSampleStage:
    """Video-style frame sampling over a concatenated-frames binary layout:
    payload = N frames of (h x w x 2 bytes); emits every ``stride``-th frame
    as its own row (flat-map explode).  For real video containers this is
    where ffmpeg would be invoked — stubbed identically to DecodeStage."""

    def __init__(self, stride: int = 2, strict: bool = False):
        self.stride = stride
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, frames = [], [], []
        for i in range(batch.num_rows):
            buf = batch["bytes"][i].as_py()
            w = batch["w"][i].as_py()
            h = batch["h"][i].as_py()
            frame_bytes = w * h * 2
            n_frames = len(buf) // frame_bytes
            if n_frames == 0:
                if self.strict:
                    raise NotImplementedError(
                        "container-format video requires ffmpeg (not in this environment)"
                    )
                continue
            for f in range(0, n_frames, self.stride):
                raw = buf[f * frame_bytes : (f + 1) * frame_bytes]
                ids.append(batch["image_id"][i].as_py())
                frame_idx.append(f)
                frames.append(raw)
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "frame": pa.array(frame_idx, pa.int32()),
                "bytes": pa.array(frames, pa.binary()),
            }
        )


class PatchExtractStage:
    """Image -> non-overlapping ``p x p`` patches (the ViT training-data
    fan-out): one row per patch with grid coordinates, raw little-endian
    uint16 payload, and integer pixel sums for downstream filtering.

    Vectorized per image (one reshape/transpose, no per-patch loop); the
    batch loop is payload-bound like every decode stage.  Ragged edges are
    dropped (the standard ViT convention), so ``h % p`` / ``w % p`` tail
    pixels never emit.  Fan-out is (h//p)*(w//p) rows per image — size
    ``batch_size`` so batch x fan-out x p² x 2 bytes fits the worker heap."""

    def __init__(self, patch: int = 16, strict: bool = False):
        self.p = int(patch)
        self.decoder = DecodeStage(strict=strict)

    def __call__(self, batch: pa.Table) -> pa.Table:
        p = self.p
        ids, prs, pcs, bufs, sums = [], [], [], [], []
        for i in range(batch.num_rows):
            px = self.decoder._decode(
                batch["bytes"][i].as_py(), batch["fmt"][i].as_py(),
                batch["w"][i].as_py(), batch["h"][i].as_py())
            h, w = px.shape
            gh, gw = h // p, w // p
            if gh == 0 or gw == 0:
                continue
            grid = px[: gh * p, : gw * p].reshape(gh, p, gw, p).transpose(0, 2, 1, 3)
            flat = np.ascontiguousarray(grid).reshape(gh * gw, p * p)
            img_id = batch["image_id"][i].as_py()
            ids.extend([img_id] * (gh * gw))
            prs.append(np.repeat(np.arange(gh, dtype=np.int32), gw))
            pcs.append(np.tile(np.arange(gw, dtype=np.int32), gh))
            le = flat.astype("<u2")
            bufs.extend(le[j].tobytes() for j in range(gh * gw))
            sums.append(flat.astype(np.int64).sum(axis=1))
        if not ids:
            return pa.table({"image_id": pa.array([], pa.string()),
                             "patch_row": pa.array([], pa.int32()),
                             "patch_col": pa.array([], pa.int32()),
                             "patch": pa.array([], pa.binary()),
                             "px_sum": pa.array([], pa.int64())})
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "patch_row": pa.array(np.concatenate(prs)),
            "patch_col": pa.array(np.concatenate(pcs)),
            "patch": pa.array(bufs, pa.binary()),
            "px_sum": pa.array(np.concatenate(sums)),
        })


def extract_patches(images, patch: int = 16, concurrency=(1, 8),
                    batch_size: int = 32):
    """images Dataset -> patches Dataset (image_id, patch_row, patch_col,
    patch bytes, px_sum), actor-pool stage."""
    return images.map_batches(
        PatchExtractStage,
        fn_constructor_kwargs={"patch": patch},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class AugmentStage:
    """Deterministic per-epoch image augmentation (the training-loader
    transform expressed as a batch stage): horizontal flip + random crop,
    with ALL randomness derived from splitmix64(hash(image_id), epoch) —
    so any worker, any retry, any cluster size produces byte-identical
    augmented pixels for a given (image, epoch), and an epoch re-run is
    reproducible end to end.  Emits re-encoded raw payloads plus the
    applied parameters for audit."""

    def __init__(self, epoch: int = 0, crop_frac: float = 0.875, strict: bool = False):
        self.epoch = int(epoch)
        self.crop_frac = float(crop_frac)
        self.decoder = DecodeStage(strict=strict)

    def _params(self, image_id: str, h: int, w: int):
        import zlib

        from .dedup import splitmix64

        seed = np.uint64(zlib.crc32(image_id.encode()) ^ (self.epoch << 32))
        r = splitmix64(np.array([seed], dtype=np.uint64))[0]
        flip = bool(r & np.uint64(1))
        ch, cw = max(1, int(h * self.crop_frac)), max(1, int(w * self.crop_frac))
        oy = int((r >> np.uint64(1)) % np.uint64(h - ch + 1))
        ox = int((r >> np.uint64(17)) % np.uint64(w - cw + 1))
        return flip, oy, ox, ch, cw

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..codec.raster import encode_image

        ids, bufs, hs, ws, flips, oys, oxs = [], [], [], [], [], [], []
        for i in range(batch.num_rows):
            img_id = batch["image_id"][i].as_py()
            px = self.decoder._decode(
                batch["bytes"][i].as_py(), batch["fmt"][i].as_py(),
                batch["w"][i].as_py(), batch["h"][i].as_py())
            h, w = px.shape
            flip, oy, ox, ch, cw = self._params(img_id, h, w)
            out = px[oy:oy + ch, ox:ox + cw]
            if flip:
                out = out[:, ::-1]
            ids.append(img_id)
            bufs.append(encode_image(np.ascontiguousarray(out), "raw"))
            hs.append(ch); ws.append(cw); flips.append(flip); oys.append(oy); oxs.append(ox)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(bufs, pa.binary()),
            "h": pa.array(hs, pa.int32()), "w": pa.array(ws, pa.int32()),
            "fmt": pa.array(["raw"] * len(ids), pa.string()),
            "flip": pa.array(flips, pa.bool_()),
            "crop_y": pa.array(oys, pa.int32()), "crop_x": pa.array(oxs, pa.int32()),
        })


def augment_images(images, epoch: int = 0, crop_frac: float = 0.875,
                   concurrency=(1, 8), batch_size: int = 64):
    """images Dataset -> augmented images Dataset, deterministic per epoch."""
    return images.map_batches(
        AugmentStage,
        fn_constructor_kwargs={"epoch": epoch, "crop_frac": crop_frac},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ImageStatsStage:
    """Per-image QUALITY-STATISTICS filter (the image-side analogue of the
    Gopher text-quality signals): decode -> integer-exact per-image stats
    used to drop flat / washed-out / low-information images from a training
    corpus.

    Emitted per image (all int64, so results are independent of block
    layout and bit-stable across engines):
    - ``n_px``            total pixels
    - ``n_distinct``      distinct pixel values
    - ``px_range``        max - min
    - ``top_share_e4``    floor(mode_count * 10000 / n_px) — dominance of
                          the most frequent value (a flat image -> 10000)
    - ``low_info``        1 when top_share_e4 >= 5000 or n_distinct <= 4

    Actor pool: the codec table lives in the actor; pixels never leave the
    task (only the tiny stats row crosses the object store)."""

    def __init__(self, strict: bool = False):
        self.strict = strict
        self._decode = DecodeStage(strict=strict)._decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        bts = batch["bytes"]
        fmts = batch["fmt"].to_pylist()
        ws = batch["w"].to_pylist()
        hs = batch["h"].to_pylist()
        n = batch.num_rows
        n_px = np.empty(n, np.int64)
        n_distinct = np.empty(n, np.int64)
        px_range = np.empty(n, np.int64)
        top_share = np.empty(n, np.int64)
        for i in range(n):
            px = self._decode(bts[i].as_py(), fmts[i], ws[i], hs[i])
            flat = px.ravel()
            vals, counts = np.unique(flat, return_counts=True)
            n_px[i] = flat.size
            n_distinct[i] = len(vals)
            # float bands: range over the quantized int view keeps int64-ness
            lo, hi = vals[0], vals[-1]
            px_range[i] = int(np.int64(hi) - np.int64(lo)) if np.issubdtype(
                vals.dtype, np.integer) else int(np.ceil(float(hi)) - np.floor(float(lo)))
            top_share[i] = int(counts.max()) * 10000 // flat.size
        low = ((top_share >= 5000) | (n_distinct <= 4)).astype(np.int64)
        return pa.table({
            "image_id": batch["image_id"],
            "n_px": pa.array(n_px), "n_distinct": pa.array(n_distinct),
            "px_range": pa.array(px_range), "top_share_e4": pa.array(top_share),
            "low_info": pa.array(low),
        })


def image_stats(images, concurrency=(1, 8), batch_size: int = 128):
    """images Dataset -> per-image quality-stats Dataset."""
    return images.map_batches(
        ImageStatsStage, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
    )


def _cc_label_min(mask: np.ndarray) -> np.ndarray:
    """4-connected component labels of a boolean mask by MIN-LABEL
    PROPAGATION with pointer jumping — the same discipline as the engine's
    distributed connected-components (stages/dedup.py), applied per image:
    each foreground pixel starts as its own label (its flat index); edge
    rounds fold the minimum over horizontal/vertical neighbours
    (np.minimum.at — no Python per-pixel loop), pointer jumps compress
    paths, and the loop converges in O(log diameter) rounds.  Returns the
    flat label array (-1 = background)."""
    h, w = mask.shape
    lab = np.full(h * w, -1, dtype=np.int64)
    ids = np.flatnonzero(mask.ravel())
    if len(ids) == 0:
        return lab
    lab[ids] = ids
    rr = np.flatnonzero((mask[:, :-1] & mask[:, 1:]).ravel())
    # ravel of the (h, w-1) window -> source index in the (h, w) grid
    a_r = (rr // (w - 1)) * w + (rr % (w - 1)) if w > 1 else np.empty(0, np.int64)
    dd = np.flatnonzero((mask[:-1, :] & mask[1:, :]).ravel())
    a = np.concatenate([a_r, dd])
    b = np.concatenate([a_r + 1, dd + w])
    if len(a) == 0:
        return lab
    while True:
        m = np.minimum(lab[a], lab[b])
        before = lab[ids].copy()
        np.minimum.at(lab, a, m)
        np.minimum.at(lab, b, m)
        lab[ids] = lab[lab[ids]]          # pointer jump
        if np.array_equal(lab[ids], before):
            break
    # full path compression
    while True:
        nxt = lab[lab[ids]]
        if np.array_equal(nxt, lab[ids]):
            break
        lab[ids] = nxt
    return lab


class BlobCountStage:
    """Per-image BLOB DETECTION (foreground connected-component count —
    the raster object-counting / segmentation-sanity operator): decode,
    threshold at the integer pixel mean (px > floor(sum/n)), label
    4-connected components, emit integer stats.  Pixels never leave the
    task; one small row per image crosses the object store.

    Emitted per image (all int64, block-layout independent):
    ``n_fg`` foreground pixels · ``n_blobs`` component count ·
    ``max_blob`` largest component size."""

    def __init__(self, strict: bool = False):
        self.strict = strict
        self._decode = DecodeStage(strict=strict)._decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        bts = batch["bytes"]
        fmts = batch["fmt"].to_pylist()
        ws = batch["w"].to_pylist()
        hs = batch["h"].to_pylist()
        n = batch.num_rows
        n_fg = np.zeros(n, np.int64)
        n_blobs = np.zeros(n, np.int64)
        max_blob = np.zeros(n, np.int64)
        for i in range(n):
            px = self._decode(bts[i].as_py(), fmts[i], ws[i], hs[i])
            px = np.asarray(px)
            thr = int(px.sum(dtype=np.int64)) // px.size
            mask = px > thr
            n_fg[i] = int(mask.sum())
            if n_fg[i]:
                lab = _cc_label_min(mask)
                roots = lab[lab >= 0]
                _, counts = np.unique(roots, return_counts=True)
                n_blobs[i] = len(counts)
                max_blob[i] = int(counts.max())
        return pa.table({
            "image_id": batch["image_id"],
            "n_fg": pa.array(n_fg), "n_blobs": pa.array(n_blobs),
            "max_blob": pa.array(max_blob),
        })


def blob_count(images, concurrency=(1, 8), batch_size: int = 128):
    """images Dataset -> per-image blob-count Dataset."""
    return images.map_batches(
        BlobCountStage, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
    )


def _otsu_bin(px: np.ndarray) -> int:
    """Exact Otsu threshold over the 256-level histogram of a uint16 image
    (bin = px >> 8): maximize the between-class variance
    sigma_b^2(t) = (s0*w1 - s1*w0)^2 / (w0*w1) over split points t
    (class 0 = bins < t).  The argmax compares EXACT integer cross
    products (python bignum — the squared term exceeds int64), smallest t
    on ties, so the result is bit-stable on any platform."""
    hist = np.bincount((np.asarray(px).ravel().astype(np.int64) >> 8)
                       .clip(0, 255), minlength=256)
    w = hist.cumsum()
    s = (hist * np.arange(256, dtype=np.int64)).cumsum()
    n, stot = int(w[-1]), int(s[-1])
    best_t, best_num, best_den = 0, -1, 1
    for t in range(1, 256):
        w0, s0 = int(w[t - 1]), int(s[t - 1])
        w1 = n - w0
        if w0 == 0 or w1 == 0:
            continue
        d = s0 * w1 - (stot - s0) * w0
        num, den = d * d, w0 * w1
        # exact fraction compare: num/den > best_num/best_den
        if num * best_den > best_num * den:
            best_t, best_num, best_den = t, num, den
    return best_t


class OtsuStage:
    """Per-image OTSU ADAPTIVE THRESHOLDING (the classic foreground
    segmentation rule — blob_count's fixed mean threshold upgraded to the
    bimodal-optimal split): decode, find the exact integer Otsu bin,
    emit the threshold and foreground stats.  Pixels never leave the
    task."""

    def __init__(self, strict: bool = False):
        self.strict = strict
        self._decode = DecodeStage(strict=strict)._decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        bts = batch["bytes"]
        fmts = batch["fmt"].to_pylist()
        ws = batch["w"].to_pylist()
        hs = batch["h"].to_pylist()
        n = batch.num_rows
        thr = np.zeros(n, np.int64)
        fg = np.zeros(n, np.int64)
        share = np.zeros(n, np.int64)
        for i in range(n):
            px = np.asarray(self._decode(bts[i].as_py(), fmts[i],
                                         ws[i], hs[i]))
            t = _otsu_bin(px)
            thr[i] = t
            mask = (px.astype(np.int64) >> 8) >= t
            fg[i] = int(mask.sum())
            share[i] = fg[i] * 10000 // px.size
        return pa.table({"image_id": batch["image_id"],
                         "otsu_bin": pa.array(thr),
                         "fg_px": pa.array(fg),
                         "fg_share_e4": pa.array(share)})


def otsu_threshold(images, concurrency=(1, 8), batch_size: int = 128):
    """images Dataset -> per-image Otsu threshold stats Dataset."""
    return images.map_batches(
        OtsuStage, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
    )
