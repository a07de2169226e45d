"""Real PNG codec (functions/png.py).

Validation is by independent structure (no PIL/matplotlib exists in
this container to cross-check against): the decoder is driven with PNG
byte streams ASSEMBLED BY HAND in this file — chunk layout via
struct/zlib and scanline filtering via straightforward per-spec loops
written here, not by calling the module's encoder — so an
encoder/decoder pair bug cannot cancel out.  Round-trip fuzz then
covers the full shape/filter space, and the error paths (CRC, magic,
truncation, unsupported features) are pinned.
"""

import struct
import zlib

import numpy as np
import pytest

from datacube_core_spark.functions.png import (
    is_png,
    png_decode,
    png_encode,
    png_meta,
)

RNG = np.random.default_rng(20260817)

MAGIC = b"\x89PNG\r\n\x1a\n"


def _chunk(tag, body):
    return (
        struct.pack(">I", len(body)) + tag + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _hand_filter(img: np.ndarray, filters) -> bytes:
    """Forward-filter per the spec's defining formulas — plain Python
    loops, independent of the module's vectorized encoder."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    rows = img.reshape(h, w * ch).astype(int)
    out = bytearray()
    for y in range(h):
        f = filters[y]
        out.append(f)
        for i in range(w * ch):
            x = rows[y][i]
            a = rows[y][i - ch] if i >= ch else 0          # left
            b = rows[y - 1][i] if y > 0 else 0             # up
            c = rows[y - 1][i - ch] if (y > 0 and i >= ch) else 0  # up-left
            if f == 0:
                v = x
            elif f == 1:
                v = x - a
            elif f == 2:
                v = x - b
            elif f == 3:
                v = x - (a + b) // 2
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = x - pred
            out.append(v % 256)
    return bytes(out)


def _hand_png(img: np.ndarray, filters) -> bytes:
    color_type = 0 if img.ndim == 2 else {3: 2, 4: 6}[img.shape[2]]
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(_hand_filter(img, filters))
    return MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def test_decode_hand_built_gray_all_filters():
    """5-row grayscale stream using every filter type exactly once, the
    stream produced by per-spec loops in THIS file."""
    img = RNG.integers(0, 256, size=(5, 7), dtype=np.uint8)
    data = _hand_png(img, filters=[0, 1, 2, 3, 4])
    out = png_decode(data)
    assert out.dtype == np.uint8 and out.shape == (5, 7)
    assert (out == img).all()


def test_decode_hand_built_rgb_and_rgba():
    img3 = RNG.integers(0, 256, size=(4, 3, 3), dtype=np.uint8)
    out3 = png_decode(_hand_png(img3, filters=[4, 3, 1, 2]))
    assert out3.shape == (4, 3, 3) and (out3 == img3).all()
    img4 = RNG.integers(0, 256, size=(3, 5, 4), dtype=np.uint8)
    out4 = png_decode(_hand_png(img4, filters=[2, 4, 4]))
    assert out4.shape == (3, 5, 4) and (out4 == img4).all()


def test_decode_skips_ancillary_chunks():
    """tEXt between IDAT-bearing chunks is CRC-checked then ignored; IDAT
    split across two chunks concatenates."""
    img = RNG.integers(0, 256, size=(3, 3), dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 3, 3, 8, 0, 0, 0, 0)
    idat = zlib.compress(_hand_filter(img, [0, 0, 0]))
    mid = len(idat) // 2
    data = (
        MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"tEXt", b"Comment\x00hi")
        + _chunk(b"IDAT", idat[:mid]) + _chunk(b"IDAT", idat[mid:])
        + _chunk(b"IEND", b"")
    )
    assert (png_decode(data) == img).all()


@pytest.mark.parametrize("shape", [(1, 1), (1, 9), (9, 1), (16, 16), (7, 11, 3), (5, 6, 4)])
@pytest.mark.parametrize("mode", ["none", "cycle"])
def test_roundtrip_fuzz(shape, mode):
    img = RNG.integers(0, 256, size=shape, dtype=np.uint8)
    data = png_encode(img, filter_mode=mode)
    assert is_png(data)
    out = png_decode(data)
    assert out.shape == img.shape and (out == img).all()
    w, h, ch = png_meta(data)
    assert (h, w) == img.shape[:2]
    assert ch == (1 if img.ndim == 2 else img.shape[2])


def test_gradient_images_compress():
    """Sanity that this is a REAL DEFLATE pipeline: a smooth gradient
    with cycle filters compresses far below raw size."""
    yy, xx = np.mgrid[0:64, 0:64]
    img = ((yy + xx) % 256).astype(np.uint8)
    data = png_encode(img, filter_mode="cycle")
    assert len(data) < 64 * 64 // 2
    assert (png_decode(data) == img).all()


def test_error_paths():
    img = RNG.integers(0, 256, size=(8, 8), dtype=np.uint8)
    good = bytearray(png_encode(img))
    with pytest.raises(ValueError, match="magic"):
        png_decode(b"notapng" + bytes(good))
    bad = good.copy()
    bad[45] ^= 0x01  # inside a chunk body
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        png_decode(bytes(good[:30]))
    # 16-bit depth rejected up front
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    d16 = MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="depth"):
        png_decode(d16)
    # Adam7 rejected
    ihdr7 = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    d7 = MAGIC + _chunk(b"IHDR", ihdr7) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="interlac"):
        png_decode(d7)
    # IDAT payload shorter than h*(stride+1)
    ihdr2 = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    short = MAGIC + _chunk(b"IHDR", ihdr2) + _chunk(b"IDAT", zlib.compress(b"\x00" * 7)) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="IDAT size"):
        png_decode(short)


def test_unknown_filter_type_rejected():
    img = np.zeros((2, 2), dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    raw = b"\x07\x00\x00" + b"\x00\x00\x00"  # filter byte 7 is invalid
    data = MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="filter type"):
        png_decode(data)
