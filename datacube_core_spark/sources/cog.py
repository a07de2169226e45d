"""Cloud-Optimized GeoTIFF sink (pure python — no GDAL/rasterio).

Reference surface: ``write_cog`` / ``to_cog``
(``datacube/utils/cog.py:214-366``) — there a rasterio delegation; here a
minimal original writer producing spec-valid COGs:

* classic little-endian TIFF, one band, uncompressed tiles
* IFDs (full resolution + reduced-resolution overviews) at the FRONT of
  the file, tile data after — the "cloud-optimized" layout rule, so a
  range-read of the head yields all metadata
* overviews built by factor-2 ``average`` (or ``nearest``/``mode``-free)
  resampling down to ≤ tile size, marked NewSubfileType=1
* GeoTIFF georeferencing: ModelPixelScale (33550), ModelTiepoint (33922),
  GeoKeyDirectory (34735) carrying the EPSG code

The writer is driver-side (export path, after per-tile compute), matching
the reference's use.  ``read_cog`` is a structural reader used by tests
and by the ingest round-trip — enough TIFF to reread what we write.
"""

from __future__ import annotations

import math
import struct
from typing import List, Optional, Tuple

import numpy as np

from ..geom.grid import GeoBox

_SAMPLE_FORMAT = {"u": 1, "i": 2, "f": 3}

# TIFF tag ids
T_NEWSUBFILETYPE = 254
T_WIDTH, T_HEIGHT = 256, 257
T_BITS, T_COMPRESSION, T_PHOTometric = 258, 259, 262
T_SAMPLESPERPIXEL, T_PLANARCONFIG = 277, 284
T_TILEWIDTH, T_TILELENGTH, T_TILEOFFSETS, T_TILEBYTECOUNTS = 322, 323, 324, 325
T_SAMPLEFORMAT = 339
T_MODELPIXELSCALE, T_MODELTIEPOINT, T_GEOKEYS = 33550, 33922, 34735
T_GDAL_NODATA = 42113

_TYPE_SHORT, _TYPE_LONG, _TYPE_DOUBLE, _TYPE_ASCII = 3, 4, 12, 2
_TYPE_SIZE = {_TYPE_SHORT: 2, _TYPE_LONG: 4, _TYPE_DOUBLE: 8, _TYPE_ASCII: 1}


def _epsg_code(crs: str) -> int:
    crs = crs.strip().upper()
    if crs.startswith("EPSG:"):
        return int(crs.split(":")[1])
    raise ValueError(f"COG writer needs an EPSG CRS, got {crs!r}")


def _overview_shapes(h: int, w: int, tile: int) -> List[Tuple[int, int]]:
    """Factor-2 pyramid until the level fits in one tile."""
    out = []
    while h > tile or w > tile:
        h, w = max(1, h // 2), max(1, w // 2)
        out.append((h, w))
        if h <= tile and w <= tile:
            break
    return out


def _decimate_avg(a: np.ndarray) -> np.ndarray:
    """Factor-2 box average (trims odd edges) — the overview resampler."""
    h, w = a.shape
    h2, w2 = h // 2 * 2, w // 2 * 2
    core = a[:h2, :w2].astype(np.float64)
    out = core.reshape(h2 // 2, 2, w2 // 2, 2).mean(axis=(1, 3))
    if np.issubdtype(a.dtype, np.integer):
        out = np.rint(out)
    return out.astype(a.dtype)


def _tiles_of(a: np.ndarray, tile: int) -> List[bytes]:
    h, w = a.shape
    ty, tx = math.ceil(h / tile), math.ceil(w / tile)
    blobs = []
    for j in range(ty):
        for i in range(tx):
            block = np.zeros((tile, tile), dtype=a.dtype)
            sub = a[j * tile : (j + 1) * tile, i * tile : (i + 1) * tile]
            block[: sub.shape[0], : sub.shape[1]] = sub
            blobs.append(block.tobytes())
    return blobs


class _IFD:
    def __init__(self):
        self.entries: List[Tuple[int, int, int, bytes]] = []  # (tag, type, count, payload)

    def add(self, tag: int, typ: int, values) -> None:
        if isinstance(values, (int, float)):
            values = [values]
        count = len(values)
        if typ == _TYPE_SHORT:
            payload = struct.pack(f"<{count}H", *values)
        elif typ == _TYPE_LONG:
            payload = struct.pack(f"<{count}I", *values)
        elif typ == _TYPE_DOUBLE:
            payload = struct.pack(f"<{count}d", *values)
        elif typ == _TYPE_ASCII:
            payload = values[0].encode() + b"\x00"
            count = len(payload)
        else:
            raise ValueError(typ)
        self.entries.append((tag, typ, count, payload))

    def size(self) -> int:
        return 2 + 12 * len(self.entries) + 4

    def overflow(self) -> int:
        return sum(len(p) for (_, _, _, p) in self.entries if len(p) > 4)

    def render(self, at: int, next_ifd: int, data_cursor: int) -> Tuple[bytes, bytes, int]:
        self.entries.sort(key=lambda e: e[0])
        body = struct.pack("<H", len(self.entries))
        overflow = b""
        for tag, typ, count, payload in self.entries:
            if len(payload) <= 4:
                body += struct.pack("<HHI", tag, typ, count) + payload.ljust(4, b"\x00")
            else:
                body += struct.pack("<HHII", tag, typ, count, data_cursor + len(overflow))
                overflow += payload
        body += struct.pack("<I", next_ifd)
        return body, overflow, data_cursor + len(overflow)


def to_cog(
    array: np.ndarray,
    gbox: GeoBox,
    tile: int = 256,
    nodata: Optional[float] = None,
    overview_levels: Optional[int] = None,
) -> bytes:
    """Serialize one band + overview pyramid as COG bytes (reference
    ``to_cog``, ``cog.py:311-366``)."""
    a = np.asarray(array)
    if a.ndim != 2:
        raise ValueError("to_cog expects a single 2-d band")
    if a.shape != (gbox.height, gbox.width):
        raise ValueError(f"array shape {a.shape} != geobox {(gbox.height, gbox.width)}")
    kind = a.dtype.kind
    if kind not in _SAMPLE_FORMAT:
        raise ValueError(f"unsupported dtype {a.dtype}")
    epsg = _epsg_code(gbox.crs or "EPSG:4326")

    levels = [a]
    shapes = _overview_shapes(a.shape[0], a.shape[1], tile)
    if overview_levels is not None:
        shapes = shapes[:overview_levels]
    cur = a
    for _h, _w in shapes:
        cur = _decimate_avg(cur)
        levels.append(cur)

    af = gbox.affine
    ifds: List[_IFD] = []
    tile_blobs: List[List[bytes]] = []
    for lvl, img in enumerate(levels):
        ifd = _IFD()
        h, w = img.shape
        if lvl > 0:
            ifd.add(T_NEWSUBFILETYPE, _TYPE_LONG, 1)
        ifd.add(T_WIDTH, _TYPE_LONG, w)
        ifd.add(T_HEIGHT, _TYPE_LONG, h)
        ifd.add(T_BITS, _TYPE_SHORT, a.dtype.itemsize * 8)
        ifd.add(T_COMPRESSION, _TYPE_SHORT, 1)
        ifd.add(T_PHOTometric, _TYPE_SHORT, 1)
        ifd.add(T_SAMPLESPERPIXEL, _TYPE_SHORT, 1)
        ifd.add(T_PLANARCONFIG, _TYPE_SHORT, 1)
        ifd.add(T_TILEWIDTH, _TYPE_SHORT, tile)
        ifd.add(T_TILELENGTH, _TYPE_SHORT, tile)
        ifd.add(T_SAMPLEFORMAT, _TYPE_SHORT, _SAMPLE_FORMAT[kind])
        if lvl == 0:
            ifd.add(T_MODELPIXELSCALE, _TYPE_DOUBLE, [abs(af.a), abs(af.e), 0.0])
            ifd.add(T_MODELTIEPOINT, _TYPE_DOUBLE, [0.0, 0.0, 0.0, af.c, af.f, 0.0])
            # GeoKeyDirectory: version 1.1.0, 3 keys:
            # GTModelType=2(geographic)/1(projected), GTRasterType=1(PixelIsArea),
            # Geographic/ProjectedCSType = EPSG
            model = 2 if epsg == 4326 else 1
            cs_key = 2048 if model == 2 else 3072
            ifd.add(
                T_GEOKEYS, _TYPE_SHORT,
                [1, 1, 0, 3, 1024, 0, 1, model, 1025, 0, 1, 1, cs_key, 0, 1, epsg],
            )
            if nodata is not None:
                ifd.add(T_GDAL_NODATA, _TYPE_ASCII, [repr(nodata)])
        blobs = _tiles_of(img, tile)
        ifd.add(T_TILEOFFSETS, _TYPE_LONG, [0] * len(blobs))  # patched below
        ifd.add(T_TILEBYTECOUNTS, _TYPE_LONG, [len(b) for b in blobs])
        ifds.append(ifd)
        tile_blobs.append(blobs)

    # layout: header | IFD0..IFDn | overflow data | tile data  (IFDs first = COG)
    header = struct.pack("<2sHI", b"II", 42, 8)
    ifd_offsets = []
    cursor = 8
    for ifd in ifds:
        ifd_offsets.append(cursor)
        cursor += ifd.size()
    overflow_start = cursor
    total_overflow = sum(ifd.overflow() for ifd in ifds)
    tile_cursor = overflow_start + total_overflow

    # patch tile offsets now that the data start is known
    for ifd, blobs in zip(ifds, tile_blobs):
        offsets = []
        for b in blobs:
            offsets.append(tile_cursor)
            tile_cursor += len(b)
        for i, e in enumerate(ifd.entries):
            if e[0] == T_TILEOFFSETS:
                ifd.entries[i] = (e[0], e[1], e[2], struct.pack(f"<{len(offsets)}I", *offsets))

    out = bytearray(header)
    data_cursor = overflow_start
    overflow_all = b""
    for i, ifd in enumerate(ifds):
        nxt = ifd_offsets[i + 1] if i + 1 < len(ifds) else 0
        body, overflow, data_cursor = ifd.render(ifd_offsets[i], nxt, data_cursor)
        out += body
        overflow_all += overflow
    out += overflow_all
    for blobs in tile_blobs:
        for b in blobs:
            out += b
    return bytes(out)


def write_cog(array: np.ndarray, gbox: GeoBox, fname: str, **kw) -> str:
    """Write to a file (reference ``write_cog``, ``cog.py:214-309``);
    ``fname=":mem:"`` returns the bytes like the reference does."""
    blob = to_cog(array, gbox, **kw)
    if fname == ":mem:":
        return blob  # type: ignore[return-value]
    with open(fname, "wb") as f:
        f.write(blob)
    return fname


# ---------------------------------------------------------------------------
# structural reader (tests / round-trip)
# ---------------------------------------------------------------------------

def read_cog(blob: bytes):
    """Parse IFDs; returns list of dicts with shape, tags, and the decoded
    full image per level."""
    if blob[:4] != b"II\x2a\x00":
        raise ValueError("not a little-endian classic TIFF")
    (first_ifd,) = struct.unpack_from("<I", blob, 4)
    levels = []
    off = first_ifd
    while off:
        (n,) = struct.unpack_from("<H", blob, off)
        tags = {}
        for k in range(n):
            tag, typ, count = struct.unpack_from("<HHI", blob, off + 2 + 12 * k)
            size = _TYPE_SIZE[typ] * count
            if size <= 4:
                payload = blob[off + 2 + 12 * k + 8 : off + 2 + 12 * k + 8 + size]
            else:
                (ptr,) = struct.unpack_from("<I", blob, off + 2 + 12 * k + 8)
                payload = blob[ptr : ptr + size]
            if typ == _TYPE_SHORT:
                vals = list(struct.unpack(f"<{count}H", payload))
            elif typ == _TYPE_LONG:
                vals = list(struct.unpack(f"<{count}I", payload))
            elif typ == _TYPE_DOUBLE:
                vals = list(struct.unpack(f"<{count}d", payload))
            else:
                vals = [payload.rstrip(b"\x00").decode()]
            tags[tag] = vals
        (nxt,) = struct.unpack_from("<I", blob, off + 2 + 12 * n)
        h, w = tags[T_HEIGHT][0], tags[T_WIDTH][0]
        tile = tags[T_TILEWIDTH][0]
        bits = tags[T_BITS][0]
        fmt = tags[T_SAMPLEFORMAT][0]
        dtype = {1: "u", 2: "i", 3: "f"}[fmt] + str(bits // 8)
        tx = math.ceil(w / tile)
        img = np.zeros((math.ceil(h / tile) * tile, tx * tile), dtype=np.dtype(dtype))
        for idx, (o, c) in enumerate(zip(tags[T_TILEOFFSETS], tags[T_TILEBYTECOUNTS])):
            block = np.frombuffer(blob[o : o + c], dtype=np.dtype(dtype)).reshape(tile, tile)
            j, i = divmod(idx, tx)
            img[j * tile : (j + 1) * tile, i * tile : (i + 1) * tile] = block
        levels.append({"tags": tags, "image": img[:h, :w], "ifd_offset": off})
        off = nxt
    return levels
