"""Distributed cross-CRS raster warp over tile grids.

The reference's ``reproject`` virtual-product combinator warps natively
loaded pixels to a target grid per tile (reference
``datacube/virtual/impl.py:745-911``; kernel ``_warp.py:37-169``).  Spark
restatement:

1. **dst candidates** — (dst_tile, region) pairs by grid-range arithmetic
   on the region bbox *transformed into the dst CRS* (Web Mercator is
   axis-separable and monotone, so a lon/lat bbox maps to a merc bbox
   exactly — pure Catalyst, no geometry code).
2. **pairing** — each dst tile back-projects (monotone ⇒ corners suffice)
   to a lon/lat window; overlapping src tiles enumerate with the same
   ``sequence``/``explode`` pattern as the grid-range join, then inner-join
   the src raster tiles on (src_tile, region).  Src tiles the region never
   touched contribute nothing (their pixels are 0 by construction).
3. **warp kernel** — ``mapInPandas`` over the pairs: each row runs the
   pure-numpy ``geom.warp.reproject`` (nearest/bilinear/average) from the
   src tile's GeoBox to the dst tile's GeoBox; dst pixels whose
   back-projection falls outside *this* src tile get the partial-nodata
   sentinel.
4. **fuse** — per (dst_tile, region): element-wise ``greatest`` fold of
   the partials (src tiles partition the plane, so exactly one partial is
   valid per pixel), then missing → 0.  Pure Catalyst aggregation.

At 100 TB the plan is: broadcastable candidate tables, one shuffle to
group partials by dst tile, Arrow-batched kernels — the same shape as the
PIP join.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geom.affine import Affine
from ..geom.grid import GeoBox, GridSpec
from ..geom.mercator import merc_x_col, merc_y_col
from ..geom.warp import reproject

PARTIAL_NODATA = -1
# reserved nodata for the signed fuse path: outside any realistic int32
# payload; the kernel raises if the input actually contains it
SIGNED_NODATA = -(1 << 31)


def _axis_seq(lo, hi, origin: float, step: float):
    """sequence(floor((lo-o)/s), ceil((hi-o)/s)-1) — grid_range as columns."""
    a = F.floor((lo - F.lit(origin)) / F.lit(step)).cast("int")
    b = (F.ceil((hi - F.lit(origin)) / F.lit(step)) - 1).cast("int")
    return F.sequence(a, F.greatest(b, a))


def merc_region_tiles(regions_df: DataFrame, dst_grid: GridSpec) -> DataFrame:
    """(dst_tx, dst_ty, region_id, merc bbox) for every dst tile whose
    extent overlaps the region's merc bbox."""
    sy, sx = dst_grid.tile_size
    oy, ox = dst_grid.origin
    mxl, mxr = merc_x_col(F.col("left")), merc_x_col(F.col("right"))
    myb, myt = merc_y_col(F.col("bottom")), merc_y_col(F.col("top"))
    base = regions_df.select(
        "region_id", mxl.alias("mxl"), mxr.alias("mxr"), myb.alias("myb"), myt.alias("myt")
    )
    return (
        base.withColumn("dst_tx", F.explode(_axis_seq(F.col("mxl"), F.col("mxr"), ox, abs(sx))))
        .withColumn("dst_ty", F.explode(_axis_seq(F.col("myb"), F.col("myt"), oy, abs(sy))))
        .select("dst_tx", "dst_ty", "region_id")
    )


def warp_rasters_to_grid(
    rasters_df: DataFrame,
    src_grid: GridSpec,
    src_res: float,
    dst_grid: GridSpec,
    dst_res: float,
    dst_candidates: DataFrame,
    resampling: str = "nearest",
    fuse: str = "greatest",
) -> DataFrame:
    """Warp per-(src_tile, region) rasters onto dst_grid tiles.

    ``rasters_df``: (tile_x, tile_y, region_id, h, w, raster) on src_grid.
    ``dst_candidates``: (dst_tx, dst_ty, region_id).
    Returns (dst_tx, dst_ty, region_id, h, w, raster) on dst_grid with the
    no-coverage pixels resolved to 0.

    Two fuse modes:

    * ``fuse="greatest"`` (default, the hot path): in-band sentinel
      ``PARTIAL_NODATA = -1`` + ``greatest`` fold + clamp-to-0 — one
      comparison per pixel per partial, but only lossless for
      NON-NEGATIVE data (a legitimately negative pixel would lose the
      fold and be clamped).  The kernel VALIDATES that and raises on the
      first negative input pixel rather than silently corrupting output.
    * ``fuse="signed"``: sentinel ``SIGNED_NODATA = INT32_MIN`` (reserved
      — the kernel raises if the input actually contains it) with an
      explicit when-chain fold (max over VALID partials; uncovered → 0),
      correct for arbitrary signed payloads at ~2x fold cost.
    """
    s_sy, s_sx = src_grid.tile_size
    s_oy, s_ox = src_grid.origin
    d_sy, d_sx = dst_grid.tile_size
    d_oy, d_ox = dst_grid.origin
    dh = int(round(abs(d_sy) / dst_res))
    dw = int(round(abs(d_sx) / dst_res))
    sh = int(round(abs(s_sy) / src_res))
    sw = int(round(abs(s_sx) / src_res))
    src_crs, dst_crs = src_grid.crs, dst_grid.crs

    # dst tile bounds → covering lon/lat window → overlapping src tiles.
    # The per-CRS Catalyst inverse comes from the registry seam
    # (geom.mercator.catalyst_inverse); its contract guarantees lon/lat
    # extremes over an axis-aligned window sit on the corners or the y=0
    # midline, so sampling those 6 points yields an exact covering window
    # (for 3857 this degenerates to the old monotone-corner form: inv_lon
    # ignores y and inv_lat is monotone).  Candidate enumeration requires a
    # GEOGRAPHIC src grid; the warp kernel itself is generic over any
    # registered pair.
    from ..geom.mercator import EPSG_4326, _norm_crs, catalyst_inverse

    if _norm_crs(src_crs) != EPSG_4326:
        raise NotImplementedError(
            f"warp_rasters_to_grid enumerates src candidates in lon/lat; src grid "
            f"must be {EPSG_4326} (got {src_crs})"
        )
    inv_lon, inv_lat = catalyst_inverse(dst_crs)

    dxl = F.col("dst_tx").cast("double") * F.lit(abs(d_sx)) + F.lit(d_ox)
    dxr = dxl + F.lit(abs(d_sx))
    dyb = F.col("dst_ty").cast("double") * F.lit(abs(d_sy)) + F.lit(d_oy)
    dyt = dyb + F.lit(abs(d_sy))
    y0 = F.greatest(dyb, F.least(dyt, F.lit(0.0)))  # y=0 clamped into the window
    lon_pts = [inv_lon(x, y) for x in (dxl, dxr) for y in (dyb, dyt, y0)]
    lat_pts = [inv_lat(x, y) for x in (dxl, dxr) for y in (dyb, dyt)]
    # Clamp to world bounds: src is geographic, so no src tile exists
    # outside [-180, 180]x[-90, 90] and clipping never loses coverage.
    # This caps the candidate explode even where the inverse degenerates
    # (e.g. sinusoidal 1/cos(lat) near the poles would otherwise yield a
    # near-infinite lon window -> a runaway F.sequence); NaN/Inf corners
    # also resolve to the world edge instead of poisoning the sequence.
    lon_lo = F.greatest(F.least(*lon_pts), F.lit(-180.0))
    lon_hi = F.least(F.greatest(*lon_pts), F.lit(180.0))
    lat_lo = F.greatest(F.least(*lat_pts), F.lit(-90.0))
    lat_hi = F.least(F.greatest(*lat_pts), F.lit(90.0))

    paired = (
        dst_candidates.withColumn(
            "src_tx", F.explode(_axis_seq(lon_lo, lon_hi, s_ox, abs(s_sx)))
        )
        .withColumn("src_ty", F.explode(_axis_seq(lat_lo, lat_hi, s_oy, abs(s_sy))))
    )
    src = rasters_df.select(
        F.col("tile_x").alias("src_tx"),
        F.col("tile_y").alias("src_ty"),
        "region_id",
        "raster",
    )
    joined = paired.join(src, on=["src_tx", "src_ty", "region_id"], how="inner")

    from ..geom.mercator import get_transformer

    if fuse not in ("greatest", "signed"):
        raise ValueError(f"unknown fuse mode {fuse!r} (greatest|signed)")
    signed = fuse == "signed"
    sentinel = SIGNED_NODATA if signed else PARTIAL_NODATA

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # the back-projection of a dst tile's pixel-center grid into the
        # src CRS depends only on the dst tile — cache it across the many
        # (dst, src) pairs sharing a dst tile.  Arithmetic mirrors
        # geom.warp.reproject's back_pix exactly (same affine coefficient
        # derivation, same operation order), so the fast path is
        # bit-identical to the generic path.
        d2s = get_transformer(dst_crs, src_crs)
        grid_cache: dict = {}
        xx = np.arange(dw, dtype=np.float64) + 0.5
        yy = np.arange(dh, dtype=np.float64) + 0.5
        XX, YY = np.meshgrid(xx, yy)

        def dst_lonlat(dtx: int, dty: int):
            key = (dtx, dty)
            got = grid_cache.get(key)
            if got is None:
                d_left = dtx * abs(d_sx) + d_ox
                d_top = (dty + 1) * abs(d_sy) + d_oy
                da = Affine(dst_res, 0.0, d_left, 0.0, -dst_res, d_top)
                wx = da.a * XX + da.b * YY + da.c
                wy = da.d * XX + da.e * YY + da.f
                with np.errstate(invalid="ignore", over="ignore"):
                    got = d2s(wx, wy)
                grid_cache[key] = got
            return got

        nearest = resampling == "nearest"
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                s_left = r.src_tx * abs(s_sx) + s_ox
                s_top = (r.src_ty + 1) * abs(s_sy) + s_oy
                s_affine = Affine(src_res, 0.0, s_left, 0.0, -src_res, s_top)
                src_arr = np.asarray(r.raster, dtype=np.int32).reshape(sh, sw)
                lo = int(src_arr.min())
                if signed:
                    if lo == sentinel:
                        raise ValueError(
                            "warp_rasters_to_grid(fuse='signed') reserves INT32_MIN "
                            f"as nodata; src tile ({r.src_tx},{r.src_ty}) contains it"
                        )
                elif lo < 0:
                    raise ValueError(
                        "warp_rasters_to_grid requires non-negative src pixels "
                        f"(got {lo} in src tile ({r.src_tx},{r.src_ty})): "
                        "the -1 in-band fuse sentinel would corrupt signed data "
                        "(use fuse='signed')"
                    )
                if nearest:
                    sx_w, sy_w = dst_lonlat(int(r.dst_tx), int(r.dst_ty))
                    inv_s = ~s_affine
                    xs = inv_s.a * sx_w + inv_s.b * sy_w + inv_s.c
                    ys = inv_s.d * sx_w + inv_s.e * sy_w + inv_s.f
                    ix = np.floor(xs).astype(np.int64)
                    iy = np.floor(ys).astype(np.int64)
                    ok = (ix >= 0) & (ix < sw) & (iy >= 0) & (iy < sh)
                    ok &= np.isfinite(xs) & np.isfinite(ys)
                    dst_arr = np.where(
                        ok, src_arr[iy.clip(0, sh - 1), ix.clip(0, sw - 1)], sentinel
                    ).astype(np.int32)
                else:
                    d_left = r.dst_tx * abs(d_sx) + d_ox
                    d_top = (r.dst_ty + 1) * abs(d_sy) + d_oy
                    s_gbox = GeoBox(sw, sh, s_affine, src_crs)
                    d_gbox = GeoBox(dw, dh, Affine(dst_res, 0.0, d_left, 0.0, -dst_res, d_top), dst_crs)
                    dst_arr = np.full((dh, dw), sentinel, dtype=np.int32)
                    reproject(src_arr, dst_arr, s_gbox, d_gbox, resampling, dst_nodata=sentinel)
                out.append(
                    (int(r.dst_tx), int(r.dst_ty), int(r.region_id), dst_arr.ravel().tolist())
                )
            if out:
                yield pd.DataFrame(out, columns=["dst_tx", "dst_ty", "region_id", "partial"])

    partials = joined.mapInPandas(
        kernel, schema="dst_tx INT, dst_ty INT, region_id INT, partial ARRAY<INT>"
    )

    # element-wise fold over partials; uncovered pixels -> 0
    empty = F.array_repeat(F.lit(sentinel), dh * dw)
    if signed:
        # max over VALID partials (explicit when-chain; sentinel never
        # participates in the comparison, so negative values are safe)
        def pick(a, b):
            return (
                F.when(b == F.lit(sentinel), a)
                .when(a == F.lit(sentinel), b)
                .otherwise(F.greatest(a, b))
            )
    else:
        def pick(a, b):
            return F.greatest(a, b)
    fused = partials.groupBy("dst_tx", "dst_ty", "region_id").agg(
        F.aggregate(
            F.collect_list("partial"), empty,
            lambda acc, x: F.zip_with(acc, x, pick),
        ).alias("raster0")
    )
    if signed:
        covered = F.transform(
            F.col("raster0"), lambda x: F.when(x == F.lit(sentinel), F.lit(0)).otherwise(x)
        )
    else:
        covered = F.transform(F.col("raster0"), lambda x: F.greatest(x, F.lit(0)))
    # dst candidate tiles with no src raster at all are all-zero
    out = dst_candidates.join(fused, on=["dst_tx", "dst_ty", "region_id"], how="left")
    zeros = F.array_repeat(F.lit(0), dh * dw)
    raster = F.when(F.col("raster0").isNull(), zeros).otherwise(covered)
    return out.select(
        "dst_tx", "dst_ty", "region_id",
        F.lit(dh).alias("h"), F.lit(dw).alias("w"), raster.alias("raster"),
    )


def sample_merc_rasters(
    points_df: DataFrame,
    rasters_df: DataFrame,
    dst_grid: GridSpec,
    dst_res: float,
    lon: str = "lon",
    lat: str = "lat",
    value_col: str = "value",
    broadcast_rasters: bool = True,
) -> DataFrame:
    """Sample points (lon/lat) against merc-grid rasters: transform to
    merc (pure Catalyst), inverse-affine pixel lookup.

    ``broadcast_rasters=True`` (default) broadcasts the raster table —
    right when rasters are a bounded mosaic (|tiles| × tile bytes fits the
    broadcast limit).  ``False`` switches to a shuffle equi-join on the
    tile id — the path for planet-scale raster tables where the POINT side
    may be the smaller one; AQE picks the build side at runtime."""
    sy, sx = dst_grid.tile_size
    oy, ox = dst_grid.origin
    h = int(round(abs(sy) / dst_res))
    w = int(round(abs(sx) / dst_res))

    mx, my = merc_x_col(F.col(lon)), merc_y_col(F.col(lat))
    pts = points_df.withColumn("mx", mx).withColumn("my", my)
    pts = pts.withColumn("dst_tx", F.floor((F.col("mx") - F.lit(ox)) / F.lit(abs(sx))).cast("int"))
    pts = pts.withColumn("dst_ty", F.floor((F.col("my") - F.lit(oy)) / F.lit(abs(sy))).cast("int"))

    tile_left = F.col("dst_tx").cast("double") * F.lit(abs(sx)) + F.lit(ox)
    tile_top = (F.col("dst_ty").cast("double") + 1) * F.lit(abs(sy)) + F.lit(oy)
    col_i = F.floor((F.col("mx") - tile_left) / F.lit(dst_res)).cast("int")
    row_i = F.floor((tile_top - F.col("my")) / F.lit(dst_res)).cast("int")
    col_c = F.least(F.greatest(col_i, F.lit(0)), F.lit(w - 1))
    row_c = F.least(F.greatest(row_i, F.lit(0)), F.lit(h - 1))
    idx = row_c * F.lit(w) + col_c + F.lit(1)

    right = F.broadcast(rasters_df) if broadcast_rasters else rasters_df
    joined = pts.join(right, on=["dst_tx", "dst_ty"], how="inner")
    return joined.withColumn(value_col, F.element_at(F.col("raster"), idx)).drop("raster", "h", "w", "mx", "my")


def sql_reproject_sample(
    pages_cte: str,
    regions_cte: str,
    src_grid: GridSpec,
    src_res: float,
    dst_grid: GridSpec,
    dst_res: float,
) -> str:
    """DuckDB twin of the full rasterize→warp(nearest)→sample pipeline.

    Nearest-warp semantics reduce to arithmetic the oracle can reproduce:
    the sampled value is the strict-PIP of the SRC pixel center containing
    the back-projection of the page's DST pixel center.  Every formula
    (merc forward/inverse, tile/pixel floors, pixel centers) mirrors the
    engine's operation order exactly.
    """
    from ..geom.mercator import sql_inv_merc_lat, sql_inv_merc_lon, sql_merc_x, sql_merc_y

    s_sy, s_sx = abs(src_grid.tile_size[0]), abs(src_grid.tile_size[1])
    s_oy, s_ox = src_grid.origin
    d_sy, d_sx = abs(dst_grid.tile_size[0]), abs(dst_grid.tile_size[1])
    d_oy, d_ox = dst_grid.origin
    dh = int(round(d_sy / dst_res))
    dw = int(round(d_sx / dst_res))

    def rng(lo, hi, origin, step):
        a = f"CAST(FLOOR(({lo} - ({origin!r})) / {step!r}) AS INT)"
        b = f"CAST(CEIL(({hi} - ({origin!r})) / {step!r}) AS INT) - 1"
        return f"generate_series({a}, GREATEST({b}, {a}))"

    return f"""{pages_cte}, {regions_cte},
mr AS (
  SELECT region_id, "left" AS rl, "bottom" AS rb, "right" AS rr, "top" AS rt,
         {sql_merc_x('"left"')} AS mxl, {sql_merc_x('"right"')} AS mxr,
         {sql_merc_y('"bottom"')} AS myb, {sql_merc_y('"top"')} AS myt
  FROM regions
),
cand AS (
  SELECT mr.region_id, mr.rl, mr.rb, mr.rr, mr.rt, tx.dst_tx, ty.dst_ty
  FROM mr,
       UNNEST({rng('mxl', 'mxr', d_ox, d_sx)}) AS tx(dst_tx),
       UNNEST({rng('myb', 'myt', d_oy, d_sy)}) AS ty(dst_ty)
),
pt AS (
  SELECT doc_id, {sql_merc_x('lon')} AS mx, {sql_merc_y('lat')} AS my
  FROM pages WHERE lat > -85.0 AND lat < 85.0
),
pp AS (
  SELECT doc_id, mx, my,
         CAST(FLOOR((mx - ({d_ox!r})) / {d_sx!r}) AS INT) AS dst_tx,
         CAST(FLOOR((my - ({d_oy!r})) / {d_sy!r}) AS INT) AS dst_ty
  FROM pt
),
px AS (
  SELECT p.doc_id, c.region_id, c.rl, c.rb, c.rr, c.rt, p.mx, p.my,
         p.dst_tx * {d_sx!r} + ({d_ox!r}) AS tl,
         (p.dst_ty + 1) * {d_sy!r} + ({d_oy!r}) AS tt
  FROM pp p JOIN cand c ON p.dst_tx = c.dst_tx AND p.dst_ty = c.dst_ty
),
pc AS (
  SELECT doc_id, region_id, rl, rb, rr, rt,
         tl + (LEAST(GREATEST(CAST(FLOOR((mx - tl) / {dst_res!r}) AS INT), 0), {dw - 1}) + 0.5) * {dst_res!r} AS cx,
         tt - (LEAST(GREATEST(CAST(FLOOR((tt - my) / {dst_res!r}) AS INT), 0), {dh - 1}) + 0.5) * {dst_res!r} AS cy
  FROM px
),
bp AS (
  SELECT doc_id, region_id, rl, rb, rr, rt,
         {sql_inv_merc_lon('cx')} AS lon_c, {sql_inv_merc_lat('cy')} AS lat_c
  FROM pc
),
sp AS (
  SELECT doc_id, region_id, rl, rb, rr, rt, lon_c, lat_c,
         CAST(FLOOR((lon_c - ({s_ox!r})) / {s_sx!r}) AS INT) AS stx,
         CAST(FLOOR((lat_c - ({s_oy!r})) / {s_sy!r}) AS INT) AS sty
  FROM bp
),
sc AS (
  SELECT doc_id, region_id, rl, rb, rr, rt,
         (stx * {s_sx!r} + ({s_ox!r})) + (FLOOR((lon_c - (stx * {s_sx!r} + ({s_ox!r}))) / {src_res!r}) + 0.5) * {src_res!r} AS scx,
         ((sty + 1) * {s_sy!r} + ({s_oy!r})) - (FLOOR((((sty + 1) * {s_sy!r} + ({s_oy!r})) - lat_c) / {src_res!r}) + 0.5) * {src_res!r} AS scy
  FROM sp
)
SELECT doc_id, region_id,
       CASE WHEN scx > rl AND scx < rr AND scy > rb AND scy < rt THEN 1 ELSE 0 END AS value
FROM sc
"""
