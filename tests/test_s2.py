"""S2 cell ids (geom/s2.py) — validated by independent structure (no s2
library in the sandbox): a table-free 2-bit Hilbert walk vs the 4-bit
lookup fast path, the defining Hilbert adjacency property, encode/decode
round-trips, level algebra, and hand-derivable face/uv anchors."""

import numpy as np
import pytest

from datacube_core_spark.geom.s2 import (
    MAX_LEVEL,
    cell_level,
    fij_to_id,
    fij_to_id_slow,
    id_to_fij,
    lonlat_to_xyz,
    parent_id,
    range_max,
    range_min,
    s2_cell_center,
    s2_cell_id,
    s2_token,
    st_to_uv,
    uv_to_st,
    with_s2_cell,
    xyz_to_face_uv,
)

RNG = np.random.RandomState(42)


def test_lookup_path_matches_independent_bitwalk():
    """The vectorized 4-bit lookup-table Hilbert traversal must agree
    with a scalar 2-bit orientation walk that shares no code with it —
    across all faces and random (i, j)."""
    faces = RNG.randint(0, 6, 500)
    i = RNG.randint(0, 1 << MAX_LEVEL, 500)
    j = RNG.randint(0, 1 << MAX_LEVEL, 500)
    fast = fij_to_id(faces, i, j)
    for idx in range(500):
        assert fast[idx] == fij_to_id_slow(int(faces[idx]), int(i[idx]), int(j[idx]))


def test_decode_inverts_encode():
    faces = RNG.randint(0, 6, 2000)
    i = RNG.randint(0, 1 << MAX_LEVEL, 2000)
    j = RNG.randint(0, 1 << MAX_LEVEL, 2000)
    f2, i2, j2 = id_to_fij(fij_to_id(faces, i, j))
    assert (f2 == faces).all() and (i2 == i).all() and (j2 == j).all()


def test_hilbert_adjacency_property():
    """THE defining property: consecutive curve positions on one face are
    exactly one (i, j) step apart.  A wrong lookup table cannot pass
    this for random positions."""
    # random leaf ids on face 2, then +2 (next leaf) — stay within face
    pos = RNG.randint(0, (1 << 60) - 2, 1000, dtype=np.int64)
    ids = ((np.int64(2) << 60) | pos) * 2 + 1
    f1, i1, j1 = id_to_fij(ids)
    f2, i2, j2 = id_to_fij(ids + 2)
    assert (f1 == 2).all() and (f2 == 2).all()
    manhattan = np.abs(i2 - i1) + np.abs(j2 - j1)
    assert (manhattan == 1).all()


def test_face_assignment_anchors():
    """Cube face centers land on their face with (u, v) = (0, 0)."""
    anchors = [
        ((0.0, 0.0), 0),     # +x
        ((90.0, 0.0), 1),    # +y
        ((0.0, 90.0), 2),    # +z
        ((180.0, 0.0), 3),   # -x
        ((-90.0, 0.0), 4),   # -y
        ((0.0, -90.0), 5),   # -z
    ]
    for (lon, lat), want in anchors:
        x, y, z = lonlat_to_xyz(np.array([lon]), np.array([lat]))
        face, u, v = xyz_to_face_uv(x, y, z)
        assert face[0] == want, (lon, lat)
        assert abs(u[0]) < 1e-12 and abs(v[0]) < 1e-12


def test_st_uv_quadratic_round_trip():
    s = RNG.uniform(0, 1, 1000)
    assert np.max(np.abs(uv_to_st(st_to_uv(s)) - s)) < 1e-12
    # anchors of the published quadratic: u=±1 ↔ s∈{0,1}, u=0 ↔ s=0.5
    assert uv_to_st(np.array([-1.0, 0.0, 1.0])).tolist() == [0.0, 0.5, 1.0]


def test_center_round_trip_all_levels():
    """encode(center(cell)) == cell at every level — exercises decode,
    st↔uv inversion and the face→xyz tables together."""
    lon = RNG.uniform(-180, 180, 300)
    lat = RNG.uniform(-89, 89, 300)
    for level in (30, 20, 12, 5, 0):
        cells = s2_cell_id(lon, lat, level)
        clon, clat = s2_cell_center(cells)
        again = s2_cell_id(clon, clat, level)
        assert (again == cells).all(), f"level {level}"


def test_level_algebra():
    lon = RNG.uniform(-180, 180, 500)
    lat = RNG.uniform(-89, 89, 500)
    leaf = s2_cell_id(lon, lat)
    assert (cell_level(leaf) == 30).all()
    for level in (25, 16, 8, 1):
        par = parent_id(leaf, level)
        assert (cell_level(par) == level).all()
        # containment: every leaf lies in its ancestor's leaf range
        assert (range_min(par) <= leaf).all() and (leaf <= range_max(par)).all()
        # and the parent is what direct encoding at that level gives
        assert (par == s2_cell_id(lon, lat, level)).all()
    # sibling ranges partition the parent's range
    p16 = parent_id(leaf, 16)
    p15 = parent_id(leaf, 15)
    assert (range_min(p15) <= range_min(p16)).all()
    assert (range_max(p16) <= range_max(p15)).all()


def test_faces_4_5_signed_representation():
    """Faces 4-5 overflow into the int64 sign bit — negative ids are the
    documented signed interop form; all algebra must stay sign-safe."""
    lon = np.array([-90.0, 0.0])
    lat = np.array([0.0, -90.0])
    ids = s2_cell_id(lon, lat)
    assert (ids < 0).all()
    f, _, _ = id_to_fij(ids)
    assert f.tolist() == [4, 5]
    assert (cell_level(ids) == 30).all()
    par = parent_id(ids, 10)
    assert (cell_level(par) == 10).all()
    assert (range_min(par) <= ids).all() and (ids <= range_max(par)).all()


def test_tokens():
    toks = s2_token(s2_cell_id(np.array([0.0]), np.array([0.0]), 30))
    t = toks[0]
    assert 1 <= len(t) <= 16 and t == t.rstrip("0")
    # token of a level-0 face cell: face bits + lsb only
    face_cell = s2_cell_id(np.array([0.0]), np.array([0.0]), 0)
    assert s2_token(face_cell)[0] == "1"  # face 0 level 0 = 0x1000...0


def test_spark_column_and_external_join(spark):
    """with_s2_cell is the interop key: a synthetic 'external S2-keyed
    table' (built independently via the SLOW bit-walk path) equi-joins
    against our column at level 12."""
    import pandas as pd
    from pyspark.sql import functions as F

    lon = RNG.uniform(-180, 180, 200)
    lat = RNG.uniform(-85, 85, 200)
    df = spark.createDataFrame(
        pd.DataFrame({"pid": np.arange(200), "lon": lon, "lat": lat})
    )
    with_cells = with_s2_cell(df, level=12)
    # external side: slow path + independent parent arithmetic
    ext_rows = []
    x, y, z = lonlat_to_xyz(lon, lat)
    face, u, v = xyz_to_face_uv(x, y, z)
    from datacube_core_spark.geom.s2 import st_to_ij

    i = st_to_ij(uv_to_st(u))
    j = st_to_ij(uv_to_st(v))
    for k in range(200):
        leaf = fij_to_id_slow(int(face[k]), int(i[k]), int(j[k]))
        lsb = 1 << (2 * (30 - 12))
        par = (leaf & -lsb) | lsb
        par = par - (1 << 64) if par >= (1 << 63) else par
        ext_rows.append((int(k), par))
    ext = spark.createDataFrame(ext_rows, "pid LONG, s2_cell LONG")
    joined = with_cells.join(ext, on=["pid", "s2_cell"], how="inner")
    assert joined.count() == 200
