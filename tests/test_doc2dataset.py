"""Doc2Dataset analog: eo3 spatial normalization, product matching,
single-doc parity API, distributed batch resolve, store round-trip, and
ingest→lineage_closure consistency (reference ``datacube/index/hl.py:246-331``,
``datacube/index/eo3.py:28-170``)."""

import json

import pytest
from pyspark.sql import functions as F

from datacube_core_spark.operators.doc2dataset import (
    BadMatch,
    Doc2Dataset,
    ProductRule,
    contains,
    eo3_grid_spatial,
    match_product,
    prep_eo3,
    resolve_doc,
    resolve_docs_df,
)
from datacube_core_spark.operators.lineage import lineage_closure
from datacube_core_spark.operators.store import DatasetStore

EO3 = "https://schemas.opendatacube.org/dataset"

RULES = [
    ProductRule("pages_eo3", {"product": {"name": "pages_eo3"}}, measurements=["red", "nir"]),
    ProductRule("other", {"product": {"name": "other"}}),
]


def _doc(ds_id, sources=(), product="pages_eo3", lon0=10.0, lat0=20.0):
    return {
        "$schema": EO3,
        "id": ds_id,
        "product": {"name": product},
        "crs": "EPSG:4326",
        "grids": {
            "default": {"shape": [100, 200], "transform": [0.01, 0, lon0, 0, -0.01, lat0, 0, 0, 1]},
        },
        "measurements": {"red": {"path": "red.tif"}, "nir": {"path": "nir.tif"}},
        "properties": {"datetime": "2024-03-01T12:00:00"},
        "lineage": {"src": list(sources)} if sources else {},
    }


def test_contains_signature_semantics():
    assert contains({"product": {"name": "A", "x": 1}}, {"product": {"name": "a"}})
    assert not contains({"product": {"name": "A"}}, {"product": {"name": "b"}})
    assert contains({"k": 1}, None)
    assert not contains({}, {"k": 1})


def test_eo3_grid_spatial_and_prep():
    doc = _doc("d1")
    oo = eo3_grid_spatial(doc)
    # grid corners: x in [10, 10+200*0.01]=[10,12]; y in [20-100*0.01, 20]=[19,20]
    assert oo["extent"]["lon"] == {"begin": 10.0, "end": 12.0}
    assert oo["extent"]["lat"] == {"begin": 19.0, "end": 20.0}
    rp = oo["grid_spatial"]["projection"]["geo_ref_points"]
    assert rp["ul"] == {"x": 10.0, "y": 20.0}
    assert rp["lr"] == {"x": 12.0, "y": 19.0}
    prepped = prep_eo3(doc)
    assert "extent" in prepped and "grid_spatial" in prepped
    # non-eo3 passes through on auto
    assert prep_eo3({"id": "x"}) == {"id": "x"}


def test_eo3_geometry_tightens_extent_and_valid_data():
    """Optional `geometry` key (reference index/eo3.py:126-141): the
    polygon lands verbatim in projection.valid_data and DRIVES the lon/lat
    extent instead of the grid bbox; without it valid_data is the default
    grid's corner polygon."""
    doc = _doc("g1")
    ring = [[10.5, 19.25], [11.5, 19.25], [11.5, 19.75], [10.5, 19.75], [10.5, 19.25]]
    doc["geometry"] = {"type": "Polygon", "coordinates": [ring]}
    oo = eo3_grid_spatial(doc)
    assert oo["extent"]["lon"] == {"begin": 10.5, "end": 11.5}
    assert oo["extent"]["lat"] == {"begin": 19.25, "end": 19.75}
    assert oo["grid_spatial"]["projection"]["valid_data"] == doc["geometry"]
    # geo_ref_points still come from the GRID corners, not the geometry
    assert oo["grid_spatial"]["projection"]["geo_ref_points"]["ul"] == {"x": 10.0, "y": 20.0}

    # no geometry → valid_data is the default grid polygon, extent = grid bbox
    plain = eo3_grid_spatial(_doc("g2"))
    vd = plain["grid_spatial"]["projection"]["valid_data"]
    assert vd["type"] == "Polygon"
    assert vd["coordinates"][0][0] == [10.0, 20.0] and len(vd["coordinates"][0]) == 5
    assert plain["extent"]["lon"] == {"begin": 10.0, "end": 12.0}

    # non-polygon geometry: raise (parity over silent widening)
    bad = _doc("g3")
    bad["geometry"] = {"type": "MultiPolygon", "coordinates": []}
    with pytest.raises(ValueError, match="GeoJSON Polygon"):
        eo3_grid_spatial(bad)


def test_eo3_resolution_segmentizes_projected_bounds():
    """The `resolution` parameter (reference eo3.py:78 + lonlat_bounds
    segmentation): on a curved projection the true lon/lat extremum sits
    mid-edge; segmentized bounds must be at least as wide and strictly
    wider on a spherical-sinusoidal grid whose top edge bulges."""
    from datacube_core_spark.geom.mercator import get_transformer

    # spherical sinusoidal (ESRI:54008, registered by the CRS seam):
    # lon = x/(R·cos(lat)), so a constant-x edge CROSSING THE EQUATOR has
    # its lon extremum mid-edge (at lat=0, where cos is largest) — corner
    # sampling alone misses it; segmentation must recover it
    fwd = get_transformer("EPSG:4326", "ESRI:54008")
    import numpy as np

    lon = np.array([10.0, 12.0, 12.0, 10.0])
    lat = np.array([30.0, 30.0, -30.0, -30.0])
    xs, ys = fwd(lon, lat)
    # affine grid spanning those projected corners
    x0, y0 = float(xs[0]), float(ys[0])
    doc = {
        "$schema": EO3, "id": "s1", "crs": "ESRI:54008",
        "grids": {"default": {"shape": [100, 200],
                              "transform": [(float(xs[1]) - x0) / 200, 0, x0,
                                            0, (float(ys[2]) - y0) / 100, y0]}},
    }
    coarse = eo3_grid_spatial(doc)
    fine = eo3_grid_spatial(doc, resolution=10_000.0)  # ~10 km segments
    c_lon = coarse["extent"]["lon"]
    f_lon = fine["extent"]["lon"]
    assert f_lon["begin"] <= c_lon["begin"] and f_lon["end"] >= c_lon["end"]
    assert (f_lon["end"] - f_lon["begin"]) > (c_lon["end"] - c_lon["begin"]), (
        "segmentation must widen the bulging sinusoidal footprint"
    )


def test_eo3_grid_spatial_projected_crs():
    """A 3857 grid round-trips through the transformer seam to lon/lat."""
    from datacube_core_spark.geom.mercator import lonlat_to_merc

    x0, y0 = (float(v) for v in lonlat_to_merc(10.0, 20.0))
    x1, y1 = (float(v) for v in lonlat_to_merc(12.0, 19.0))
    doc = {
        "$schema": EO3, "id": "m1", "crs": "EPSG:3857",
        "grids": {"default": {"shape": [100, 200],
                              "transform": [(x1 - x0) / 200, 0, x0, 0, (y1 - y0) / 100, y0]}},
    }
    oo = eo3_grid_spatial(doc)
    assert abs(oo["extent"]["lon"]["begin"] - 10.0) < 1e-9
    assert abs(oo["extent"]["lon"]["end"] - 12.0) < 1e-9
    assert abs(oo["extent"]["lat"]["begin"] - 19.0) < 1e-9
    assert abs(oo["extent"]["lat"]["end"] - 20.0) < 1e-9


def test_match_product_exactly_one():
    assert match_product(_doc("d"), RULES).name == "pages_eo3"
    with pytest.raises(BadMatch, match="No matching"):
        match_product({"product": {"name": "nope"}}, RULES)
    dup = [ProductRule("a", {}), ProductRule("b", {})]  # both match anything
    with pytest.raises(BadMatch, match="several products"):
        match_product(_doc("d"), dup)


def test_resolve_doc_consistency_and_errors():
    row = resolve_doc(_doc("d1", sources=["s1", "s2"]), "file:///d1.json", RULES)
    assert row["error"] is None
    assert row["product"] == "pages_eo3"
    assert row["source_ids"] == ["s1", "s2"]
    assert (row["lon_min"], row["lon_max"]) == (10.0, 12.0)
    assert json.loads(row["geo_ref_points"])["ul"] == {"x": 10.0, "y": 20.0}

    bad = dict(_doc("d2"))
    del bad["measurements"]
    row = resolve_doc(bad, "u", RULES)
    assert "not specifying all of the measurements" in row["error"]

    noid = dict(_doc("")); noid["id"] = None
    assert resolve_doc(noid, "u", RULES)["error"] == "No id defined in dataset doc"


def test_batch_resolve_and_store_roundtrip(spark, tmp_path):
    """The full flow: raw docs -> distributed resolve -> store.add ->
    searchable via current(); lineage edges feed lineage_closure and the
    closure agrees with the documents' lineage blocks."""
    store = DatasetStore(spark, str(tmp_path / "cat"), id_type="STRING")
    resolver = Doc2Dataset(store, RULES)

    # two root datasets, one derived from both, one bad doc
    docs = [
        (json.dumps(_doc("a1")), "file:///a1.json"),
        (json.dumps(_doc("a2")), "file:///a2.json"),
        (json.dumps(_doc("b1", sources=["a1", "a2"])), "file:///b1.json"),
        (json.dumps({"id": "junk", "product": {"name": "nope"}}), "file:///junk.json"),
    ]
    docs_df = spark.createDataFrame(docs, "doc STRING, uri STRING")
    n, errors = resolver.ingest(docs_df)
    assert n == 3
    errs = errors.collect()
    assert len(errs) == 1 and "No matching Product" in errs[0]["error"]

    live = store.current()
    assert sorted(r["id"] for r in live.collect()) == ["a1", "a2", "b1"]
    got = live.where(F.col("id") == "b1").collect()[0]
    assert got["product"] == "pages_eo3" and got["lon_min"] == 10.0

    # lineage edges are queryable through the standard closure operator
    edges = spark.read.parquet(f"{store.base}/lineage_edges")
    roots = spark.createDataFrame([("b1",)], "dataset_id STRING")
    clo = lineage_closure(edges, roots, direction="sources")
    reach = {(r["node"], r["distance"]) for r in clo.collect()}
    assert reach == {("b1", 0), ("a1", 1), ("a2", 1)}


def test_fail_on_missing_lineage(spark, tmp_path):
    store = DatasetStore(spark, str(tmp_path / "cat2"), id_type="STRING")
    resolver = Doc2Dataset(store, RULES, fail_on_missing_lineage=True)

    # single-doc parity API
    row, err = resolver(_doc("x1", sources=["ghost"]), "u")
    assert row is None and "missing from DB" in err and "ghost" in err

    # batch path: a1 exists, ghost does not
    store.add(spark.createDataFrame(
        [("a1",)], "id STRING").withColumn("product", F.lit("p")))
    out = resolver.resolve(spark.createDataFrame(
        [(json.dumps(_doc("x2", sources=["a1", "ghost"])), "u2")], "doc STRING, uri STRING"
    )).collect()
    assert len(out) == 1
    assert "missing from DB: ghost" in out[0]["error"]

    ok = resolver.resolve(spark.createDataFrame(
        [(json.dumps(_doc("x3", sources=["a1"])), "u3")], "doc STRING, uri STRING"
    )).collect()
    assert ok[0]["error"] is None


def test_malformed_docs_become_error_rows_not_job_failures(spark, tmp_path):
    """TypeError-shaped malformations (wrong-typed grids, lineage=None,
    already-normalized doc) must yield error rows / pass through — never
    kill the distributed resolve job (r3 review finding)."""
    from datacube_core_spark.operators.doc2dataset import prep_eo3, resolve_doc

    # already-normalized doc: prep is idempotent, resolve succeeds
    norm = prep_eo3(_doc("n1"))
    again = prep_eo3(norm)
    assert again == norm
    row = resolve_doc(norm, "u", RULES)
    assert row["error"] is None

    bad_docs = [
        {"$schema": EO3, "id": "b1", "crs": "EPSG:4326",
         "grids": {"default": {"shape": 5}}},              # TypeError: len(5)
        {"$schema": EO3, "id": "b2", "crs": "EPSG:4326",
         "grids": {"default": {"shape": [2, 2], "transform": "x"}}},
        {**_doc("b3"), "lineage": None},                   # flatten gets None -> {} ok
        {**_doc("b4"), "lineage": {"src": None}},          # TypeError in flatten
    ]
    rows = [resolve_doc(d, "u", RULES) for d in bad_docs]
    assert rows[0]["error"] and rows[1]["error"] and rows[3]["error"]
    assert rows[2]["error"] is None  # lineage None reads as empty

    # and through the distributed path
    docs_df = spark.createDataFrame(
        [(json.dumps(d), "u") for d in bad_docs], "doc STRING, uri STRING"
    )
    from datacube_core_spark.operators.doc2dataset import resolve_docs_df
    out = resolve_docs_df(docs_df, RULES).collect()  # must not raise
    assert sum(1 for r in out if r["error"]) == 3


def test_ingest_retry_is_edge_idempotent(spark, tmp_path):
    """Re-running the same ingest batch adds 0 rows AND 0 edges
    (r3 review finding: the edge path must be as idempotent as add)."""
    store = DatasetStore(spark, str(tmp_path / "cat4"), id_type="STRING")
    resolver = Doc2Dataset(store, RULES)
    docs_df = spark.createDataFrame(
        [(json.dumps(_doc("r1", sources=["s1", "s2"])), "u1"),
         (json.dumps(_doc("s1")), "u2"), (json.dumps(_doc("s2")), "u3")],
        "doc STRING, uri STRING",
    )
    n1, _ = resolver.ingest(docs_df)
    edges1 = spark.read.parquet(f"{store.base}/lineage_edges").count()
    n2, _ = resolver.ingest(docs_df)  # retry
    edges2 = spark.read.parquet(f"{store.base}/lineage_edges").count()
    assert n1 == 3 and n2 == 0
    assert edges1 == 2 and edges2 == 2, "retry duplicated lineage edges"


def test_wide_geographic_grid_extent_not_corrupted():
    """A legitimately 190-degree-wide geographic grid keeps its true
    extent (safe-mode's dateline heuristic must not rewrite it)."""
    from datacube_core_spark.operators.doc2dataset import eo3_grid_spatial

    doc = {
        "$schema": EO3, "id": "w1", "crs": "EPSG:4326",
        "grids": {"default": {"shape": [100, 1900],
                              "transform": [0.1, 0, -170.0, 0, -0.1, 30.0]}},
    }
    oo = eo3_grid_spatial(doc)
    assert oo["extent"]["lon"] == {"begin": -170.0, "end": 20.0}


def test_ingest_docs_cli_job(spark, tmp_path, capsys):
    """`datacube dataset add` analog: the ingest-docs CLI job resolves a
    line-delimited JSON file into a DatasetStore catalog."""
    from datacube_core_spark.__main__ import main

    docs = [json.dumps({
        "$schema": EO3, "id": f"cli-{i}",
        "product": {"name": "pages_eo3"}, "crs": "EPSG:4326",
        "grids": {"default": {"shape": [8, 16],
                              "transform": [0.125, 0, float(i), 0, -0.125, 10.0]}},
        "properties": {"datetime": "2024-05-01T00:00:00"},
    }) for i in range(5)] + ["{not json"]
    path = str(tmp_path / "docs.jsonl")
    open(path, "w").write("\n".join(docs))
    store = str(tmp_path / "cat")

    rc = main(["--job", "ingest-docs", "--docs", path, "--store", store])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"added": 5' in out and '"errors": 1' in out

    st = DatasetStore(spark, store, id_type="STRING")
    got = sorted(r["id"] for r in st.current().collect())
    assert got == [f"cli-{i}" for i in range(5)]


def test_dataset_lifecycle_cli_jobs(spark, tmp_path, capsys):
    """`datacube dataset archive/restore/purge` analogs (VERDICT r3 #7):
    the CLI jobs drive DatasetStore over a catalog ingested by
    ingest-docs, and purge refuses live rows without --force."""
    from datacube_core_spark.__main__ import main

    docs = [json.dumps({
        "$schema": EO3, "id": f"lc-{i}",
        "product": {"name": "pages_eo3"}, "crs": "EPSG:4326",
        "grids": {"default": {"shape": [8, 16],
                              "transform": [0.125, 0, float(i), 0, -0.125, 10.0]}},
        "properties": {"datetime": "2024-05-01T00:00:00"},
    }) for i in range(4)]
    path = str(tmp_path / "docs.jsonl")
    open(path, "w").write("\n".join(docs))
    store = str(tmp_path / "cat")
    assert main(["--job", "ingest-docs", "--docs", path, "--store", store]) == 0
    capsys.readouterr()

    assert main(["--job", "dataset-archive", "--store", store, "--ids", "lc-0,lc-1"]) == 0
    assert '"affected": 2' in capsys.readouterr().out
    st = DatasetStore(spark, store, id_type="STRING")
    assert sorted(r["id"] for r in st.current().collect()) == ["lc-2", "lc-3"]

    assert main(["--job", "dataset-restore", "--store", store, "--ids", "lc-1"]) == 0
    assert '"affected": 1' in capsys.readouterr().out
    assert sorted(r["id"] for r in st.current().collect()) == ["lc-1", "lc-2", "lc-3"]

    # purge of the still-archived lc-0 works; purging a LIVE row needs --force
    assert main(["--job", "dataset-purge", "--store", store, "--ids", "lc-0"]) == 0
    assert '"affected": 1' in capsys.readouterr().out
    with pytest.raises(ValueError, match="non-archived"):
        main(["--job", "dataset-purge", "--store", store, "--ids", "lc-2"])
    assert main(["--job", "dataset-purge", "--store", store, "--ids", "lc-2", "--force"]) == 0
    assert '"affected": 1' in capsys.readouterr().out
    assert sorted(r["id"] for r in st.current(include_archived=True).collect()) == ["lc-1", "lc-3"]


def test_product_cli_jobs(spark, tmp_path, capsys):
    """`datacube product list/show` analogs over the ProductCatalog."""
    from datacube_core_spark.__main__ import main

    defs = [
        {"name": "pages_eo3", "description": "web pages",
         "metadata": {"product": {"name": "pages_eo3"}},
         "measurements": [{"name": "red"}, {"name": "nir"}]},
        {"name": "other", "description": "other product",
         "metadata": {"product": {"name": "other"}}},
    ]
    path = str(tmp_path / "products.json")
    open(path, "w").write(json.dumps(defs))
    store = str(tmp_path / "cat")
    assert main(["--job", "add-products", "--docs", path, "--store", store]) == 0
    capsys.readouterr()

    assert main(["--job", "product-list", "--store", store]) == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines() if l.startswith("{")]
    listed = [l for l in lines if "name" in l and "measurements" in l]
    assert [l["name"] for l in listed] == ["other", "pages_eo3"]
    assert listed[1]["measurements"] == ["red", "nir"]

    assert main(["--job", "product-show", "--store", store, "--product", "pages_eo3"]) == 0
    shown = json.loads(capsys.readouterr().out.rsplit("\n{", 1)[0])
    assert shown["description"] == "web pages"

    with pytest.raises(SystemExit, match="not a valid Product name"):
        main(["--job", "product-show", "--store", store, "--product", "nope"])


def test_update_docs_info_and_system_check_cli(spark, tmp_path, capsys):
    """`datacube dataset update` / `dataset info` / `system check`
    analogs: update only touches existing ids (unknown -> error row,
    never an insert), info prints payload + event history, system-check
    reports counts and flags orphan lineage edges."""
    from datacube_core_spark.__main__ import main

    def doc(i, lat0=10.0):
        return json.dumps({
            "$schema": EO3, "id": f"u-{i}",
            "product": {"name": "pages_eo3"}, "crs": "EPSG:4326",
            "grids": {"default": {"shape": [8, 16],
                                  "transform": [0.125, 0, float(i), 0, -0.125, lat0]}},
            "properties": {"datetime": "2024-05-01T00:00:00"},
        })

    path = str(tmp_path / "docs.jsonl")
    open(path, "w").write("\n".join(doc(i) for i in range(3)))
    store = str(tmp_path / "cat")
    assert main(["--job", "ingest-docs", "--docs", path, "--store", store]) == 0
    capsys.readouterr()

    # update 2 existing (moved grid origin) + 1 unknown -> updated=2, errors=1
    upd = str(tmp_path / "upd.jsonl")
    open(upd, "w").write("\n".join([doc(0, lat0=50.0), doc(1, lat0=50.0),
                                    doc(99, lat0=50.0)]))
    assert main(["--job", "update-docs", "--docs", upd, "--store", store]) == 0
    out = capsys.readouterr().out
    assert '"updated": 2' in out and '"errors": 1' in out
    st = DatasetStore(spark, store, id_type="STRING")
    lat_max = {r["id"]: r["lat_max"] for r in st.current().collect()}
    assert lat_max["u-0"] == 50.0 and lat_max["u-2"] == 10.0
    assert "u-99" not in lat_max  # update never inserts

    assert main(["--job", "dataset-info", "--store", store, "--ids", "u-0,nope"]) == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
             if l.startswith("{") and '"job"' not in l]
    by_id = {l["id"]: l for l in lines}
    assert [e["op"] for e in by_id["u-0"]["events"]] == ["add", "update"]
    assert by_id["u-0"]["current"]["lat_max"] == "50.0"
    assert by_id["nope"]["error"] == "not found"

    assert main(["--job", "system-check", "--store", store]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[0])
    assert rep["ok"] is True and rep["datasets"] == 3 and rep["archived"] == 0
    assert rep["orphan_edges"] == 0

    # purge one dataset -> its lineage edges (if any) would orphan; here
    # docs have no lineage, so counts just drop
    assert main(["--job", "dataset-archive", "--store", store, "--ids", "u-0"]) == 0
    capsys.readouterr()
    assert main(["--job", "system-check", "--store", store]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[0])
    assert rep["datasets"] == 2 and rep["archived"] == 1

    # a PURGED dataset must report as purged, not a live payload
    # (code-review r4: the tombstone ends the chain)
    assert main(["--job", "dataset-purge", "--store", store, "--ids", "u-0"]) == 0
    capsys.readouterr()
    assert main(["--job", "dataset-info", "--store", store, "--ids", "u-0"]) == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[0])
    assert line["error"] == "purged" and "current" not in line
    assert [e["op"] for e in line["events"]][-1] == "purge"


def test_docs_from_files_yaml_json_jsonl(spark, tmp_path):
    """read_documents analog: multi-doc YAML streams, JSON, JSONL, and
    unparseable files -> error rows, all distributed."""
    import yaml as _yaml
    from datacube_core_spark.operators.doc2dataset import docs_from_files

    d1, d2, d3 = _doc("y1"), _doc("y2"), _doc("j1")
    ydir = tmp_path / "docs"
    ydir.mkdir()
    (ydir / "multi.yaml").write_text(_yaml.safe_dump_all([d1, d2]))
    (ydir / "one.json").write_text(json.dumps(d3))
    (ydir / "broken.yaml").write_text("key: [unclosed")

    out = docs_from_files(spark, str(ydir))
    resolved = resolve_docs_df(out, RULES).collect()
    by_id = {r["id"]: r for r in resolved if r["id"]}
    assert set(by_id) == {"y1", "y2", "j1"}
    assert all(by_id[i]["error"] is None for i in by_id)
    errs = [r for r in resolved if r["error"]]
    assert len(errs) == 1 and "invalid JSON" in errs[0]["error"]
    assert errs[0]["uri"].endswith("broken.yaml")
    # multi-doc uris disambiguated
    uris = {r["uri"] for r in resolved}
    assert any(u.endswith("multi.yaml#0") for u in uris) and any(u.endswith("multi.yaml#1") for u in uris)

    # jsonl line mode
    (ydir / "lines.jsonl").write_text("\n".join(json.dumps(_doc(f"l{i}")) for i in range(3)))
    out2 = docs_from_files(spark, str(ydir / "lines.jsonl"), fmt="jsonl")
    r2 = resolve_docs_df(out2, RULES).collect()
    assert sorted(r["id"] for r in r2) == ["l0", "l1", "l2"]


def test_product_catalog_rules_and_full_loop(spark, tmp_path):
    """`datacube product add` analog: register product definitions, load
    rules with reference load_rules_from_types semantics, and ingest
    datasets matched against the REGISTERED products end to end."""
    import yaml as _yaml
    from datacube_core_spark.__main__ import main
    from datacube_core_spark.operators.doc2dataset import ProductCatalog, product_from_doc

    base = str(tmp_path / "cat")
    defs = [
        {"name": "pages_eo3", "metadata": {"product": {"name": "pages_eo3"}},
         "measurements": [{"name": "red", "dtype": "uint16"}, {"name": "nir", "dtype": "uint16"}]},
        {"name": "other", "metadata": {"product": {"name": "other"}}},
    ]
    cat = ProductCatalog(spark, base)
    assert cat.add_documents(defs) == 2

    rules = cat.rules()
    assert [r.name for r in rules] == ["other", "pages_eo3"]
    assert sorted(next(r for r in rules if r.name == "pages_eo3").measurements) == ["nir", "red"]
    assert [r.name for r in cat.rules(excluding=["other"])] == ["pages_eo3"]
    with pytest.raises(ValueError, match='"nope" not present'):
        cat.rules(product_names=["nope"])
    with pytest.raises(ValueError, match="Found no matching products"):
        cat.rules(excluding=["other", "pages_eo3"])

    # full CLI loop: add-products then ingest-docs against the catalog
    pdefs = str(tmp_path / "products.yaml")
    open(pdefs, "w").write(_yaml.safe_dump_all(defs))
    base2 = str(tmp_path / "cat2")
    assert main(["--job", "add-products", "--docs", pdefs, "--store", base2]) == 0
    ds = str(tmp_path / "scene.yaml")
    open(ds, "w").write(_yaml.safe_dump_all([_doc("p1"), _doc("p2")]))
    assert main(["--job", "ingest-docs", "--docs", ds, "--store", base2]) == 0
    st = DatasetStore(spark, base2, id_type="STRING")
    assert sorted(r["id"] for r in st.current().collect()) == ["p1", "p2"]

    # product_from_doc validation
    with pytest.raises(ValueError, match="must have a name"):
        product_from_doc({"metadata": {}})


def test_docs_from_files_jsonl_inside_directory(spark, tmp_path):
    """A .jsonl file found while auto-scanning a DIRECTORY is parsed per
    line (r3 review finding: whole-file json.loads silently collapsed all
    its documents into one error row)."""
    from datacube_core_spark.operators.doc2dataset import docs_from_files

    d = tmp_path / "mixed"
    d.mkdir()
    (d / "scenes.jsonl").write_text(
        "\n".join(json.dumps(_doc(f"m{i}")) for i in range(4)) + "\n{broken"
    )
    (d / "one.json").write_text(json.dumps(_doc("j9")))

    resolved = resolve_docs_df(docs_from_files(spark, str(d)), RULES).collect()
    ok = sorted(r["id"] for r in resolved if r["error"] is None)
    assert ok == ["j9", "m0", "m1", "m2", "m3"]
    errs = [r for r in resolved if r["error"]]
    assert len(errs) == 1 and errs[0]["uri"].endswith("scenes.jsonl#4")


def test_add_products_json_array_file(spark, tmp_path):
    """A .json products file holding an ARRAY of definitions registers
    every product (r3 review finding)."""
    from datacube_core_spark.__main__ import main
    from datacube_core_spark.operators.doc2dataset import ProductCatalog

    path = str(tmp_path / "products.json")
    open(path, "w").write(json.dumps([
        {"name": "a", "metadata": {"product": {"name": "a"}}},
        {"name": "b", "metadata": {"product": {"name": "b"}}},
    ]))
    base = str(tmp_path / "cat")
    assert main(["--job", "add-products", "--docs", path, "--store", base]) == 0
    assert [r.name for r in ProductCatalog(spark, base).rules()] == ["a", "b"]


def test_add_documents_intra_batch_duplicate_name(spark, tmp_path):
    """Duplicate product names in ONE batch resolve deterministically
    (last definition wins) instead of a nondeterministic seq tie."""
    from datacube_core_spark.operators.doc2dataset import ProductCatalog

    cat = ProductCatalog(spark, str(tmp_path / "cat"))
    n = cat.add_documents([
        {"name": "p", "metadata": {"v": 1}},
        {"name": "p", "metadata": {"v": 2}},
    ])
    assert n == 1
    got = {r.name: r.signature for r in cat.rules()}
    assert got == {"p": {"v": 2}}


def test_update_dedupes_intra_batch_duplicates(spark, tmp_path):
    """Two documents for the SAME id in one update batch: one wins
    deterministically (first by uri), the other surfaces as an error row
    (review-pass-2: equal (_seq, _tie) rows read back nondeterministic)."""
    from datacube_core_spark.operators.doc2dataset import Doc2Dataset

    store = DatasetStore(spark, str(tmp_path / "cat"), id_type="STRING")
    d2d = Doc2Dataset(store, RULES)
    base = spark.createDataFrame(
        [(json.dumps(_doc("dup-1")), "file:///a.json")], "doc STRING, uri STRING"
    )
    n, errs = d2d.ingest(base)
    assert n == 1

    upd_docs = spark.createDataFrame(
        [
            (json.dumps(_doc("dup-1", lon0=30.0)), "file:///b1.json"),
            (json.dumps(_doc("dup-1", lon0=40.0)), "file:///b2.json"),
        ],
        "doc STRING, uri STRING",
    )
    n, errs = d2d.update(upd_docs)
    assert n == 1
    err_rows = errs.collect()
    assert len(err_rows) == 1 and "duplicate document" in err_rows[0]["error"]
    # winner is the first by uri (b1 -> lon0=30)
    cur = store.current().collect()[0]
    assert cur["lon_min"] == 30.0
