"""MetadataType registry + the no-reingest search loop
(`datacube metadata add/list/show` analogs, reference
datacube/scripts/metadata.py + index metadata_types resource)."""

import json

import pytest

from datacube_core_spark.operators.metadata import MetadataTypeCatalog

from .test_fields import SPECS, _raw_docs


def _mdt_doc():
    return {
        "name": "eo3_pages",
        "description": "web pages with eo3 spatial keys",
        "dataset": {
            "id": ["id"],
            "search_fields": dict(SPECS),
        },
    }


def test_metadata_catalog_roundtrip_and_validation(spark, tmp_path):
    cat = MetadataTypeCatalog(spark, str(tmp_path / "cat"))
    assert cat.names() == []
    assert cat.add_documents([_mdt_doc()]) == 1
    assert cat.names() == ["eo3_pages"]
    assert cat.get("eo3_pages")["description"] == "web pages with eo3 spatial keys"
    assert set(cat.search_fields("eo3_pages")) == set(SPECS)
    assert cat.get("nope") is None
    with pytest.raises(ValueError, match="not a valid MetadataType"):
        cat.search_fields("nope")

    # validation happens at ADD time: unknown field type rejected
    bad = _mdt_doc()
    bad["name"] = "bad"
    bad["dataset"]["search_fields"]["x"] = {"type": "hyperloglog"}
    with pytest.raises(ValueError, match="unknown type"):
        cat.add_documents([bad])
    with pytest.raises(ValueError, match="must have a name"):
        cat.add_documents([{"dataset": {}}])


def test_metadata_cli_and_search_docs(spark, tmp_path, capsys):
    """The full declare-type → search-raw-docs loop through the CLI:
    metadata-add registers the type, search-docs applies its fields plus
    the expression grammar to a raw-JSON parquet — no re-ingest."""
    from datacube_core_spark.__main__ import main

    store = str(tmp_path / "cat")
    mdt_path = str(tmp_path / "mdt.json")
    open(mdt_path, "w").write(json.dumps(_mdt_doc()))
    assert main(["--job", "metadata-add", "--docs", mdt_path, "--store", store]) == 0
    assert '"metadata_types_added": 1' in capsys.readouterr().out

    assert main(["--job", "metadata-list", "--store", store]) == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
             if l.startswith("{") and "search_fields" in l]
    assert lines[0]["name"] == "eo3_pages" and "lat" in lines[0]["search_fields"]

    assert main(["--job", "metadata-show", "--store", store,
                 "--metadata-type", "eo3_pages"]) == 0
    shown = capsys.readouterr().out
    assert '"eo3_pages"' in shown and '"double-range"' in shown

    docs_path = str(tmp_path / "rawdocs")
    _raw_docs(spark).write.mode("overwrite").parquet(docs_path)
    assert main([
        "--job", "search-docs", "--docs", docs_path, "--store", store,
        "--metadata-type", "eo3_pages",
        "--expr", "platform = sat-1 lat in [-10.0, 30.0]",
        "--limit", "100",
    ]) == 0
    out_lines = capsys.readouterr().out.strip().splitlines()
    hits = [json.loads(l) for l in out_lines if '"doc"' in l]
    tail = json.loads(out_lines[-2])
    assert tail["matched_shown"] == len(hits) > 0
    # every hit satisfies both predicates (check via the doc content)
    for h in hits:
        d = json.loads(h["doc"])
        plat = d["properties"].get("eo:platform") or d["properties"].get("platform")
        assert plat == "sat-1"
        lat = d["extent"]["lat"]
        assert lat["end"] >= -10.0 and lat["begin"] <= 30.0

    with pytest.raises(SystemExit, match="not a valid MetadataType"):
        main(["--job", "metadata-show", "--store", store, "--metadata-type", "zzz"])
