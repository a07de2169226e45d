"""MetadataType registry — the ``datacube metadata add/list/show`` loop.

Reference surface: ``datacube/scripts/metadata.py`` (CLI),
``datacube/index/abstract.py`` ``metadata_types`` resource, and the
metadata-type document shape (``name`` + ``description`` + ``dataset``
section whose ``search_fields`` declare the runtime JSON-path fields —
``datacube/utils/documents.py`` / default-metadata-types.yaml).

Backed by the same event-sourced :class:`DatasetStore` as
:class:`~.doc2dataset.ProductCatalog` (add/update/archive/time-travel
for free), keyed by type name; the document rides as a JSON column.
``search_fields(name)`` returns the spec dict ready for
``plans.fields.parse_fields`` / ``search_raw_docs`` — registering a
metadata type makes any raw-JSON document table searchable with its
fields, no re-ingest (the full reference loop: declare type → search).
Specs are VALIDATED at add time (unknown field types / bad offsets fail
the add, not the first query).
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Mapping, Optional, Sequence

from pyspark.sql import functions as F

from ..plans.fields import parse_fields


def _validate_metadata_doc(doc: Mapping[str, Any]) -> str:
    if not isinstance(doc, Mapping):
        raise ValueError(
            f"metadata type document must be a mapping, got {type(doc).__name__}"
        )
    name = doc.get("name")
    if not name:
        raise ValueError("metadata type definition must have a name")
    specs = (doc.get("dataset") or {}).get("search_fields") or {}
    # compile against a dummy column: unknown types / bad selections /
    # malformed offsets raise HERE, not at first search
    parse_fields(specs, F.lit(""))
    return str(name)


class MetadataTypeCatalog:
    """Persistent metadata-type registry (``datacube metadata add``)."""

    def __init__(self, spark, base_path: str):
        from .store import DatasetStore

        self.spark = spark
        self.store = DatasetStore(
            spark, f"{base_path.rstrip('/')}/metadata_types", id_col="name", id_type="STRING"
        )

    def add_documents(self, docs: Sequence[Mapping[str, Any]], update_existing: bool = False) -> int:
        from .store import add_named_documents

        by_name: Dict[str, str] = {}
        for d in docs:
            name = _validate_metadata_doc(d)
            by_name[name] = json.dumps(dict(d), sort_keys=True)
        return add_named_documents(self.spark, self.store, by_name, update_existing)

    def names(self) -> List[str]:
        return sorted(self.documents())

    def documents(self) -> Dict[str, Dict[str, Any]]:
        """All registered type documents in ONE state resolve (listing N
        types must not pay N+1 event-log scans)."""
        try:
            rows = self.store.current().select("name", "definition").collect()
        except ValueError:
            return {}
        return {r["name"]: json.loads(r["definition"]) for r in rows}

    def get(self, name: str) -> Optional[Dict[str, Any]]:
        try:
            rows = self.store.current().where(F.col("name") == name).collect()
        except ValueError:
            return None
        return json.loads(rows[0]["definition"]) if rows else None

    def search_fields(self, name: str) -> Dict[str, Any]:
        """The ``search_fields`` spec dict for ``parse_fields`` /
        ``search_raw_docs``; unknown type name raises (reference
        'no such metadata type' error path)."""
        doc = self.get(name)
        if doc is None:
            raise ValueError(f'"{name}" is not a valid MetadataType name')
        return (doc.get("dataset") or {}).get("search_fields") or {}
