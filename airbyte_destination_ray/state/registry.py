"""Schema registry: versioned table schemas with column ids (north-rule
schema evolution — add / widen / rename-by-id between epochs).

Two layers:

- :class:`SchemaStore` — file-backed versions under
  ``<lake>/<table>/_schema/v<NNN>.json``, created with the same atomic
  write-if-absent CAS as commit manifests, so concurrent evolvers can race
  safely (one wins, the loser re-reads).  Merge tasks read version files
  directly — the data path never round-trips through an actor.
- :func:`get_registry_actor` — a named Ray actor wrapping a SchemaStore for
  callers that want coordinated evolution from distributed code (the
  "schema-registry actor" of SURVEY.md §7.6).  It is a thin serialization
  point over the same files, not a required dependency.

The reference has NO in-band evolution (schema fixed at Data Source
creation, destination.go:298-321); evolution is applied only at epoch
boundaries, matching that create-time-only model per epoch.
"""

from __future__ import annotations

import json
from pathlib import Path

import pyarrow as pa

from ..schema import VersionedSchema, align_table
from .manifest import _atomic_write_json

# keyed by str(arrow_type) — the round-trip format used in version files
_SUPPORTED_TYPES = [
    pa.string(),
    pa.large_string(),
    pa.binary(),
    pa.bool_(),
    pa.int8(),
    pa.int16(),
    pa.int32(),
    pa.int64(),
    pa.uint64(),
    pa.float32(),
    pa.float64(),
    pa.date32(),
    pa.timestamp("us"),
    pa.timestamp("us", tz="UTC"),
]
_STR_TO_TYPE = {str(t): t for t in _SUPPORTED_TYPES}


def _type_str(t: pa.DataType) -> str:
    s = str(t)
    if s not in _STR_TO_TYPE:
        raise ValueError(f"unsupported registry type: {s}")
    return s


def schema_to_json(vs: VersionedSchema) -> dict:
    return {
        "version": vs.version,
        "fields": [
            {
                "name": f.name,
                "type": _type_str(f.type),
                "nullable": f.nullable,
                "id": vs.column_ids[f.name],
            }
            for f in vs.schema
        ],
    }


def schema_from_json(raw: dict) -> VersionedSchema:
    fields = [
        pa.field(f["name"], _STR_TO_TYPE[f["type"]], nullable=f["nullable"])
        for f in raw["fields"]
    ]
    ids = {f["name"]: f["id"] for f in raw["fields"]}
    return VersionedSchema(raw["version"], pa.schema(fields), ids)


class SchemaStore:
    """File-backed versioned schema registry for one table."""

    def __init__(self, lake_root: str | Path, table: str):
        self.dir = Path(lake_root) / table / "_schema"

    def _path(self, version: int) -> Path:
        return self.dir / f"v{version:04d}.json"

    def init(self, schema: pa.Schema) -> VersionedSchema:
        """Register version 0 if absent; returns the current version 0."""
        vs = VersionedSchema(0, schema)
        _atomic_write_json(self._path(0), schema_to_json(vs))
        return self.get(0)

    def exists(self) -> bool:
        return self._path(0).exists()

    def get(self, version: int) -> VersionedSchema:
        with open(self._path(version)) as f:
            return schema_from_json(json.load(f))

    def current_version(self) -> int:
        if not self.dir.exists():
            raise FileNotFoundError(f"no schema registry at {self.dir}")
        versions = [
            int(p.stem[1:]) for p in self.dir.glob("v*.json")
        ]
        return max(versions)

    def current(self) -> VersionedSchema:
        return self.get(self.current_version())

    def _commit(self, vs: VersionedSchema) -> VersionedSchema:
        if not _atomic_write_json(self._path(vs.version), schema_to_json(vs)):
            raise RuntimeError(
                f"schema version {vs.version} already exists (concurrent "
                "evolution) — re-read current() and retry"
            )
        return vs

    # -- evolution ops (applied between epochs only) -----------------------
    def add_column(self, name: str, dtype: pa.DataType) -> VersionedSchema:
        return self._commit(self.current().evolve_add(name, dtype))

    def widen_column(self, name: str, dtype: pa.DataType) -> VersionedSchema:
        return self._commit(self.current().evolve_widen(name, dtype))

    def rename_column(self, old: str, new: str) -> VersionedSchema:
        return self._commit(self.current().evolve_rename(old, new))

    def align(
        self, table: pa.Table, *, source_version: int, target_version: int
    ) -> pa.Table:
        if source_version == target_version:
            return table
        return align_table(
            table, self.get(target_version), self.get(source_version)
        )


def get_registry_actor(lake_root: str, table: str, **actor_opts):
    """Named actor wrapper — one coordinator per (lake, table) for
    distributed evolution calls (get_if_exists avoids create races; the name
    includes the lake root so same-named tables in different lakes never
    share a coordinator)."""
    import hashlib

    import ray

    lake_tag = hashlib.sha256(str(Path(lake_root).resolve()).encode()).hexdigest()[:12]
    name = f"schema_registry::{lake_tag}::{table}"
    return (
        ray.remote(SchemaStore)
        .options(name=name, get_if_exists=True, **actor_opts)
        .remote(lake_root, table)
    )
