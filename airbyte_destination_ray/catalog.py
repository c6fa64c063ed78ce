"""Catalog model + validation (reference parity: S3, M9, M11, M12, M13, M14).

The ConfiguredCatalog shape follows the Airbyte protocol structs
(reference internal/airbyte/protocol.go:220-250); validation reproduces the
plan-time checks of the reference's Write path:

- PK shape: each ``primary_key`` path has exactly one element — no nested PKs
  (M11, destination.go:283-291),
- ``append_dedup`` requires at least one primary key (M12, destination.go:324-327),
- mode-vs-existing-table compatibility: ``append_dedup`` is forbidden when the
  table's unique id is ``_airbyte_raw_id``; ``append`` is forbidden when the
  table is PK-ordered (M12, destination.go:246-254).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from enum import Enum
from pathlib import Path

import pyarrow as pa

from .functions.ids import table_unique_name
from .schema import RAW_ID_COLUMN, EXTRACTED_AT_COLUMN, build_table_schema


class SyncMode(str, Enum):
    OVERWRITE = "overwrite"
    APPEND = "append"
    APPEND_DEDUP = "append_dedup"


class CatalogError(ValueError):
    pass


@dataclass
class ConfiguredStream:
    name: str
    namespace: str = ""
    json_schema: dict = field(default_factory=dict)
    sync_mode: str = "full_refresh"
    destination_sync_mode: SyncMode = SyncMode.APPEND
    cursor_field: list[str] = field(default_factory=list)
    primary_key: list[list[str]] = field(default_factory=list)

    @property
    def table_name(self) -> str:
        return table_unique_name(self.namespace, self.name)

    @property
    def pk_columns(self) -> list[str]:
        return [p[0] for p in self.primary_key]

    @property
    def cursor(self) -> str:
        """Version column for LWW; defaults to _airbyte_extracted_at
        (reference destination.go:293-296)."""
        if self.cursor_field:
            return self.cursor_field[0]
        return EXTRACTED_AT_COLUMN

    def arrow_schema(self) -> pa.Schema:
        props = self.json_schema.get("properties", {})
        return build_table_schema(
            props,
            primary_key=self.pk_columns,
            cursor_field=self.cursor if self.cursor in props else None,
        )

    def validate(self) -> None:
        for pk_path in self.primary_key:
            if len(pk_path) != 1:
                raise CatalogError(
                    f"stream {self.table_name}: primary key path {pk_path} must have "
                    "exactly one element (nested primary keys are not supported)"
                )
        if self.destination_sync_mode == SyncMode.APPEND_DEDUP and not self.primary_key:
            raise CatalogError(
                f"stream {self.table_name}: append_dedup requires at least one primary key"
            )

    def validate_against_table(self, unique_id: str, pk_ordered: bool) -> None:
        """Mode-vs-existing-table checks (destination.go:246-254)."""
        if self.destination_sync_mode == SyncMode.APPEND_DEDUP and unique_id == RAW_ID_COLUMN:
            raise CatalogError(
                f"stream {self.table_name}: append_dedup is incompatible with a table "
                f"whose unique id is {RAW_ID_COLUMN}"
            )
        if self.destination_sync_mode == SyncMode.APPEND and pk_ordered:
            raise CatalogError(
                f"stream {self.table_name}: append is incompatible with a PK-ordered table"
            )


@dataclass
class Catalog:
    streams: list[ConfiguredStream]

    def validate(self) -> None:
        for s in self.streams:
            s.validate()

    @property
    def is_full_reset(self) -> bool:
        """True iff every stream is overwrite (destination.go:181,184,262-268)."""
        return bool(self.streams) and all(
            s.destination_sync_mode == SyncMode.OVERWRITE for s in self.streams
        )

    def stream_by_table(self) -> dict[str, ConfiguredStream]:
        return {s.table_name: s for s in self.streams}


def _stream_from_json(cs: dict) -> ConfiguredStream:
    stream = cs.get("stream", {})
    return ConfiguredStream(
        name=stream.get("name", ""),
        namespace=stream.get("namespace") or "",
        json_schema=stream.get("json_schema", {}),
        sync_mode=cs.get("sync_mode", "full_refresh"),
        destination_sync_mode=SyncMode(cs.get("destination_sync_mode", "append")),
        cursor_field=cs.get("cursor_field") or [],
        primary_key=cs.get("primary_key") or [],
    )


def load_catalog(path: str | Path) -> Catalog:
    """S2+S3: JSON file → validated Catalog (reference parser.go:8-15 +
    destination.go:167-171)."""
    with open(path) as f:
        raw = json.load(f)
    return catalog_from_json(raw)


def catalog_from_json(raw: dict) -> Catalog:
    cat = Catalog(streams=[_stream_from_json(cs) for cs in raw.get("streams", [])])
    cat.validate()
    return cat


@dataclass
class Config:
    """Engine config (reference Config {application_id, application_secret},
    internal/connector/config.go:3-6 — locally: where the lake lives)."""

    lake_root: str
    application_id: str = ""
    application_secret: str = ""


def load_config(path: str | Path) -> Config:
    with open(path) as f:
        raw = json.load(f)
    if "lake_root" not in raw:
        raise CatalogError("config missing required field 'lake_root'")
    return Config(
        lake_root=raw["lake_root"],
        application_id=raw.get("application_id", ""),
        application_secret=raw.get("application_secret", ""),
    )


def spec() -> dict:
    """Engine capability spec (M14; reference destination.go:87-129)."""
    return {
        "documentationUrl": "https://docs.ray.io/en/latest/data/data.html",
        "supported_destination_sync_modes": ["overwrite", "append", "append_dedup"],
        "supportsIncremental": True,
        "connectionSpecification": {
            "$schema": "http://json-schema.org/draft-07/schema#",
            "title": "Ray Data CDC Lake Destination Spec",
            "type": "object",
            "required": ["lake_root"],
            "properties": {
                "lake_root": {
                    "type": "string",
                    "description": "Filesystem root of the Parquet lake",
                },
            },
        },
        "engine": {
            "schema_evolution": ["add", "widen", "rename_by_id"],
            "delivery_guarantee": "exactly_once (idempotent per-partition commit manifests)",
        },
    }


def check(config: Config) -> tuple[bool, str]:
    """M13: validate config + lake-root writability."""
    try:
        root = Path(config.lake_root)
        root.mkdir(parents=True, exist_ok=True)
        probe = root / ".write_probe"
        probe.write_text("ok")
        probe.unlink()
    except OSError as e:  # pragma: no cover - environment-dependent
        return False, f"lake root not writable: {e}"
    return True, "Successfully validated lake root"
