from .ids import airbyte_raw_id, raw_ids_for_batch, rfc3339_nano, table_unique_name

__all__ = ["airbyte_raw_id", "raw_ids_for_batch", "rfc3339_nano", "table_unique_name"]
