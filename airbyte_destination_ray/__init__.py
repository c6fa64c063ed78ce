"""airbyte_destination_ray — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch engine with the query/data-processing capabilities of
propeldata/airbyte-destination (reference, read-only at /root/reference),
re-expressed as idiomatic Ray Data pipelines:

- change streams are ``ray.data.Dataset``s of Arrow batches,
- per-record transforms are vectorized ``map_batches`` stages,
- the LWW upsert (ClickHouse ReplacingMergeTree semantics the reference
  *declares* via table settings, reference internal/connector/destination.go:337-351)
  is an explicit hash-partitioned merge operator,
- exactly-once comes from idempotent per-(epoch, partition) commit
  manifests rather than HTTP retries.

Nothing here is a translation of the reference's Go execution loop.
"""

__version__ = "0.1.0"
