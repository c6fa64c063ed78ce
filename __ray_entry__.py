"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash → CORRECTNESS_r{N}.json).

No ``ray.init``/``ray.shutdown`` here or in the library — the driver owns
the session.
"""

from __future__ import annotations

import shutil
import sys
from collections.abc import Callable
from pathlib import Path
from typing import Any

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def entry() -> Any:
    """Flagship CDC pipeline at sf0.001 scale: synthesize a deterministic
    web-page change binlog, run the epoch-by-epoch LWW sync into a Parquet
    lake, return the compacted table as a Dataset."""
    from airbyte_destination_ray.sources.synth import ensure_binlog
    from airbyte_destination_ray.pipelines.cdc import read_table, run_cdc_sync

    base = Path("/tmp/adr_entry")
    binlog = base / "binlog"
    lake = base / "lake"
    ensure_binlog(binlog, n_events=6000, n_keys=1000, n_epochs=3, seed=42)
    if lake.exists():
        shutil.rmtree(lake)
    run_cdc_sync(str(lake), str(binlog), num_partitions=16)
    return read_table(str(lake), "pages")


def _events(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/events.parquet")


def _documents(sf_dir: str, columns=None):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _q_cdc_lww_latest(sf_dir: str):
    """A1 (LWW upsert) as a query: latest event per user_id by (ts, event_id).

    The ``events`` table stands in as a change stream: pk=user_id,
    ver=ts (cursor), seq=event_id (arrival order / tie-break)."""
    from airbyte_destination_ray.pipelines.ops import lww_latest

    return lww_latest(_events(sf_dir), pk="user_id", ver="ts", seq="event_id")


def _q_dedup_exact_documents(sf_dir: str):
    """Exact dedup on document text (hash-partition + per-group first)."""
    from airbyte_destination_ray.pipelines.ops import dedup_exact

    return dedup_exact(_documents(sf_dir), on="text", keep_by="doc_id")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "cdc_lww_latest_by_user": _q_cdc_lww_latest,
        "dedup_exact_documents": _q_dedup_exact_documents,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "cdc_lww_latest_by_user": """
            SELECT event_id, ts, user_id, event_type, value, props
            FROM events
            QUALIFY row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        """,
        "dedup_exact_documents": """
            SELECT doc_id, text, lang, source, n_chars
            FROM documents
            QUALIFY row_number() OVER (
                PARTITION BY text ORDER BY doc_id) = 1
        """,
    }
