"""Airbyte protocol messages (reference parity: S1, M1, M2, §1.1).

The message model follows internal/airbyte/protocol.go:12-29 — a tagged union
``{type, log?, spec?, connectionStatus?, catalog?, record?, state?}``; only
RECORD and STATE are acted on by the destination (destination.go:402,421), all
other types are ignored.

Parsing is fail-fast: a malformed line aborts the sync with the record index
(M1, destination.go:396-400).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Iterator

MESSAGE_TYPE_RECORD = "RECORD"
MESSAGE_TYPE_STATE = "STATE"
MESSAGE_TYPE_LOG = "LOG"
MESSAGE_TYPE_SPEC = "SPEC"
MESSAGE_TYPE_CONNECTION_STATUS = "CONNECTION_STATUS"
MESSAGE_TYPE_CATALOG = "CATALOG"


class ProtocolError(ValueError):
    pass


@dataclass
class Record:
    """One row-change event (protocol.go:253-258)."""

    stream: str
    data: dict[str, Any]
    emitted_at: int  # epoch millis
    namespace: str = ""


@dataclass
class State:
    """Checkpoint barrier with opaque source payload (protocol.go:92-115)."""

    raw: dict[str, Any] = field(default_factory=dict)

    def with_destination_stats(self, record_count: float | None) -> dict[str, Any]:
        """Echo rule (S6, destination.go:417-420): destinationStats mirrors
        sourceStats' record count after the flush-all barrier."""
        out = dict(self.raw)
        stats = out.get("sourceStats")
        if stats is not None and "recordCount" in stats:
            out["destinationStats"] = {"recordCount": stats["recordCount"]}
        elif record_count is not None:
            out["destinationStats"] = {"recordCount": record_count}
        return out


@dataclass
class ParsedMessage:
    type: str
    record: Record | None = None
    state: State | None = None


def parse_message(line: str, index: int) -> ParsedMessage | None:
    """Parse one NDJSON line; None for blank lines.

    Fail-fast with the line index on malformed JSON (destination.go:396-400).
    """
    line = line.strip()
    if not line:
        return None
    try:
        raw = json.loads(line)
    except json.JSONDecodeError as e:
        raise ProtocolError(f"failed to parse message at index {index}: {e}") from e
    mtype = raw.get("type", "")
    if mtype == MESSAGE_TYPE_RECORD:
        r = raw.get("record") or {}
        return ParsedMessage(
            type=mtype,
            record=Record(
                stream=r.get("stream", ""),
                data=r.get("data") or {},
                emitted_at=int(r.get("emitted_at", 0)),
                namespace=r.get("namespace") or "",
            ),
        )
    if mtype == MESSAGE_TYPE_STATE:
        return ParsedMessage(type=mtype, state=State(raw=raw.get("state") or {}))
    # LOG / SPEC / CATALOG / CONNECTION_STATUS / TRACE: ignored by the
    # destination (destination.go:402,421 — switch handles only RECORD/STATE)
    return ParsedMessage(type=mtype)


def iter_messages(lines: Iterator[str]) -> Iterator[tuple[int, ParsedMessage]]:
    """Scan lines in arrival order, yielding (record_index, message).

    ``record_index`` increments only on RECORD messages and is global across
    streams (destination.go:393,423,453) — the replay-critical numbering that
    feeds the deterministic raw id (M4).
    """
    record_index = 0
    for i, line in enumerate(lines):
        msg = parse_message(line, i)
        if msg is None:
            continue
        if msg.type == MESSAGE_TYPE_RECORD:
            yield record_index, msg
            record_index += 1
        else:
            yield record_index, msg
