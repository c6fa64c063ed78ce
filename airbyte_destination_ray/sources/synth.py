"""Deterministic synthetic binlog/WAL generation (FIXTURES.md §B2).

Produces Parquet segment files of Common-Crawl-style web-page change events
with the envelope ``(seq, epoch, op, url, warc_ts, html, text, lang)``:

- Zipf-skewed update frequency over a fixed url universe (hot-key stress for
  salted sub-partitioning),
- a fixed fraction of out-of-order ``warc_ts`` within an epoch (LWW must pick
  max version, not last-seen — reference fixture parity:
  internal/connector/test_files/input_data.txt:54-60),
- deletes (op="D", null payload) followed by re-inserts,
- duplicated (re-delivered) events across epoch boundaries to exercise
  idempotence (reference fixture parity: sample_files/input_data.txt:10,12 —
  the duplicated id=7 record re-sent after a STATE barrier),
- ``text`` derived purely from ``(url, warc_ts)`` so byte-identical replay is
  checkable.

Everything is seeded numpy — no wall clock, no unseeded RNG.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

BASE_TS_US = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z in microseconds

LANGS = np.array(["en", "de", "fr", "es", "zh"])

ENVELOPE_SCHEMA = pa.schema(
    [
        pa.field("seq", pa.int64(), nullable=False),
        pa.field("epoch", pa.int32(), nullable=False),
        pa.field("op", pa.string(), nullable=False),
        pa.field("url", pa.string(), nullable=False),
        pa.field("warc_ts", pa.timestamp("us"), nullable=False),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)


def _join(*parts) -> pa.Array:
    """Vectorized string concat: scalars broadcast, arrays element-wise."""
    arrs = [
        p if isinstance(p, (pa.Array, pa.ChunkedArray)) else pa.scalar(str(p))
        for p in parts
    ]
    return pc.binary_join_element_wise(*arrs, "")


def _int_str(a: np.ndarray) -> pa.Array:
    return pc.cast(pa.array(a, type=pa.int64()), pa.string())


def urls_for_keys(keys: np.ndarray) -> pa.Array:
    hosts = keys % 997
    return _join(
        "https://site-", _int_str(hosts), ".example.com/page/", _int_str(keys)
    )


_MESSY_SCHEMES = pa.array(["HTTPS", "http", "https"])
_MESSY_PORTS = pa.array([":443", ":8080", ":80", "", ""])
_MESSY_QUERIES = pa.array(["?b=2&a=1", "", "", "", "", "", ""])


def messy_urls_for_keys(keys: np.ndarray) -> pa.Array:
    """Deterministic 'wild crawl' URLs: mixed-case schemes/hosts, default
    and non-default explicit ports, empty paths, queries, and fragments —
    every branch of :func:`..functions.urls.canonicalize_urls`, as a pure
    function of the key so a SQL oracle can rebuild the same bytes."""
    k = np.asarray(keys, dtype=np.int64)
    scheme = _MESSY_SCHEMES.take(pa.array(k % 3, type=pa.int64()))
    host_mixed = _join("Site-", _int_str(k % 997), ".Example.COM")
    host = pc.if_else(
        pa.array(k % 2 == 0), host_mixed, pc.utf8_lower(host_mixed)
    )
    port = _MESSY_PORTS.take(pa.array(k % 5, type=pa.int64()))
    path = pc.if_else(
        pa.array(k % 4 == 0),
        pa.scalar("", type=pa.string()),
        _join("/Page/", _int_str(k)),
    )
    query = _MESSY_QUERIES.take(pa.array(k % 7, type=pa.int64()))
    frag = pc.if_else(
        pa.array(k % 2 == 1),
        _join("#Frag", _int_str(k)),
        pa.scalar("", type=pa.string()),
    )
    return _join(scheme, "://", host, port, path, query, frag)


# variable-length filler via dictionary lookup (vectorized take), not per-row repeat
_FILLERS = pa.array([" lorem-ipsum" * k for k in range(3, 10)])


def text_for(urls: pa.Array, warc_ts_us: np.ndarray) -> pa.Array:
    """Deterministic page text: a pure function of (url, warc_ts)."""
    filler = _FILLERS.take(pa.array(warc_ts_us % 7, type=pa.int64()))
    return _join("extracted text of ", urls, " @", _int_str(warc_ts_us), filler)


def synthesize_binlog(
    out_dir: str | Path,
    *,
    n_events: int = 10_000,
    n_keys: int = 2_000,
    n_epochs: int = 4,
    seed: int = 42,
    zipf_a: float = 1.3,
    frac_delete: float = 0.05,
    frac_redelivered: float = 0.02,
    frac_out_of_order: float = 0.10,
    rows_per_segment: int = 250_000,
    html_pad: int = 0,
) -> dict:
    """Write segment files ``segment-e<E>-<i>.parquet``; return a summary."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)

    # Zipf-skewed key choice clipped to the universe
    keys = (rng.zipf(zipf_a, size=n_events) - 1) % n_keys
    seq = np.arange(n_events, dtype=np.int64)
    per_epoch = -(-n_events // n_epochs)
    epoch = (seq // per_epoch).astype(np.int32)

    # version timestamps: mostly increasing with seq; a fraction shuffled
    # backwards within the epoch so warc_ts order != arrival order
    warc_ts = BASE_TS_US + seq * 1_000_000 + rng.integers(0, 1_000_000, n_events)
    ooo = rng.random(n_events) < frac_out_of_order
    warc_ts[ooo] -= rng.integers(1, per_epoch * 1_000_000, ooo.sum())

    # op: first event of a key is I; later ones U; a fraction D (tombstone)
    first_occurrence = np.zeros(n_events, dtype=bool)
    _, first_idx = np.unique(keys, return_index=True)
    first_occurrence[first_idx] = True
    op = np.where(first_occurrence, "I", "U").astype(object)
    deletes = (~first_occurrence) & (rng.random(n_events) < frac_delete)
    op[deletes] = "D"

    # re-delivered duplicates: a sample of epoch-e events re-sent at the head
    # of epoch e+1 (identical seq + payload, only the delivery epoch differs)
    dup_mask = (rng.random(n_events) < frac_redelivered) & (epoch < n_epochs - 1)
    n_duplicates = int(dup_mask.sum())

    def build_chunk(idx: np.ndarray, deliver_epoch: int) -> pa.Table:
        """Materialize a bounded chunk of rows from the cheap base arrays —
        string payload columns are built per chunk so no Arrow array ever
        nears the 2 GiB offset limit."""
        k, ts, d = keys[idx], warc_ts[idx], deletes[idx]
        urls = urls_for_keys(k)
        text = text_for(urls, ts)
        if html_pad:
            # deterministic wide-page filler (~16·html_pad bytes) so the
            # benchmark can approximate real Common-Crawl html width; varies
            # per row via ts so columns stay incompressible enough to matter.
            # Wrapped in <style> blocks (extraction-dead) so the north-star
            # invariant text == extract_text_html(html) holds even on padded
            # corpora (functions/html.py drops style blocks entirely).
            pad = pa.array(
                np.array(["<style>pad%08d</style>" % v for v in range(16)])[
                    (ts % 16).astype(np.int64)
                ]
            )
            pad = pc.binary_repeat(pad, html_pad)
            html = _join("<html><body>", text, pad, "</body></html>")
        else:
            html = _join("<html><body>", text, "</body></html>")
        lang = pa.array(LANGS[k % len(LANGS)], type=pa.string())
        del_mask = pa.array(d)
        null_str = pa.scalar(None, type=pa.string())
        return pa.table(
            {
                "seq": seq[idx],
                "epoch": np.full(len(idx), deliver_epoch, dtype=np.int32),
                "op": pa.array(op[idx], type=pa.string()),
                "url": urls,
                "warc_ts": pa.array(ts, type=pa.timestamp("us")),
                "html": pc.if_else(del_mask, null_str, html).cast(pa.binary()),
                "text": pc.if_else(del_mask, null_str, text),
                "lang": pc.if_else(del_mask, null_str, lang),
            },
            schema=ENVELOPE_SCHEMA,
        )

    segments: list[str] = []
    for e in range(n_epochs):
        fresh = np.nonzero(epoch == e)[0]
        redelivered = (
            np.nonzero(dup_mask & (epoch == e - 1))[0]
            if e > 0
            else np.empty(0, dtype=np.int64)
        )
        order = np.concatenate([redelivered, fresh])
        n_seg = max(1, -(-len(order) // rows_per_segment))
        for i in range(n_seg):
            idx = order[i * rows_per_segment : (i + 1) * rows_per_segment]
            name = f"segment-e{e:05d}-{i:04d}.parquet"
            pq.write_table(build_chunk(idx, e), out / name, compression="zstd")
            segments.append(name)

    summary = {
        "n_events": n_events,
        "n_keys": n_keys,
        "n_epochs": n_epochs,
        "seed": seed,
        "zipf_a": zipf_a,
        "frac_delete": frac_delete,
        "frac_redelivered": frac_redelivered,
        "frac_out_of_order": frac_out_of_order,
        "rows_per_segment": rows_per_segment,
        "html_pad": html_pad,
        "n_duplicates": n_duplicates,
        "segments": segments,
    }
    with open(out / "_binlog.json", "w") as f:
        json.dump(summary, f, sort_keys=True)
    return summary


def ensure_binlog(out_dir: str | Path, **params) -> dict:
    """Synthesize unless an identical-parameter binlog already exists."""
    out = Path(out_dir)
    marker = out / "_binlog.json"
    if marker.exists():
        with open(marker) as f:
            existing = json.load(f)
        if all(existing.get(k) == v for k, v in params.items()):
            return existing
    return synthesize_binlog(out, **params)


def write_custom_binlog(out_dir: str | Path, rows: list[dict]) -> dict:
    """Write an explicit list of change events as a binlog (test helper).

    Each row: ``{seq, epoch, op, url, warc_ts (µs int), html, text, lang}``.
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    epochs = sorted({r["epoch"] for r in rows})
    segments = []
    for e in epochs:
        chunk = [r for r in rows if r["epoch"] == e]
        t = pa.table(
            {
                "seq": pa.array([r["seq"] for r in chunk], pa.int64()),
                "epoch": pa.array([r["epoch"] for r in chunk], pa.int32()),
                "op": pa.array([r["op"] for r in chunk], pa.string()),
                "url": pa.array([r["url"] for r in chunk], pa.string()),
                "warc_ts": pa.array([r["warc_ts"] for r in chunk], pa.timestamp("us")),
                "html": pa.array([r.get("html") for r in chunk], pa.binary()),
                "text": pa.array([r.get("text") for r in chunk], pa.string()),
                "lang": pa.array([r.get("lang") for r in chunk], pa.string()),
            },
            schema=ENVELOPE_SCHEMA,
        )
        name = f"segment-e{e:05d}-0000.parquet"
        pq.write_table(t, out / name, compression="zstd")
        segments.append(name)
    summary = {"n_events": len(rows), "n_epochs": max(epochs) + 1, "segments": segments}
    with open(out / "_binlog.json", "w") as f:
        json.dump(summary, f, sort_keys=True)
    return summary


def list_epochs(binlog_dir: str | Path) -> list[int]:
    with open(Path(binlog_dir) / "_binlog.json") as f:
        return list(range(json.load(f)["n_epochs"]))


def list_segments(binlog_dir: str | Path, epoch: int) -> list[str]:
    prefix = f"segment-e{epoch:05d}-"
    return sorted(
        str(p) for p in Path(binlog_dir).glob(f"{prefix}*.parquet")
    )
