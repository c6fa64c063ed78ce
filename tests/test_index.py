"""Incrementally-maintained inverted index: change-feed deltas (adds,
lost-term tombstones, delete tombstones), LWW lookup, resume from the
committed epoch, idempotent re-sync, bucket prune."""

import pyarrow as pa
import pytest

from airbyte_destination_ray.pipelines.cdc import run_cdc_sync
from airbyte_destination_ray.pipelines.index import (
    index_meta,
    lookup_term_docs,
    probed_files,
    sync_text_index,
)


def _pairs(ds):
    t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    return sorted(
        zip(t.column("term").to_pylist(), t.column("doc_id").to_pylist())
    )


def _build_docs_lake(tmp_path, rows):
    import json

    import pyarrow.parquet as pq

    binlog = tmp_path / "binlog"
    binlog.mkdir()
    epochs = sorted({r["epoch"] for r in rows})
    segments = []
    for e in epochs:
        chunk = [r for r in rows if r["epoch"] == e]
        t = pa.table(
            {
                "seq": pa.array([r["seq"] for r in chunk], pa.int64()),
                "epoch": pa.array([r["epoch"] for r in chunk], pa.int32()),
                "op": pa.array([r["op"] for r in chunk], pa.string()),
                "doc_id": pa.array([r["doc_id"] for r in chunk], pa.int64()),
                "ver": pa.array([r["ver"] for r in chunk], pa.int64()),
                "text": pa.array([r.get("text") for r in chunk], pa.string()),
            }
        )
        name = f"segment-e{e:05d}-0000.parquet"
        pq.write_table(t, binlog / name)
        segments.append(name)
    with open(binlog / "_binlog.json", "w") as f:
        json.dump(
            {
                "n_events": len(rows),
                "n_epochs": max(epochs) + 1,
                "segments": segments,
            },
            f,
        )
    lake = tmp_path / "lake"
    run_cdc_sync(
        str(lake),
        str(binlog),
        table="docs",
        pk="doc_id",
        ver="ver",
        payload_columns=["doc_id", "ver", "text"],
        num_partitions=4,
        compute_digest=False,
    )
    return lake


ROWS = [
    dict(seq=0, epoch=0, op="U", doc_id=1, ver=0, text="alpha beta gamma"),
    dict(seq=1, epoch=0, op="U", doc_id=2, ver=0, text="beta delta"),
    dict(seq=2, epoch=0, op="U", doc_id=3, ver=0, text="alpha alone"),
    # epoch 1: doc 1 loses beta+gamma, keeps alpha, gains omega;
    # doc 3 deleted
    dict(seq=3, epoch=1, op="U", doc_id=1, ver=1, text="alpha omega"),
    dict(seq=4, epoch=1, op="D", doc_id=3, ver=1, text=None),
]

EXPECTED = sorted(
    [
        ("alpha", 1),
        ("omega", 1),
        ("beta", 2),
        ("delta", 2),
    ]
)


def test_index_adds_tombstones_and_lookup(tmp_path, ray_session):
    lake = _build_docs_lake(tmp_path, ROWS)
    idx = tmp_path / "index"
    stats = sync_text_index(
        str(lake), "docs", idx, upto_epoch=1, num_buckets=8
    )
    assert set(stats) == {"0", "1"}
    got = _pairs(
        lookup_term_docs(
            idx, ["alpha", "beta", "gamma", "delta", "omega", "alone"]
        )
    )
    assert got == EXPECTED
    assert index_meta(idx)["last_epoch"] == 1


def test_index_resume_equals_oneshot(tmp_path, ray_session):
    lake = _build_docs_lake(tmp_path, ROWS)
    idx = tmp_path / "index"
    sync_text_index(str(lake), "docs", idx, upto_epoch=0, num_buckets=8)
    assert index_meta(idx)["last_epoch"] == 0
    # epoch-0 view: all three docs present with base text
    got0 = _pairs(lookup_term_docs(idx, ["alpha", "beta", "gamma"]))
    assert got0 == sorted([("alpha", 1), ("alpha", 3), ("beta", 1), ("beta", 2), ("gamma", 1)])
    # resume to epoch 1: identical to the one-shot build
    sync_text_index(str(lake), "docs", idx, upto_epoch=1, num_buckets=8)
    got = _pairs(
        lookup_term_docs(
            idx, ["alpha", "beta", "gamma", "delta", "omega", "alone"]
        )
    )
    assert got == EXPECTED
    # re-sync with nothing new is a no-op
    assert sync_text_index(str(lake), "docs", idx, upto_epoch=1) == {}


def test_index_bucket_prune_and_bucket_guard(tmp_path, ray_session):
    lake = _build_docs_lake(tmp_path, ROWS)
    idx = tmp_path / "index"
    sync_text_index(str(lake), "docs", idx, upto_epoch=1, num_buckets=8)
    one = probed_files(idx, ["alpha"])
    all_files = probed_files(
        idx, ["alpha", "beta", "gamma", "delta", "omega", "alone"]
    )
    assert one and set(one) < set(all_files)  # strict subset: prune real
    with pytest.raises(ValueError, match="buckets"):
        sync_text_index(str(lake), "docs", idx, upto_epoch=1, num_buckets=4)


def test_lookup_ignores_uncommitted_epoch_files(tmp_path, ray_session):
    """A crash mid-epoch leaves SOME buckets' delta files on disk before
    the meta commit — the committed last_epoch is the read barrier."""
    import shutil

    lake = _build_docs_lake(tmp_path, ROWS)
    idx = tmp_path / "index"
    sync_text_index(str(lake), "docs", idx, upto_epoch=1, num_buckets=8)
    full = _pairs(lookup_term_docs(idx, ["alpha", "beta", "omega"]))

    # simulate the crash: keep epoch-1 delta files but roll meta back
    import json

    meta = index_meta(idx)
    meta["last_epoch"] = 0
    with open(idx / "_index_meta.json", "w") as f:
        json.dump(meta, f)
    partial = _pairs(lookup_term_docs(idx, ["alpha", "beta", "omega"]))
    # epoch-0 view: no omega yet, doc 3 still alive
    assert ("omega", 1) not in partial
    assert ("alpha", 3) in partial
    # recovery: re-sync rewrites epoch 1 idempotently and recommits
    sync_text_index(str(lake), "docs", idx, upto_epoch=1)
    assert _pairs(lookup_term_docs(idx, ["alpha", "beta", "omega"])) == [
        p for p in full
    ]


def test_index_string_pk(tmp_path, ray_session):
    """The index is pk-type agnostic: a string-pk lake (the engine's
    default pages table shape) indexes and looks up cleanly."""
    from airbyte_destination_ray.sources.synth import write_custom_binlog

    b = str(tmp_path / "b")
    write_custom_binlog(b, [
        dict(seq=0, epoch=0, op="I", url="a.com", warc_ts=1,
             text="hello shared", lang="en", html=b""),
        dict(seq=1, epoch=0, op="I", url="b.com", warc_ts=1,
             text="shared world", lang="en", html=b""),
    ])
    lake = str(tmp_path / "lake")
    run_cdc_sync(lake, b, num_partitions=2)  # pages table, pk=url (string)
    idx = tmp_path / "index"
    sync_text_index(lake, "pages", idx, upto_epoch=0, num_buckets=4)
    got = lookup_term_docs(idx, ["shared", "hello"]).to_pandas()
    pairs = sorted(zip(got["term"], got["doc_id"]))
    assert pairs == [("hello", "a.com"), ("shared", "a.com"),
                     ("shared", "b.com")]


def test_trigram_substring_search_tracks_updates(ray_session, tmp_path):
    """pg_trgm analog: LIKE-parity on the current state, including an
    update that REMOVES a match and a delete; probes read only probed
    buckets."""
    import json

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from airbyte_destination_ray.pipelines.cdc import run_cdc_sync
    from airbyte_destination_ray.pipelines.index import (
        probed_files,
        substring_search,
        sync_trigram_index,
    )

    rows = [
        # epoch 0
        (0, 0, "U", 1, 0, "alpha needle here"),
        (1, 0, "U", 2, 1, "no match at all"),
        (2, 0, "U", 3, 2, "the needle twice needle"),
        (3, 0, "U", 4, 3, None),
        # epoch 1: doc 1 loses the needle; doc 3 deleted; doc 5 gains it
        (4, 1, "U", 1, 4, "alpha thread here"),
        (5, 1, "D", 3, 5, None),
        (6, 1, "U", 5, 6, "NEEDLE uppercase"),
    ]
    blog = tmp_path / "blog"
    blog.mkdir()
    t = pa.table({
        "seq": pa.array([r[0] for r in rows], pa.int64()),
        "epoch": pa.array([r[1] for r in rows], pa.int32()),
        "op": pa.array([r[2] for r in rows]),
        "doc_id": pa.array([r[3] for r in rows], pa.int64()),
        "ver": pa.array([r[4] for r in rows], pa.int64()),
        "text": pa.array([r[5] for r in rows]),
    })
    segs = []
    for e in (0, 1):
        import pyarrow.compute as pc

        name = f"segment-e{e:05d}-0000.parquet"
        pq.write_table(t.filter(pc.equal(t.column("epoch"), e)),
                       blog / name)
        segs.append(name)
    (blog / "_binlog.json").write_text(
        json.dumps({"n_epochs": 2, "segments": segs})
    )
    lake = str(tmp_path / "lake")
    idx = tmp_path / "idx"
    run_cdc_sync(lake, str(blog), table="docs", pk="doc_id", ver="ver",
                 payload_columns=["doc_id", "ver", "text"],
                 num_partitions=4)
    sync_trigram_index(lake, "docs", idx, upto_epoch=1, num_buckets=16)

    got = sorted(
        r["doc_id"]
        for r in substring_search(lake, "docs", idx, "Needle").take_all()
    )
    # doc 3 deleted, doc 1 updated away; doc 5 matches (case-folded)
    assert got == [5], got

    # short needles refuse
    import pytest as _p

    with _p.raises(ValueError):
        substring_search(lake, "docs", idx, "ab")

    # bucket prune: the probe reads a strict subset of the delta files
    all_files = sum(
        1 for b in idx.glob("bucket=*/epoch-*.parquet")
    )
    probed = len(probed_files(idx, ["nee", "eed", "edl", "dle"]))
    assert 0 < probed <= all_files


def test_compact_index_preserves_lookups_and_later_epochs(
    ray_session, tmp_path
):
    """Index compaction: per-bucket stacks fold to one snapshot; lookups
    identical pre/post; a LATER epoch's deltas still outrank the
    snapshot (compact mid-history, then advance, equals a never-
    compacted index)."""
    import json

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from airbyte_destination_ray.pipelines.cdc import run_cdc_sync
    from airbyte_destination_ray.pipelines.index import (
        compact_index,
        lookup_term_docs,
        sync_text_index,
    )

    rows = [
        (0, 0, "U", 1, 0, "apple banana"),
        (1, 0, "U", 2, 1, "banana cherry"),
        (2, 1, "U", 1, 2, "apple dates"),      # loses banana
        (3, 1, "U", 3, 3, "banana"),
        (4, 2, "D", 2, 4, None),               # cherry+banana doc gone
        (5, 2, "U", 4, 5, "cherry apple"),
    ]
    blog = tmp_path / "blog"
    blog.mkdir()
    t = pa.table({
        "seq": pa.array([r[0] for r in rows], pa.int64()),
        "epoch": pa.array([r[1] for r in rows], pa.int32()),
        "op": pa.array([r[2] for r in rows]),
        "doc_id": pa.array([r[3] for r in rows], pa.int64()),
        "ver": pa.array([r[4] for r in rows], pa.int64()),
        "text": pa.array([r[5] for r in rows]),
    })
    segs = []
    for e in (0, 1, 2):
        name = f"segment-e{e:05d}-0000.parquet"
        pq.write_table(t.filter(pc.equal(t.column("epoch"), e)),
                       blog / name)
        segs.append(name)
    (blog / "_binlog.json").write_text(
        json.dumps({"n_epochs": 3, "segments": segs})
    )

    def postings(idx, terms):
        return sorted(
            (r["term"], r["doc_id"])
            for r in lookup_term_docs(idx, terms).take_all()
        )

    terms = ["apple", "banana", "cherry", "dates"]
    lake = str(tmp_path / "lake")
    run_cdc_sync(lake, str(blog), table="docs", pk="doc_id", ver="ver",
                 payload_columns=["doc_id", "ver", "text"],
                 num_partitions=4)

    # compact mid-history, then advance
    idx = tmp_path / "idx"
    sync_text_index(lake, "docs", idx, upto_epoch=1, num_buckets=8)
    pre = postings(idx, terms)
    res = compact_index(idx)
    assert res["buckets"] >= 1 and res["files_removed"] >= 1
    assert postings(idx, terms) == pre
    # every bucket dir now holds exactly one delta file
    for b in idx.glob("bucket=*"):
        assert len(list(b.glob("epoch-*.parquet"))) == 1
    sync_text_index(lake, "docs", idx, upto_epoch=2)

    # reference: never-compacted full build
    idx2 = tmp_path / "idx2"
    sync_text_index(lake, "docs", idx2, upto_epoch=2, num_buckets=8)
    assert postings(idx, terms) == postings(idx2, terms)
    assert postings(idx, terms) == [
        ("apple", 1), ("apple", 4), ("banana", 3),
        ("cherry", 4), ("dates", 1),
    ]


def test_trigram_terms_survive_nul_and_unicode(ray_session):
    """The hex-term encoding round-trips NUL bytes and multibyte UTF-8
    (a numpy 'S3' view truncates at NUL; raw trigram bytes can split a
    character) — review-confirmed repro."""
    import binascii

    from airbyte_destination_ray.pipelines.index import (
        _tri_hex,
        _trigram_terms,
    )

    texts = pa.array(["ab\x00cd", "héllo", None, "xy"])
    terms, parents = _trigram_terms(texts, "")
    got = set(zip(parents.to_pylist(), terms.to_pylist()))
    raw0 = "ab\x00cd".encode()
    raw1 = "héllo".lower().encode()
    exp = {(0, t) for t in _tri_hex(raw0)} | {(1, t) for t in _tri_hex(raw1)}
    assert got == exp
    # every term is pure-hex ASCII, NULs preserved inside
    assert all(
        len(t) == 6 and binascii.unhexlify(t) for _, t in got
    )
